"""Trending top-k (llm/profile.py) and text normalization
(llm/lineclean.py): hand-checked bucketing/tie-breaks and the fold
contract. sf-scale oracle parity rides in test_oracle_parity."""

import datetime

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.profile import (TrendingConfig,
                                             build_trending_topk)
from datavault4dbt_spark.llm.lineclean import (TextNormalizeConfig,
                                               build_text_normalize)

TS = datetime.datetime.fromisoformat


def _reg(name, df):
    reg = Registry()
    reg.spark_loaders[name] = lambda _s: df
    return reg


def test_trending_ranks_per_bucket_with_value_tiebreak(spark):
    rows = [(TS("2024-01-01 01:00:00"), "b"),
            (TS("2024-01-01 02:00:00"), "b"),
            (TS("2024-01-01 03:00:00"), "a"),
            (TS("2024-01-01 04:00:00"), "c"),   # a/c tie -> a first
            (TS("2024-01-02 01:00:00"), "c")]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {(r["bucket"], r["rnk"]): (r["value"], r["cnt"])
           for r in build_trending_topk(
               spark, _reg("events", df),
               TrendingConfig("t", k=2)).collect()}
    d0 = 19723                       # 2024-01-01 epoch-day
    assert out[(d0, 1)] == ("b", 2)
    assert out[(d0, 2)] == ("a", 1)  # tie with c broken by value
    assert out[(d0 + 1, 1)] == ("c", 1)
    assert len(out) == 3             # k cuts, no rank-3 row


def test_normalize_folds_case_punct_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   WORLD!!"), (2, "hello world"), (3, "!!!")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in build_text_normalize(
        spark, _reg("documents", df),
        TextNormalizeConfig("n")).collect()}
    assert out[1]["norm_text"] == "hello world"
    assert out[1]["norm_md5"] == out[2]["norm_md5"]   # variants collapse
    assert (out[1]["n_norm_chars"], out[1]["n_norm_tokens"]) == (11, 2)
    assert out[3]["norm_text"] == ""                  # all-punct -> empty
    assert out[3]["n_norm_tokens"] == 0
