"""Small-file compaction (operators/compaction.py): the file-count
contract and row preservation. The sf-scale oracle parity rides in
test_oracle_parity via the declared fixture (docs_compacted)."""

import glob
import os

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.compaction import (CompactionConfig,
                                                      build_compaction,
                                                      compact_directory)


def _data_files(path):
    return [f for f in glob.glob(os.path.join(path, "*.parquet"))
            if not os.path.basename(f).startswith("_")]


def test_compaction_rewrites_to_exact_file_count(spark, tmp_path):
    frag = str(tmp_path / "frag")
    comp = str(tmp_path / "comp")
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    df.repartition(16).write.parquet(frag)
    assert len(_data_files(frag)) == 16
    out = compact_directory(spark, frag, comp, 3, "id bigint, v bigint")
    assert len(_data_files(comp)) == 3
    assert out.count() == 1000
    assert out.selectExpr("sum(v)").first()[0] == 999 * 1000


def test_build_compaction_preserves_rows_exactly(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", i) for i in range(97)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    reg = Registry()
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = CompactionConfig("c_test", fragment_files=9, target_files=2)
    out = build_compaction(spark, reg, cfg)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(97))


def test_validation():
    with pytest.raises(ValueError, match="cols"):
        CompactionConfig("c", cols=())
    with pytest.raises(ValueError, match="target_files"):
        CompactionConfig("c", target_files=0)
