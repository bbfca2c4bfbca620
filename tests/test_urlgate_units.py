"""URL-gate normalization edges (llm/urlcuration.py): hand-checked
canonical forms the sf-scale fixture cannot isolate — tracking-only
query strings, mixed tracking + kept params, fragments, case-folds,
scheme-less garbage, subdomain rollups and blocklist polarity. The
fixture-level oracle parity rides in test_oracle_parity."""

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.urlcuration import (UrlGateConfig,
                                                 build_url_gate)


def _gate(spark, urls, **kw):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    cfg = UrlGateConfig("u", source="t", url_expr="url", **kw)
    return {r.doc_id: r for r in build_url_gate(spark, reg, cfg).collect()}


def test_url_normalization_edges(spark):
    out = _gate(spark, [
        "HTTPS://WWW.Example.COM/a?utm_source=x",          # 0
        "http://www.example.com/a?utm_source=x&id=7",      # 1
        "http://news.example.com/b#frag",                  # 2
        "https://Example.com/a?id=7&utm_campaign=c",       # 3
        "not a url at all",                                # 4
        "http://one.two.ads.net/x",                        # 5
    ], blocklist=("ads.net",))
    # tracking-only query strips entirely (trailing ? tidied away)
    assert out[0].url_norm == "https://www.example.com/a"
    # non-tracking param survives, '?&' tidied to '?'
    assert out[1].url_norm == "http://www.example.com/a?id=7"
    # fragment stripped
    assert out[2].url_norm == "http://news.example.com/b"
    # trailing '&'-side tracking param stripped, kept param stays
    assert out[3].url_norm == "https://example.com/a?id=7"
    # registered-domain rollup collapses subdomains
    assert out[0].domain == "example.com"
    assert out[2].domain == "example.com"
    assert out[5].domain == "ads.net"
    # census counts the rolled-up domain
    assert out[0].n_domain_docs == 4
    # blocklist verdict
    assert out[5].is_blocked and not out[0].is_blocked
    # scheme-less garbage canonicalizes to the empty-host form with an
    # empty domain — visible, never an error
    assert out[4].domain == ""


def test_url_gate_custom_tracking_params(spark):
    out = _gate(spark, ["http://a.example.org/p?ref=abc&id=1"],
                tracking_params=("ref",))
    assert out[0].url_norm == "http://a.example.org/p?id=1"
