"""URL/domain curation (RefinedWeb §3.1-style): canonical URL
normalization, registered-domain rollup and a broadcast blocklist gate
— the standard first stage of a web-corpus pipeline (Penedo et al.
2023 filter on the URL before ever reading the page).

Normalization (all scan-stage expressions — zero shuffles):

- fragment stripped (``#...`` never reaches the server);
- scheme and host case-folded (RFC 3986: both are case-insensitive;
  path/query are NOT touched);
- tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``
  by default), leftover ``?``/``&`` tidied — so two crawls of one page
  that differ only in campaign tags canonicalize identically.

Registered domain: the last two host labels (``news.example.com`` ->
``example.com``). This is the naive eTLD+1 — exact grouping under
multi-label suffixes (``co.uk``) needs the Public Suffix List, which
is a broadcast lookup table in production; the rollup structure is
identical.

Gate: ``blocklist`` is a declared domain set (broadcast-sized by
definition — reputation lists are thousands of rows); a document is
blocked iff its registered domain is listed. The per-domain census
(``n_domain_docs``) rides along — the reputation signal builders
(domain share caps, spam-domain heuristics) consume exactly this.

Scale design (100 TB): normalization and domain extraction are pure
Column expressions in the scan stage; the census is one
map-side-combined groupBy on the (bounded) domain level; the join-back
is AQE-decided (domain census << corpus — broadcast in practice); the
blocklist test is an IN over a literal list (no join at all). Regex
patterns follow the repo portability contract (llm/scrub.py): no
backslashes, no quotes — character classes only — so Java regex
(Spark) and RE2 (DuckDB) agree literally.

Reference anchor: the reference (a Data Vault loader) has no web
curation surface; this extends the build brief's training-data
pipeline operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder

_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_DOMAIN = "([^.]+[.][^.]+)$"


@dataclass(frozen=True)
class UrlGateConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    # SQL expression for the URL, valid in BOTH dialects (the stage
    # text_expr contract)
    url_expr: str = "url"
    blocklist: tuple = ()
    # alternation terms for tracking parameter NAMES (regex fragments
    # under the no-backslash contract)
    tracking_params: tuple = ("utm_[A-Za-z]+", "fbclid", "gclid")

    def __post_init__(self):
        ensure_identifier(self.id_col, "column", self.name)
        for t in self.tracking_params + self.blocklist:
            if "\\" in t or "'" in t:
                raise ValueError(
                    f"{self.name}: {t!r} violates the regex/literal "
                    f"portability contract (backslash or quote)")

    def tracking_pattern(self) -> str:
        return f"({'|'.join(self.tracking_params)})=[^&#]*[&]?"


def _norm_exprs(cfg: UrlGateConfig, dialect: str) -> tuple:
    """(url_norm, domain) SQL expressions over a column named ``url``.
    regexp_replace is first-match-only in DuckDB — the fragment and
    scheme-host patterns match at most once by construction, only the
    tracking strip needs the 'g' flag."""
    gflag = ", 'g'" if dialect == "duck" else ""
    nofrag = "regexp_replace(url, '#.*', '')"
    scheme = f"lower(regexp_extract({nofrag}, '{_SCHEME}', 1))"
    host = f"lower(regexp_extract({nofrag}, '{_HOST}', 1))"
    rest = f"regexp_replace({nofrag}, '{_SCHEME_HOST}', '')"
    rest = (f"regexp_replace({rest}, '{cfg.tracking_pattern()}', ''"
            f"{gflag})")
    # tidy: '?&id=7' -> '?id=7', trailing '?'/'&' -> ''
    rest = (f"regexp_replace(replace({rest}, '?&', '?'), "
            f"'[?&]+$', '')")
    url_norm = f"concat({scheme}, '://', {host}, {rest})"
    domain = f"regexp_extract({host}, '{_DOMAIN}', 1)"
    return url_norm, domain


def _block_pred(cfg: UrlGateConfig) -> str:
    if not cfg.blocklist:
        return "false"
    lst = ", ".join(f"'{d}'" for d in cfg.blocklist)
    return f"domain IN ({lst})"


def build_url_gate(spark, reg: Registry, cfg: UrlGateConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    url_norm, domain = _norm_exprs(cfg, "spark")
    t = (reg.load(spark, cfg.source)
         .selectExpr(cfg.id_col, f"({cfg.url_expr}) AS url")
         .selectExpr(cfg.id_col, f"{url_norm} AS url_norm",
                     f"{domain} AS domain"))
    census = t.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_domain_docs"))
    return (t.join(census, "domain")
            .selectExpr(cfg.id_col, "url_norm", "domain",
                        "n_domain_docs",
                        f"({_block_pred(cfg)}) AS is_blocked"))


def url_gate_oracle(b: SqlBuilder, reg: Registry, cfg: UrlGateConfig,
                    g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    url_norm, domain = _norm_exprs(cfg, "duck")
    t = b.cte(f"{cfg.name}__t",
              f"SELECT {cfg.id_col}, {url_norm} AS url_norm, "
              f"{domain} AS domain FROM ("
              f"SELECT {cfg.id_col}, ({cfg.url_expr}) AS url "
              f"FROM {src}) u")
    census = b.cte(f"{cfg.name}__c",
                   f"SELECT domain, count(*) AS n_domain_docs "
                   f"FROM {t} GROUP BY domain")
    return b.cte(
        cfg.name,
        f"SELECT t.{cfg.id_col}, t.url_norm, t.domain, "
        f"c.n_domain_docs, ({_block_pred(cfg)}) AS is_blocked "
        f"FROM {t} t JOIN {census} c USING (domain)")
