"""Train/eval contamination detection: n-gram overlap between a corpus
and a benchmark (eval) set.

Standard LLM training-data hygiene (the GPT-3 appendix / Dolma /
FineWeb decontamination recipe, all public): a training document is
contaminated when it shares at least one n-gram with any eval document;
contaminated documents are dropped or flagged before training. The
eval set here is selected by a deterministic id rule so the Spark plan
and the DuckDB oracle pick the identical set; production deployments
register a real benchmark table instead.

Scale design (100 TB corpus, small eval set): the corpus side explodes
to distinct (doc, gram) pairs inside the scan stage (codegen, no
shuffle); the eval gram set is tiny by construction (benchmarks are
MBs, corpora are TBs) and is broadcast, so the probe join is
shuffle-free over the corpus — the only shuffle is the final per-doc
aggregation on doc_id. An optional document-frequency cap drops
ubiquitous grams (boilerplate) the same way the Jaccard operator tames
hot shingles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens, spark_shingles, duck_shingles


@dataclass(frozen=True)
class ContaminationConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    ngram_n: int = 5          # 13 in the GPT-3 recipe; 5 suits short docs
    eval_mod: int = 17        # doc_id % eval_mod == 0 -> eval set
    broadcast_eval: bool = True
    # > 0: drop grams appearing in more than this many corpus documents
    # before the probe join (boilerplate suppression, same idea as
    # NgramJaccardConfig.max_doc_freq). Costs one extra gram-keyed
    # aggregation shuffle, so it is opt-in; the hot-gram set it yields
    # is small by definition and is broadcast for the anti-join.
    max_doc_freq: int = 0


def _grams(cfg: ContaminationConfig, reg: Registry, spark) -> DataFrame:
    df = reg.load(spark, cfg.source)
    w = df.selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w")
    return w.selectExpr(
        cfg.id_col, f"explode({spark_shingles('w', cfg.ngram_n)}) AS gram")


def build_contamination(spark, reg: Registry, cfg: ContaminationConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    """(doc_id, n_shared_ngrams, n_eval_docs_hit) for every TRAIN
    document sharing >= 1 n-gram with the eval set.

    The corpus side is deliberately NOT pre-deduplicated: a distinct
    over the full gram explosion is a corpus-wide shuffle, while the
    countDistinct aggregation dedupes within the (much smaller) per-doc
    groups after the broadcast join has filtered to overlap rows only.
    Only the eval side (small) pays an explicit distinct."""
    grams = _grams(cfg, reg, spark)
    is_eval = (F.col(cfg.id_col) % cfg.eval_mod) == 0
    eval_grams = (grams.filter(is_eval)
                  .select(F.col(cfg.id_col).alias("eval_id"), "gram")
                  .distinct())
    if cfg.broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train = grams.filter(~is_eval)
    if cfg.max_doc_freq:
        hot = (grams.groupBy("gram")
               .agg(F.countDistinct(cfg.id_col).alias("df"))
               .filter(F.col("df") > cfg.max_doc_freq).select("gram"))
        train = train.join(F.broadcast(hot), "gram", "left_anti")
    return (train.join(eval_grams, "gram")
            .groupBy(cfg.id_col)
            .agg(F.countDistinct("gram").alias("n_shared_ngrams"),
                 F.countDistinct("eval_id").alias("n_eval_docs_hit")))


def contamination_oracle(b: SqlBuilder, reg: Registry,
                         cfg: ContaminationConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    gr = b.cte(f"{cfg.name}__g",
               f"SELECT DISTINCT {cfg.id_col}, "
               f"unnest({duck_shingles('w', cfg.ngram_n)}) AS gram FROM {w}")
    ev = b.cte(f"{cfg.name}__ev",
               f"SELECT {cfg.id_col} AS eval_id, gram FROM {gr} "
               f"WHERE {cfg.id_col} % {cfg.eval_mod} = 0")
    hot_gate = ""
    if cfg.max_doc_freq:
        hot = b.cte(
            f"{cfg.name}__hot",
            f"SELECT gram FROM {gr} GROUP BY gram "
            f"HAVING count(DISTINCT {cfg.id_col}) > {cfg.max_doc_freq}")
        hot_gate = f"AND t.gram NOT IN (SELECT gram FROM {hot}) "
    return b.cte(
        cfg.name,
        f"SELECT t.{cfg.id_col}, "
        f"count(DISTINCT t.gram) AS n_shared_ngrams, "
        f"count(DISTINCT e.eval_id) AS n_eval_docs_hit "
        f"FROM {gr} t JOIN {ev} e USING (gram) "
        f"WHERE t.{cfg.id_col} % {cfg.eval_mod} != 0 "
        f"{hot_gate}"
        f"GROUP BY t.{cfg.id_col}")


def eval_gram_set(spark, reg: Registry, cfg: ContaminationConfig,
                  g: GlobalConfig = DEFAULT) -> DataFrame:
    """The static eval-side artifact of the gate: the distinct n-gram
    set of the benchmark documents. Benchmarks are MBs, so this stays
    broadcastable by construction; production recomputes it only when
    the benchmark suite changes (a nightly job at most)."""
    grams = _grams(cfg, reg, spark)
    return (grams.filter((F.col(cfg.id_col) % cfg.eval_mod) == 0)
            .select("gram").distinct())


def contamination_gate(docs: DataFrame, eval_grams: DataFrame,
                       cfg: ContaminationConfig) -> DataFrame:
    """Keep only documents that share NO n-gram with the eval set —
    the decontamination DROP to `build_contamination`'s REPORT, with
    the gram expressions shared so the two cannot drift. Documents
    matching the eval-id rule are dropped too (a benchmark document in
    a training corpus is contamination by definition).

    Works identically on a batch frame and inside ``foreachBatch``
    (streaming.curation.start_contamination_gate): the gate is per-doc
    vs a STATIC gram set, so micro-batch-local gating equals corpus-
    wide gating — no cross-document dependency, no state. Plan shape:
    scan-stage explode, broadcast semi-join on gram, broadcast-able
    hit-id anti-join; the only wide op is the final anti-join keyed on
    {id}, and its right side (contaminated ids) is overlap-sized.

    ``max_doc_freq`` is refused here: the document-frequency cap is a
    corpus-wide statistic, undefined over one micro-batch."""
    if cfg.max_doc_freq:
        raise ValueError(
            f"{cfg.name}: max_doc_freq is corpus-wide — the gate "
            f"(batch or micro-batch) cannot honor it; pre-filter hot "
            f"grams out of eval_grams instead")
    is_eval = (F.col(cfg.id_col) % cfg.eval_mod) == 0
    train = docs.filter(~is_eval)
    w = train.selectExpr(cfg.id_col,
                         f"{spark_tokens(cfg.text_col)} AS __w")
    pairs = w.selectExpr(
        cfg.id_col, f"explode({spark_shingles('__w', cfg.ngram_n)}) AS gram")
    hits = (pairs.join(F.broadcast(eval_grams), "gram", "left_semi")
            .select(cfg.id_col))
    return train.join(hits, cfg.id_col, "left_anti")


def contamination_gate_oracle(b: SqlBuilder, reg: Registry,
                              cfg: ContaminationConfig,
                              g: GlobalConfig = DEFAULT,
                              out_cols: str = "*") -> str:
    """Full-corpus SQL for the gate: training docs with zero shared
    grams (NOT EXISTS over the eval gram set)."""
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__gw",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    gr = b.cte(f"{cfg.name}__gg",
               f"SELECT DISTINCT {cfg.id_col}, "
               f"unnest({duck_shingles('w', cfg.ngram_n)}) AS gram FROM {w}")
    ev = b.cte(f"{cfg.name}__gev",
               f"SELECT DISTINCT gram FROM {gr} "
               f"WHERE {cfg.id_col} % {cfg.eval_mod} = 0")
    return b.cte(
        cfg.name,
        f"SELECT {out_cols} FROM {src} d "
        f"WHERE d.{cfg.id_col} % {cfg.eval_mod} != 0 AND NOT EXISTS ("
        f"SELECT 1 FROM {gr} t JOIN {ev} e USING (gram) "
        f"WHERE t.{cfg.id_col} = d.{cfg.id_col})")


def build_decontaminated(spark, reg: Registry, cfg: ContaminationConfig,
                         g: GlobalConfig = DEFAULT) -> DataFrame:
    """Project-facing decontamination: the source rows (all columns)
    that survive the gate — eval-set computation and gate composed from
    the two building blocks above."""
    docs = reg.load(spark, cfg.source)
    return contamination_gate(docs, eval_gram_set(spark, reg, cfg, g), cfg)
