"""Document chunking: fixed-size overlapping character windows — the
context-window preparation step for pretraining and retrieval corpora
(every RAG/embedding pipeline re-cuts documents into overlapping
chunks; overlap preserves cross-boundary context, stride controls the
duplication factor).

Chunk grammar (1-based, both dialects):

    n_chunks   = 1                           if length <= chunk_chars
               = 1 + ceil((length - chunk_chars) / stride)  otherwise
    chunk_start(i) = 1 + i * stride          for i in [0, n_chunks)
    chunk_text(i)  = substring(text, chunk_start, chunk_chars)

NULL text yields no rows (there is nothing to cut); empty text yields
one empty chunk (the document exists — downstream joins keyed on
doc_id must not lose it). The last chunk may be shorter than
``chunk_chars`` (substring clamps identically in Spark and DuckDB).

Scale design (100 TB): pure scan-stage generate+project — the
``sequence``/``range`` explode and the substring run inside
whole-stage codegen with ZERO shuffles; output size is input size
times the overlap factor (chunk/stride), which the config makes
explicit. Chunk provenance (doc_id, chunk_id, chunk_start) rides
along, so any downstream dedup/score can be mapped back to exact
character offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class ChunkConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    chunk_chars: int = 120
    stride: int = 90             # overlap = chunk_chars - stride

    def __post_init__(self):
        if self.chunk_chars < 1 or self.stride < 1:
            raise ValueError(
                f"{self.name}: chunk_chars and stride must be >= 1")
        if self.stride > self.chunk_chars:
            raise ValueError(
                f"{self.name}: stride ({self.stride}) > chunk_chars "
                f"({self.chunk_chars}) would skip characters between "
                f"chunks — use stride <= chunk_chars")


def _n_chunks_expr(cfg: ChunkConfig) -> str:
    """Identical text in Spark SQL and DuckDB; DOUBLE ceil is exact for
    any realistic document length (< 2^52)."""
    n = f"length({cfg.text_col})"
    return (f"CASE WHEN {n} <= {cfg.chunk_chars} THEN 1 "
            f"ELSE 1 + CAST(ceil(CAST({n} - {cfg.chunk_chars} AS DOUBLE) "
            f"/ {cfg.stride}) AS INT) END")


def chunk_dataframe(df: DataFrame, cfg: ChunkConfig,
                    carry: tuple = ()) -> DataFrame:
    """Chunk an arbitrary DataFrame — the single implementation both
    the batch builder and the streaming path use (stateless generate+
    project, so it runs unchanged inside a micro-batch plan; shared
    code means stream and batch cannot drift). ``carry``: extra
    columns to pass through unchanged (e.g. the event-time column a
    stream's watermark rides on)."""
    # Spark's sequence(0, -1) counts DOWN — guard with the NULL filter
    # (n_chunks >= 1 for every non-NULL text by construction)
    base = (df.filter(f"{cfg.text_col} IS NOT NULL")
            .selectExpr(cfg.id_col, *carry, cfg.text_col,
                        f"{_n_chunks_expr(cfg)} AS n_chunks"))
    return base.selectExpr(
        cfg.id_col, *carry,
        "explode(sequence(0, n_chunks - 1)) AS chunk_id",
        "n_chunks", cfg.text_col,
    ).selectExpr(
        cfg.id_col, *carry, "chunk_id", "n_chunks",
        f"1 + chunk_id * {cfg.stride} AS chunk_start",
        f"substring({cfg.text_col}, 1 + chunk_id * {cfg.stride}, "
        f"{cfg.chunk_chars}) AS chunk_text",
    ).selectExpr(cfg.id_col, *carry, "chunk_id", "n_chunks",
                 "chunk_start", "length(chunk_text) AS chunk_len",
                 "chunk_text")


def build_doc_chunks(spark, reg: Registry, cfg: ChunkConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    return chunk_dataframe(reg.load(spark, cfg.source), cfg)


def doc_chunks_oracle(b: SqlBuilder, reg: Registry, cfg: ChunkConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    base = b.cte(f"{cfg.name}__b",
                 f"SELECT {cfg.id_col}, {cfg.text_col}, "
                 f"{_n_chunks_expr(cfg)} AS n_chunks FROM {src} "
                 f"WHERE {cfg.text_col} IS NOT NULL")
    ex = b.cte(
        f"{cfg.name}__e",
        f"SELECT {cfg.id_col}, CAST(i AS INT) AS chunk_id, n_chunks, "
        f"CAST(1 + i * {cfg.stride} AS INT) AS chunk_start, "
        f"substring({cfg.text_col}, CAST(1 + i * {cfg.stride} AS INT), "
        f"{cfg.chunk_chars}) AS chunk_text "
        f"FROM {base}, UNNEST(range(0, n_chunks)) AS t(i)")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, chunk_id, n_chunks, chunk_start, "
        f"CAST(length(chunk_text) AS INT) AS chunk_len, chunk_text "
        f"FROM {ex}")


@dataclass(frozen=True)
class ChunkDedupConfig:
    """Paragraph-level dedup over the chunk grammar (round-7): find
    chunk texts shared across >= ``min_docs`` documents, then report
    per document how much of it is duplicated material — the natural
    consumer of chunk provenance (doc_id, chunk_start, chunk_len).
    Overlapping duplicate chunks are merged into maximal character
    SPANS (interval union via gaps-and-islands, the same pattern as
    substring dedup's diagonal runs), so ``dup_chars`` counts each
    duplicated character once no matter how many strided chunks cover
    it. No reference analogue; standard corpus-curation step (C4/
    RefinedWeb-style inter-document paragraph dedup).

    Output: (doc_id, n_chunks, n_dup_chunks, n_dup_spans, dup_chars,
    first_dup_start, last_dup_end, doc_chars) — integers only (the
    dup ratio is dup_chars/doc_chars, a pure function of the output;
    doubles stay out of the surface for cross-dialect rendering).
    """

    name: str
    chunks_entity: str = "doc_chunks"
    id_col: str = "doc_id"
    min_docs: int = 2        # chunk text must appear in >= N documents
    min_chunk_len: int = 20  # ignore tiny (mostly tail) chunks
    normalize: bool = True   # lower(trim(text)) before hashing

    def __post_init__(self):
        if self.min_docs < 2:
            raise ValueError(
                f"{self.name}: min_docs must be >= 2 (a chunk always "
                f"appears in its own document)")
        if self.min_chunk_len < 1:
            raise ValueError(f"{self.name}: min_chunk_len must be >= 1")


def build_chunk_dedup(spark, reg: Registry, cfg: ChunkDedupConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    """Scale design (100 TB): one md5 per eligible chunk at scan stage;
    the cross-document frequency is ONE map-side-combined groupBy on
    the signature (uniform key — md5), the join back re-shuffles the
    slim (doc_id, offsets, sig) projection on the same key, and the
    span merge + per-doc rollup share ONE doc_id partitioning (window
    and both groupBys). No driver actions, no cartesian anywhere; the
    signature table is corpus-sized but never collected or broadcast.
    """
    from pyspark.sql import Window, functions as F

    ch = reg.load(spark, cfg.chunks_entity)
    norm = (F.lower(F.trim(F.col("chunk_text"))) if cfg.normalize
            else F.col("chunk_text"))
    eligible = (ch.filter(F.col("chunk_len") >= cfg.min_chunk_len)
                .select(F.col(cfg.id_col).alias("doc_id"),
                        F.col("chunk_start"),
                        (F.col("chunk_start") + F.col("chunk_len") - 1)
                        .alias("chunk_end"),
                        F.unhex(F.md5(norm)).alias("sig")))
    dup_sigs = (eligible.groupBy("sig")
                .agg(F.countDistinct("doc_id").alias("n_docs"))
                .filter(F.col("n_docs") >= cfg.min_docs).select("sig"))
    dups = eligible.join(dup_sigs, "sig")

    # interval union per doc: a chunk starts a new span iff it begins
    # past every earlier chunk's end (strictly adjacent offsets merge
    # because positions are inclusive on both ends)
    w = Window.partitionBy("doc_id").orderBy("chunk_start")
    prev_max = F.max("chunk_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    islands = dups.withColumn(
        "new_span",
        F.when(prev_max.isNull()
               | (F.col("chunk_start") > prev_max + 1), 1).otherwise(0)
    ).withColumn(
        "span_id",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = (islands.groupBy("doc_id", "span_id")
             .agg(F.min("chunk_start").alias("span_start"),
                  F.max("chunk_end").alias("span_end")))
    per_doc = (spans.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_dup_spans"),
                    F.sum(F.col("span_end") - F.col("span_start") + 1)
                    .alias("dup_chars"),
                    F.min("span_start").alias("first_dup_start"),
                    F.max("span_end").alias("last_dup_end")))
    n_dup_chunks = (dups.groupBy("doc_id")
                    .agg(F.count(F.lit(1)).alias("n_dup_chunks")))

    totals = (ch.groupBy(F.col(cfg.id_col).alias("doc_id"))
              .agg(F.max("n_chunks").alias("n_chunks"),
                   (F.max(F.col("chunk_start") + F.col("chunk_len")) - 1)
                   .alias("doc_chars")))
    return (totals
            .join(n_dup_chunks, "doc_id", "left")
            .join(per_doc, "doc_id", "left")
            .select("doc_id", "n_chunks",
                    F.coalesce("n_dup_chunks", F.lit(0))
                    .alias("n_dup_chunks"),
                    F.coalesce("n_dup_spans", F.lit(0))
                    .alias("n_dup_spans"),
                    F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
                    "first_dup_start", "last_dup_end", "doc_chars"))


def chunk_dedup_oracle(b: SqlBuilder, reg: Registry, cfg: ChunkDedupConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    """Independent replay of the span algebra with DuckDB windows —
    same inclusive-interval semantics, same strict-adjacency merge."""
    chunks = reg.duckdb_relation(cfg.chunks_entity)
    norm = ("lower(trim(chunk_text))" if cfg.normalize else "chunk_text")
    el = b.cte(f"{cfg.name}__el",
               f"SELECT {cfg.id_col} AS doc_id, chunk_start, "
               f"chunk_start + chunk_len - 1 AS chunk_end, "
               f"md5({norm}) AS sig FROM {chunks} "
               f"WHERE chunk_len >= {cfg.min_chunk_len}")
    fr = b.cte(f"{cfg.name}__fr",
               f"SELECT sig FROM {el} GROUP BY sig "
               f"HAVING count(DISTINCT doc_id) >= {cfg.min_docs}")
    du = b.cte(f"{cfg.name}__du",
               f"SELECT e.doc_id, e.chunk_start, e.chunk_end "
               f"FROM {el} e JOIN {fr} USING (sig)")
    fl = b.cte(
        f"{cfg.name}__fl",
        f"SELECT doc_id, chunk_start, chunk_end, CASE WHEN "
        f"max(chunk_end) OVER (PARTITION BY doc_id ORDER BY chunk_start "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL "
        f"OR chunk_start > max(chunk_end) OVER (PARTITION BY doc_id "
        f"ORDER BY chunk_start ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING) + 1 THEN 1 ELSE 0 END AS new_span FROM {du}")
    isl = b.cte(
        f"{cfg.name}__is",
        f"SELECT doc_id, chunk_start, chunk_end, sum(new_span) OVER "
        f"(PARTITION BY doc_id ORDER BY chunk_start ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id FROM {fl}")
    sp = b.cte(f"{cfg.name}__sp",
               f"SELECT doc_id, span_id, min(chunk_start) AS span_start, "
               f"max(chunk_end) AS span_end FROM {isl} "
               f"GROUP BY doc_id, span_id")
    pd_ = b.cte(f"{cfg.name}__pd",
                f"SELECT doc_id, count(*) AS n_dup_spans, "
                f"CAST(sum(span_end - span_start + 1) AS BIGINT) "
                f"AS dup_chars, min(span_start) AS first_dup_start, "
                f"max(span_end) AS last_dup_end FROM {sp} GROUP BY doc_id")
    nd = b.cte(f"{cfg.name}__nd",
               f"SELECT doc_id, count(*) AS n_dup_chunks FROM {du} "
               f"GROUP BY doc_id")
    tot = b.cte(f"{cfg.name}__tot",
                f"SELECT {cfg.id_col} AS doc_id, max(n_chunks) AS n_chunks, "
                f"max(chunk_start + chunk_len) - 1 AS doc_chars "
                f"FROM {chunks} GROUP BY {cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT t.doc_id, t.n_chunks, "
        f"coalesce(nd.n_dup_chunks, 0) AS n_dup_chunks, "
        f"coalesce(p.n_dup_spans, 0) AS n_dup_spans, "
        f"coalesce(p.dup_chars, 0) AS dup_chars, "
        f"p.first_dup_start, p.last_dup_end, t.doc_chars "
        f"FROM {tot} t LEFT JOIN {nd} nd ON t.doc_id = nd.doc_id "
        f"LEFT JOIN {pd_} p ON t.doc_id = p.doc_id")


@dataclass(frozen=True)
class ChunkScrubConfig:
    """Exact substring-dedup TRANSFORM (round-8): remove cross-document
    duplicated chunks from the text and keep the document — the
    "deduplicate the substring, not the document" policy of Lee et al.
    2022 (Deduplicating Training Data Makes Language Models Better),
    where dropping whole documents for one shared boilerplate passage
    throws away good prose. ``chunk_dedup`` above REPORTS duplicated
    spans; this operator REMOVES them and reassembles the survivors.

    Semantics — first occurrence wins, globally: the corpus is cut into
    NON-overlapping chunks (stride == chunk_chars, so removal is
    well-defined — each character belongs to exactly one chunk); a
    chunk occurrence is removed iff an identical (normalized) chunk
    text exists at a strictly earlier position in corpus order
    (lower doc_id, or same doc_id and lower chunk_id). The earliest
    copy of every duplicated passage survives, every later copy is cut,
    and ``cleaned_text`` is the in-order concatenation of surviving
    chunks. Chunks shorter than ``min_chunk_len`` (document tails) are
    never candidates — tiny fragments collide by chance and carry no
    dedup signal (Lee et al. use a 50-token floor for the same reason).

    Output: (doc_id, n_chunks, n_removed_chunks, cleaned_len,
    cleaned_text). Documents with NULL text have no chunks and emit no
    row (the ``doc_chunks`` contract). Ids must be non-negative: the
    corpus-order key is a zero-padded decimal rendering (portable
    string MIN across engines — struct-min aggregation orderings are
    engine-specific, lpad is not).

    No reference analogue (the reference is a Data Vault loader);
    extends the build brief's training-data-pipeline surface.
    """

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    chunk_chars: int = 60        # non-overlapping removal unit
    min_chunk_len: int = 20      # tails below this are never removed
    normalize: bool = True       # lower(trim(text)) before matching

    def __post_init__(self):
        if self.chunk_chars < 1:
            raise ValueError(f"{self.name}: chunk_chars must be >= 1")
        if self.min_chunk_len < 1:
            raise ValueError(f"{self.name}: min_chunk_len must be >= 1")

    def chunker(self) -> ChunkConfig:
        # stride == chunk_chars: disjoint chunks, removal well-defined
        return ChunkConfig(f"{self.name}__ch", source=self.source,
                           id_col=self.id_col, text_col=self.text_col,
                           chunk_chars=self.chunk_chars,
                           stride=self.chunk_chars)


def _okey_expr(cfg: ChunkScrubConfig, dialect: str) -> str:
    """Corpus-order occurrence key: zero-padded '(doc_id):(chunk_id)'.

    String MIN over these equals numeric (doc_id, chunk_id) MIN for
    non-negative ids; lpad renders identically in Spark and DuckDB."""
    vc = "STRING" if dialect == "spark" else "VARCHAR"
    return (f"concat(lpad(CAST({cfg.id_col} AS {vc}), 19, '0'), ':', "
            f"lpad(CAST(chunk_id AS {vc}), 10, '0'))")


def build_chunk_scrub(spark, reg: Registry, cfg: ChunkScrubConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    """Scale design (100 TB): chunking is scan-stage generate+project
    (zero shuffles); the signature census is ONE map-side-combined
    groupBy on md5 (uniform key, partial MIN/COUNT collapse hot
    signatures before the shuffle); only signatures seen >= 2 times
    survive into the join side, so the equi-join back is against the
    duplicated minority (AQE broadcasts it when small, shuffles on the
    uniform md5 key when not); the reassembly shuffles once on doc_id.
    No windows, no driver actions, no cartesian anywhere.
    """
    from pyspark.sql import functions as F

    ch = chunk_dataframe(reg.load(spark, cfg.source), cfg.chunker())
    norm = (F.lower(F.trim(F.col("chunk_text"))) if cfg.normalize
            else F.col("chunk_text"))
    cand = (ch.filter(F.col("chunk_len") >= cfg.min_chunk_len)
            .select(F.col(cfg.id_col), F.col("chunk_id"),
                    F.unhex(F.md5(norm)).alias("sig"),
                    F.expr(_okey_expr(cfg, "spark")).alias("okey")))
    firsts = (cand.groupBy("sig")
              .agg(F.min("okey").alias("first_key"),
                   F.count(F.lit(1)).alias("n_occ"))
              .filter(F.col("n_occ") >= 2))
    removals = (cand.join(firsts, "sig")
                .filter(F.col("okey") != F.col("first_key"))
                .select(cfg.id_col, "chunk_id",
                        F.lit(True).alias("__removed")))
    out = (ch.join(removals, [cfg.id_col, "chunk_id"], "left")
           .groupBy(cfg.id_col)
           .agg(F.count(F.lit(1)).cast("int").alias("n_chunks"),
                F.sum(F.when(F.col("__removed"), 1).otherwise(0))
                .cast("int").alias("n_removed_chunks"),
                F.collect_list(
                    F.when(F.col("__removed").isNull(),
                           F.struct("chunk_id", "chunk_text")))
                .alias("__kept")))
    return (out.withColumn(
                "cleaned_text",
                F.expr("array_join(transform(array_sort(__kept), "
                       "x -> x.chunk_text), '')"))
            .select(cfg.id_col, "n_chunks", "n_removed_chunks",
                    F.length("cleaned_text").cast("int")
                    .alias("cleaned_len"),
                    "cleaned_text"))


def chunk_scrub_oracle(b: SqlBuilder, reg: Registry, cfg: ChunkScrubConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    chunks = doc_chunks_oracle(b, reg, cfg.chunker(), g)
    norm = ("lower(trim(chunk_text))" if cfg.normalize else "chunk_text")
    cand = b.cte(
        f"{cfg.name}__ca",
        f"SELECT {cfg.id_col}, chunk_id, md5({norm}) AS sig, "
        f"{_okey_expr(cfg, 'duckdb')} AS okey "
        f"FROM {chunks} WHERE chunk_len >= {cfg.min_chunk_len}")
    firsts = b.cte(
        f"{cfg.name}__fi",
        f"SELECT sig, min(okey) AS first_key FROM {cand} "
        f"GROUP BY sig HAVING count(*) >= 2")
    rem = b.cte(
        f"{cfg.name}__rm",
        f"SELECT c.{cfg.id_col}, c.chunk_id, true AS removed "
        f"FROM {cand} c JOIN {firsts} f USING (sig) "
        f"WHERE c.okey <> f.first_key")
    return b.cte(
        cfg.name,
        f"SELECT ch.{cfg.id_col}, CAST(count(*) AS INT) AS n_chunks, "
        f"CAST(count(r.removed) AS INT) AS n_removed_chunks, "
        f"CAST(length(coalesce(string_agg(ch.chunk_text, '' "
        f"ORDER BY ch.chunk_id) FILTER (WHERE r.removed IS NULL), "
        f"'')) AS INT) AS cleaned_len, "
        f"coalesce(string_agg(ch.chunk_text, '' ORDER BY ch.chunk_id) "
        f"FILTER (WHERE r.removed IS NULL), '') AS cleaned_text "
        f"FROM {chunks} ch LEFT JOIN {rem} r "
        f"ON ch.{cfg.id_col} = r.{cfg.id_col} "
        f"AND ch.chunk_id = r.chunk_id "
        f"GROUP BY ch.{cfg.id_col}")
