"""Deduplication operators for large-scale training-data pipelines.

Five dedup strategies over the ``documents`` / ``embeddings`` tables,
each with a Spark DataFrame plan and a DuckDB oracle generator built
from the same config (the repo-wide dual-build pattern):

- exact           : content-hash grouping -> canonical-id mapping
- minhash_lsh     : word-shingle MinHash signatures, banded LSH join
- simhash         : 32-bit token SimHash, banded candidate join +
                    Hamming verification
- ngram_jaccard   : exact n-gram Jaccard via inverted shingle index
- embedding_cosine: near-duplicate vectors by cosine similarity

Scale design (100 TB): every operator is expressed with built-in
array/higher-order functions — signature computation stays inside the
scan's whole-stage codegen with NO shuffle; the only shuffles are the
candidate-generation joins, which key on uniformly-distributed hash
signatures (no skew). The LSH band join touches only bucket collisions
(|candidates| << |pairs|); the brute-force ops (ngram inverted index,
cosine) prune with doc-frequency / threshold filters and are the
verification tier, not the discovery tier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from .textprep import (spark_tokens, duck_tokens, spark_shingles,
                       duck_shingles, n_digests)


# ---------------------------------------------------------------- exact --

@dataclass(frozen=True)
class ExactDedupConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    content_col: str = "text"


def build_exact_dedup(spark, reg: Registry, cfg: ExactDedupConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    """Canonical-id mapping per content hash: every non-NULL-content row
    keeps its id, plus the minimum id sharing the same md5(content) —
    the standard exact-dedup 'keep first' decision as a reusable
    mapping table. Rows with NULL content are EXCLUDED from the mapping
    (md5(NULL) is NULL and NULL keys never equi-join — same in the
    oracle); treat the mapping as total only over non-NULL content, or
    filter NULLs upstream with the quality gate.

    Scale: one hash-partitioned shuffle on the 32-char digest (uniform);
    map-side partial min aggregation; broadcast-joins back only when the
    dup-group table is small (Catalyst/AQE decides).
    """
    df = reg.load(spark, cfg.source)
    hashed = df.select(
        F.col(cfg.id_col),
        F.md5(F.col(cfg.content_col)).alias("content_hash"))
    canon = (hashed.groupBy("content_hash")
             .agg(F.min(cfg.id_col).alias("canonical_id")))
    return hashed.join(canon, "content_hash").select(
        cfg.id_col, "canonical_id", "content_hash")


def exact_dedup_oracle(b: SqlBuilder, reg: Registry, cfg: ExactDedupConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    h = b.cte(f"{cfg.name}__h",
              f"SELECT {cfg.id_col}, md5({cfg.content_col}) AS content_hash "
              f"FROM {src}")
    c = b.cte(f"{cfg.name}__c",
              f"SELECT content_hash, min({cfg.id_col}) AS canonical_id "
              f"FROM {h} GROUP BY content_hash")
    return b.cte(cfg.name,
                 f"SELECT {cfg.id_col}, canonical_id, a.content_hash AS content_hash "
                 f"FROM {h} a JOIN {c} USING (content_hash)")


# ---------------------------------------------------------- minhash LSH --

@dataclass(frozen=True)
class MinHashLshConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    shingle_n: int = 3
    num_perm: int = 16       # permutations (simulated via seeded md5)
    bands: int = 4           # num_perm/bands rows per band


def _band_width(cfg: MinHashLshConfig) -> int:
    assert cfg.num_perm % cfg.bands == 0
    return cfg.num_perm // cfg.bands


def minhash_bucket_frame(df: DataFrame, cfg: MinHashLshConfig) -> DataFrame:
    """(id, band, sig) LSH bucket rows for every document in ``df`` —
    the shared signature front-end of the batch pair-finder below and
    the incremental index dedup (llm/incdedup.py): one shingle explode,
    one md5 digest pass, one k-min aggregation, band keys stacked in
    the same projection (one generator row per (doc, band))."""
    r = _band_width(cfg)
    w = df.selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w")
    # single pass: explode shingles once, digest once, take all k
    # minima in ONE partial-aggregating groupBy (no per-permutation
    # array materialization)
    nd = n_digests(cfg.num_perm)
    dig = ", ".join(f"md5(concat('{j}:', s))" for j in range(nd))
    ex = w.selectExpr(cfg.id_col,
                      f"explode({spark_shingles('w', cfg.shingle_n)}) AS s") \
          .selectExpr(cfg.id_col, f"concat({dig}) AS h")
    sig = ex.groupBy(cfg.id_col).agg(
        *[F.min(F.expr(f"substr(h, {1 + 4 * i}, 4)")).alias(f"mh{i}")
          for i in range(cfg.num_perm)])
    # unhex(md5): the band key is internal (pair outputs carry ids and
    # band counts), so shuffle it as 16-byte BINARY rather than the
    # 32-char hex string — the bucket self-join and the persisted
    # signature index (llm/incdedup.py) halve their key bytes (guide
    # §2.3); unhex is injective on md5 output, so bucket collisions —
    # and therefore every downstream count — are unchanged
    stack_rows = ", ".join(
        f"{bidx}, unhex(md5(concat_ws('|', "
        + ", ".join(f"mh{bidx * r + j}" for j in range(r)) + ")))"
        for bidx in range(cfg.bands))
    return sig.selectExpr(
        cfg.id_col,
        f"stack({cfg.bands}, {stack_rows}) AS (band, sig)")


def build_minhash_lsh(spark, reg: Registry, cfg: MinHashLshConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    """Candidate duplicate pairs via banded MinHash (Broder '97 /
    Leskovec MMDS ch.3). Signature + banding are pure projections; the
    single shuffle is the self-join on (band, signature) — at 100 TB
    this is the canonical shingle->minhash->band->bucket-join plan, and
    bucket keys are md5 outputs so the join is skew-free by construction.

    Cache lifecycle: the (band, sig) bucket table is persist()ed (it
    feeds both self-join sides) and intentionally left cached —
    unpersisting before the caller consumes the returned plan would
    defeat the point. Long-lived sessions running builders repeatedly
    should `spark.catalog.clearCache()` between runs (bench.py does).
    """
    # no min-parallelism shim here: the heavy work (bucket join +
    # verify) runs AFTER a shuffle, which restores parallelism on
    # its own; round-robin repartitioning the scan only adds an
    # exchange (measured 1.5-2x slower at fixture scale)
    df = reg.load(spark, cfg.source)
    # The bucket subtree (shingle explode + md5 digests per shingle +
    # k-min aggregation) dominates query cost and feeds BOTH self-join
    # sides, so it must materialize exactly once (the round-5 shape:
    # 2*bands cache readers; this one: 2).
    buckets = minhash_bucket_frame(df, cfg).persist()
    a = buckets.alias("a")
    bb = buckets.alias("b")
    pairs = (a.join(bb, on=[F.col("a.band") == F.col("b.band"),
                            F.col("a.sig") == F.col("b.sig"),
                            F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
             .groupBy(F.col(f"a.{cfg.id_col}").alias("id_a"),
                      F.col(f"b.{cfg.id_col}").alias("id_b"))
             .agg(F.count("*").alias("n_bands")))
    return pairs


def minhash_lsh_oracle(b: SqlBuilder, reg: Registry, cfg: MinHashLshConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    r = _band_width(cfg)
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w FROM {src}")
    nd = n_digests(cfg.num_perm)
    dig = ", ".join(f"md5(concat('{j}:', s))" for j in range(nd))
    ex = b.cte(f"{cfg.name}__ex",
               f"SELECT {cfg.id_col}, concat({dig}) AS h FROM ("
               f"SELECT {cfg.id_col}, "
               f"unnest({duck_shingles('w', cfg.shingle_n)}) AS s FROM {w})")
    sig_cols = ", ".join(f"min(substr(h, {1 + 4 * i}, 4)) AS mh{i}"
                         for i in range(cfg.num_perm))
    sig = b.cte(f"{cfg.name}__sig",
                f"SELECT {cfg.id_col}, {sig_cols} FROM {ex} "
                f"GROUP BY {cfg.id_col}")
    band_selects = []
    for bidx in range(cfg.bands):
        cols = ", ".join(f"mh{bidx * r + j}" for j in range(r))
        band_selects.append(
            f"SELECT {cfg.id_col}, {bidx} AS band, "
            f"md5(concat_ws('|', {cols})) AS sig FROM {sig}")
    bu = b.cte(f"{cfg.name}__buckets", "\nUNION ALL\n".join(band_selects))
    return b.cte(cfg.name,
                 f"SELECT a.{cfg.id_col} AS id_a, b.{cfg.id_col} AS id_b, "
                 f"count(*) AS n_bands "
                 f"FROM {bu} a JOIN {bu} b ON a.band = b.band AND a.sig = b.sig "
                 f"AND a.{cfg.id_col} < b.{cfg.id_col} GROUP BY 1, 2")


# -------------------------------------------------------------- simhash --

@dataclass(frozen=True)
class SimHashConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    bits: int = 32           # 8 hex nibbles of md5(token)
    max_hamming: int = 3     # band count = max_hamming + 1 (pigeonhole)

    def __post_init__(self):
        # The fingerprint is assembled as a sum of 2^j terms and CAST to
        # BIGINT: at bits=64 the top term (2^63) exceeds the signed
        # range, so any document whose bit 63 wins the majority vote
        # overflows (ANSI error / NULL fingerprint) — and xor/bit_count
        # on the DuckDB side breaks identically. 32 bits (the md5-hex
        # nibble budget) is the supported fingerprint width; scale the
        # BAND count (max_hamming), not the width.
        if not (4 <= self.bits <= 32 and self.bits % 4 == 0):
            raise ValueError(
                f"SimHash bits must be a multiple of 4 in [4, 32], "
                f"got {self.bits}")
        if self.bits % (self.max_hamming + 1):
            raise ValueError(
                f"bits ({self.bits}) must divide evenly into "
                f"max_hamming+1 = {self.max_hamming + 1} bands")


# Hard token cap enforced in the plan (Spark slice / DuckDB list slice)
# BEFORE the per-token explode: the packed 16-bit lanes overflow BIGINT
# starting at 32768 tokens on the worst-case sum — 32767*(2^48+2^32+
# 2^16+1) = 9223231297218904063 < 2^63-1, so 32767 is the largest safe
# count — and oversize documents would hash WRONG, not fail. We cap at
# 32766, deliberately one under the proven bound; tokens beyond it
# carry no extra majority-vote signal (they only shift the threshold).
_SIMHASH_MAX_TOKENS = 32766


def _simhash_nibble_exprs(bits: int):
    """One int per hex nibble of md5(token) — computed ONCE per token
    (substr+instr are the expensive part; the 4 bit tests per nibble
    then run on the cached int). Identical text in Spark & DuckDB."""
    return [f"(instr('0123456789abcdef', substr(h, {p + 1}, 1)) - 1) AS v{p}"
            for p in range(bits // 4)]


def _simhash_packed_exprs(bits: int, dialect: str):
    """Per-token PACKED bit contribution, one expression per nibble:
    the 4 bits of nibble p are spread into 16-bit lanes of one BIGINT,
    so the per-document aggregation is bits/4 SUMs + COUNT instead of
    `bits` SUMs (4x fewer aggregate buffers; sum(+-1) > 0 is equivalent
    to 2*bitcount > n). Lane width 16 bits caps documents at 32767
    tokens before lane overflow — token counts beyond that carry no
    extra SimHash signal, so production pipelines sample/truncate
    upstream (textprep tokenizers emit far fewer)."""
    idiv = " div " if dialect == "spark" else " // "
    exprs = []
    for p in range(bits // 4):
        terms = [f"((v{p}{idiv}{2 ** q}) % 2) * {2 ** (16 * q)}"
                 for q in range(4)]
        exprs.append(" + ".join(terms))
    return exprs


def _simhash_value_expr(bits: int, dialect: str) -> str:
    """Fingerprint from packed lane sums s0.. and token count n:
    bit j set iff the majority of tokens set it (2*count > n)."""
    idiv = " div " if dialect == "spark" else " // "
    terms = []
    for j in range(bits):
        p, q = divmod(j, 4)
        cnt = f"((s{p}{idiv}{2 ** (16 * q)}) % 65536)"
        terms.append(f"CASE WHEN 2 * {cnt} > n THEN {2 ** j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def build_simhash_dedup(spark, reg: Registry, cfg: SimHashConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    """Charikar SimHash near-dup: 32-bit fingerprints, 8-bit band join
    (Hamming <= 3 guarantees >= 1 identical band), exact Hamming verify.

    Scale: fingerprinting = explode + one groupBy(doc) (map-side partial
    sums); candidate join keys on 4-bit band values — buckets are large
    (65k distinct fingerprints max), so this op is the *verifier* for
    moderate corpora; at extreme scale raise `bits` (wider fingerprint =
    finer buckets), the plan shape is unchanged.
    """
    nb = cfg.max_hamming + 1
    band_bits = cfg.bits // nb
    # no min-parallelism shim here: the heavy work (bucket join +
    # verify) runs AFTER a shuffle, which restores parallelism on
    # its own; round-robin repartitioning the scan only adds an
    # exchange (measured 1.5-2x slower at fixture scale)
    df = reg.load(spark, cfg.source)
    toks = df.selectExpr(
        cfg.id_col,
        f"explode(slice({spark_tokens(cfg.text_col)}, 1, "
        f"{_SIMHASH_MAX_TOKENS})) AS t")
    hx = toks.selectExpr(cfg.id_col, "md5(t) AS h") \
             .selectExpr(cfg.id_col, *_simhash_nibble_exprs(cfg.bits))
    sums = hx.groupBy(cfg.id_col).agg(
        *[F.sum(F.expr(e)).alias(f"s{p}")
          for p, e in enumerate(_simhash_packed_exprs(cfg.bits, "spark"))],
        F.count("*").alias("n"))
    # fp is one slim row per document but its subtree (tokenize + md5 +
    # packed-lane aggregation over every token) is the expensive part of
    # the whole query — and it is consumed by `nb` non-identical band
    # projections (different band constants, so ReusedExchange cannot
    # dedupe them). Persist it: fingerprints compute once, the band
    # union and both join sides read the cached rows.
    fp = sums.selectExpr(cfg.id_col,
                         f"{_simhash_value_expr(cfg.bits, 'spark')} AS simhash") \
             .persist()
    bands = []
    for q in range(nb):
        bands.append(fp.selectExpr(
            cfg.id_col, "simhash", f"{q} AS band",
            f"(simhash div {2 ** (band_bits * q)}) % {2 ** band_bits} AS val"))
    bu = bands[0]
    for extra in bands[1:]:
        bu = bu.unionByName(extra)
    a, bb = bu.alias("a"), bu.alias("b")
    cand = (a.join(bb, on=[F.col("a.band") == F.col("b.band"),
                           F.col("a.val") == F.col("b.val"),
                           F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
            .select(F.col(f"a.{cfg.id_col}").alias("id_a"),
                    F.col(f"b.{cfg.id_col}").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    out = cand.selectExpr(
        "id_a", "id_b",
        "bit_count(cast(sh_a AS BIGINT) ^ cast(sh_b AS BIGINT)) AS hamming").filter(
        F.col("hamming") <= cfg.max_hamming)
    return out


def simhash_dedup_oracle(b: SqlBuilder, reg: Registry, cfg: SimHashConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    nb = cfg.max_hamming + 1
    band_bits = cfg.bits // nb
    src = reg.duckdb_relation(cfg.source)
    toks = b.cte(f"{cfg.name}__t",
                 f"SELECT {cfg.id_col}, "
                 f"unnest(({duck_tokens(cfg.text_col)})"
                 f"[1:{_SIMHASH_MAX_TOKENS}]) AS t "
                 f"FROM {src}")
    hx = b.cte(f"{cfg.name}__h",
               f"SELECT {cfg.id_col}, "
               + ", ".join(_simhash_nibble_exprs(cfg.bits))
               + f" FROM (SELECT {cfg.id_col}, md5(t) AS h FROM {toks})")
    sum_cols = ", ".join(f"sum({e}) AS s{p}"
                         for p, e in enumerate(_simhash_packed_exprs(cfg.bits, "duck")))
    sums = b.cte(f"{cfg.name}__s",
                 f"SELECT {cfg.id_col}, {sum_cols}, count(*) AS n "
                 f"FROM {hx} GROUP BY {cfg.id_col}")
    fp = b.cte(f"{cfg.name}__fp",
               f"SELECT {cfg.id_col}, {_simhash_value_expr(cfg.bits, 'duck')} AS simhash "
               f"FROM {sums}")
    band_selects = [
        f"SELECT {cfg.id_col}, simhash, {q} AS band, "
        f"(simhash // {2 ** (band_bits * q)}) % {2 ** band_bits} AS val FROM {fp}"
        for q in range(nb)]
    bu = b.cte(f"{cfg.name}__bands", "\nUNION ALL\n".join(band_selects))
    cand = b.cte(
        f"{cfg.name}__cand",
        f"SELECT DISTINCT a.{cfg.id_col} AS id_a, b.{cfg.id_col} AS id_b, "
        f"a.simhash AS sh_a, b.simhash AS sh_b "
        f"FROM {bu} a JOIN {bu} b ON a.band = b.band AND a.val = b.val "
        f"AND a.{cfg.id_col} < b.{cfg.id_col}")
    return b.cte(cfg.name,
                 f"SELECT id_a, id_b, "
                 f"bit_count(xor(sh_a::BIGINT, sh_b::BIGINT)) AS hamming "
                 f"FROM {cand} WHERE bit_count(xor(sh_a::BIGINT, sh_b::BIGINT)) <= "
                 f"{cfg.max_hamming}")


# -------------------------------------------------------- ngram jaccard --

@dataclass(frozen=True)
class NgramJaccardConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    shingle_n: int = 3
    threshold: float = 0.5
    # Drop shingles appearing in more than `max_doc_freq` documents
    # BEFORE the inverted-index self-join (0 = no cap). A stopword
    # shingle in 10^6 docs would otherwise put 10^12 pair rows in one
    # join partition. Jaccard is then computed over the KEPT shingle
    # sets (sizes post-filter), a well-defined contract: hot shingles
    # carry no discriminative signal, true near-dups still share their
    # rare shingles. The oracle applies the identical cap.
    max_doc_freq: int = 200


def build_ngram_jaccard(spark, reg: Registry, cfg: NgramJaccardConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    """Exact n-gram Jaccard duplicates via an inverted shingle index:
    only pairs sharing >= 1 kept shingle are ever materialized.

    Scale: the index join shuffles on the shingle string; hot shingles
    (stopword runs) would skew it, so shingles above `max_doc_freq`
    documents are dropped first. The DF count is a window over the same
    `s` key the join shuffles on, so AQE reuses the exchange; AQE
    skew-join splitting covers any remainder below the cap.
    """
    # no min-parallelism shim here: the heavy work (bucket join +
    # verify) runs AFTER a shuffle, which restores parallelism on
    # its own; round-robin repartitioning the scan only adds an
    # exchange (measured 1.5-2x slower at fixture scale)
    df = reg.load(spark, cfg.source)
    w = df.selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w")
    sh = (w.selectExpr(cfg.id_col,
                       f"explode({spark_shingles('w', cfg.shingle_n)}) AS s")
          .distinct())
    if cfg.max_doc_freq:
        from pyspark.sql import Window
        sh = (sh.withColumn("df", F.count("*").over(Window.partitionBy("s")))
              .filter(F.col("df") <= cfg.max_doc_freq)
              .drop("df"))
    # the kept inverted index feeds three consumers (sizes + both join
    # sides); the join sides share one exchange via ReusedExchange but
    # `sizes` shuffles on id instead of s, which would recompute the
    # explode+distinct+window chain. Persist the slim (id, shingle)
    # pairs once. MEMORY_AND_DISK is the cluster-safe default: at 100 TB
    # the index spills instead of evicting under memory pressure.
    sh = sh.persist()
    sizes = sh.groupBy(cfg.id_col).agg(F.count("*").alias("n"))
    a, bb = sh.alias("a"), sh.alias("b")
    inter = (a.join(bb, on=[F.col("a.s") == F.col("b.s"),
                            F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
             .groupBy(F.col(f"a.{cfg.id_col}").alias("id_a"),
                      F.col(f"b.{cfg.id_col}").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.selectExpr(f"{cfg.id_col} AS id_a", "n AS na")
    sb = sizes.selectExpr(f"{cfg.id_col} AS id_b", "n AS nb")
    out = (inter.join(sa, "id_a").join(sb, "id_b")
           .selectExpr("id_a", "id_b",
                       "round(inter / (na + nb - inter), 6) AS jaccard")
           .filter(F.col("jaccard") >= cfg.threshold))
    return out


def ngram_jaccard_oracle(b: SqlBuilder, reg: Registry, cfg: NgramJaccardConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w FROM {src}")
    sh = b.cte(f"{cfg.name}__sh",
               f"SELECT DISTINCT {cfg.id_col}, "
               f"unnest({duck_shingles('w', cfg.shingle_n)}) AS s FROM {w}")
    if cfg.max_doc_freq:
        sh = b.cte(f"{cfg.name}__kept",
                   f"SELECT {cfg.id_col}, s FROM ("
                   f"SELECT {cfg.id_col}, s, "
                   f"COUNT(*) OVER (PARTITION BY s) AS df FROM {sh}) "
                   f"WHERE df <= {cfg.max_doc_freq}")
    sizes = b.cte(f"{cfg.name}__n",
                  f"SELECT {cfg.id_col}, count(*) AS n FROM {sh} "
                  f"GROUP BY {cfg.id_col}")
    inter = b.cte(f"{cfg.name}__i",
                  f"SELECT a.{cfg.id_col} AS id_a, b.{cfg.id_col} AS id_b, "
                  f"count(*) AS inter FROM {sh} a JOIN {sh} b "
                  f"ON a.s = b.s AND a.{cfg.id_col} < b.{cfg.id_col} "
                  f"GROUP BY 1, 2")
    return b.cte(
        cfg.name,
        f"SELECT id_a, id_b, "
        f"round(inter / (sa.n + sb.n - inter), 6) AS jaccard "
        f"FROM {inter} JOIN {sizes} sa ON sa.{cfg.id_col} = id_a "
        f"JOIN {sizes} sb ON sb.{cfg.id_col} = id_b "
        f"WHERE round(inter / (sa.n + sb.n - inter), 6) >= {cfg.threshold}")


# ----------------------------------------------------- embedding cosine --

@dataclass(frozen=True)
class EmbeddingCosineConfig:
    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    threshold: float = 0.4
    # 0 = higher-order-function fold (measured FASTER than an unrolled
    # element_at sum: the 64-term expression falls out of whole-stage
    # codegen and pays per-element bounds checks; the fold JITs well)
    dim: int = 0
    # sign-LSH candidate generation (the scale path): `lsh_bands` bands
    # of `lsh_bits` sign bits each, band q over coordinates
    # [q*lsh_bits, (q+1)*lsh_bits). A pair is a candidate iff it shares
    # >= 1 band bucket; cosine verifies. lsh_bands=0 = exact all-pairs
    # (verification tier ONLY — O(n^2), never the default).
    # Default r=8, b=8 (needs dim >= 64): 256 buckets per band, so
    # candidate volume is ~n^2/256 per band under uniform signs —
    # measured 4-bit bands pruned only 2x off all-pairs (16 buckets
    # cannot bound bucket size as n grows; a scale-killer at corpus
    # size). Recall P = 1-(1-p^r)^b with p = 1 - acos(cos)/pi:
    # r=8 -> 0.94 at cosine 0.9, 0.75 at 0.8 — near-dup detection
    # targets the high-cosine regime; lower r only if you need recall
    # on genuinely distant pairs and can pay the candidate volume.
    lsh_bits: int = 8
    lsh_bands: int = 8


# Dot product in DOUBLE with left-to-right IEEE summation — identical
# values in both engines. The default (dim=0) is the higher-order
# aggregate/zip_with fold: MEASURED ~3.5x faster than a 64-term
# unrolled element_at sum on the hot pair-scoring join (the unrolled
# expression falls out of whole-stage codegen and pays per-element
# array bounds checks; the fold's lambda loop JITs well). `dim` keeps
# the unrolled form available for engines where that tradeoff flips.
# ((t1+t2)+t3)... association equals the fold from 0.0
# (0.0+t1 == t1 exactly), so results are bit-identical.
def _spark_dot(a: str, bcol: str, dim: int = 0) -> str:
    if dim:
        terms = " + ".join(
            f"element_at({a}, {i}) * element_at({bcol}, {i})"
            for i in range(1, dim + 1))
        return f"({terms})"
    return (f"aggregate(zip_with({a}, {bcol}, (x, y) -> x * y), "
            f"cast(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _spark_norm(v: str) -> str:
    return (f"sqrt(aggregate({v}, cast(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + x * x))")


def _duck_dot(a: str, bcol: str, dim_expr: str, dim: int = 0) -> str:
    if dim:
        terms = " + ".join(f"{a}[{i}] * {bcol}[{i}]"
                           for i in range(1, dim + 1))
        return f"({terms})"
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {dim_expr} + 1), "
            f"i -> {a}[i] * {bcol}[i])), (acc, v) -> acc + v)")


def _duck_norm(v: str) -> str:
    return (f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({v}, x -> x * x)), (acc, x) -> acc + x))")


def _sign_band_expr(vec: str, band: int, bits: int, dialect: str) -> str:
    """Sign bucket of coordinates [band*bits, (band+1)*bits): bit i set
    iff the coordinate is >= 0 (same hyperplane family as
    similarity._bucket_expr, offset per band)."""
    terms = []
    for i in range(bits):
        pos = band * bits + i + 1
        at = (f"element_at({vec}, {pos})" if dialect == "spark"
              else f"{vec}[{pos}]")
        terms.append(f"CASE WHEN {at} >= 0 THEN {2 ** i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def build_embedding_cosine(spark, reg: Registry, cfg: EmbeddingCosineConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    """Embedding near-duplicates: candidate pairs from banded sign-LSH
    buckets, verified by exact cosine >= threshold.

    Scale (100 TB): the banded table is SLIM (id, band, val) — vectors
    are NOT carried through the candidate self-join; verification joins
    the distinct candidate pairs back to the normalized vector table on
    id. Shuffles key on (band, val) and id — both uniform. No pair is
    materialized unless it collides in >= 1 bucket, so the join is
    O(collisions), not O(n^2). `lsh_bands=0` falls back to the exact
    all-pairs verifier (recall baseline; never the configured default).
    """
    # no min-parallelism shim here: the heavy work (bucket join +
    # verify) runs AFTER a shuffle, which restores parallelism on
    # its own; round-robin repartitioning the scan only adds an
    # exchange (measured 1.5-2x slower at fixture scale)
    df = reg.load(spark, cfg.source)
    if cfg.lsh_bands:
        # One-row probe (driver-side scalar, same pattern as the HWM
        # probes): band q reads coordinates [q*bits, (q+1)*bits), so
        # vectors shorter than bands*bits would make the high bands read
        # past the array end -> NULL -> every bit 0 -> all rows share one
        # bucket per degenerate band = a silent O(n^2) cross join (the
        # oracle degenerates identically, so parity would not catch it).
        need = cfg.lsh_bands * cfg.lsh_bits
        probe = df.selectExpr(f"size({cfg.vec_col}) AS d").first()
        if probe is not None and (probe.d is None or probe.d < need):
            raise ValueError(
                f"{cfg.name}: embedding dim {probe.d} < lsh_bands*lsh_bits"
                f" = {need}; lower lsh_bits/lsh_bands (candidate buckets "
                f"degenerate when bands read past the vector end). "
                f"NULL dim = a NULL vector in the first row — clean the "
                f"input. Ragged corpora (later rows shorter) pass this "
                f"one-row probe but fail fast at runtime: ANSI mode's "
                f"element_at raises INVALID_ARRAY_INDEX past the end.")
    v = df.selectExpr(
        cfg.id_col,
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v")
    # normalized side is consumed twice (both sides of the verify join):
    # cache it so Spark does not recompute the norm projection per branch
    n = v.selectExpr(cfg.id_col, "v", f"{_spark_norm('v')} AS nrm").persist()
    if not cfg.lsh_bands:
        a, bb = n.alias("a"), n.alias("b")
        return (a.join(bb, F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}"))
                .selectExpr(f"a.{cfg.id_col} AS id_a", f"b.{cfg.id_col} AS id_b",
                            f"round(try_divide({_spark_dot('a.v', 'b.v', cfg.dim)}, a.nrm * b.nrm), 6)"
                            f" AS cosine")
                .filter(F.col("cosine") >= cfg.threshold))
    slim = [n.selectExpr(cfg.id_col, f"{q} AS band",
                         f"{_sign_band_expr('v', q, cfg.lsh_bits, 'spark')} AS val")
            for q in range(cfg.lsh_bands)]
    bu = slim[0]
    for extra in slim[1:]:
        bu = bu.unionByName(extra)
    a, bb = bu.alias("a"), bu.alias("b")
    cand = (a.join(bb, on=[F.col("a.band") == F.col("b.band"),
                           F.col("a.val") == F.col("b.val"),
                           F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
            .select(F.col(f"a.{cfg.id_col}").alias("id_a"),
                    F.col(f"b.{cfg.id_col}").alias("id_b"))
            .distinct())
    va = n.selectExpr(f"{cfg.id_col} AS id_a", "v AS va", "nrm AS na")
    vb = n.selectExpr(f"{cfg.id_col} AS id_b", "v AS vb", "nrm AS nb")
    return (cand.join(va, "id_a").join(vb, "id_b")
            .selectExpr("id_a", "id_b",
                        f"round(try_divide({_spark_dot('va', 'vb', cfg.dim)}, na * nb), 6)"
                        f" AS cosine")
            .filter(F.col("cosine") >= cfg.threshold))


def embedding_cosine_oracle(b: SqlBuilder, reg: Registry,
                            cfg: EmbeddingCosineConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    v = b.cte(f"{cfg.name}__v",
              f"SELECT {cfg.id_col}, "
              f"list_transform({cfg.vec_col}, x -> CAST(x AS DOUBLE)) AS v "
              f"FROM {src}")
    n = b.cte(f"{cfg.name}__n",
              f"SELECT {cfg.id_col}, v, {_duck_norm('v')} AS nrm FROM {v}")
    if not cfg.lsh_bands:
        dot = _duck_dot("a.v", "b.v", "len(a.v)", cfg.dim)
        return b.cte(
            cfg.name,
            f"SELECT a.{cfg.id_col} AS id_a, b.{cfg.id_col} AS id_b, "
            f"round({dot} / (a.nrm * b.nrm), 6) AS cosine "
            f"FROM {n} a JOIN {n} b ON a.{cfg.id_col} < b.{cfg.id_col} "
            f"WHERE round({dot} / (a.nrm * b.nrm), 6) >= {cfg.threshold}")
    band_selects = [
        f"SELECT {cfg.id_col}, {q} AS band, "
        f"{_sign_band_expr('v', q, cfg.lsh_bits, 'duck')} AS val FROM {n}"
        for q in range(cfg.lsh_bands)]
    bu = b.cte(f"{cfg.name}__bands", "\nUNION ALL\n".join(band_selects))
    cand = b.cte(f"{cfg.name}__cand",
                 f"SELECT DISTINCT a.{cfg.id_col} AS id_a, "
                 f"b.{cfg.id_col} AS id_b "
                 f"FROM {bu} a JOIN {bu} b ON a.band = b.band "
                 f"AND a.val = b.val AND a.{cfg.id_col} < b.{cfg.id_col}")
    dot = _duck_dot("va.v", "vb.v", "len(va.v)", cfg.dim)
    return b.cte(
        cfg.name,
        f"SELECT c.id_a, c.id_b, "
        f"round({dot} / (va.nrm * vb.nrm), 6) AS cosine "
        f"FROM {cand} c JOIN {n} va ON va.{cfg.id_col} = c.id_a "
        f"JOIN {n} vb ON vb.{cfg.id_col} = c.id_b "
        f"WHERE round({dot} / (va.nrm * vb.nrm), 6) >= {cfg.threshold}")


# ------------------------------------------------------- dup groups CC --

@dataclass(frozen=True)
class DupGroupsConfig:
    """Duplicate-GROUP resolution: connected components over a
    near-duplicate pair list. Pair discovery (LSH) yields edges; a
    training-data pipeline needs the transitive closure — one group id
    per connected set of documents — to pick one survivor per group
    (keeping "A~B, B~C" as two independent pairs can drop both B and C
    or neither). No reference analogue; standard corpus-dedup step.

    Two strategies, same result:

    - ``propagation``: min-label propagation, 1 shuffle/round, round
      count = component DIAMETER. Right for near-dup graphs — LSH
      components are near-cliques (diameter ~2-3) by construction.
    - ``pointer_jumping``: alternating large-star/small-star rounds
      (Kiveris et al. 2014, "Connected Components in MapReduce and
      Beyond"), 2 shuffles/round but round count = O(log^2 n)
      regardless of diameter. The escape hatch for adversarial
      chain-shaped graphs where propagation's diameter ceiling trips
      (tests/test_dup_groups.py pins a path graph longer than
      max_iter converging under this strategy).
    """

    name: str
    pairs_entity: str = "dedup_minhash_lsh"   # emits (id_a, id_b, n_bands)
    min_bands: int = 1       # edge = pair colliding in >= min_bands bands
    max_iter: int = 15       # propagation/star rounds
    strategy: str = "propagation"

    def __post_init__(self):
        if self.strategy not in ("propagation", "pointer_jumping"):
            raise ValueError(
                f"{self.name}: unknown strategy {self.strategy!r} — "
                f"use 'propagation' or 'pointer_jumping'")


def _star_contraction(pairs: DataFrame, cfg: DupGroupsConfig) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.
    2014): each round rewrites the edge set so every node's larger
    neighbors attach to its minimum neighbor (large-star), then its
    smaller-or-equal neighborhood collapses onto that minimum
    (small-star). Converges to star graphs — every edge (node, root)
    with root = the component's minimum id — in O(log^2 n) rounds
    independent of diameter.

    Scale: edges stay canonically oriented (hi, lo) and distinct; each
    round is two groupBy-min + join passes keyed on node ids (uniform),
    `localCheckpoint` truncates lineage, and the convergence probe is a
    driver-side set-difference scalar, same pattern as propagation's
    changed-count."""
    e = (pairs.select(F.greatest("id_a", "id_b").alias("u"),
                      F.least("id_a", "id_b").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct().localCheckpoint(eager=True))
    e_cnt = e.count()
    for _ in range(cfg.max_iter):
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", F.col("mn")).alias("m")))
        # large-star: larger neighbors v of u attach to m(u); v > u >=
        # m(u) so the new edge is already (hi, lo) oriented
        large = (sym.join(mins, "u").where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .distinct())
        # small-star over the large-star result: smaller neighbors and
        # u itself collapse onto m(u)
        sym2 = large.unionByName(
            large.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins2 = (sym2.groupBy("u").agg(F.min("v").alias("mn"))
                 .select("u", F.least("u", F.col("mn")).alias("m")))
        small_nbrs = (sym2.join(mins2, "u").where(F.col("v") < F.col("u"))
                      .select(F.col("v").alias("u"), F.col("m").alias("v")))
        small_self = mins2.select(F.col("u"), F.col("m").alias("v"))
        new_e = (small_nbrs.unionByName(small_self)
                 .filter(F.col("u") != F.col("v"))
                 .distinct().localCheckpoint(eager=False))
        # fixpoint probe: both sets are distinct, so equal counts plus
        # an empty one-sided difference imply set equality. ONE
        # aggregate job per round computes both (count + anti-matched
        # count) AND materializes the lazy checkpoint (the full-scan
        # agg computes every partition of new_e, which persists the
        # checkpoint blocks) — previously the eager checkpoint, the
        # count and the subtract probe were up to three jobs per round
        # (guide §1.2 fewer passes).
        row = (new_e
               .join(e.select("u", "v", F.lit(1).alias("__old")),
                     ["u", "v"], "left")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.count(F.when(F.col("__old").isNull(), F.lit(1)))
                    .alias("n_new"))
               .collect()[0])
        new_cnt = row["n"]
        converged = new_cnt == e_cnt and row["n_new"] == 0
        e, e_cnt = new_e, new_cnt
        if converged:
            break
    else:
        raise ValueError(
            f"{cfg.name}: star contraction did not converge after "
            f"{cfg.max_iter} rounds — raise max_iter (bound is "
            f"O(log^2 n) rounds)")
    # converged stars: every non-root appears exactly once as u with
    # its root as v; roots appear only on the v side
    nonroot = e.select(F.col("u").alias("doc_id"),
                       F.col("v").alias("label"))
    roots = (e.select(F.col("v").alias("doc_id")).distinct()
             .withColumn("label", F.col("doc_id")))
    return nonroot.unionByName(roots)


def build_dup_groups(spark, reg: Registry, cfg: DupGroupsConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    """Min-label propagation to a fixpoint: every node's label converges
    to the smallest doc id in its component, which becomes the group id
    (and the canonical survivor). Returns (doc_id, group_id, group_size)
    for every document in some duplicate group.

    Scale design: one round = one shuffle (edge join on the propagation
    key + min-aggregate), and near-duplicate components are near-cliques
    by construction (every member pair collides in some LSH band), so
    the diameter — and the round count — is small and independent of
    corpus size; `localCheckpoint` truncates lineage each round so plans
    don't grow. The per-round convergence probe is a driver-side scalar
    action, same pattern as the HWM probes (plans/incremental.py:27).
    For adversarial long-chain graphs swap in pointer-jumping
    (large-star/small-star, Kiveris et al. 2014) — near-dup dedup does
    not produce those.
    """
    # Self-pairs carry no duplicate information — drop them HERE so
    # both strategies (and the oracle, which filters identically) agree
    # on external pair lists that contain them: before this filter a
    # node appearing only as (x, x) was a size-1 group under
    # propagation but absent from pointer-jumping's star output
    # (round-6 advice). The shipped LSH pair builders never emit them
    # (id_a < id_b enforced), so this is input hardening only.
    pairs = (reg.load(spark, cfg.pairs_entity)
             .filter(F.col("n_bands") >= cfg.min_bands)
             .filter(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b"))
    if cfg.strategy == "pointer_jumping":
        labels = _star_contraction(pairs, cfg)
        from pyspark.sql import Window
        wsz = Window.partitionBy("label")
        return labels.select(
            "doc_id", F.col("label").alias("group_id"),
            F.count("*").over(wsz).alias("group_size"))
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"),
                     F.col("id_a").alias("id_b"))).persist()
    labels = (edges.select(F.col("id_a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")))
    try:
        for _ in range(cfg.max_iter):
            nbr = (edges.join(labels, edges.id_b == labels.doc_id)
                   .groupBy("id_a").agg(F.min("label").alias("nbr_min")))
            upd = (labels.join(nbr, labels.doc_id == nbr.id_a, "left")
                   .select(labels.doc_id, labels.label,
                           F.least(labels.label,
                                   F.coalesce(F.col("nbr_min"), labels.label))
                           .alias("new_label"))
                   .localCheckpoint(eager=False))
            # ONE job per round: the full-scan aggregate computes every
            # partition of the lazily-marked checkpoint (persisting its
            # blocks and truncating lineage) and returns the changed
            # count — previously the eager checkpoint and the
            # changed-probe were two jobs (guide §1.2 fewer passes).
            changed = upd.agg(F.count(F.when(
                F.col("new_label") < F.col("label"), F.lit(1)))
            ).collect()[0][0]
            labels = upd.select("doc_id", F.col("new_label").alias("label"))
            if not changed:
                break
        else:
            raise ValueError(
                f"{cfg.name}: no fixpoint after {cfg.max_iter} rounds — "
                f"component diameter exceeds max_iter (raise it, or use "
                f"pointer-jumping for chain-shaped graphs)")
    finally:
        # release the cached edge set on every exit path (the converged
        # labels are checkpointed, so nothing downstream needs it)
        edges.unpersist()
    # group size via a window over the converged labels: ONE shuffle on
    # group_id (a groupBy + join-back would shuffle twice)
    from pyspark.sql import Window
    wsz = Window.partitionBy("label")
    return labels.select(
        "doc_id", F.col("label").alias("group_id"),
        F.count("*").over(wsz).alias("group_size"))


def dup_groups_oracle(b: SqlBuilder, reg: Registry, cfg: DupGroupsConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    """Independent semantics: recursive transitive closure (reach set
    per node), group id = min reachable id. O(sum of component^2) — an
    oracle-side cost only; the Spark plan never materializes closures."""
    pairs = reg.duckdb_relation(cfg.pairs_entity)
    # id_a <> id_b mirrors build_dup_groups' self-pair filter — both
    # engines ignore self-loops on external pair lists
    e = b.cte(f"{cfg.name}__e",
              f"SELECT id_a AS a, id_b AS bb FROM {pairs} "
              f"WHERE n_bands >= {cfg.min_bands} AND id_a <> id_b\n"
              f"UNION ALL\n"
              f"SELECT id_b AS a, id_a AS bb FROM {pairs} "
              f"WHERE n_bands >= {cfg.min_bands} AND id_a <> id_b")
    r = b.cte(f"{cfg.name}__reach",
              f"SELECT a AS node, bb AS peer FROM {e}\n"
              f"UNION\n"
              f"SELECT r.node, e.bb AS peer FROM {cfg.name}__reach r "
              f"JOIN {e} e ON r.peer = e.a",
              recursive=True)
    lab = b.cte(f"{cfg.name}__lab",
                f"SELECT node AS doc_id, least(node, min(peer)) AS group_id "
                f"FROM {r} GROUP BY node")
    return b.cte(
        cfg.name,
        f"SELECT doc_id, group_id, "
        f"count(*) OVER (PARTITION BY group_id) AS group_size FROM {lab}")
