"""Shared text-preparation fragments for the LLM-pipeline operators.

Every operator over the ``documents`` table needs the same two
primitives — whitespace tokenization and word n-gram shingling — and
needs them to produce *identical values* in the Spark plan and in the
DuckDB oracle SQL. Both sides are expressed as higher-order array
functions (no UDFs, fully inside whole-stage codegen / vectorized
execution), so at 100 TB the token/shingle expansion happens inside the
scan stage with zero extra shuffles.

Determinism contract: tokens are split on a single space and empties
are dropped; shingles use 1-based inclusive windows; MinHash
permutations are simulated with ``md5(seed || ':' || shingle)`` so
Spark and DuckDB agree byte-for-byte (neither engine's native hash()
matches the other's).
"""

from __future__ import annotations

# -- tokens: split on ' ', drop empties ------------------------------------
# Spark and DuckDB split identically on the literal single-space
# delimiter (both keep empty strings, hence the filter).
SPARK_TOKENS = "filter(split({col}, ' '), x -> x <> '')"
DUCK_TOKENS = "list_filter(string_split({col}, ' '), x -> x <> '')"


def spark_tokens(col: str = "text") -> str:
    return SPARK_TOKENS.format(col=col)


def duck_tokens(col: str = "text") -> str:
    return DUCK_TOKENS.format(col=col)


# -- shingles: word n-grams over the token array ---------------------------
# Spark's sequence(1, 0) counts DOWN ([1, 0]); guard short docs with an
# explicit CASE so docs with < n tokens yield an empty shingle list on
# both sides (DuckDB's range(1, x<=1) is already empty).

def spark_shingles(w: str, n: int = 3) -> str:
    return (f"CASE WHEN size({w}) >= {n} "
            f"THEN transform(sequence(1, size({w}) - {n - 1}), "
            f"i -> array_join(slice({w}, i, {n}), ' ')) "
            f"ELSE array() END")


def duck_shingles(w: str, n: int = 3) -> str:
    # DuckDB list slice is 1-based inclusive: w[i:i+n-1] has n elements.
    return (f"list_transform(range(1, greatest(len({w}) - {n - 2}, 1)), "
            f"i -> array_to_string({w}[i:i+{n - 1}], ' '))")


# -- MinHash -----------------------------------------------------------------
# k permutations are derived from ceil(k/8) md5 digests per shingle, not
# k digests: each 32-hex digest yields eight 4-hex (16-bit) slices, and
# the lexicographic min of a fixed slice across shingles is a valid
# minhash (uniform 16-bit hash family). 8x fewer md5 calls — md5 is the
# dominant CPU cost of the signature stage at scale.

def n_digests(num_perm: int) -> int:
    return (num_perm + 7) // 8


def spark_shingle_digests(shingles: str, num_perm: int) -> str:
    parts = ", ".join(f"md5(concat('{j}:', s))" for j in range(n_digests(num_perm)))
    return f"transform({shingles}, s -> concat({parts}))"


def duck_shingle_digests(shingles: str, num_perm: int) -> str:
    parts = ", ".join(f"md5(concat('{j}:', s))" for j in range(n_digests(num_perm)))
    return f"list_transform({shingles}, s -> concat({parts}))"


def spark_minhash(digests: str, perm: int) -> str:
    return (f"array_min(transform({digests}, "
            f"h -> substr(h, {1 + 4 * perm}, 4)))")


def duck_minhash(digests: str, perm: int) -> str:
    return (f"list_min(list_transform({digests}, "
            f"h -> substr(h, {1 + 4 * perm}, 4)))")


# -- hex nibble -> int (both engines lack a shared hex->int cast) ----------
# instr is 1-based in both; value = position in the hex alphabet - 1.

def spark_nibble(char_expr: str) -> str:
    return f"(instr('0123456789abcdef', {char_expr}) - 1)"


duck_nibble = spark_nibble  # identical syntax and semantics in DuckDB
