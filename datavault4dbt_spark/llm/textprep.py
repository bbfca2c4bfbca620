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


# -- MinHash: one permutation = min md5 over seeded shingles ---------------

def spark_minhash(shingles: str, seed: int) -> str:
    return f"array_min(transform({shingles}, s -> md5(concat('{seed}:', s))))"


def duck_minhash(shingles: str, seed: int) -> str:
    return f"list_min(list_transform({shingles}, s -> md5(concat('{seed}:', s))))"


# -- hex nibble -> int (both engines lack a shared hex->int cast) ----------
# instr is 1-based in both; value = position in the hex alphabet - 1.

def spark_nibble(char_expr: str) -> str:
    return f"(instr('0123456789abcdef', {char_expr}) - 1)"


duck_nibble = spark_nibble  # identical syntax and semantics in DuckDB
