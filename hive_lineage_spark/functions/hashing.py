"""Cross-engine deterministic hashing for dedup/fingerprint operators.

Spark's builtin hashes (xxhash64, murmur3) have no DuckDB twin, so
oracle-checked dedup needs a hash expressible in BOTH engines. We use a
classic polynomial rolling hash over code points,

    h(s) = fold(c in s) (h * 31 + codepoint(c)) mod 1_000_000_007

emitted twice from one spec: as a Spark ``Column`` (``F.aggregate`` over
``F.split`` — JVM-side codegen, no Python UDF) and as a DuckDB SQL
snippet (``list_reduce`` over ``string_split``). Integer arithmetic only
→ bit-exact across engines (max intermediate ≈ 3.1e10 < 2^63).

MinHash permutations are the standard ``(a*h + b) mod p`` family with
fixed constants, same on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
MULT = 31


def poly_hash(col: Column | str) -> Column:
    """Spark polynomial hash of a string column (JVM higher-order fns)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"), lambda acc, x: (acc * MULT + x) % MOD)


def poly_hash_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`poly_hash` on expression ``expr``.

    ``greatest(unicode(ch), 0)``: DuckDB's unicode('') is -1 while Spark's
    ascii('') is 0 — the clamp keeps the engines identical on the empty
    string (string_split('','') yields [''] in both)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), ch -> CAST(greatest(unicode(ch), 0) AS BIGINT))), "
        f"(acc, x) -> (acc * {MULT} + x) % {MOD})"
    )


def minhash_perm(h: Column, i: int) -> Column:
    """i-th MinHash permutation of an already-poly-hashed value."""
    a, b = 2 * i + 3, 7 * i + 1
    return (h * a + b) % MOD


def minhash_perm_sql(expr: str, i: int) -> str:
    a, b = 2 * i + 3, 7 * i + 1
    return f"(({expr}) * {a} + {b}) % {MOD}"


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of a whitespace-tokenized string (Spark).
    Documents shorter than ``n`` words yield an empty array."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.split(c, " ")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_ngrams_sql(ws_col: str = "ws", n: int = 3, distinct: bool = True) -> str:
    """DuckDB equivalent of :func:`word_ngrams`, over an in-scope column
    ``ws_col`` that already holds ``string_split(text, ' ')`` (1-based
    list indexing; lambdas may reference sibling columns).
    ``distinct=False`` keeps the full multiset (repetition analysis)."""
    joined = " || ' ' || ".join(f"{ws_col}[i+{j}]" for j in range(n))
    body = (
        f"list_transform(range(1, greatest(len({ws_col}) - {n - 2}, 1)), "
        f"i -> {joined})"
    )
    return f"list_distinct({body})" if distinct else body
