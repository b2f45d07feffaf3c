"""Native Column builders for text analysis — all JVM-side expressions.

Nothing here is a Python UDF: tokenization, shingling, hashing, and scoring
are Catalyst expressions (split / transform / aggregate / md5 / conv), so
they stay inside whole-stage codegen and scale linearly with executors.

Cross-engine hashing convention (used by dedup/minhash/simhash oracles):
``md5_int(s)`` = first 15 hex chars of md5(s) as a bigint — identical in
Spark (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``); 60 bits so it fits
signed int64 exactly in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "norm_text",
    "tokens",
    "word_count",
    "md5_int",
    "shingles",
    "doc_fingerprint",
    "shingle_fingerprint",
]


def norm_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the reference's word_count tokenizer,
    /root/reference/src/main.rs:468-471)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def word_count(col: Column | str) -> Column:
    """Token count as int, 0 for empty strings (main.rs:468-471 semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c))).cast("int")


def md5_int(col: Column) -> Column:
    """Portable 60-bit integer hash (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int_sql(expr: str) -> str:
    """DuckDB twin of md5_int for oracle SQL strings."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined), from a token array.

    Built as chained ``zip_with`` over k shifted ``slice``s — the token
    array expression is evaluated O(k) times per ROW. (A transform-with-
    element_at formulation re-evaluates the array per ELEMENT, turning
    tokenization O(n²) per document — 4× slower on the minhash bench.)

    Docs shorter than k tokens produce their full text as one shingle
    (zip_with pads with null; concat_ws skips nulls) so no document
    silently vanishes from minhash/jaccard.
    """
    cnt = F.greatest(F.size(tok) - (k - 1), F.lit(1))
    acc = F.slice(tok, 1, cnt)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(tok, j + 1, cnt), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(acc)


def shingles_sql(tok_col: str, k: int = 3) -> str:
    """DuckDB twin of shingles() for oracle SQL. ``tok_col`` must be a named
    list column in scope (lambdas can reference row columns directly).

    Precondition on BOTH sides: documents have ≥ k tokens — below that,
    Spark's concat_ws skips out-of-range NULLs while DuckDB's ``||``
    propagates them. The driver corpus (≥15 tokens/doc) satisfies this.
    """
    parts = " || ' ' || ".join(f"{tok_col}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({tok_col}) - {k - 1}, 1)), "
        f"i -> {parts}))"
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Exact-dedup fingerprint: md5 of normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(norm_text(c))


def shingle_fingerprint(col: Column | str, k: int = 3) -> Column:
    """Order-insensitive structural fingerprint: md5 over the sorted distinct
    k-shingle set (rolling-hash document sketch)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.array_join(F.array_sort(shingles(tokens(c), k)), "|"))
