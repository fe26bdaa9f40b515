"""Reusable Column expression helpers.

Everything here is built-in `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen'd. No Python UDFs in this module: these run in the hot
path of 100 TB scans, so they must stay inside Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens (WordCount tokenization).

    Mirrors the reference's flatMapValues split
    (WordCountLambdaExample.java:197) with a whitespace pattern shared with
    the DuckDB oracle (`regexp_split_to_array(lower(text), '\\s+')`).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(col), TOKEN_SPLIT_RE)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles from a token array (for MinHash / Jaccard dedup).

    `transform(sequence(...))` is a codegen'd array expression — no UDF.
    Caller must filter size(toks) >= n first (Spark's `sequence` would
    produce a descending range otherwise).
    """
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + k) for k in range(n)]
        ),
    )


def md5_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared with the DuckDB oracle.

    `xxhash64` is Spark-only; for oracle-parity operators we derive a
    portable hash from the first 15 hex chars of md5 (same value as
    DuckDB's `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double.

    Pure codegen'd array fold — stays JVM-side; at 100 TB this is the inner
    loop of brute-force KNN so no Python may touch it.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)
