"""Property tests for the portable hashing foundation: hash48 and mix48 must
agree bit-for-bit across Python, DuckDB SQL, and Spark — every sketch
operator (minhash, simhash, fingerprints, LSH) builds on this.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_ex8_producer_spark.functions.text import (
    _M24,
    _M48,
    _MIX_C1,
    _MIX_C2,
    hash48,
    mix48,
    py_hash48,
    sql_hash48,
    sql_mix48,
)


def py_mix48(x: int) -> int:
    def mult48(v: int, c: int) -> int:
        return (((((v >> 24) * c) & _M24) << 24) + ((v & _M24) * c)) & _M48

    a = x ^ (x >> 24)
    b = mult48(a, _MIX_C1)
    c = b ^ (b >> 20)
    d = mult48(c, _MIX_C2)
    return d ^ (d >> 24)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 53) - 1))
def test_mix48_python_equals_duckdb(x: int) -> None:
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_mix48(str(x))}").fetchone()[0]
    assert got == py_mix48(x)
    con.close()


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_hash48_python_equals_duckdb(s: str) -> None:
    if "\x00" in s:  # NUL handling differs between engines' varchar; excluded
        return
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_hash48('?')}", [s]).fetchone()[0]
    assert got == py_hash48(s.encode("utf-8"))
    con.close()


def test_spark_matches_python(spark) -> None:
    import random

    rng = random.Random(42)
    ints = [rng.randrange(0, 1 << 53) for _ in range(500)]
    strs = [f"shingle {i} {rng.random()}" for i in range(500)]

    from pyspark.sql import functions as F

    idf = spark.createDataFrame([(v,) for v in ints], "x long").select(
        "x", mix48(F.col("x")).alias("m")
    )
    for row in idf.collect():
        assert row["m"] == py_mix48(row["x"])

    sdf = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", hash48(F.col("s")).alias("h")
    )
    for row in sdf.collect():
        assert row["h"] == py_hash48(row["s"].encode("utf-8"))
