"""Property test: the portable hash/shingle kernels (hashing.py) produce
IDENTICAL values in Spark and DuckDB — the foundation every dedup oracle
in __spark_entry__.py rests on. Random printable-ASCII inputs, fixed seed.
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.hashing import (
    MINHASH_COEFFS,
    char_shingles,
    char_shingles_sql,
    enc4,
    enc4_sql,
    encw,
    encw_sql,
    uhash,
    uhash_sql,
    word_shingles,
    word_shingles_sql,
)

ALPHA = string.ascii_letters + string.digits + " _-.,!?"


@pytest.fixture(scope="module")
def samples():
    rng = random.Random(20260817)
    out = []
    for _ in range(80):
        n_words = rng.randint(0, 8)
        words = ["".join(rng.choice(ALPHA.replace(" ", ""))
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(n_words)]
        out.append(" ".join(words))
    out += ["", "a", "ab c", "x" * 300]
    return out


def test_enc4_encw_uhash_match_duckdb(spark, samples):
    texts = [s for s in samples if len(s) >= 4]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = df.select(
        enc4(F.col("s")).alias("e4"),
        encw(F.col("s")).alias("ew"),
        uhash(enc4(F.col("s")), 3).alias("u3"),
        uhash(encw(F.col("s")), 7).alias("u7"),
    ).collect()
    con = duckdb.connect()
    for row, t in zip(got, texts):
        lit = "'" + t.replace("'", "''") + "'"
        e4, ew, u3, u7 = con.sql(
            f"SELECT {enc4_sql(lit)}, {encw_sql(lit)}, "
            f"{uhash_sql(enc4_sql(lit), 3)}, "
            f"{uhash_sql(encw_sql(lit), 7)}"
        ).fetchone()
        assert (row.e4, row.ew, row.u3, row.u7) == (e4, ew, u3, u7), t


def test_shingles_match_duckdb(spark, samples):
    df = spark.createDataFrame([(t,) for t in samples], "s string")
    got = df.select(
        char_shingles(F.col("s"), 4).alias("cs"),
        word_shingles(F.col("s"), 3).alias("ws"),
    ).collect()
    con = duckdb.connect()
    for row, t in zip(got, samples):
        lit = "'" + t.replace("'", "''") + "'"
        toks = "string_split(" + lit + ", ' ')"
        cs, ws = con.sql(
            f"SELECT {char_shingles_sql(lit, 4)}, "
            f"{word_shingles_sql(toks, 3)}"
        ).fetchone()
        assert list(row.cs) == list(cs), t
        assert list(row.ws) == list(ws), t


def test_minhash_coeff_no_overflow():
    # A_j * x stays far below int64 for every coefficient (hashing.py
    # contract: A_j < 2^20, x < P < 2^31)
    P = 2_147_483_647
    for a, b in MINHASH_COEFFS:
        assert a < 2 ** 20 and b < P
        assert a * (P - 1) + b < 2 ** 63 - 1
