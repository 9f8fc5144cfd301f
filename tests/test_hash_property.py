"""Hypothesis-driven cross-engine property tests for the portable hash
kernels (functions/hashing.py) — enc4 / encw / uhash and the char/word
shinglers that every dedup / decontaminate / sampling oracle in
__spark_entry__.py rests on.

The fixed-seed ASCII test (test_hash_portability.py) pins the happy
path; THIS test exists so an engine-vs-DuckDB divergence is caught by
randomized search, not by the driver's gate (the round-4 BPE lesson:
the engines' regex/char defaults differ exactly on the inputs local
fixtures never contain). The alphabet therefore includes the known
divergence chars (\\x0b, U+0085, U+2028, NBSP), quotes/backslashes
(SQL-literal robustness is a non-issue here — inputs go in via a
registered frame, not literals), combining marks, and non-BMP code
points — any ascii()/substr()/length() disagreement between engines
shows up as an integer mismatch immediately."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.hashing import (
    char_shingles, char_shingles_sql, enc4, enc4_sql, encw, encw_sql,
    uhash, uhash_sql, word_shingles, word_shingles_sql)

_ALPHA = ("ab z09.,'\"\\\x0b\x85\xa0 ́é\U0001d11e")
_text = st.text(alphabet=_ALPHA, min_size=0, max_size=40)
_texts = st.lists(_text, min_size=1, max_size=12)


def _duck(rows: list[str], select: str) -> list:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(rows)), "s": rows}))
    out = con.execute(
        f"SELECT {select} FROM t ORDER BY i").fetchall()
    con.close()
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_texts)
def test_scalar_kernels_match_duckdb(spark, texts):
    texts = [t for t in texts if len(t) >= 4]  # enc4's k=4 shingle contract
    if not texts:
        return
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = [tuple(r) for r in df.orderBy("i").select(
        enc4(F.col("s")).alias("e4"),
        encw(F.col("s")).alias("ew"),
        uhash(enc4(F.col("s")), 3).alias("u3"),
        uhash(encw(F.col("s")), 11).alias("u11"),
    ).collect()]
    want = _duck(texts, f"{enc4_sql('s')}, {encw_sql('s')}, "
                        f"{uhash_sql(enc4_sql('s'), 3)}, "
                        f"{uhash_sql(encw_sql('s'), 11)}")
    assert got == [tuple(int(v) for v in r) for r in want]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_texts)
def test_char_shingles_match_duckdb(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = [r["sh"] for r in df.orderBy("i")
           .select(char_shingles(F.col("s")).alias("sh")).collect()]
    want = [list(r[0]) for r in _duck(texts, char_shingles_sql("s"))]
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_texts)
def test_word_shingles_match_duckdb(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = [r["sh"] for r in df.orderBy("i")
           .select(word_shingles(F.col("s")).alias("sh")).collect()]
    want = [list(r[0]) for r in _duck(
        texts,
        word_shingles_sql("string_split(s, ' ')"))]
    assert got == want
