"""Drift math: binned KS/PSI vs a pure-numpy reference; grouped
applyInPandas per-day path."""

import math

import numpy as np
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.operators.drift import (
    build_baseline,
    daily_drift,
    ks_psi,
)
from mlcast_sourcedata_validator_spark.synth import generate_transcripts


def _np_binned_ks_psi(a, b, eps=1e-6):
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    ca = np.cumsum(a / a.sum())
    cb = np.cumsum(b / b.sum())
    ks = float(np.max(np.abs(ca - cb)))
    p = np.maximum(a / a.sum(), eps)
    q = np.maximum(b / b.sum(), eps)
    psi = float(np.sum((p - q) * np.log(p / q)))
    return ks, psi


def test_ks_psi_matches_numpy_reference():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1000, 32).tolist()
    b = rng.integers(0, 1000, 32).tolist()
    ks, psi = ks_psi(a, b)
    ks_ref, psi_ref = _np_binned_ks_psi(a, b)
    assert math.isclose(ks, ks_ref, rel_tol=1e-12)
    assert math.isclose(psi, psi_ref, rel_tol=1e-9)


def test_ks_psi_identical_is_zero():
    a = [10, 20, 30, 40]
    ks, psi = ks_psi(a, a)
    assert ks == 0.0 and abs(psi) < 1e-12


def test_ks_psi_disjoint_is_one():
    ks, _ = ks_psi([100, 0], [0, 100])
    assert ks == 1.0


def test_daily_drift_flags_only_drifted_day(spark):
    df = generate_transcripts(spark, n_convs=200, seed=3)
    baseline = build_baseline(df, expr="length(text)", metric="turn_len_chars")
    # pick an actual day and blow up its texts
    some_day = df.select(F.to_date("ts").alias("d")).groupBy("d").count() \
                 .orderBy(F.desc("count")).first()["d"]
    drifted = df.withColumn(
        "text",
        F.when(F.to_date("ts") == F.lit(some_day),
               F.concat(F.col("text"), F.lit("y" * 5000))).otherwise(F.col("text")),
    )
    out = daily_drift(drifted, baseline, expr="length(text)",
                      metric="turn_len_chars").collect()
    by_day = {r["day"]: r for r in out}
    assert by_day[some_day]["ks"] > 0.5
    others = [r["ks"] for d, r in by_day.items() if d != some_day and r["n"] > 50]
    assert others and max(others) < 0.2
