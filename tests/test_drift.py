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


# ---------------------------------------------------------------------------
# Categorical drift (role/tool mix).
# ---------------------------------------------------------------------------

def _np_tvd_psi(a, b, eps=1e-6):
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    pa, pb = a / a.sum(), b / b.sum()
    tvd = 0.5 * float(np.abs(pa - pb).sum())
    p = np.maximum(pa, eps)
    q = np.maximum(pb, eps)
    psi = float(np.sum((p - q) * np.log(p / q)))
    return tvd, psi


def test_tvd_psi_cramers_matches_numpy_reference():
    from mlcast_sourcedata_validator_spark.operators.drift import tvd_psi_cramers

    rng = np.random.default_rng(1)
    a = rng.integers(1, 1000, 5).tolist()
    b = rng.integers(1, 1000, 5).tolist()
    tvd, psi, v = tvd_psi_cramers(a, b)
    tvd_ref, psi_ref = _np_tvd_psi(a, b)
    assert math.isclose(tvd, tvd_ref, rel_tol=1e-12)
    assert math.isclose(psi, psi_ref, rel_tol=1e-9)
    # chi-square cross-check for Cramér's V
    na = sum(a)
    exp = np.asarray(b, float) / sum(b) * na
    chi2 = float(np.sum((np.asarray(a, float) - exp) ** 2 / exp))
    assert math.isclose(v, math.sqrt(chi2 / (na * 4)), rel_tol=1e-12)


def test_tvd_identical_zero_disjoint_one():
    from mlcast_sourcedata_validator_spark.operators.drift import tvd_psi_cramers

    tvd, psi, _ = tvd_psi_cramers([10, 20, 30], [10, 20, 30])
    assert tvd == 0.0 and abs(psi) < 1e-12
    tvd, _, _ = tvd_psi_cramers([100, 0], [0, 100])
    assert tvd == 1.0


def test_categorical_bucket_null_and_unknown_pool_to_other(spark):
    from mlcast_sourcedata_validator_spark.operators.drift import (
        categorical_bucket,
    )

    df = spark.createDataFrame(
        [("user",), ("assistant",), ("operator",), (None,)], "role string"
    )
    got = [
        r["b"]
        for r in df.select(
            categorical_bucket(F.col("role"), ["system", "user", "assistant", "tool"])
            .alias("b")
        ).collect()
    ]
    # user->2, assistant->3, unknown->5, NULL->5
    assert got == [2, 3, 5, 5]


def test_categorical_drift_verdicts(spark):
    """Suite-level: identical mix PASSes, a shifted role mix FAILs, and a
    missing baseline degrades to WARNING — all through the fused scan."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_categorical_baseline,
    )
    from mlcast_sourcedata_validator_spark.report import FAIL, PASS, WARNING
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec,
        CheckSuite,
        RunContext,
    )

    suite = CheckSuite(suite_id="cat_drift_only", checks=[CheckSpec(
        "drift_role_dist", "categorical_drift", "5.2 drift", "role mix",
        {"metric": "role_dist", "expr": "role",
         "categories": ["system", "user", "assistant", "tool"],
         "warn_tvd": 0.05, "max_tvd": 0.20},
    )])
    df = generate_transcripts(spark, n_convs=100, seed=7)
    base = build_categorical_baseline(
        df, expr="role",
        categories=["system", "user", "assistant", "tool"],
        metric="role_dist")

    res = run_suite(RunContext(spark=spark, df=df, suite=suite,
                               run_id="c1", baseline_df=base))
    assert [r.status for r in res.report.results] == [PASS]

    # collapse every role to 'user' -> TVD far beyond the FAIL bar,
    # and the worst-shifted category is named in the detail
    shifted = df.withColumn("role", F.lit("user"))
    res = run_suite(RunContext(spark=spark, df=shifted, suite=suite,
                               run_id="c2", baseline_df=base))
    assert [r.status for r in res.report.results] == [FAIL]
    assert "worst=" in res.report.results[0].detail

    res = run_suite(RunContext(spark=spark, df=df, suite=suite,
                               run_id="c3", baseline_df=None))
    assert [r.status for r in res.report.results] == [WARNING]


def test_incremental_baseline_equals_whole_table_build(spark, tmp_path):
    """maintain_baseline/read_baseline over per-partition deltas is
    row-identical to the whole-table builders, for both drift families,
    and feeds run_suite as baseline_df directly."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_categorical_baseline,
        maintain_baseline,
        read_baseline,
    )
    from mlcast_sourcedata_validator_spark.report import FAIL, PASS
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite
    from mlcast_sourcedata_validator_spark.synth import (
        generate_conversations_registry,
    )

    df = generate_transcripts(spark, n_convs=120, seed=37).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "base")
    write_partitioned_transcripts(df, table)

    # numeric family
    maintain_baseline(spark, table, store, metric="turn_len_chars",
                      expr="length(text)", scale="log",
                      lo=1.0, hi=10000.0, n_bins=32)
    inc = read_baseline(spark, store, metric="turn_len_chars")
    direct = build_baseline(spark.read.parquet(table).drop("date"),
                            expr="length(text)", metric="turn_len_chars",
                            scale="log", lo=1.0, hi=10000.0, n_bins=32)
    assert inc.exceptAll(direct).count() == 0
    assert direct.exceptAll(inc).count() == 0

    # categorical family, same store
    maintain_baseline(spark, table, store, metric="role_dist", expr="role",
                      categories=["system", "user", "assistant", "tool"])
    inc_cat = read_baseline(spark, store, metric="role_dist")
    direct_cat = build_categorical_baseline(
        spark.read.parquet(table).drop("date"), expr="role",
        categories=["system", "user", "assistant", "tool"],
        metric="role_dist")
    assert inc_cat.exceptAll(direct_cat).count() == 0
    assert direct_cat.exceptAll(inc_cat).count() == 0

    # the merged snapshots feed the suite directly: self-baseline PASS
    reg = generate_conversations_registry(df)
    res = run_suite(RunContext(
        spark=spark, df=df, suite=get_suite("transcripts_v1"), run_id="ib",
        registry_df=reg, baseline_df=inc.unionByName(inc_cat)))
    drift = {r.detail.split()[0]: r.status for r in res.report.results
             if r.detail.startswith("metric=")}
    assert drift["metric=turn_len_chars"] == PASS
    assert drift["metric=role_dist"] == PASS
    assert res.report.summarize()[FAIL] == 0


# --- EMD (Wasserstein-1) ----------------------------------------------------


def _ref_emd_ppm(cur, base):
    """Pure-python integer reference of daily_emd's cross-multiplied
    form (exact rational, floored to ppm)."""
    na, nb = sum(cur), sum(base)
    B = len(cur)
    ca = cb = 0
    s = 0
    for a, b in zip(cur[:-1], base[:-1]):
        ca += a
        cb += b
        s += abs(ca * nb - cb * na)
    return (s * 1_000_000) // (na * nb * (B - 1))


def test_emd_binned_matches_numpy_reference():
    from mlcast_sourcedata_validator_spark.operators.drift import emd_binned

    rng = np.random.default_rng(1)
    a = rng.integers(0, 1000, 32).tolist()
    b = rng.integers(0, 1000, 32).tolist()
    ca = np.cumsum(np.asarray(a, float) / sum(a))[:-1]
    cb = np.cumsum(np.asarray(b, float) / sum(b))[:-1]
    ref = float(np.sum(np.abs(ca - cb))) / 31
    assert math.isclose(emd_binned(a, b), ref, rel_tol=1e-12)
    # bounds + degenerate cases
    assert emd_binned(a, a) == 0.0
    assert emd_binned([100, 0], [0, 100]) == 1.0
    assert math.isnan(emd_binned([0, 0], [1, 2]))


def test_emd_ranks_displacement_where_ks_cannot():
    """Two shifted histograms with the SAME max-ECDF gap but different
    displacement distances: KS ties, EMD orders them."""
    from mlcast_sourcedata_validator_spark.operators.drift import (
        emd_binned, ks_psi)

    base = [100, 0, 0, 0]
    near = [0, 100, 0, 0]
    far = [0, 0, 0, 100]
    assert ks_psi(base, near)[0] == ks_psi(base, far)[0] == 1.0
    assert emd_binned(base, near) < emd_binned(base, far)


def test_daily_emd_matches_integer_reference(spark):
    from mlcast_sourcedata_validator_spark.operators.drift import daily_emd

    df = generate_transcripts(spark, n_convs=120, seed=5)
    baseline = build_baseline(df, expr="length(text)",
                              metric="turn_len_chars", scale="linear",
                              lo=0.0, hi=400.0, n_bins=10)
    out = {r["day"]: (r["n"], r["emd_ppm"])
           for r in daily_emd(df, baseline, expr="length(text)",
                              metric="turn_len_chars", scale="linear",
                              lo=0.0, hi=400.0, n_bins=10).collect()}
    # rebuild both histograms in pure python from the same bucketing
    rows = df.select(
        F.to_date("ts").alias("day"),
        F.least(F.greatest(F.floor(F.length("text") / 400.0 * 10) + 1,
                           F.lit(1)), F.lit(10)).alias("bucket"),
    ).collect()
    base_counts = [0] * 10
    per_day: dict = {}
    for r in rows:
        base_counts[r["bucket"] - 1] += 1
        per_day.setdefault(r["day"], [0] * 10)[r["bucket"] - 1] += 1
    assert set(out) == set(per_day)
    for day, cur in per_day.items():
        assert out[day] == (sum(cur), _ref_emd_ppm(cur, base_counts)), day


def test_drift_check_emd_threshold_and_detail(spark):
    """compile_drift: emd in the detail always; warn_emd/max_emd gate
    even when KS/PSI thresholds stay silent."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_baseline as bb)
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    df = generate_transcripts(spark, n_convs=80, seed=9)
    baseline = bb(df, expr="length(text)", metric="turn_len_chars")
    shifted = df.withColumn("text", F.concat(F.col("text"),
                                             F.lit("x" * 400)))

    def one(params, data):
        suite = CheckSuite("emd_t", [CheckSpec(
            "drift_len", "drift", "5.2", "no drift",
            dict({"metric": "turn_len_chars", "expr": "length(text)",
                  "scale": "log", "lo": 1.0, "hi": 10000.0,
                  "n_bins": 32}, **params))])
        res = run_suite(RunContext(spark=spark, df=data, suite=suite,
                                   run_id="e", baseline_df=baseline))
        return res.report.results[0]

    clean = one({}, df)
    assert clean.status == "PASS" and "emd=" in clean.detail
    gated = one({"max_emd": 0.05}, shifted)
    assert gated.status == "FAIL" and "emd=" in gated.detail
    warned = one({"warn_emd": 0.05}, shifted)
    assert warned.status == "WARNING"
