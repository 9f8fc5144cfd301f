from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.anomaly import (
    ewma_residual,
    metric_history_anomaly,
    relative_change,
    trailing_zscore,
)


def _series_df(spark, values, key="a"):
    rows = [(key, float(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t double, v double")


# --- pure-Python references -------------------------------------------------


def ref_trailing(values, window, min_points):
    out = []
    for i, v in enumerate(values):
        frame = values[max(0, i - window):i]
        n = len(frame)
        if n < min_points:
            out.append(None)
            continue
        mean = sum(frame) / n
        var = sum((x - mean) ** 2 for x in frame) / n
        std = max(math.sqrt(var), 1e-9)
        out.append(round((v - mean) / std, 6))
    return out


def ref_ewma(values, window, alpha):
    out = []
    for i in range(len(values)):
        frame = values[max(0, i - window):i]
        num = den = 0.0
        for x in frame:  # oldest -> newest, same fold as the Column form
            num = num * (1 - alpha) + x
            den = den * (1 - alpha) + 1.0
        out.append(num / den if den else None)
    return out


# --- detectors ---------------------------------------------------------------


def test_trailing_zscore_matches_reference(spark):
    values = [10, 11, 9, 10, 10, 11, 30, 10, 9, 10, 11, 10]
    df = trailing_zscore(
        _series_df(spark, values), ["k"], "t", "v", window=5, k=3.0,
        min_points=3,
    )
    rows = df.orderBy("t").collect()
    expect = ref_trailing([float(v) for v in values], 5, 3)
    got = [r["zscore"] for r in rows]
    for g, e in zip(got, expect):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e, abs=1e-6)
    # the spike (30) flags; its neighbours don't
    flags = [r["is_anomaly"] for r in rows]
    assert flags[6] is True
    assert sum(flags) == flags[6] + flags[7]  # 10-after-30 may or may not flag
    # warm-up rows (fewer than min_points of history) never flag
    assert flags[0] is False and flags[1] is False and flags[2] is False


def test_trailing_zscore_flat_history_flags_first_change(spark):
    df = trailing_zscore(
        _series_df(spark, [5, 5, 5, 5, 5, 7]), ["k"], "t", "v",
        window=5, k=3.0, min_points=3,
    )
    rows = df.orderBy("t").collect()
    assert rows[-1]["is_anomaly"] is True  # std floored, z finite but huge
    assert all(not r["is_anomaly"] for r in rows[:-1])


def test_trailing_zscore_series_are_independent(spark):
    a = [(f"k{j}", float(i), 10.0 + (50.0 if (j, i) == (1, 6) else 0.0))
         for j in range(2) for i in range(8)]
    df = spark.createDataFrame(a, "k string, t double, v double")
    out = trailing_zscore(df, ["k"], "t", "v", window=5, min_points=3)
    flagged = [(r["k"], r["t"]) for r in out.where("is_anomaly").collect()]
    assert flagged == [("k1", 6.0)]


def test_ewma_matches_reference_fold(spark):
    values = [3, 4, 5, 4, 3, 10, 4, 5, 3, 4]
    df = ewma_residual(
        _series_df(spark, values), ["k"], "t", "v",
        alpha=0.4, window=6, k=3.0, min_points=3,
    )
    rows = df.orderBy("t").collect()
    expect = ref_ewma([float(v) for v in values], 6, 0.4)
    for r, e in zip(rows, expect):
        if e is None:
            assert r["ewma"] is None
        else:
            assert r["ewma"] == pytest.approx(e, rel=1e-9)
    assert rows[5]["is_anomaly"] is True


def test_relative_change_semantics(spark):
    df = relative_change(
        _series_df(spark, [100, 110, 400, 380, 0, 90]), ["k"], "t", "v",
        max_ratio=2.0, min_abs=10.0,
    )
    rows = {r["t"]: r for r in df.collect()}
    assert rows[0.0]["is_anomaly"] is False          # no previous point
    assert rows[1.0]["is_anomaly"] is False          # 1.1x
    assert rows[2.0]["is_anomaly"] is True           # 3.6x jump
    assert rows[3.0]["is_anomaly"] is False          # 0.95x
    assert rows[4.0]["is_anomaly"] is True           # 380 -> 0 collapse
    assert rows[5.0]["is_anomaly"] is True           # 0 -> 90 step
    assert rows[2.0]["ratio"] == pytest.approx(400 / 110, abs=1e-6)


def test_relative_change_min_abs_suppresses_noise(spark):
    df = relative_change(
        _series_df(spark, [1, 3, 1]), ["k"], "t", "v",
        max_ratio=2.0, min_abs=10.0,
    )
    assert df.where("is_anomaly").count() == 0


# --- store-level audit --------------------------------------------------------


def _store(spark, series):
    """Build fake metrics + lineage stores from {partition: [v0, v1...]}."""
    mrows, lrows = [], []
    for pid, vals in series.items():
        for i, v in enumerate(vals):
            rid = f"r{pid}_{i}"
            mrows.append(("s1", rid, "null_rate.rate", float(v), None, pid))
            lrows.append((rid, pid, 100, 0, 0, 0, 1, 0.1, float(i)))
    m = spark.createDataFrame(
        mrows, "suite_id string, run_id string, metric string, "
               "value double, value_str string, partition_id string")
    lin = spark.createDataFrame(
        lrows, "run_id string, partition_id string, n_input_rows long, "
               "n_violations long, n_fails long, n_warnings long, "
               "n_passes long, wall_sec double, committed_at double")
    return m, lin


def test_metric_history_anomaly_flags_creeping_partition(spark):
    m, lin = _store(spark, {
        "d=2024-01-01": [0.01, 0.011, 0.009, 0.01, 0.01, 0.010, 0.011],
        "d=2024-01-02": [0.01, 0.010, 0.011, 0.01, 0.01, 0.010, 0.080],
    })
    out = metric_history_anomaly(
        m, lin, "null_rate.rate", strategy="trailing_zscore",
        window=5, k=3.0,
    ).collect()
    assert [(r["partition_id"], r["value"]) for r in out] == [
        ("d=2024-01-02", 0.08)
    ]
    # evidence columns ride along
    assert out[0]["t_mean"] == pytest.approx(0.0102, abs=1e-6)


def test_metric_history_anomaly_strategies_and_errors(spark):
    m, lin = _store(spark, {"p": [1, 1, 1, 1, 5]})
    ew = metric_history_anomaly(
        m, lin, "null_rate.rate", strategy="ewma", window=5, k=3.0)
    assert ew.count() == 1
    rc = metric_history_anomaly(
        m, lin, "null_rate.rate", strategy="relative_change",
        max_ratio=2.0)
    assert rc.count() == 1
    with pytest.raises(ValueError, match="strategy"):
        metric_history_anomaly(m, lin, "x", strategy="bogus")
    # other metrics are ignored
    none = metric_history_anomaly(m, lin, "other.metric")
    assert none.count() == 0


def test_metric_history_anomaly_unflagged_view(spark):
    m, lin = _store(spark, {"p": [1, 1, 1, 1, 1]})
    full = metric_history_anomaly(
        m, lin, "null_rate.rate", flagged_only=False)
    assert full.count() == 5
    assert full.where("is_anomaly").count() == 0


def test_ewma_alpha_validation(spark):
    with pytest.raises(ValueError, match="alpha"):
        ewma_residual(_series_df(spark, [1.0]), ["k"], "t", "v", alpha=0.0)


# --- CUSUM -------------------------------------------------------------------


def ref_cusum(values, slack_k, baseline_points, min_std=1e-9):
    base = values[:baseline_points]
    mu = sum(base) / len(base)
    var = sum(x * x for x in base) / len(base) - mu * mu
    sd = max(math.sqrt(max(var, 0.0)), min_std)
    sp = sn = 0.0
    out = []
    for x in values:
        z = (x - mu) / sd
        sp = max(0.0, sp + z - slack_k)
        sn = max(0.0, sn - z - slack_k)
        out.append((round(sp, 6), round(sn, 6)))
    return out


def test_cusum_matches_reference_trajectory(spark):
    from mlcast_sourcedata_validator_spark.functions.anomaly import (
        cusum_alarms)

    values = [10, 11, 9, 10, 10, 10.6, 10.4, 10.7, 10.5, 10.8,
              10.6, 10.9, 10.7, 11.0, 10.8]
    df = _series_df(spark, values)
    rows = sorted(
        cusum_alarms(df, ["k"], "t", "v", slack_k=0.5,
                     threshold_h=5.0).collect(),
        key=lambda r: r["run_order"])
    got = [(r["cusum_pos"], r["cusum_neg"]) for r in rows]
    assert got == ref_cusum(values, 0.5, 5)


def test_cusum_catches_small_persistent_shift_zscore_misses(spark):
    """+0.75-sigma step: never beyond 3 trailing sigmas, but the
    cumulative sum walks over the CUSUM threshold."""
    import numpy as np

    from mlcast_sourcedata_validator_spark.functions.anomaly import (
        cusum_alarms, trailing_zscore)

    rng = np.random.default_rng(7)
    pre = (10 + rng.normal(0, 1.0, 30)).tolist()
    post = (10.75 + rng.normal(0, 1.0, 30)).tolist()
    df = _series_df(spark, pre + post)
    # the shift region itself never trips a 3-sigma trailing z-score
    # (warm-up noise at tiny frames may — that is not the shift)
    z = trailing_zscore(df, ["k"], "t", "v", window=10, k=3.0)
    assert z.where("is_anomaly AND t >= 30").count() == 0
    c = cusum_alarms(df, ["k"], "t", "v", slack_k=0.25,
                     threshold_h=5.0, baseline_points=30)
    alarms = [r["run_order"] for r in c.where("is_anomaly").collect()]
    assert alarms and min(alarms) >= 30  # fires, and only after the shift


def test_cusum_series_are_independent_and_validated(spark):
    from mlcast_sourcedata_validator_spark.functions.anomaly import (
        cusum_alarms)

    flat = _series_df(spark, [5.0] * 20, key="flat")
    shifted = _series_df(spark, [5.0] * 10 + [9.0] * 10, key="step")
    out = cusum_alarms(flat.union(shifted), ["k"], "t", "v",
                       threshold_h=4.0)
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["k"], []).append(r["is_anomaly"])
    assert not any(by_key["flat"])
    assert any(by_key["step"])
    with pytest.raises(ValueError):
        cusum_alarms(flat, ["k"], "t", "v", baseline_points=1)
    with pytest.raises(ValueError):
        cusum_alarms(flat, ["k"], "t", "v", threshold_h=0)


def test_metric_history_cusum_strategy(spark):
    """'cusum' strategy through metric_history_anomaly: flags the
    creeping partition, leaves the stable one alone."""
    from mlcast_sourcedata_validator_spark.functions.anomaly import (
        metric_history_anomaly)

    runs = []
    lineage = []
    for i in range(12):
        creep = 0.001 * (1.35 ** i)
        for pid, val in (("p_ok", 0.001), ("p_creep", creep)):
            runs.append(("s", f"r{i}", pid, "null_rate", float(val)))
            lineage.append((f"r{i}", pid, float(i)))
    metrics = spark.createDataFrame(
        runs, "suite_id string, run_id string, partition_id string, "
              "metric string, value double")
    lin = spark.createDataFrame(
        lineage, "run_id string, partition_id string, committed_at double")
    out = metric_history_anomaly(
        metrics, lin, "null_rate", strategy="cusum", k=4.0, min_points=4)
    flagged = {r["partition_id"] for r in out.collect()}
    assert flagged == {"p_creep"}
