"""operators/anomaly.py — raw-data point checks (volume anomaly +
Benford) vs hand-computed expectations. Cross-engine parity vs the
DuckDB oracles is covered by tests/test_extra_oracles.py once the
queries are registered in __spark_entry__ extras."""

from __future__ import annotations

import datetime as dt

import pytest

from mlcast_sourcedata_validator_spark.operators.anomaly import (
    BENFORD_PPM,
    benford_profile,
    benford_profile_sql,
    volume_anomaly,
    volume_anomaly_sql,
)


def _events(spark, day_counts, key="purchase"):
    """day_counts: {day_offset: n_rows} -> (key, ts) rows."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (key, base + dt.timedelta(days=d, seconds=i))
        for d, n in day_counts.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_volume_anomaly_statuses(spark):
    # 3 warmup days at 10, then steady 10s, a 30-spike, a 2-drop
    counts = {0: 10, 1: 10, 2: 10, 3: 10, 4: 30, 5: 10, 6: 2}
    df = _events(spark, counts)
    out = {
        r["day"].isoformat(): (r["cnt"], r["trail_sum"], r["trail_days"],
                               r["status"])
        for r in volume_anomaly(df, "event_type", "ts").collect()
    }
    assert out["2024-01-01"] == (10, 0, 0, "WARMUP")
    assert out["2024-01-02"] == (10, 10, 1, "WARMUP")
    assert out["2024-01-03"] == (10, 20, 2, "WARMUP")
    assert out["2024-01-04"] == (10, 30, 3, "OK")
    # 30 * 4 trail days >= 2 * 40 trail sum -> spike
    assert out["2024-01-05"] == (30, 40, 4, "SPIKE")
    # trailing mean now inflated by the spike: 10*5=50 < 2*70 -> OK
    assert out["2024-01-06"] == (10, 70, 5, "OK")
    # 2 * 6 * 2 = 24 <= 80 -> drop
    assert out["2024-01-07"] == (2, 80, 6, "DROP")


def test_volume_anomaly_keys_are_independent(spark):
    steady = _events(spark, {d: 10 for d in range(5)}, key="steady")
    bursty = _events(spark, {0: 10, 1: 10, 2: 10, 3: 100}, key="bursty")
    out = volume_anomaly(steady.union(bursty), "event_type", "ts").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r["status"])
    assert "SPIKE" not in by_key["steady"]
    assert by_key["bursty"][-1] == "SPIKE"


def test_volume_anomaly_trail_skips_absent_days(spark):
    # ROWS window: a 10-day gap does not dilute the trail (documented
    # contract — the trail is the last k OBSERVED days)
    counts = {0: 10, 1: 10, 2: 10, 3: 10, 20: 10}
    df = _events(spark, counts)
    out = {r["day"].isoformat(): r for r in
           volume_anomaly(df, "event_type", "ts").collect()}
    r = out["2024-01-21"]
    assert (r["trail_sum"], r["trail_days"], r["status"]) == (40, 4, "OK")


def test_volume_anomaly_validates_factors(spark):
    df = _events(spark, {0: 1})
    with pytest.raises(ValueError):
        volume_anomaly(df, "event_type", "ts", spike_factor=1)
    with pytest.raises(ValueError):
        volume_anomaly(df, "event_type", "ts", window_days=2,
                       min_trail_days=3)


def _vals(spark, values):
    return spark.createDataFrame([(float(v),) for v in values],
                                 "value double")


def test_benford_counts_and_ppm(spark):
    # first digits by cents: 1.23 -> 123 -> 1; 0.05 -> 5 -> 5;
    # 912.00 -> 91200 -> 9; zero and negative dropped
    df = _vals(spark, [1.23, 0.05, 912.00, 0.0, -4.5, 1.99])
    rows = {r["digit"]: r for r in benford_profile(df, "value").collect()}
    assert rows[1]["n"] == 2 and rows[5]["n"] == 1 and rows[9]["n"] == 1
    assert 4 not in rows  # negative dropped
    # 4 kept values -> digit 1 observed_ppm = 2*1e6 DIV 4
    assert rows[1]["observed_ppm"] == 500000
    assert rows[1]["expected_ppm"] == BENFORD_PPM[1]
    assert rows[1]["dev_ppm"] == 500000 - BENFORD_PPM[1]
    assert rows[1]["status"] == "DEVIANT"
    assert rows[5]["observed_ppm"] == 250000


def test_benford_conforming_sample_is_ok(spark):
    # synthesize counts proportional to Benford: digit d repeated
    # round(ppm/1000) times as d.00 values
    values = []
    for d, ppm in BENFORD_PPM.items():
        values.extend([float(d)] * round(ppm / 1000))
    df = _vals(spark, values)
    rows = benford_profile(df, "value").collect()
    assert len(rows) == 9
    assert all(r["status"] == "OK" for r in rows)
    assert all(r["dev_ppm"] <= 1000 for r in rows)


def test_benford_expectations_sum_to_exactly_1e6():
    assert sum(BENFORD_PPM.values()) == 1_000_000


def _one_check_suite(kind, params):
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    return CheckSuite(f"{kind}_t", [CheckSpec(
        kind, kind, "9.1 anomaly",
        f"{kind} screen must hold.", params)])


def test_volume_anomaly_check_verdicts(spark):
    """Declarative volume_anomaly kind: PASS on steady volume, WARNING
    with actionable day detail on a planted spike, FAIL when gated."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import RunContext

    steady = _events(spark, {d: 10 for d in range(8)})
    res = run_suite(RunContext(
        spark=spark, df=steady,
        suite=_one_check_suite("volume_anomaly", {}), run_id="v1"))
    assert [r.status for r in res.report.results] == ["PASS"]

    spiky = _events(spark, {0: 10, 1: 10, 2: 10, 3: 10, 4: 80})
    res2 = run_suite(RunContext(
        spark=spark, df=spiky,
        suite=_one_check_suite("volume_anomaly", {}), run_id="v2"))
    r2 = res2.report.results
    assert [r.status for r in r2] == ["WARNING"]
    assert "2024-01-05 spike cnt=80" in r2[0].detail
    assert res2.exit_code() == 0

    res3 = run_suite(RunContext(
        spark=spark, df=spiky,
        suite=_one_check_suite("volume_anomaly", {"severity": "FAIL"}),
        run_id="v3"))
    assert [r.status for r in res3.report.results] == ["FAIL"]
    assert res3.exit_code() == 1

    # keyed slicing: only the bursty key is named
    both = _events(spark, {d: 10 for d in range(5)}, key="steady").union(
        _events(spark, {0: 10, 1: 10, 2: 10, 3: 100}, key="bursty"))
    res4 = run_suite(RunContext(
        spark=spark, df=both,
        suite=_one_check_suite("volume_anomaly", {"key": "event_type"}),
        run_id="v4"))
    d4 = res4.report.results[0].detail
    assert "[bursty]" in d4 and "[steady]" not in d4


def test_benford_check_rides_fused_observation(spark):
    """Declarative benford kind: an AggCheck (zero extra jobs) — verify
    verdicts and that compile emits only agg exprs, no DriverCheck."""
    from mlcast_sourcedata_validator_spark.compiler import (
        compile_suite, run_suite)
    from mlcast_sourcedata_validator_spark.suite import RunContext

    suite = _one_check_suite("benford", {"column": "value"})
    cs = compile_suite(suite)
    assert len(cs.agg_checks) == 1 and not cs.driver_checks

    conforming = []
    for d, ppm in BENFORD_PPM.items():
        conforming.extend([float(d)] * round(ppm / 1000))
    res = run_suite(RunContext(
        spark=spark, df=_vals(spark, conforming), suite=suite,
        run_id="b1"))
    assert [r.status for r in res.report.results] == ["PASS"]

    uniform = _vals(spark, [float(v) for v in range(1, 1000)])
    res2 = run_suite(RunContext(spark=spark, df=uniform, suite=suite,
                                run_id="b2"))
    r2 = res2.report.results
    assert [r.status for r in r2] == ["WARNING"]
    assert "deviates from Benford" in r2[0].detail

    empty = _vals(spark, [0.0, -3.0])
    res3 = run_suite(RunContext(spark=spark, df=empty, suite=suite,
                                run_id="b3"))
    assert [r.status for r in res3.report.results] == ["PASS"]
    assert "vacuously" in res3.report.results[0].detail


def test_point_anomaly_sql_mirrors_on_duckdb(spark):
    """Direct three-way check on in-memory data (the sf0.001 leg lives
    in test_extra_oracles.py): Spark result == DuckDB oracle rows."""
    import duckdb

    counts = {0: 10, 1: 10, 2: 10, 3: 10, 4: 30, 5: 10, 6: 2, 30: 7}
    df = _events(spark, counts)
    spark_rows = sorted(
        (r["key"], r["day"].isoformat(), r["cnt"], r["trail_sum"],
         r["trail_days"], r["status"])
        for r in volume_anomaly(df, "event_type", "ts").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('purchase', TIMESTAMP '{(dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=d, seconds=i)).isoformat(sep=' ')}')"
            for d, n in counts.items() for i in range(n))
        + ") t(event_type, ts)")
    duck_rows = sorted(
        (k, day.isoformat(), cnt, ts_, td, st)
        for k, day, cnt, ts_, td, st in con.execute(
            volume_anomaly_sql("ev", "event_type", "ts")).fetchall()
    )
    assert spark_rows == duck_rows

    vals = [1.23, 0.05, 912.00, 0.0, -4.5, 1.99, 33.33, 871.12]
    vdf = _vals(spark, vals)
    s_rows = sorted(
        tuple(r) for r in benford_profile(vdf, "value").collect())
    con.execute("CREATE TABLE v AS SELECT * FROM (VALUES "
                + ", ".join(f"({v})" for v in vals) + ") t(value)")
    d_rows = sorted(
        tuple(r) for r in con.execute(
            benford_profile_sql("v", "value")).fetchall())
    assert s_rows == d_rows
