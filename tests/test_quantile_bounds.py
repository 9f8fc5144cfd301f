"""quantile_bounds check kind: tail budgets riding the fused Observation
(operators/stats.py compile_quantile_bounds)."""

import pytest
from pyspark.sql import Row

from mlcast_sourcedata_validator_spark.compiler import compile_suite, run_suite
from mlcast_sourcedata_validator_spark.suite import (
    CheckSpec,
    CheckSuite,
    RunContext,
)


def _suite(params):
    return CheckSuite("qb_t", [CheckSpec(
        "qb", "quantile_bounds", "1.3 stats",
        "Tail of the length distribution MUST stay within budget.",
        params)], conv_col="conv_id", turn_col="turn_idx")


def _df(spark, values):
    return spark.createDataFrame(
        [("c", i, float(x) if x is not None else None)
         for i, x in enumerate(values)],
        "conv_id string, turn_idx int, v double")


def test_quantile_bounds_verdicts(spark):
    # 100 values 1..100: p95 ~ 95
    df = _df(spark, range(1, 101))
    res = run_suite(RunContext(
        spark=spark, df=df,
        suite=_suite({"column": "v", "q": 0.95, "lo": 90, "hi": 99}),
        run_id="a"))
    r = res.report.results[0]
    assert r.status == "PASS" and "p95=" in r.detail

    res2 = run_suite(RunContext(
        spark=spark, df=df,
        suite=_suite({"column": "v", "q": 0.95, "hi": 50}), run_id="b"))
    assert res2.report.results[0].status == "FAIL"
    assert res2.exit_code() == 1

    res3 = run_suite(RunContext(
        spark=spark, df=df,
        suite=_suite({"column": "v", "q": 0.95, "hi": 200, "warn_hi": 50}),
        run_id="c"))
    assert res3.report.results[0].status == "WARNING"
    assert res3.exit_code() == 0

    # expr form: length expression over a string column
    df2 = spark.createDataFrame(
        [Row(conv_id="c", turn_idx=0, text="x" * 10),
         Row(conv_id="c", turn_idx=1, text="x" * 1000)])
    res4 = run_suite(RunContext(
        spark=spark, df=df2,
        suite=_suite({"expr": "length(text)", "q": 0.5, "hi": 100}),
        run_id="d"))
    assert res4.report.results[0].status == "PASS"


def test_quantile_bounds_edges(spark):
    # all-NULL column: WARNING, not a crash
    df = _df(spark, [None, None, None])
    res = run_suite(RunContext(
        spark=spark, df=df,
        suite=_suite({"column": "v", "q": 0.9, "hi": 10}), run_id="e"))
    r = res.report.results[0]
    assert r.status == "WARNING" and "no non-null" in r.detail

    with pytest.raises(ValueError, match="q must be in"):
        compile_suite(_suite({"column": "v", "q": 1.0}))

    # rides the Observation: compiles to an AggCheck, no extra jobs
    cs = compile_suite(_suite({"column": "v", "q": 0.9}))
    assert len(cs.agg_checks) == 1 and not cs.driver_checks
