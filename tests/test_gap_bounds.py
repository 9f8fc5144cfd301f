"""gap_bounds check kind: inter-turn latency quantile budgets riding the
shared window enrichment."""

import datetime

import pytest

from mlcast_sourcedata_validator_spark.compiler import compile_suite, run_suite
from mlcast_sourcedata_validator_spark.report import FAIL, PASS, WARNING
from mlcast_sourcedata_validator_spark.suite import (
    CheckSpec,
    CheckSuite,
    RunContext,
)

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _df(spark, gaps_by_conv):
    """Build transcripts where conv c's turn i sits gaps[i-1] seconds
    after turn i-1."""
    rows = []
    for conv, gaps in gaps_by_conv.items():
        t = T0
        rows.append((conv, 0, "user", "hi", None, t))
        for i, g in enumerate(gaps, start=1):
            t = t + datetime.timedelta(seconds=g)
            rows.append((conv, i, "assistant", "ok", None, t))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def _suite(**params):
    return CheckSuite(
        suite_id="gap-test",
        checks=[CheckSpec("gap_tail", "gap_bounds", "4.4",
                          "gap budget", params)],
    )


def _status(spark, df, **params):
    res = run_suite(RunContext(spark=spark, df=df, suite=_suite(**params),
                               run_id="g"))
    rows = [r for r in res.report.results if "gap" in r.requirement]
    assert len(rows) == 1
    return rows[0]


def test_within_budget_passes(spark):
    df = _df(spark, {"a": [10, 10, 10], "b": [20, 20]})
    r = _status(spark, df, q=0.5, warn_hi=60.0, hi=3600.0)
    assert r.status == PASS
    assert "p50=" in r.detail.replace("gap p50", "p50=") or "p50" in r.detail


def test_blown_tail_fails_and_advisory_warns(spark):
    # one conversation stalls for 2 days
    df = _df(spark, {"a": [10, 10, 172800], "b": [10, 10, 10]})
    r = _status(spark, df, q=0.99, hi=86400.0)
    assert r.status == FAIL
    r2 = _status(spark, df, q=0.99, warn_hi=86400.0)
    assert r2.status == WARNING
    # the gap quantile converts micros -> seconds in the detail
    assert "172800.000s" in r2.detail


def test_collapsed_gap_lower_bound(spark):
    # replayed log: all turns at the same timestamp
    df = _df(spark, {"a": [0, 0, 0, 0]})
    r = _status(spark, df, q=0.5, lo=0.5)
    assert r.status == FAIL


def test_no_pairs_is_warning(spark):
    # only single-turn conversations: every lag is NULL
    df = _df(spark, {"a": [], "b": []})
    r = _status(spark, df, q=0.5, warn_hi=60.0)
    assert r.status == WARNING
    assert "undefined" in r.detail


def test_bad_q_rejected(spark):
    with pytest.raises(ValueError, match="q must be"):
        compile_suite(_suite(q=1.5, warn_hi=1.0))


def test_transcripts_v1_carries_gap_tail(spark):
    from mlcast_sourcedata_validator_spark.suite import get_suite

    suite = get_suite("transcripts_v1")
    kinds = {c.check_id: c.kind for c in suite.checks}
    assert kinds.get("gap_tail") == "gap_bounds"
