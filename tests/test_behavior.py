"""Funnels, cohort retention, and cross-table reconciliation
(functions/behavior.py) + the declarative `reconciliation` check kind."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from mlcast_sourcedata_validator_spark.functions.behavior import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
    reconcile_aggregates,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_id=i, event_type=t,
             ts=T0 + dt.timedelta(minutes=m))
         for i, (u, t, m) in enumerate(rows)])


def test_funnel_greedy_chaining(spark):
    """Steps complete only in order; an out-of-order later step doesn't
    count until its predecessor happened; one event fills one step."""
    rows = [
        # u1: full funnel in order
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # u2: purchase BEFORE view/click -> only reaches step 1 then 2
        (2, "purchase", 0), (2, "view", 1), (2, "click", 2),
        # u3: view only
        (3, "view", 0),
        # u4: click+purchase but never views -> reaches nothing
        (4, "click", 0), (4, "purchase", 1),
    ]
    per = {r["user_id"]: r["step_ts"]
           for r in funnel_steps(_ev(spark, rows),
                                 ["view", "click", "purchase"],
                                 order_col="event_id").collect()}
    assert [x is not None for x in per[1]] == [True, True, True]
    assert [x is not None for x in per[2]] == [True, True, False]
    assert [x is not None for x in per[3]] == [True, False, False]
    assert [x is not None for x in per[4]] == [False, False, False]

    counts = {r["step_name"]: r["n_users"]
              for r in funnel_counts(_ev(spark, rows),
                                     ["view", "click", "purchase"],
                                     order_col="event_id").collect()}
    assert counts == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_tiebreak_and_single_fill(spark):
    """Two events at the SAME ts chain via the order_col tiebreak, and a
    repeated-step funnel cannot be satisfied by one event twice."""
    rows = [(1, "view", 0), (1, "click", 0)]  # same minute
    per = funnel_steps(_ev(spark, rows), ["view", "click"],
                       order_col="event_id").collect()[0]["step_ts"]
    assert per[0] is not None and per[1] is not None

    # view->view needs TWO view events; one is not enough
    one = _ev(spark, [(1, "view", 0)])
    p1 = funnel_steps(one, ["view", "view"],
                      order_col="event_id").collect()[0]["step_ts"]
    assert p1[0] is not None and p1[1] is None
    two = _ev(spark, [(1, "view", 0), (1, "view", 3)])
    p2 = funnel_steps(two, ["view", "view"],
                      order_col="event_id").collect()[0]["step_ts"]
    assert p2[0] is not None and p2[1] is not None and p2[1] > p2[0]

    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(one, ["view"])

    # empty input: 0 users reached every step (not NULL)
    empty = one.where("1=0")
    rows = funnel_counts(empty, ["view", "click"],
                         order_col="event_id").collect()
    assert [r["n_users"] for r in rows] == [0, 0]


def test_cohort_retention_matrix(spark):
    """Hand-checked weekly matrix; count(1) after the explode equals
    count(distinct user) because (user, period) pairs are unique."""
    rows = [
        (1, "view", 0), (1, "view", 60),            # u1 week0 only (twice)
        (2, "view", 0), (2, "view", 7 * 24 * 60),   # u2 week0 + week1
        (3, "view", 7 * 24 * 60),                   # u3 cohort = week1
    ]
    out = {(str(r["cohort"]), r["offset"]): r["n_users"]
           for r in cohort_retention(_ev(spark, rows)).collect()}
    # 2024-06-01 is a Saturday; its Monday-truncated week is 2024-05-27
    assert out == {("2024-05-27", 0): 2, ("2024-05-27", 1): 1,
                   ("2024-06-03", 0): 1}
    daily = cohort_retention(_ev(spark, rows), granularity="day")
    assert daily.where("offset = 7").count() == 1
    with pytest.raises(ValueError, match="week|day"):
        cohort_retention(_ev(spark, rows), granularity="month")


def _fact(spark):
    return spark.createDataFrame(
        [Row(k="a", v=10.0, ts=T0), Row(k="a", v=5.0, ts=T0),
         Row(k="b", v=7.0, ts=T0 + dt.timedelta(hours=1))])


def test_reconcile_aggregates_tolerance_and_sides(spark):
    """Value mismatch beyond atol+rtol flags; within tolerance passes;
    one-sided keys flag from either side; timestamps compare on epoch."""
    fact = _fact(spark)
    ref = spark.createDataFrame(
        [Row(k="a", total=15.0, started=T0),
         Row(k="b", total=7.5, started=T0 + dt.timedelta(hours=1)),
         Row(k="c", total=1.0, started=T0)])  # c: registry-only
    rules = [{"agg_sql": "sum(v)", "expect": "total", "atol": 0.6},
             {"agg_sql": "min(ts)", "expect": "started"}]
    bad = reconcile_aggregates(fact, ref, "k", rules).collect()
    # b's sum 7.0 vs 7.5 exceeds atol 0.6? |7-7.5|=0.5 <= 0.6 -> passes;
    # c is one-sided so BOTH rules flag it
    assert {(r["k"], r["rule_idx"]) for r in bad} == {("c", 0), ("c", 1)}

    # shrink the tolerance -> b's sum now flags too
    rules2 = [{"agg_sql": "sum(v)", "expect": "total", "atol": 0.1}]
    bad2 = reconcile_aggregates(fact, ref, "k", rules2).collect()
    assert {(r["k"]) for r in bad2} == {"b", "c"}

    # timestamp drift beyond rtol-in-micros flags
    ref3 = ref.withColumn(
        "started", F.col("started") + F.expr("INTERVAL 10 SECONDS"))
    bad3 = reconcile_aggregates(
        fact, ref3, "k", [{"agg_sql": "min(ts)", "expect": "started"}])
    assert bad3.where("k IN ('a','b')").count() == 2
    ok3 = reconcile_aggregates(
        fact, ref3, "k",
        [{"agg_sql": "min(ts)", "expect": "started", "atol": 11e6}])
    assert ok3.where("k IN ('a','b')").count() == 0

    # inner join ignores one-sided keys
    inner = reconcile_aggregates(fact, ref, "k", rules, how="inner")
    assert inner.count() == 0
    with pytest.raises(ValueError, match="at least one rule"):
        reconcile_aggregates(fact, ref, "k", [])


def test_reconcile_non_numeric_equality(spark):
    """Non-numeric aggregates (string min) compare by exact equality."""
    fact = spark.createDataFrame(
        [Row(k="a", name="x"), Row(k="a", name="y"), Row(k="b", name="z")])
    ref = spark.createDataFrame(
        [Row(k="a", first_name="x"), Row(k="b", first_name="DIFFERENT")])
    bad = reconcile_aggregates(
        fact, ref, "k",
        [{"agg_sql": "min(name)", "expect": "first_name"}]).collect()
    assert [r["k"] for r in bad] == ["b"]
    assert bad[0]["actual_str"] == "z" \
        and bad[0]["expected_str"] == "DIFFERENT"


def test_reconciliation_check_kind(spark):
    """Declarative check: PASS when min(ts) matches the registry's
    started_at; FAIL naming the rule and exemplar keys when it drifts;
    raises without a registry; severity is validated at compile time."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    df = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=0, ts=T0),
         Row(conv_id="a", turn_idx=1, ts=T0 + dt.timedelta(minutes=1)),
         Row(conv_id="b", turn_idx=0, ts=T0 + dt.timedelta(hours=2))])

    def suite(params):
        base = {"rules": [{"agg_sql": "min(ts)", "expect": "started_at"}]}
        base.update(params)
        return CheckSuite("recon_t", [CheckSpec(
            "recon", "reconciliation", "2.4 registry",
            "Registry started_at MUST equal each conversation's first ts.",
            base)], conv_col="conv_id", turn_col="turn_idx")

    good_reg = df.groupBy("conv_id").agg(F.min("ts").alias("started_at"))
    res = run_suite(RunContext(spark=spark, df=df, suite=suite({}),
                               run_id="r1", registry_df=good_reg))
    assert [r.status for r in res.report.results] == ["PASS"]

    bad_reg = good_reg.withColumn(
        "started_at",
        F.when(F.col("conv_id") == "b",
               F.col("started_at") + F.expr("INTERVAL 5 MINUTES"))
        .otherwise(F.col("started_at")))
    res2 = run_suite(RunContext(spark=spark, df=df, suite=suite({}),
                                run_id="r2", registry_df=bad_reg))
    r2 = res2.report.results[0]
    assert r2.status == "FAIL" and "min(ts)" in r2.detail \
        and "e.g. b" in r2.detail
    assert res2.exit_code() == 1

    res3 = run_suite(RunContext(
        spark=spark, df=df,
        suite=suite({"severity": "WARNING"}), run_id="r3",
        registry_df=bad_reg))
    assert res3.report.results[0].status == "WARNING"
    assert res3.exit_code() == 0

    with pytest.raises(ValueError, match="registry_df"):
        run_suite(RunContext(spark=spark, df=df, suite=suite({}),
                             run_id="r4"))
    from mlcast_sourcedata_validator_spark.compiler import compile_suite
    with pytest.raises(ValueError, match="needs 'rules'"):
        compile_suite(suite({"rules": []}))
    # partition-scoped compilation refuses: a partition batch's per-key
    # aggregates can't be compared to whole-conversation declarations
    with pytest.raises(ValueError, match="whole-table only"):
        compile_suite(suite({}), partition_scoped=True)
    with pytest.raises(ValueError, match="missing"):
        compile_suite(suite({"rules": [{"agg_sql": "min(ts)"}]}))
    with pytest.raises(ValueError, match="severity"):
        compile_suite(suite({"severity": "NOTE"}))
