"""asof_join and point_in_interval_join must equal their naive
theta-join formulations (which is how the DuckDB oracles state them)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window as W, functions as F

from mlcast_sourcedata_validator_spark.functions.joins import (
    asof_join,
    point_in_interval_join,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(1), 10.0),
            ("A", _ts(5), 11.0),
            ("A", _ts(0), 9.0),   # before any quote -> NULL match
            ("B", _ts(2), 20.0),
            ("C", _ts(9), 30.0),  # key with no quotes at all
        ],
        "sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0.5), 100.0, None),   # NULL payload field must carry
            ("A", _ts(5.0), 101.0, 51.0),   # tie at trade ts -> matches (<=)
            ("A", _ts(7.0), 102.0, 52.0),   # future quote never matches
            ("B", _ts(1.0), 200.0, 99.0),
        ],
        "sym string, qts timestamp, bid double, ask double",
    )
    return trades, quotes


def _naive_asof(trades, quotes):
    j = trades.join(
        quotes, (trades.sym == quotes.sym) & (quotes.qts <= trades.ts), "left"
    )
    w = W.partitionBy(trades.sym, trades.ts, trades.price).orderBy(
        F.desc_nulls_last("qts")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(trades.sym, trades.ts, trades.price, "bid", "ask")
    )


def test_asof_left_matches_naive(trades_quotes):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="qts")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _naive_asof(trades, quotes).collect())
    )
    # NULL inside the matched quote row stays NULL (no fallback to older row)
    row = {(r.sym, r.ts): r for r in got.collect()}
    assert row[("A", _ts(1))].bid == 100.0 and row[("A", _ts(1))].ask is None
    assert row[("A", _ts(5))].bid == 101.0   # tie at equal ts matches
    assert row[("A", _ts(0))].bid is None    # nothing precedes
    assert row[("C", _ts(9))].bid is None    # keyless


def test_asof_inner_drops_unmatched(trades_quotes):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
                    how="inner")
    keys = {(r.sym, r.ts) for r in got.collect()}
    assert keys == {("A", _ts(1)), ("A", _ts(5)), ("B", _ts(2))}


def test_asof_single_shuffle_plan(trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="qts"
    )._jdf.queryExecution().executedPlan().toString()
    # union + one window: exactly one exchange per input branch, no join node
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_point_in_interval_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, _ts(i * 0.7)) for i in range(200)], "pid long, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (0, _ts(0), _ts(10)),
            (1, _ts(5), _ts(5.1)),    # sub-bin interval
            (2, _ts(59), _ts(180)),   # spans many bins
            (3, _ts(30), _ts(30)),    # empty (start == end, half-open)
            (4, _ts(130), _ts(140)),  # interval ending on a bin edge
        ],
        "iid long, s timestamp, e timestamp",
    )
    got = point_in_interval_join(points, intervals, "pts", "s", "e",
                                 bin_width_sec=600)
    naive = points.join(
        intervals, (points.pts >= intervals.s) & (points.pts < intervals.e)
    ).select("pid", "pts", "iid", "s", "e")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert got.where("iid = 3").count() == 0


def test_point_in_interval_left_outer_keeps_points(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(500))], "pid long, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, _ts(0), _ts(1))], "iid long, s timestamp, e timestamp"
    )
    got = point_in_interval_join(points, intervals, "pts", "s", "e",
                                 bin_width_sec=60, how="left_outer")
    rows = {r.pid: r.iid for r in got.collect()}
    assert rows == {1: 7, 2: None}


def test_asof_null_ts_and_null_key_right_rows_never_match(spark):
    """Theta semantics: ``right_ts <= left_ts`` is NULL for a NULL right
    timestamp, and NULL keys never equi-match — such right rows must not
    attach to anything (they used to sort NULLS FIRST and act as a
    match-all earliest row)."""
    left = spark.createDataFrame(
        [("A", _ts(5)), (None, _ts(5))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", None, 1.0), (None, _ts(0), 2.0), ("A", _ts(1), 3.0)],
        "k string, rts timestamp, v double",
    )
    got = {r.k: r.v for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                     payload_cols=["v"]).collect()}
    assert got == {"A": 3.0, None: None}


def test_asof_null_left_ts_gets_null_payload(spark):
    left = spark.createDataFrame([("A", None)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _ts(0), 1.0)], "k string, rts timestamp, v double"
    )
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v"]).collect()
    assert len(got) == 1 and got[0].v is None


def test_asof_empty_payload_raises(spark):
    left = spark.createDataFrame([("A", _ts(1))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(0))], "k string, rts timestamp")
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")


def test_asof_payload_with_nonidentifier_name(spark):
    """Programmatic StructType: payload column names that are not bare SQL
    identifiers (spaces) must survive (the old DDL-string cast broke)."""
    left = spark.createDataFrame([("A", _ts(1))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(0), 5.0)],
                                  "k string, rts timestamp, `my val` double")
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["my val"]).collect()
    assert got[0]["my val"] == 5.0


def test_point_in_interval_inverted_interval_dropped(spark):
    """end < start is an empty interval: no matches, no junk candidate
    rows from a descending sequence."""
    points = spark.createDataFrame(
        [(1, _ts(5))], "pid long, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, _ts(10), _ts(0))], "iid long, s timestamp, e timestamp"
    )
    got = point_in_interval_join(points, intervals, "pts", "s", "e",
                                 bin_width_sec=60)
    assert got.count() == 0


def test_point_in_interval_oversized_interval_raises(spark):
    """An interval spanning more bins than max_bins_per_interval must fail
    loudly instead of silently exploding into span/bin rows."""
    points = spark.createDataFrame([(1, _ts(5))], "pid long, pts timestamp")
    intervals = spark.createDataFrame(
        [(7, _ts(0), _ts(60 * 24 * 365))], "iid long, s timestamp, e timestamp"
    )
    big = point_in_interval_join(points, intervals, "pts", "s", "e",
                                 bin_width_sec=60, max_bins_per_interval=1000)
    with pytest.raises(Exception, match="max_bins_per_interval"):
        big.collect()
    # and the limit is advisory: None disables it
    ok = point_in_interval_join(points, intervals, "pts", "s", "e",
                                bin_width_sec=60, max_bins_per_interval=None)
    assert ok.count() == 1


def test_point_in_interval_plan_is_equi_join(spark):
    """The bin equality must be extracted as the join key: a plan that
    degrades to BroadcastNestedLoopJoin/CartesianProduct would be the
    O(n*m) theta join this operator exists to avoid."""
    points = spark.createDataFrame(
        [(1, _ts(0))], "pid long, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, _ts(0), _ts(1))], "iid long, s timestamp, e timestamp"
    )
    plan = point_in_interval_join(
        points, intervals, "pts", "s", "e", bin_width_sec=60
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
