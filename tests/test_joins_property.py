"""Property tests: asof_join and point_in_interval_join equal their naive
theta-join formulations on randomized inputs (hypothesis drives the data
shapes; one Spark action per example, so examples are few but adversarial:
duplicate timestamps, empty sides, single-key pileups, zero-length
intervals)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W, functions as F

from mlcast_sourcedata_validator_spark.functions.joins import (
    asof_join,
    point_in_interval_join,
)

T0 = dt.datetime(2024, 3, 1)

# few keys + coarse timestamps force collisions
_key = st.sampled_from(["k1", "k2", "k3"])
_minute = st.integers(min_value=0, max_value=30)


def _ts(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lefts=st.lists(st.tuples(_key, _minute), min_size=0, max_size=12),
    rights=st.lists(st.tuples(_key, _minute), min_size=0, max_size=12),
)
def test_asof_matches_naive_on_random_inputs(sp, lefts, rights):
    left = sp.createDataFrame(
        [(k, _ts(m), i) for i, (k, m) in enumerate(lefts)] or [("zz", _ts(0), 0)],
        "k string, ts timestamp, lid long",
    )
    # dedupe right per (k, ts): asof_join's documented precondition
    seen, rrows = set(), []
    for i, (k, m) in enumerate(rights):
        if (k, m) not in seen:
            seen.add((k, m))
            rrows.append((k, _ts(m), float(i)))
    right = sp.createDataFrame(
        rrows or [("zz2", _ts(0), 0.0)], "k string, rts timestamp, payload double"
    )

    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["payload"])

    j = left.join(right, (left.k == right.k) & (right.rts <= left.ts), "left")
    w = W.partitionBy(left.k, left.ts, left.lid).orderBy(F.desc_nulls_last("rts"))
    naive = (
        j.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        .select(left.k, left.ts, left.lid, "payload")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(_minute, min_size=0, max_size=15),
    ivs=st.lists(st.tuples(_minute, st.integers(min_value=0, max_value=12)),
                 min_size=0, max_size=8),
    binw=st.sampled_from([60, 180, 600, 3600]),
)
@pytest.mark.slow
def test_interval_join_matches_naive_on_random_inputs(sp, points, ivs, binw):
    p = sp.createDataFrame(
        [(i, _ts(m)) for i, m in enumerate(points)] or [(0, _ts(0))],
        "pid long, pts timestamp",
    )
    iv = sp.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (s, d) in enumerate(ivs)]
        or [(0, _ts(0), _ts(0))],
        "iid long, s timestamp, e timestamp",
    )
    got = point_in_interval_join(p, iv, "pts", "s", "e", bin_width_sec=binw)
    naive = p.join(iv, (p.pts >= iv.s) & (p.pts < iv.e)) \
             .select("pid", "pts", "iid", "s", "e")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
