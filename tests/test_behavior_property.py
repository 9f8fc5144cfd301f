"""Property test: funnel_steps equals a brute-force greedy Python scan
on randomized event sequences (hypothesis drives shapes; one Spark
action per example, so examples are few but adversarial: duplicate
timestamps, repeated step types, users missing steps entirely)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mlcast_sourcedata_validator_spark.functions.behavior import funnel_steps

T0 = dt.datetime(2024, 3, 1)

_user = st.integers(min_value=1, max_value=3)
_type = st.sampled_from(["a", "b", "c", "x"])
# coarse minutes force ts collisions, exercising the order_col tiebreak
_minute = st.integers(min_value=0, max_value=5)
_events = st.lists(st.tuples(_user, _type, _minute), min_size=1,
                   max_size=25)


def _reference_funnel(rows, steps):
    """Greedy earliest-completion per user over (ts, event_id) order —
    the semantics funnel_steps' fold implements."""
    out = {}
    by_user = {}
    for eid, (u, t, m) in enumerate(rows):
        by_user.setdefault(u, []).append(
            (T0 + dt.timedelta(minutes=m), eid, t))
    for u, evs in by_user.items():
        acc = [None] * len(steps)
        for ts, _eid, t in sorted(evs):
            for j in range(len(steps)):
                if acc[j] is None and t == steps[j] \
                        and (j == 0 or acc[j - 1] is not None):
                    acc[j] = ts
                    break  # one event fills at most one step
        out[u] = acc
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_events, steps=st.sampled_from(
    [["a", "b"], ["a", "b", "c"], ["a", "a"], ["b", "a", "b"]]))
def test_funnel_steps_equals_greedy_reference(spark, rows, steps):
    df = spark.createDataFrame(
        [Row(user_id=u, event_id=eid, event_type=t,
             ts=T0 + dt.timedelta(minutes=m))
         for eid, (u, t, m) in enumerate(rows)])
    got = {r["user_id"]: list(r["step_ts"])
           for r in funnel_steps(df, steps, order_col="event_id").collect()}
    want = _reference_funnel(rows, steps)
    assert got == want
