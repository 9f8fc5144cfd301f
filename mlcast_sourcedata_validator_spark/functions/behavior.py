"""Behavioral analytics over event streams — funnels, cohort retention,
and cross-table aggregate reconciliation — expressed scale-first.

- ``funnel_steps`` / ``funnel_counts``: ordered-sequence (funnel)
  matching per user. The per-user event sequence is collected ONCE
  (one shuffle on the user key), sorted, and folded with a codegen'd
  ``F.aggregate`` higher-order function into an array of per-step
  completion timestamps — greedy earliest-completion, which is optimal
  for step-reachability (taking the earliest occurrence of step j never
  hurts reaching step j+1). No per-row Python, no k-way self-join (the
  textbook k-step funnel is k-1 self-joins = k-1 shuffles; this is one).
- ``cohort_retention``: the (cohort period × period offset → active
  users) retention matrix in a SINGLE user-key shuffle:
  ``groupBy(user).agg(min(ts), collect_set(trunc(ts)))`` then explode —
  instead of the textbook three shuffles (first-event agg + activity
  distinct + re-join). The per-user state is bounded by the number of
  distinct periods (weeks/days), not events, so collect_set stays small
  at any event volume.
- ``reconcile_aggregates``: cross-table consistency — per-key aggregates
  of a big fact table compared against declared values on a reference
  table (registry / summary / header), with absolute + relative
  tolerance. One shuffle on the key for the fact-side agg; the join is
  between two aggregate-sized (one row per key) relations. This is the
  dbt-style "sum of line items equals header total" audit the per-table
  checks cannot see.

Reference parity note: the reference validates one dataset at a time and
has no cross-table or sequence checks (its referential check,
georeferencing.py:41-65, is membership only); these operators extend the
§2C pipeline surface. All outputs are exact and DuckDB-oracle-verified
(tests/test_extra_oracles.py; `__spark_entry__.py` extras).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Per-user funnel completion: one row per user with an
    ``step_ts`` array — ``step_ts[j]`` is the timestamp at which step j
    was first completed (NULL if never reached), where step j counts
    only strictly after step j-1 in ``(ts, order_col)`` order (one event
    cannot satisfy two steps).

    One shuffle on ``user_col``; the fold runs inside whole-stage
    codegen over the sorted per-user array. Per-user event counts bound
    the array (sessions/conversations, not the global table).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("o") if order_col else F.col(ts_col).alias("o"),
        F.col(type_col).alias("t"),
    )))
    k = len(steps)
    init = F.array(*[F.lit(None).cast(df.schema[ts_col].dataType)
                     for _ in steps])

    def fold(acc: Column, e: Column) -> Column:
        # left-to-right against the OLD acc: an event can fill at most
        # one step, and step j only opens once acc[j-1] was set by a
        # STRICTLY earlier event in the sorted order.
        out = []
        for j in range(k):
            opens = F.lit(True) if j == 0 else acc[j - 1].isNotNull()
            out.append(
                F.when(acc[j].isNotNull(), acc[j]).otherwise(
                    F.when((e["t"] == F.lit(steps[j])) & opens, e["ts"])
                    .otherwise(F.lit(None).cast(df.schema[ts_col].dataType))
                )
            )
        return F.array(*out)

    return (
        df.select(user_col, ts_col, type_col,
                  *( [order_col] if order_col else [] ))
        .groupBy(user_col)
        .agg(F.aggregate(ev, init, fold).alias("step_ts"))
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Aggregate funnel: one row per step with the number of users who
    reached it — ``(step_idx, step_name, n_users)``. Conversion between
    consecutive steps is ``n_users[j]/n_users[j-1]`` downstream."""
    per_user = funnel_steps(df, steps, user_col, type_col, ts_col, order_col)
    # coalesce: a global sum over ZERO users is NULL; an empty funnel
    # reached 0 users, not unknown
    reached = per_user.select(*[
        F.coalesce(
            F.sum(F.when(F.col("step_ts")[j].isNotNull(), 1).otherwise(0)),
            F.lit(0))
        .alias(f"_s{j}")
        for j in range(len(steps))
    ])
    pairs = F.array(*[
        F.struct(F.lit(j + 1).alias("step_idx"),
                 F.lit(s).alias("step_name"),
                 F.col(f"_s{j}").alias("n_users"))
        for j, s in enumerate(steps)
    ])
    return (
        reached.select(F.explode(pairs).alias("r"))
        .select("r.step_idx", "r.step_name",
                F.col("r.n_users").cast("long").alias("n_users"))
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: ``(cohort, offset, n_users)`` where
    ``cohort`` is the user's first-activity period (date_trunc), and
    ``n_users`` counts users of that cohort active ``offset`` periods
    later. ``granularity`` is 'week' or 'day'.

    Single shuffle on ``user_col``: min(ts) and the distinct activity
    periods come out of ONE aggregate (collect_set over truncated
    timestamps — bounded by the calendar, not the event count), then an
    explode + period-key agg. No distinct-users recount is needed after
    the explode: each (user, period) appears exactly once by
    construction, so ``count(1)`` IS ``count(distinct user)``.
    """
    if granularity not in ("week", "day"):
        raise ValueError(f"granularity must be week|day, got {granularity!r}")
    days = 7 if granularity == "week" else 1
    period = F.date_trunc(granularity, F.col(ts_col)).cast("date")
    per_user = (
        df.groupBy(user_col)
        .agg(F.min(period).alias("cohort"),
             F.collect_set(period).alias("periods"))
    )
    return (
        per_user.select("cohort", F.explode("periods").alias("p"))
        .groupBy(F.col("cohort"),
                 (F.datediff(F.col("p"), F.col("cohort")) / days)
                 .cast("int").alias("offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def reconcile_aggregates(
    df: DataFrame,
    ref: DataFrame,
    key: str,
    rules: list[dict[str, Any]],
    how: str = "full_outer",
) -> DataFrame:
    """Cross-table aggregate reconciliation. Each rule is
    ``{"agg_sql": <aggregate SQL over df>, "expect": <ref column>,
    "atol": 0.0, "rtol": 0.0}``; returns one row per (key, rule) that
    FAILS — key present on only one side, or |actual-expected| >
    atol + rtol*|expected| (non-numerics compare by exact inequality;
    timestamps compare on epoch micros so tolerances are seconds*1e6).

    Output: ``(key, rule_idx, expect_col, actual_str, expected_str)``.

    Scale shape: ``df.groupBy(key).agg(...)`` is one shuffle with
    map-side partials; both join sides are aggregate-sized (one row per
    key), so the join cost is O(#keys) regardless of fact-table volume.
    """
    if not rules:
        raise ValueError("reconcile_aggregates needs at least one rule")
    aggs = [F.expr(r["agg_sql"]).alias(f"_actual_{i}")
            for i, r in enumerate(rules)]
    actual = df.groupBy(F.col(key).alias("_k")).agg(*aggs)
    expected = ref.select(
        F.col(key).alias("_k"),
        F.lit(True).alias("_ref_present"),
        *[F.col(r["expect"]).alias(f"_expected_{i}")
          for i, r in enumerate(rules)],
    )
    j = actual.withColumn("_fact_present", F.lit(True)).join(
        expected, "_k", how)

    def mismatch(i: int, r: dict[str, Any]) -> Column:
        a, e = F.col(f"_actual_{i}"), F.col(f"_expected_{i}")
        atol = float(r.get("atol", 0.0))
        rtol = float(r.get("rtol", 0.0))
        a_num, e_num = _as_numeric(a, df, r["agg_sql"]), None
        if a_num is not None:
            e_num = _epoch_or_cast(e, ref.schema[r["expect"]].dataType)
        if a_num is not None and e_num is not None:
            diff_bad = (
                F.abs(a_num - e_num) > F.lit(atol) + F.lit(rtol) * F.abs(e_num)
            )
        else:
            diff_bad = ~a.eqNullSafe(e)
        one_sided = F.col("_fact_present").isNull() | \
            F.col("_ref_present").isNull()
        both_null = a.isNull() & e.isNull()
        return one_sided | (~both_null & (
            a.isNull() | e.isNull() | diff_bad))

    per_rule = F.array(*[
        F.struct(
            F.lit(i).alias("rule_idx"),
            F.lit(r["expect"]).alias("expect_col"),
            mismatch(i, r).alias("bad"),
            F.col(f"_actual_{i}").cast("string").alias("actual_str"),
            F.col(f"_expected_{i}").cast("string").alias("expected_str"),
        )
        for i, r in enumerate(rules)
    ])
    return (
        j.select(F.col("_k").alias(key), F.explode(per_rule).alias("r"))
        .where(F.col("r.bad"))
        .select(key, "r.rule_idx", "r.expect_col",
                "r.actual_str", "r.expected_str")
    )


def _as_numeric(col: Column, df: DataFrame, agg_sql: str) -> Column | None:
    """Numeric view of the fact-side aggregate, or None if the aggregate
    is non-numeric (string mins etc. compare by equality instead)."""
    try:
        dt = df.selectExpr(f"{agg_sql} AS _probe").schema["_probe"].dataType
    except Exception:
        return None
    return _epoch_or_cast(col, dt)


def _epoch_or_cast(col: Column, dt) -> Column | None:
    from pyspark.sql import types as T

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.NumericType):
        return col.cast("double")
    return None


def repeat_runs(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    min_run: int = 2,
) -> DataFrame:
    """Consecutive-repeat run profile per key: for each key, the longest
    run of an identical ``val_col`` value over the ordered sequence, how
    many runs reach ``min_run``, and how many rows those runs repeat —
    the gaps-and-islands analysis behind loop detection (an agent
    emitting the same event/turn over and over), returned as analytics
    rather than a pass/fail verdict (that is the ``consecutive_dup``
    check kind).

    Scale shape: ONE exchange on the key — the change flag (null-safe
    lag inequality) and the running-sum run id share the same window
    partitioning, so Catalyst plans one Exchange + one Sort; the
    run-length groupBy's map-side partial aggregation then reduces each
    partition to run-level rows (#runs, not #rows) before its shuffle,
    and the per-key fold is over runs. Adjacent NULLs count as one run
    (eqNullSafe), matching SQL's IS NOT DISTINCT FROM.

    Output: (key_col, max_run, n_runs, n_repeat_rows) for keys whose
    longest run reaches ``min_run``; n_runs counts qualifying runs,
    n_repeat_rows counts their repeated rows (run length - 1 each).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    changed = (~F.col(val_col).eqNullSafe(
        F.lag(val_col).over(w))).cast("long")
    run_id = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    runs = (
        df.withColumn("_run", run_id)
        .groupBy(key_col, "_run")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    qual = F.col("_len") >= min_run
    return (
        runs.groupBy(key_col)
        .agg(
            F.max("_len").alias("max_run"),
            F.sum(qual.cast("long")).alias("n_runs"),
            F.coalesce(
                F.sum(F.when(qual, F.col("_len") - 1)), F.lit(0)
            ).alias("n_repeat_rows"),
        )
        .where(F.col("max_run") >= min_run)
    )
