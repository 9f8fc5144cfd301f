"""Slowly-changing-dimension type-2 (SCD2) history over change logs.

Validation needs versioned dimensions: the conversations registry the
refint check joins against is not static — owners, classes and states
change, and "which registry version was true when this transcript was
ingested" is an auditable question. SCD2 is the standard warehouse
answer: one row per (key, state interval) with ``valid_from`` /
``valid_to`` bounds and an open interval for the current state.

Two operators:

- :func:`scd2_from_log` — derive the full SCD2 table from an
  observation log in one pass: per-key change points (the same
  adjacent-lag argument the ``fd_constant`` check uses — a key's state
  stream has a new version exactly where an ADJACENT pair of
  observations differs), then ``lead()`` closes each interval. One
  shuffle on the key; both windows share the partitioning so Catalyst
  plans a single Exchange.

- :func:`scd2_merge` — incremental maintenance: apply a new log batch
  to an existing SCD2 table by re-deriving ONLY the touched keys
  (semi/anti-join on the batch's distinct keys — broadcastable, since a
  batch touches a bounded key set) and unioning the untouched history
  back unchanged. At 10^12 rows this is the difference between
  rewriting the dimension's whole history every day and shuffling just
  the keys that changed. Updates arbitrarily unordered WITHIN the batch
  are exact; updates strictly OLDER than a key's current version raise
  loudly (see the guard note on :func:`scd2_merge` — the SCD2 table is
  a lossy compression of the log, so rewriting the past through it is
  not answerable exactly).

Determinism: callers order by an unambiguous ``order_col`` (a unique
event id, or a (ts, id) struct) — ties on a bare timestamp would make
version boundaries nondeterministic under retries.

No reference analog (the reference validates one static dataset);
this is the maintenance story for the registry/dimension side of the
refint check (operators/refint.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_log", "scd2_merge"]


def _any_changed(attr_cols: list[str], lag_prefix: str = "__scd_prev_") -> Column:
    """NULL-safe 'some attribute differs from the previous observation'."""
    out = None
    for c in attr_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"{lag_prefix}{c}"))
        out = d if out is None else (out | d)
    return out


def scd2_from_log(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse an observation log into SCD2 intervals.

    Output: ``key_cols + attr_cols + (valid_from, valid_to, is_current)``
    where ``valid_from`` is the ``order_col`` of the version's first
    observation, ``valid_to`` the next version's ``valid_from`` (NULL =
    open/current). Consecutive observations with identical attributes
    (null-safely) belong to one version.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    lagged = df.select(
        *key_cols,
        order_col,
        *attr_cols,
        F.row_number().over(w).alias("__scd_rn"),
        *[F.lag(c).over(w).alias(f"__scd_prev_{c}") for c in attr_cols],
    )
    is_new_version = (F.col("__scd_rn") == 1) | _any_changed(attr_cols)
    cps = lagged.where(is_new_version).select(
        *key_cols, *attr_cols, F.col(order_col).alias("valid_from")
    )
    # same key partitioning -> the second window reuses the Exchange
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return cps.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Apply a log batch to an existing SCD2 table; returns the new SCD2
    table, row-identical to ``scd2_from_log`` over the combined log.

    ``history`` must carry ``key_cols + attr_cols + valid_from``
    (``valid_to``/``is_current`` are recomputed); ``updates`` is a raw
    log batch (``key_cols + order_col + attr_cols``).

    Plan shape: the batch's distinct keys split history with one
    semi/anti join pair (small side broadcastable); only touched keys'
    versions — O(batch keys x versions-per-key), not O(history) — enter
    the re-derivation window. Untouched history passes through
    untouched, so in a partition-pruned store only touched key buckets
    are rewritten.

    Ordering guard: every update must land strictly AFTER its key's
    current ``valid_from`` (new keys are unconstrained). The SCD2 table
    collapses repeat observations, so an update inserted BEFORE the
    current version could fall between two observations history merged
    into one row — the correct post-insert split is unrecoverable from
    the compressed table. Rather than silently diverging from a full
    re-derivation, a violating batch fails the job (``assert_true``,
    same loud-precondition pattern as ngram_jaccard's hot-shingle
    guard); rewriting the past is a replay-the-raw-log operation, not a
    merge. Updates unordered WITHIN the batch (all after the current
    version) interleave exactly.

    The guard is evaluated INSIDE the replay window (per-key max history
    order vs min update order over the same partitioning — zero extra
    joins). Deliberately so: the obvious alternative, joining updates
    against a ``groupBy(key).max(valid_from)`` of history, puts a THIRD
    reference to the history plan into one query, and Spark's
    relation-deduplication then mis-rewrites the window expressions —
    each branch evaluates correctly alone while the combined union plan
    fabricates versions (observed on 4.1: a same-state update produced
    a phantom current row). Single-reference-per-branch construction
    avoids the hazard and is cheaper anyway.
    """
    touched = updates.select(*key_cols).distinct()
    untouched = history.join(touched, key_cols, "left_anti").select(
        *key_cols, *attr_cols, "valid_from",
    )
    # history rows are themselves change points: replaying them as
    # observations (at their valid_from) through the same derivation is
    # lossless, and interleaves (guard-checked) updates exactly
    touched_log = (
        history.join(touched, key_cols, "left_semi")
        .select(
            *key_cols,
            F.col("valid_from").alias(order_col),
            *attr_cols,
            F.lit(True).alias("__scd_is_hist"),
        )
        .unionByName(
            updates.select(*key_cols, order_col, *attr_cols)
            .withColumn("__scd_is_hist", F.lit(False))
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    w_all = Window.partitionBy(*key_cols)
    hist_o = F.when(F.col("__scd_is_hist"), F.col(order_col))
    upd_o = F.when(~F.col("__scd_is_hist"), F.col(order_col))
    guard_ok = (
        F.min(upd_o).over(w_all).isNull()
        | F.max(hist_o).over(w_all).isNull()
        | (F.min(upd_o).over(w_all) > F.max(hist_o).over(w_all))
    )
    lagged = touched_log.select(
        *key_cols,
        order_col,
        *attr_cols,
        F.row_number().over(w).alias("__scd_rn"),
        *[F.lag(c).over(w).alias(f"__scd_prev_{c}") for c in attr_cols],
        F.assert_true(
            guard_ok,
            F.concat(
                F.lit("scd2_merge: a batch update is not strictly after "
                      "its key's current version (key window min update "
                      "order <= max history order) — rewriting the past "
                      "needs a raw-log replay"),
            ),
        ).alias("__scd_guard"),
    ).where(F.col("__scd_guard").isNull()).drop("__scd_guard")
    is_new_version = (F.col("__scd_rn") == 1) | _any_changed(attr_cols)
    cps = lagged.where(is_new_version).select(
        *key_cols, *attr_cols, F.col(order_col).alias("valid_from")
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    rederived = cps.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    # recompute the interval bounds for untouched keys too (they are
    # unchanged by construction — one window over already-final rows —
    # but recomputing keeps a single code path and output schema)
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    closed_untouched = untouched.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return closed_untouched.unionByName(rederived)
