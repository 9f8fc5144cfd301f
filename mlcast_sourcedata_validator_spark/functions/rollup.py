"""Incremental keyed rollups: algebraic partial aggregation + merge.

The hypertable-rollup analog for a 10^12-turn transcripts table: a
per-conversation (or per-user, per-day, ...) summary table that is
MAINTAINED INCREMENTALLY — each new date partition is rolled up alone
(one scan of just the new data, partition-pruned) and merged into the
existing rollup with an aggregation over rollup ROWS (|keys| rows, not
|turns| rows). The full-history recompute never happens after day one.

Correctness contract: every spec is *algebraic* — ``merge(rollup(A),
rollup(B)) == rollup(A ∪ B)`` for ANY split of the input — the same
requirement :mod:`..skew`'s two-phase salted aggregation imposes, and the
same (partial, merge) pair convention. count/sum/min/max qualify; so do
sums of indicator expressions (role counts) and HLL sketch buffers.
Averages/ratios are DERIVED at read time from merged sums
(:func:`with_derived`), never merged directly.

At scale: the delta rollup's groupBy gets map-side partial aggregation
(rows arrive grouped by conv within a shard, so partials are tiny); the
merge shuffles only rollup rows. A Zipf-hot conv_id is bounded by max
conversation length, and the merge side is one row per (conv, source) —
no salting needed on either phase.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: output name -> (partial agg over raw turns, merge agg over rollup rows)
RollupSpecs = dict[str, tuple[Column, Column]]


def transcript_rollup_specs(
    text_col: str = "text", role_col: str = "role",
    tool_col: str = "tool", ts_col: str = "ts", turn_col: str = "turn_idx",
) -> RollupSpecs:
    """The flagship per-conversation summary for the input_hint schema.

    Every stat is algebraic; chars/token sums accumulate in DECIMAL so
    merge order can never perturb them (same rationale as the streaming
    aggregates in ``__spark_entry__``).
    """
    def _n(pred: Column) -> Column:
        return F.sum(F.when(pred, 1).otherwise(0))

    return {
        "n_turns": (F.count(F.lit(1)), F.sum("n_turns")),
        "first_ts": (F.min(ts_col), F.min("first_ts")),
        "last_ts": (F.max(ts_col), F.max("last_ts")),
        "min_turn_idx": (F.min(turn_col), F.min("min_turn_idx")),
        "max_turn_idx": (F.max(turn_col), F.max("max_turn_idx")),
        # pinned to decimal(38,0) on BOTH sides: Spark widens sum(decimal
        # (p,s)) to decimal(p+10,s), so an unpinned merge would change the
        # stored type at every merge depth — schema drift in the rollup
        # table itself
        "total_chars": (
            F.sum(F.coalesce(F.length(text_col), F.lit(0)).cast("decimal(28,0)"))
            .cast("decimal(38,0)"),
            F.sum("total_chars").cast("decimal(38,0)"),
        ),
        "n_user": (_n(F.col(role_col) == "user"), F.sum("n_user")),
        "n_assistant": (_n(F.col(role_col) == "assistant"), F.sum("n_assistant")),
        "n_system": (_n(F.col(role_col) == "system"), F.sum("n_system")),
        "n_tool_calls": (_n(F.col(tool_col).isNotNull()), F.sum("n_tool_calls")),
    }


def table_rollup_specs(
    conv_col: str = "conv_id", text_col: str = "text", ts_col: str = "ts",
    lg_config_k: int = 12,
) -> RollupSpecs:
    """TABLE-level incremental stats (``keys=[]`` — one row per
    partition delta): row count, ts coverage, char mass, and a
    **mergeable HLL sketch** of distinct conversations.

    The sketch is the piece that makes whole-corpus cardinality
    incremental: ``hll_sketch_agg`` over each new partition (a few KB of
    binary state, survives the parquet delta write), ``hll_union_agg``
    at merge — distinct-conv count over 10^12 rows without ever
    rescanning history, with HLL's standard ~1-2% relative error at
    lg_config_k=12. Estimate with
    ``F.hll_sketch_estimate("conv_sketch")`` after the merge.
    """
    return {
        "n_turns": (F.count(F.lit(1)), F.sum("n_turns")),
        "first_ts": (F.min(ts_col), F.min("first_ts")),
        "last_ts": (F.max(ts_col), F.max("last_ts")),
        "total_chars": (
            F.sum(F.coalesce(F.length(text_col), F.lit(0)).cast("decimal(28,0)"))
            .cast("decimal(38,0)"),
            F.sum("total_chars").cast("decimal(38,0)"),
        ),
        "conv_sketch": (
            F.hll_sketch_agg(conv_col, F.lit(lg_config_k)),
            F.hll_union_agg("conv_sketch"),
        ),
    }


def keyed_rollup(df: DataFrame, keys: list[str], specs: RollupSpecs) -> DataFrame:
    """Roll raw rows up to one row per key (the partial-aggregate pass).

    Run this over a NEW partition only; merge into the standing rollup
    with :func:`merge_rollups`.
    """
    return df.groupBy(*keys).agg(
        *[c.alias(name) for name, (c, _) in specs.items()]
    )


def merge_rollups(
    parts: list[DataFrame], keys: list[str], specs: RollupSpecs
) -> DataFrame:
    """Merge rollup tables produced by :func:`keyed_rollup` (or by prior
    merges — the operation is associative). Shuffles only rollup rows:
    O(sum of |keys| per part), independent of raw input size."""
    if not parts:
        raise ValueError("merge_rollups needs at least one part")
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(*keys).agg(
        *[re_agg.alias(name) for name, (_, re_agg) in specs.items()]
    )


def contiguity_audit(
    rollup: DataFrame, conv_col: str = "conv_id", base_turn: int = 0
) -> DataFrame:
    """Cross-partition turn-contiguity audit over the MERGED rollup.

    The per-partition window checks (operators/ordering.py) see one date
    partition at a time, so a gap or duplicate that straddles a partition
    boundary — day 1 ends at turn 4, day 2 resumes at turn 6 — is
    invisible to them. The merged rollup sees every partition's
    contribution, and contiguity is decidable from algebraic stats alone:
    a conversation is contiguous from ``base_turn`` iff

        min_turn_idx == base_turn  and
        n_turns == max_turn_idx - min_turn_idx + 1

    Cost: O(#conversations) rollup rows, no raw-table scan. Returns the
    violating conversations with a reason column.

    Residual blind spot (documented): a cross-boundary duplicate that
    exactly compensates a cross-boundary gap keeps ``n_turns`` equal to
    the span and passes this audit; only the whole-table uniqueness
    check (or an exact distinct count, which is not algebraic) separates
    that pair. Each anomaly alone IS caught here.
    """
    span = F.col("max_turn_idx") - F.col("min_turn_idx") + F.lit(1)
    return (
        rollup.withColumn(
            "reason",
            F.when(F.col("min_turn_idx") != base_turn, F.lit("bad_first_turn"))
            .when(F.col("n_turns") < span, F.lit("gap"))
            .when(F.col("n_turns") > span, F.lit("duplicate"))
        )
        .where(F.col("reason").isNotNull())
        .select(conv_col, "n_turns", "min_turn_idx", "max_turn_idx", "reason")
    )


def boundary_audit(
    deltas: DataFrame,
    conv_col: str = "conv_id",
    partition_col: str = "partition_id",
) -> DataFrame:
    """Cross-boundary ORDERING audit over per-partition rollup deltas.

    The per-partition window checks verify ordering INSIDE each date
    partition; :func:`contiguity_audit` verifies the merged turn span.
    What neither sees is HOW the turns are distributed across partitions:

    - ``turn_overlap``: a later partition's min_turn_idx <= an earlier
      partition's max_turn_idx — turns interleave across days (a replayed
      or mis-dated shard), even when the merged span is perfect.
    - ``ts_regression``: a later partition's first_ts < an earlier
      partition's last_ts — event time runs backwards at the boundary,
      invisible to per-partition ts-monotonic checks.

    One window over (conv, partition) DELTA rows — O(#convs x
    #partitions-each-conv-touches), typically 1-3 rows per conv; no
    raw-table scan. Partitions are ordered by ``partition_col`` (date
    strings sort chronologically).

    A compaction base delta (partition_id ``__base-...``) pools many
    source partitions, so boundaries INSIDE it are gone (they were
    auditable before the compaction that folded them) — but its per-conv
    max_turn_idx / last_ts are exactly the historical FRONTIER, so the
    base is ordered FIRST and serves as the predecessor of the earliest
    uncompacted delta: a new partition that interleaves with or
    time-regresses against compacted history is still caught across
    runs.

    Together: local window checks + contiguity_audit + boundary_audit
    decide the full global ordering contract with one raw scan per NEW
    partition, ever.
    """
    from pyspark.sql import Window as W

    # base rows sort before every real partition id (empty sort key)
    order_key = F.when(F.col(partition_col).startswith("__"), F.lit("")) \
        .otherwise(F.col(partition_col))
    w = W.partitionBy(conv_col).orderBy(order_key)
    lag_max_turn = F.lag("max_turn_idx").over(w)
    lag_last_ts = F.lag("last_ts").over(w)
    return (
        deltas
        .select(conv_col, partition_col, "min_turn_idx",
                "max_turn_idx", "first_ts", "last_ts")
        .withColumn(
            "reason",
            F.when(lag_max_turn.isNotNull()
                   & (F.col("min_turn_idx") <= lag_max_turn),
                   F.lit("turn_overlap"))
            .when(lag_last_ts.isNotNull()
                  & (F.col("first_ts") < lag_last_ts),
                  F.lit("ts_regression"))
        )
        .where(F.col("reason").isNotNull())
        .select(conv_col, partition_col, "reason")
    )


def with_derived(rollup: DataFrame) -> DataFrame:
    """Read-time derived metrics over a transcript rollup: mean turn
    length, wall duration, tool-call rate. Kept OUT of the merge cycle —
    ratios are not algebraic."""
    return rollup.withColumn(
        "avg_turn_chars",
        F.round(F.col("total_chars").cast("double") / F.col("n_turns"), 4),
    ).withColumn(
        "duration_sec",
        (F.unix_micros(F.col("last_ts").cast("timestamp"))
         - F.unix_micros(F.col("first_ts").cast("timestamp"))) / 1e6,
    ).withColumn(
        "tool_call_rate",
        F.round(F.col("n_tool_calls") / F.col("n_turns"), 4),
    )
