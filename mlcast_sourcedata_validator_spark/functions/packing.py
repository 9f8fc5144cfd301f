"""Sequence packing: assign documents to fixed-token-budget training
packs — the "concatenate the corpus, chunk every N tokens" layout GPT-
style pretraining uses.

Semantics are the exact concat-then-chunk stream: documents are laid out
in a deterministic order, a document's pack is the chunk its FIRST token
falls into, and a ``straddles_boundary`` flag marks documents split
across chunks (the consumer decides whether to break or shift them).
Everything is exclusive-prefix-sum + integer arithmetic over one window
— deterministic, oracle-checkable, no Python in the row path.

Scale note: a single global ordering is one window partition = one task.
Real corpora pack WITHIN SHARDS (``partition_col``: a date, source, or
hash bucket — shards are independent training streams anyway), which
makes the window a per-shard sort that parallelizes across the cluster;
the global form exists for small corpora and oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _estimated_bytes

#: Catalyst size estimate above which the GLOBAL (partition_col=None)
#: form refuses to run: one unpartitioned window = ONE task sorting the
#: whole corpus, and past ~this volume that task is a silent
#: hours-long straggler rather than a layout choice. 256 MiB of input
#: is far beyond any oracle/small-corpus use and far below where the
#: single task becomes pathological — callers who truly want a bigger
#: global stream opt in explicitly with allow_global_over_estimate.
GLOBAL_PACK_MAX_BYTES = 256 << 20


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_col: str | None = None,
    partition_col: str | None = None,
    allow_global_over_estimate: bool = False,
) -> DataFrame:
    """(id, [partition_col], n_tokens, start_offset, pack_id,
    pack_offset, straddles_boundary) under the concat-then-chunk layout.

    ``order_col`` defaults to ``id_col`` (any deterministic total order
    works — determinism is what makes the layout reproducible across
    retries). ``partition_col`` packs within shards (the scale path);
    ``None`` packs one global stream and RAISES when Catalyst's size
    estimate exceeds :data:`GLOBAL_PACK_MAX_BYTES` (the global window is
    one task — at corpus scale that's a scale-killer that must not be
    invokable silently; pass ``allow_global_over_estimate=True`` or a
    ``partition_col`` to proceed).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if partition_col is None and not allow_global_over_estimate:
        est = _estimated_bytes(df)
        # Long.MaxValue is Catalyst's "unknown" sentinel (e.g. python-
        # local relations) — only a REAL estimate (file scans propagate
        # actual sizes) can prove the input too big to sort in one task
        if est is not None and est != (1 << 63) - 1 \
                and est > GLOBAL_PACK_MAX_BYTES:
            raise ValueError(
                f"pack_sequences(partition_col=None) would sort an input "
                f"estimated at {est} bytes (> {GLOBAL_PACK_MAX_BYTES}) in "
                f"ONE window task; pass partition_col to pack within "
                f"shards, or allow_global_over_estimate=True to accept "
                f"the single-task global stream"
            )
    order = order_col or id_col
    w = (Window.partitionBy(partition_col) if partition_col
         else Window.partitionBy()).orderBy(F.col(order).asc())
    toks = F.col(tokens_col).cast("long")
    start = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    out_cols = [F.col(id_col)]
    if partition_col:
        out_cols.append(F.col(partition_col))
    return df.select(
        *out_cols,
        toks.alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start % budget).alias("pack_offset"),
        (F.floor((start + F.greatest(toks, F.lit(1).cast("long")) - 1)
                 / budget) > F.floor(start / budget))
        .alias("straddles_boundary"),
    )


def tail_by_budget(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    weight: "F.Column",
    budget: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key SUFFIX selection under a weight budget: keep each key's
    most-recent rows (descending ``order_col``) while their inclusive
    running weight stays <= ``budget``.

    The context-window prep op: "each conversation's latest turns that
    fit in K tokens". One key-window pass (descending running sum), no
    self-join; per-key work is bounded by conversation length, so the
    window skew profile matches the engine's other conv-keyed passes.

    The running sum accumulates in DECIMAL so the kept-set boundary is
    reproducible bit-for-bit across engines and retries (a float cumsum
    is order-deterministic here, but decimal removes representation
    doubt for oracle comparison). A single row heavier than the budget
    is dropped — the contract is "suffix whose total fits", not "at
    least one row".

    Weights MUST be non-negative — a negative weight makes the running
    sum non-monotone and the kept set stops being a contiguous suffix —
    so a negative weight fails the job loudly (raise_error riding the
    same projection) instead of silently corrupting the selection.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    checked = F.when(weight >= 0, weight).otherwise(
        F.raise_error(F.concat(
            F.lit("tail_by_budget: negative weight "),
            weight.cast("string"),
        ))
    )
    w = Window.partitionBy(*key_cols).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = F.sum(checked.cast("decimal(18,2)")).over(w)
    return (
        df.withColumn("__running", running)
        .where(F.col("__running") <= budget)
        .drop("__running")
    )
