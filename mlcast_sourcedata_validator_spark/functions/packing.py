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


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """(id, [partition_col], n_tokens, start_offset, pack_id,
    pack_offset, straddles_boundary) under the concat-then-chunk layout.

    ``order_col`` defaults to ``id_col`` (any deterministic total order
    works — determinism is what makes the layout reproducible across
    retries). ``partition_col`` packs within shards (the scale path);
    ``None`` packs one global stream.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
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
