"""Streaming validation: run the CheckSuite on each micro-batch.

The reference is strictly batch (SURVEY.md §2B: no streaming surface); the
north_rule's resumability contract is met by per-partition batch commits.
This module is the cheap extension the survey anticipated: a
``foreachBatch`` wrapper so the same compiled suite validates a continuous
transcript feed — new files landing in the table directory, a Kafka topic,
or a rate source — with Structured Streaming's own checkpointing providing
exactly-once batch tracking.

Per micro-batch the engine runs the identical fused single-scan plan, so
batch and streaming validation semantics are the same by construction
(checks whose meaning is global — temporal coverage, drift — are evaluated
per micro-batch, i.e. over the batch's own rows).

Because ``partition_id`` is set per micro-batch, the suite compiles
PARTITION-SCOPED (compiler.py `_PARTITION_SCOPED_KINDS`): turn-contiguity
checks internal gaps only — a conversation legitimately continues across
micro-batches, so "first turn in this batch is 0" would false-FAIL every
continuing conversation. The global start-at-0 / cross-boundary half of
the ordering contract belongs to the rollup audits
(functions/rollup.py `contiguity_audit` / `boundary_audit`) run over the
accumulated store, exactly as in the partitioned batch flow.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..compiler import SuiteRunResult, run_suite
from ..suite import CheckSuite, RunContext


def validate_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    suite: CheckSuite,
    checkpoint_dir: str,
    run_id: str,
    registry_df: Optional[DataFrame] = None,
    baseline_df: Optional[DataFrame] = None,
    on_batch: Optional[Callable[[int, SuiteRunResult], None]] = None,
    trigger_available_now: bool = True,
):
    """Attach the suite to a streaming DataFrame via foreachBatch.

    Returns the StreamingQuery. With ``trigger_available_now`` the query
    drains everything currently available and stops — the pattern for
    incremental validation jobs scheduled by an external orchestrator.
    """

    def _validate(batch_df: DataFrame, batch_id: int) -> None:
        ctx = RunContext(
            spark=spark, df=batch_df, suite=suite,
            run_id=f"{run_id}-b{batch_id}", partition_id=f"batch_{batch_id}",
            registry_df=registry_df, baseline_df=baseline_df,
        )
        res = run_suite(ctx)
        if on_batch is not None:
            on_batch(batch_id, res)

    writer = stream_df.writeStream.foreachBatch(_validate).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
