"""Custom stateful streaming operator: per-conversation running validation.

The batch engine validates conversations it can see whole (one window pass
per batch). On a continuous feed, a conversation's turns arrive across
micro-batches — ordering/contiguity checks need **state**. This module is
the Structured Streaming analog of the window pass in compiler.py:
``applyInPandasWithState`` keeps per-conv_id (n_turns, max_turn_idx,
max_ts, violation counters) across batches and emits one summary row per
conversation when its event-time timeout fires (no new turns for
``inactivity_ms`` past the watermark — i.e. the conversation is complete
as far as the watermark can tell).

Scale/late-data semantics:

- state is partitioned by conv_id (same key as the batch engine's only
  shuffle); Spark's state store scales it per-executor and checkpoints it,
- the watermark bounds both state size (timed-out convs are dropped) and
  late data (turns older than the watermark are not delivered to the
  operator at all — the standard tradeoff, tested in
  tests/test_skew_and_streaming.py),
- the pandas group iterator is Arrow-batched: no per-row Python outside
  the grouped fold.

Reference parity: the emitted per-conversation row carries the same
violation classes as the batch suite's window checks (duplicate/gap
turn_idx, ts regressions — operators/ordering.py) so a streaming
deployment degrades to "summaries now, exact violation rows on the
nightly batch run".
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx long, "
    "n_dup_or_gap long, n_ts_regressions long, complete boolean"
)
STATE_SCHEMA = (
    "n_turns long, max_turn_idx long, max_ts_us long, "
    "n_dup_or_gap long, n_ts_regressions long"
)


def make_update_fn(inactivity_ms: int):
    """Build the applyInPandasWithState update function (a closure so the
    timeout rides pickling to the Python workers — module globals do NOT:
    workers re-import the module and would see the default)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n_turns, max_turn, _max_ts, dupgap, regr = state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": key[0], "n_turns": n_turns,
                "max_turn_idx": max_turn, "n_dup_or_gap": dupgap,
                "n_ts_regressions": regr, "complete": True,
            }])
            return

        n_turns, max_turn, max_ts_us, dupgap, regr = (
            state.get if state.exists else (0, -1, -(2 ** 62), 0, 0)
        )
        # Spark does NOT pre-filter late input for this operator (unlike
        # windowed aggregation) — the operator drops rows behind the
        # watermark itself, matching aggregation semantics
        wm_ms = state.getCurrentWatermarkMs()
        newest_us = max_ts_us
        kept = 0
        for pdf in pdfs:
            # within-batch order: the stable (turn_idx, ts) sort; across
            # batches the running maxima in state keep checks correct
            pdf = pdf.sort_values(["turn_idx", "ts"])
            # unit/tz-agnostic event time in microseconds (Arrow may hand
            # ns or us resolution, naive or UTC-aware)
            ts_us = (
                pd.to_datetime(pdf["ts"], utc=True)
                .dt.tz_localize(None)
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64")
            )
            for turn, t_us in zip(pdf["turn_idx"].tolist(), ts_us.tolist()):
                if wm_ms > 0 and t_us // 1000 < wm_ms:
                    continue  # late turn: behind the watermark, dropped
                if turn != max_turn + 1:
                    dupgap += 1
                if t_us < max_ts_us:
                    regr += 1
                max_turn = max(max_turn, int(turn))
                max_ts_us = max(max_ts_us, int(t_us))
                newest_us = max(newest_us, int(t_us))
                n_turns += 1
                kept += 1
        if not state.exists and kept == 0:
            return  # only late data for an unknown conversation
        state.update((n_turns, max_turn, max_ts_us, dupgap, regr))
        # conversation "complete" once the watermark passes its newest
        # event time + inactivity; Spark rejects a timeout behind the
        # current watermark, so clamp
        state.setTimeoutTimestamp(
            max(newest_us // 1000 + inactivity_ms, wm_ms + 1)
        )
        if kept:
            yield pd.DataFrame([{
                "conv_id": key[0], "n_turns": n_turns,
                "max_turn_idx": max_turn, "n_dup_or_gap": dupgap,
                "n_ts_regressions": regr, "complete": False,
            }])

    return update


def conversation_state_stream(
    stream_df,
    inactivity_ms: int = 60_000,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    conv_col: str = "conv_id",
):
    """Attach the stateful per-conversation operator to a streaming
    transcripts DataFrame. Returns the (streaming) summaries DataFrame —
    caller picks the sink/trigger. Output mode must be "append"."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    wm = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return (
        wm.select(
            F.col(conv_col).alias("conv_id"),
            F.col("turn_idx"),
            F.col(ts_col).alias("ts"),
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_update_fn(inactivity_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
