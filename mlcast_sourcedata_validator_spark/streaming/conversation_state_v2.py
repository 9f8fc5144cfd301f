"""Per-conversation running validation on the Spark 4 stateful API.

Same operator as ``conversation_state.py`` (running turn counts,
duplicate/gap + ts-regression counters, completion on inactivity), ported
to ``transformWithStateInPandas`` + ``StatefulProcessor`` — the successor
of ``applyInPandasWithState`` with typed state (ValueState), explicit
timers, and per-state TTL. Keeping both demonstrates the full stateful
surface; new code should prefer this one.

Differences from the v1 operator that matter here:

- state is a named ``ValueState`` (schema'd, queryable via the state
  store APIs) instead of a positional tuple,
- timers are registered through the handle (``registerTimer``) and fire
  into ``handleExpiredTimer`` — no hasTimedOut branch inside the input
  path,
- with ``timeMode='eventTime'`` Spark itself drops rows behind the
  watermark before the processor sees them, so the operator needs no
  manual late-row filter (v1 had to drop them itself).

Runtime requirements: the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and the Python
``protobuf`` package (PySpark's TWS driver worker imports
``google.protobuf``). This sandbox lacks protobuf, so
``tests/test_skew_and_streaming.py`` importorskips the e2e test there;
the tested production path remains the v1 ``applyInPandasWithState``
operator, which needs neither.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx long, "
    "n_dup_or_gap long, n_ts_regressions long, complete boolean"
)
STATE_SCHEMA = (
    "n_turns long, max_turn_idx long, max_ts_us long, "
    "n_dup_or_gap long, n_ts_regressions long"
)


class ConversationProcessor(StatefulProcessor):
    """Fold (turn_idx, ts) per conv_id; emit running summaries and a
    final ``complete=True`` row when the inactivity timer fires."""

    def __init__(self, inactivity_ms: int = 60_000):
        self._inactivity_ms = inactivity_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("conv", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n_turns, max_turn, max_ts_us, dupgap, regr = (
            self._state.get() if self._state.exists()
            else (0, -1, -(2 ** 62), 0, 0)
        )
        newest_us = max_ts_us
        kept = 0
        for pdf in rows:
            pdf = pdf.sort_values(["turn_idx", "ts"])
            ts_us = (
                pd.to_datetime(pdf["ts"], utc=True)
                .dt.tz_localize(None)
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64")
            )
            for turn, t_us in zip(pdf["turn_idx"].tolist(), ts_us.tolist()):
                if turn != max_turn + 1:
                    dupgap += 1
                if t_us < max_ts_us:
                    regr += 1
                max_turn = max(max_turn, int(turn))
                max_ts_us = max(max_ts_us, int(t_us))
                newest_us = max(newest_us, int(t_us))
                n_turns += 1
                kept += 1
        if kept == 0:
            return
        self._state.update((n_turns, max_turn, max_ts_us, dupgap, regr))
        # re-arm the inactivity timer relative to the newest event time
        # (clamped ahead of the watermark, which Spark requires)
        wm_ms = timerValues.getCurrentWatermarkInMs()
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            max(newest_us // 1000 + self._inactivity_ms, wm_ms + 1)
        )
        yield pd.DataFrame([{
            "conv_id": key[0], "n_turns": n_turns,
            "max_turn_idx": max_turn, "n_dup_or_gap": dupgap,
            "n_ts_regressions": regr, "complete": False,
        }])

    def handleExpiredTimer(
        self, key: Any, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._state.exists():
            return
        n_turns, max_turn, _max_ts, dupgap, regr = self._state.get()
        self._state.clear()
        yield pd.DataFrame([{
            "conv_id": key[0], "n_turns": n_turns,
            "max_turn_idx": max_turn, "n_dup_or_gap": dupgap,
            "n_ts_regressions": regr, "complete": True,
        }])

    def close(self) -> None:
        pass


def v2_runtime_gate() -> tuple[bool, str]:
    """Explicit PLATFORM GATE for the transformWithStateInPandas path:
    (available, reason-if-not). PySpark's TWS driver worker imports
    ``google.protobuf`` at runtime — without it the query fails deep
    inside the streaming harness, so availability is probed here,
    driver-side and cheap, and both the operator entry point and the
    e2e test consume THIS gate (the test skip is a declared platform
    condition, not a dangling importorskip)."""
    try:
        import google.protobuf  # type: ignore # noqa: F401
    except ImportError:
        return False, (
            "python 'protobuf' package not importable — PySpark's "
            "transformWithStateInPandas driver worker requires it; "
            "use the v1 applyInPandasWithState operator "
            "(conversation_state.py) on this platform"
        )
    return True, ""


def conversation_state_stream_v2(
    stream_df,
    inactivity_ms: int = 60_000,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    conv_col: str = "conv_id",
):
    """Attach the StatefulProcessor to a streaming transcripts DataFrame
    (append mode, event-time timers). Late rows are dropped by Spark via
    ``eventTimeColumnName`` before reaching the processor. Raises
    ``NotImplementedError`` (fail-fast, driver-side) when
    :func:`v2_runtime_gate` reports the platform cannot run it."""
    ok, reason = v2_runtime_gate()
    if not ok:
        raise NotImplementedError(f"conversation_state_stream_v2: {reason}")
    from pyspark.sql import functions as F

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
        .transformWithStateInPandas(
            statefulProcessor=ConversationProcessor(inactivity_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
