"""Streaming windowed heavy hitters: per-window Misra-Gries state under
``applyInPandasWithState``.

The batch form (functions/sketch.py) bounds per-partition state at
``capacity`` counters; this is the streaming composition the same way
``conversation_state.py`` is the streaming composition of the batch
ordering checks: one state slot PER EVENT-TIME WINDOW holding a
Misra-Gries summary of the window's key stream, updated per micro-batch
(vectorized ``value_counts`` + one decrement step — never a
distinct-key-sized map), snapshot-emitted in append mode with a
monotone ``seq`` so the sink's latest snapshot per window is the
window's summary, and evicted by event-time timeout once the watermark
passes the window end. Unbounded key cardinality therefore costs
O(windows_in_flight x capacity) state — the native
``groupBy(window, key).count()`` alternative holds every distinct key
in the state store until the watermark closes the window.

Exactness contract mirrors the batch operator: counts are exact (no
decrement ever ran) while the window's distinct-key count stays within
``capacity`` — the fixture regime the extras oracle pins — and a
provable superset of every key with in-window count > N_w/(capacity+1)
otherwise (unit-tested under forced saturation); an offline recount of
the candidates (functions/sketch.py pass 2) upgrades saturated windows
to exact.

Late rows: Spark does not pre-filter late input for this operator (see
conversation_state.py) — rows whose window end is behind the current
watermark are dropped here, and never resurrect an evicted window's
state.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Iterator, Tuple

import pandas as pd

from ..functions.sketch import _mg_shrink

OUTPUT_SCHEMA = "w_start timestamp, key string, est long, seq long"
STATE_SCHEMA = "keys array<string>, counts array<long>, seq long"


def make_update_fn(capacity: int, window_ms: int):
    """Closure carrying capacity + window duration to the Python workers
    (module globals do not survive re-import there — see
    conversation_state.make_update_fn)."""

    def update(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed the window end: final snapshot is already
            # in the sink; just release the state slot
            state.remove()
            return
        w_start = pd.Timestamp(key[0])
        w_end_ms = w_start.value // 1_000_000 + window_ms
        wm_ms = state.getCurrentWatermarkMs()
        if w_end_ms <= wm_ms:
            # late rows for a closed (possibly already-evicted) window:
            # drop them; never resurrect state behind the watermark
            return
        if state.exists:
            keys, counts, seq = state.get
            mg: Counter = Counter(dict(zip(keys, counts)))
        else:
            mg, seq = Counter(), 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            vc = pdf["key"].value_counts()
            mg.update(dict(zip(vc.index, vc.to_numpy())))
            _mg_shrink(mg, capacity)
        if n_new == 0 and not state.exists:
            return
        seq += 1
        state.update(
            ([str(k) for k in mg.keys()],
             [int(v) for v in mg.values()], seq)
        )
        # evict once the watermark passes the window end (clamped: Spark
        # rejects a timeout at/behind the current watermark)
        state.setTimeoutTimestamp(max(w_end_ms, wm_ms + 1))
        if mg:
            yield pd.DataFrame({
                "w_start": [w_start] * len(mg),
                "key": list(mg.keys()),
                "est": [int(v) for v in mg.values()],
                "seq": [seq] * len(mg),
            })

    return update


def hot_keys_stream(
    stream_df,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    capacity: int = 1024,
):
    """Attach the windowed Misra-Gries operator to a streaming frame.
    Returns the (streaming) snapshots DataFrame — caller picks sink and
    trigger; output mode must be "append". Read the sink with
    :func:`latest_topk_sql`."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    window_ms = _duration_ms(window)
    wm = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return (
        wm.select(
            F.window(F.col(ts_col), window).start.alias("w_start"),
            F.col(key_col).cast("string").alias("key"),
            # the watermarked event-time column must survive the
            # projection for EventTimeTimeout to be legal (the operator
            # itself only reads `key`)
            F.col(ts_col),
        )
        .where(F.col("key").isNotNull())
        .groupBy("w_start")
        .applyInPandasWithState(
            make_update_fn(capacity, window_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def latest_topk_sql(table: str, k: int) -> str:
    """SQL over the drained append sink: the LATEST snapshot per window
    (max seq — earlier snapshots may contain keys later decremented
    away), ranked (est DESC, key ASC) and cut at ``k``."""
    return f"""
        SELECT w_start, key, n FROM (
          SELECT w_start, key, est AS n,
                 row_number() OVER (
                   PARTITION BY w_start ORDER BY est DESC, key ASC) AS rk
          FROM (
            SELECT *, max(seq) OVER (PARTITION BY w_start) AS mseq
            FROM {table}
          ) WHERE seq = mseq
        ) WHERE rk <= {k}
        ORDER BY w_start, n DESC, key"""


def _duration_ms(s: str) -> int:
    """Parse the tiny subset of Spark interval strings used for windows
    ('N second(s)/minute(s)/hour(s)/day(s)')."""
    n, unit = s.split()
    mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000,
            "day": 86_400_000}[unit.rstrip("s")]
    return int(n) * mult
