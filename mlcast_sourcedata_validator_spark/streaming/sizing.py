"""Event-time disorder profiling — measure, don't guess, the watermark.

Every stateful streaming stage in this engine (hourly windowed counts,
``dropDuplicatesWithinWatermark`` dedup, the conversation-state
processors) bounds its keyed state with an event-time watermark, and the
watermark DELAY is a correctness/size dial: too small drops genuinely
late rows from results, too large holds state (and result emission) for
longer than the stream's disorder warrants. The delay should come from
the measured lateness distribution of the feed, not a folklore
constant.

:func:`disorder_profile` computes that distribution over a batch sample
of the stream: an event's lateness is how far it arrived BEHIND the
stream's event-time high-water mark at its arrival point —
``max(ts of earlier-arrived events in the key's stream) - ts``, floored
at 0 for in-order rows. One window shuffle on the key (the same
partitioning the suite's checks ride), exact percentiles over the
lateness column, one summary row out. A watermark delay at/above the
observed p99.9 keeps state bounded while dropping at most the measured
tail; re-profile per release and feed the result into the
``withWatermark`` calls (streaming/conversation_state.py:133,
__spark_entry__.py streaming queries).

``arrival_col`` is the arrival/ingest order proxy (a monotone ingest id
or file sequence). With no true arrival stamp, profiling against ingest
order still upper-bounds the disorder the streaming job will see when
replaying the same feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["disorder_profile"]


def disorder_profile(
    df: DataFrame,
    key_col: str,
    arrival_col: str,
    ts_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One summary row of the stream's event-time disorder:
    ``(n_events, n_late, late_frac, p<q>_late_s ..., max_late_s)``.

    Lateness is computed in integer microseconds (exact under ANSI) and
    reported in seconds rounded to 1e-6; percentiles are exact
    (``F.percentile``) over ALL events — in-order rows contribute 0, so
    the quantiles answer "what delay covers q of the whole feed", not
    just of the already-late slice.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.col(ts_col)).over(w)
    late_us = F.greatest(
        F.lit(0).cast("long"),
        F.unix_micros(prev_max.cast("timestamp"))
        - F.unix_micros(F.col(ts_col).cast("timestamp")),
    )
    late_s = (late_us.cast("double") / F.lit(1_000_000.0))
    enriched = df.select(F.coalesce(late_s, F.lit(0.0)).alias("_late_s"))
    pct = F.percentile("_late_s", F.array(*[F.lit(q) for q in quantiles]))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_late_s") > 0).cast("long")).alias("n_late"),
        F.round(
            F.sum((F.col("_late_s") > 0).cast("long"))
            / F.count(F.lit(1)), 6
        ).alias("late_frac"),
        *[
            F.round(pct[i], 6).alias(
                "p{}_late_s".format(f"{q * 100:g}".replace(".", "_")))
            for i, q in enumerate(quantiles)
        ],
        F.round(F.max("_late_s"), 6).alias("max_late_s"),
    ]
    return enriched.agg(*aggs)
