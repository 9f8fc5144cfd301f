"""Temporal joins Spark lacks as built-ins, expressed scale-first.

- ``asof_join``: for every left row, attach the most recent right row
  (per key) with ``right_ts <= left_ts``. Implemented as union + one
  window pass — a SINGLE shuffle on the join key, no range explosion, no
  per-row Python. This is the standard distributed as-of pattern (vs the
  naive ``left.ts >= right.ts`` theta join, which Spark executes as
  BroadcastNestedLoop/cartesian and which dies at scale).
- ``point_in_interval_join``: match points to intervals containing them
  (``start <= point_ts < end``) by binning time into fixed-width buckets:
  intervals explode into the buckets they overlap, points hash-join on
  their bucket, and the exact predicate filters the candidates. Turns an
  O(n·m) theta join into an equi-join whose cost is (points per bucket) ×
  (intervals per bucket) — AQE-skew-splittable, broadcastable when the
  interval side is small.

Reference parity note: the reference has no joins beyond dict-lookup
referential checks (georeferencing.py:41-65); these operators are part of
the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql import types as T

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_BIN = "__iv_bin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join: latest right row per key with ``right_ts <= left_ts``.

    Returns all left columns plus ``payload_cols`` from the matching right
    row (NULL when no right row precedes, unless ``how='inner'`` which
    drops those). Ties at equal ``right_ts`` within a key are the caller's
    responsibility to pre-aggregate (one right row per (key, ts)) — the
    window otherwise picks an arbitrary one.

    Plan shape: unionByName -> window(partitionBy key, orderBy ts, side)
    with ``last(payload_struct, ignorenulls)`` — one exchange, one sort,
    zero Python. The payload rides in a struct so a NULL *inside* a right
    row is carried through instead of falling back to an older row.

    NULL semantics match the theta-join ``right_ts <= left_ts`` (and the
    equi-join on keys): right rows with a NULL timestamp or a NULL join
    key never match anything — they are filtered from the right branch
    (otherwise NULLS-FIRST window ordering would make a NULL-ts right row
    a match-all earliest row, and NULL keys would pair up via
    partitionBy). Left rows with NULL key/ts simply get a NULL payload.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    if not payload_cols:
        raise ValueError(
            "asof_join needs at least one payload column from the right "
            "side (right has no columns beyond the key and timestamp)"
        )
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")

    payload_type = T.StructType([right.schema[c] for c in payload_cols])
    left_only = [c for c in left.columns if c not in set(on) | {left_ts}]
    l2 = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *left_only,
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    null_match = F.col(right_ts).isNull()
    for k in on:
        null_match = null_match | F.col(k).isNull()
    right = right.where(~null_match)
    r2 = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    # side 0 sorts before side 1: a right row at exactly left_ts matches (<=)
    w = (
        W.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        l2.unionByName(r2)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == 1)
    )
    if how == "inner":
        filled = filled.where(F.col(_PAYLOAD).isNotNull())
    return filled.select(
        *on,
        F.col(_TS).alias(left_ts),
        *left_only,
        *[F.col(_PAYLOAD)[c].alias(c) for c in payload_cols],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_sec: int,
    how: str = "inner",
    max_bins_per_interval: int | None = 10_000,
) -> DataFrame:
    """Join points to the intervals containing them: start <= ts < end.

    Both sides get a time-bucket column (``floor(us / bin_width)``);
    intervals are exploded into every bucket they overlap (``sequence``,
    JVM-side), then an equi-join on the bucket + the exact range predicate.
    Choose ``bin_width_sec`` near the typical interval length so each
    interval lands in ~2 buckets.

    Guards: empty/inverted intervals (``end <= start`` — end is exclusive)
    are dropped before exploding, matching the theta-join result, instead
    of silently producing descending junk sequences. An interval spanning
    more than ``max_bins_per_interval`` buckets fails the job with a clear
    error (``assert_true``) rather than silently exploding into span/bin
    rows — e.g. a 1-year interval at 60s bins is ~525k rows *per interval*;
    pick a wider ``bin_width_sec`` or raise/None the limit deliberately.

    Returns points.* + intervals.* matched pairs (column names must not
    collide). ``how='left_outer'`` keeps unmatched points with NULL
    interval columns.
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between sides: {clash}")
    binw = int(bin_width_sec) * 1_000_000

    def _bin(c: Column) -> Column:
        return F.floor(F.unix_micros(c.cast("timestamp")) / binw)

    p = points.withColumn(_BIN, _bin(F.col(point_ts)))
    # end <= start is an empty interval under the exclusive end — the
    # theta join matches nothing, so dropping the row is exact (and stops
    # F.sequence from emitting a descending run of junk bins)
    intervals = intervals.where(F.col(end_ts) > F.col(start_ts))
    if max_bins_per_interval is not None:
        n_bins = (
            _bin(F.expr(f"{end_ts} - interval 1 microsecond"))
            - _bin(F.col(start_ts)) + 1
        )
        # assert_true inside the filter cannot be pruned; it throws with
        # the offending span instead of letting the explode run away
        guard = F.assert_true(
            n_bins <= F.lit(int(max_bins_per_interval)),
            F.concat(
                F.lit("point_in_interval_join: interval spans "),
                n_bins.cast("string"),
                F.lit(f" bins (> max_bins_per_interval="
                      f"{int(max_bins_per_interval)}); widen bin_width_sec"),
            ),
        )
        intervals = intervals.where(guard.isNull())
    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin(F.col(start_ts)),
                _bin(F.expr(f"{end_ts} - interval 1 microsecond")),
            )
        ),
    )
    pred = (
        (p[_BIN] == iv[_BIN])
        & (p[point_ts] >= iv[start_ts])
        & (p[point_ts] < iv[end_ts])
    )
    joined = p.join(iv, pred, how)
    return joined.select(
        *[p[c] for c in points.columns], *[iv[c] for c in intervals.columns]
    )
