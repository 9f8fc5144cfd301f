"""Skew-handling utilities: salted two-phase aggregation.

north_rule: "salted repartitioning on skewed conv_id hot keys". Zipf-skewed
conv_ids make single-phase ``groupBy(conv_id)`` aggregations straggle: one
reducer gets the hot key's entire row set. The standard fix is two-phase
aggregation over a salted key:

    phase 1: groupBy(key, salt)  -- hot key split across `n_salts` reducers
    phase 2: groupBy(key)        -- re-aggregate the tiny per-salt partials

Phase-2 input is |keys| x n_salts rows, so the second shuffle is negligible.
Only *algebraic* aggregates (count/sum/min/max + anything with a merge
function, e.g. HLL sketches) can be re-aggregated; the helpers below expose
the common ones.

Note the engine's main pass does NOT need salting for its window checks:
``Window.partitionBy(conv_id)`` skew is bounded by max conversation length
(hot *keys* here are conversations with many rows elsewhere in the cluster,
not unbounded groups). Salting matters for unbounded per-key aggregations —
per-user/day rollups, dedup counts — and for joins, where AQE's
skew-join splitting (enabled in session.py) is the first line of defense.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int = 16, seed: int = 0) -> DataFrame:
    """Deterministic row salt derived from the full row hash (not rand(),
    so retries/recomputation produce identical assignments)."""
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
    return df.withColumn(SALT_COL, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name -> (phase1_agg,
    phase2_reagg_over_phase1_column).

    Example::

        salted_agg(df, ["conv_id"], {
            "n":      (F.count(F.lit(1)),      F.sum("n")),
            "max_ts": (F.max("ts"),            F.max("max_ts")),
        })
    """
    p1 = (
        with_salt(df, n_salts, seed)
        .groupBy(*keys, SALT_COL)
        .agg(*[c.alias(name) for name, (c, _) in aggs.items()])
    )
    return p1.groupBy(*keys).agg(
        *[re_agg.alias(name) for name, (_, re_agg) in aggs.items()]
    )


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase per-key row count (the uniqueness-check shape at scale)."""
    return salted_agg(
        df, keys, {"count": (F.count(F.lit(1)), F.sum("count"))}, n_salts
    )


def skew_profile(
    df: DataFrame,
    keys: list[str],
    k: int = 20,
    n_salts: int = 16,
) -> DataFrame:
    """Top-``k`` hottest keys by row count, with their share of the table
    and their multiple of the mean key size — the MEASUREMENT that decides
    where salting / AQE skew-splitting is needed, run before committing to
    a partitioning. north_rule: "salted repartitioning on skewed conv_id
    hot keys" — this is how the hot keys are found.

    The per-key counting is itself the salted two-phase form (profiling a
    skewed table must not straggle on the very key it is measuring); the
    totals are one map-side-combinable single-row agg over the per-key
    counts, broadcast back; the top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps, no global sort).

    Output: ``keys`` + ``n_rows`` (exact), ``share`` (of all rows) and
    ``x_mean`` (n_rows / mean rows-per-key), both rounded to 6dp.
    """
    counts = salted_count(df, keys, n_salts)
    totals = counts.agg(
        F.sum("count").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    out = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("count").alias("n_rows"),
            F.round(F.col("count") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("count") * F.col("_n_keys") / F.col("_total"), 6
            ).alias("x_mean"),
        )
    )
    order = [F.col("n_rows").desc()] + [F.col(c).asc() for c in keys]
    return out.orderBy(*order).limit(k)


def suggest_salts(
    df: DataFrame,
    keys: list[str],
    target_rows_per_task: int = 1_000_000,
    n_salts: int = 16,
) -> int:
    """Recommended ``n_salts`` for :func:`salted_agg` over ``keys``: the
    hottest key's row count divided by the per-task target, clamped to
    [1, 4096]. One salted count + a single-row max agg — cheap enough to
    run per release and feed the next run's configuration."""
    hot = salted_count(df, keys, n_salts).agg(F.max("count")).first()[0]
    if hot is None:
        return 1
    return max(1, min(4096, -(-int(hot) // int(target_rows_per_task))))
