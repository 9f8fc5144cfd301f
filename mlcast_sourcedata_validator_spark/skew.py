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
            # double-first multiply: a long*long product overflows int64
            # at 10^12 rows x 10^9 keys (and Spark wraps silently)
            F.round(
                F.col("count").cast("double") * F.col("_n_keys")
                / F.col("_total"), 6
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


def compile_hot_keys(spec, suite):
    """Declarative hot-key check: profile the top-k keys and verdict on
    the hottest one. params: key (default suite.conv_col), k (default 5),
    max_x_mean (default 100.0 — hottest key at most 100x the mean key
    size), max_share (optional cap on one key's share of all rows),
    n_salts (profiling salt count), severity ('WARNING' default: skew is
    an operational hazard, not data corruption — pass 'FAIL' to gate),
    method ('salted' default; 'sketch' switches the profile to the
    bounded-state Misra-Gries path in functions/sketch.py for key spaces
    that no longer fit the salted count's per-key hash aggregation —
    counts stay exact, share exact, x_mean ~2% approximate via HLL),
    capacity (sketch counters per partition, default 4096).

    Runs as a DriverCheck with its own bounded two-jobs (salted two-phase
    count + TakeOrdered top-k): per-key aggregation CANNOT ride the fused
    single-scan Observation, and profiling a skewed table must itself be
    salted. Detail carries the top offenders and the suggested n_salts
    for salted_agg so the finding is directly actionable.
    """
    from .report import FAIL, PASS, WARNING, ValidationReport, stamp
    from .suite import DriverCheck

    key = spec.params.get("key") or suite.conv_col
    k = int(spec.params.get("k", 5))
    max_x_mean = float(spec.params.get("max_x_mean", 100.0))
    max_share = spec.params.get("max_share")
    n_salts = int(spec.params.get("n_salts", 16))
    severity = spec.params.get("severity", WARNING)
    method = spec.params.get("method", "salted")
    capacity = int(spec.params.get("capacity", 4096))
    if severity not in (WARNING, FAIL):
        raise ValueError(f"hot_keys severity must be WARNING or FAIL, "
                         f"got {severity!r}")
    if method not in ("salted", "sketch"):
        raise ValueError(f"hot_keys method must be 'salted' or 'sketch', "
                         f"got {method!r}")

    def _sketch_profile(ctx):
        """Bounded-state profile for key spaces that no longer fit the
        salted count's per-key hash aggregation (10^9+ distinct keys):
        Misra-Gries candidates + exact recount for the top rows
        (functions/sketch.py — counts exact, certified or flagged), one
        extra single-row agg for total/HLL key-count, so `share` is
        exact and `x_mean` approximate (~2% HLL rsd) — both fine for an
        operational-hazard verdict and labelled in the detail."""
        from pyspark.sql import functions as F

        from .functions.sketch import heavy_hitters

        keys_df = ctx.df.select(F.col(key).cast("string").alias("key"))
        hh = heavy_hitters(keys_df, key_col="key", k=k, capacity=capacity,
                           on_inconclusive="warn_column").collect()
        tot = ctx.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(key).alias("n_keys"),
        ).first()
        n, n_keys = int(tot["n"]), max(1, int(tot["n_keys"]))
        return [
            {key: r["key"], "n_rows": r["n"],
             "share": r["n"] / n if n else 0.0,
             "x_mean": r["n"] * n_keys / n if n else 0.0}
            for r in hh
        ]

    def fn(ctx) -> ValidationReport:
        report = ValidationReport()
        if method == "sketch":
            top = _sketch_profile(ctx)
        else:
            top = skew_profile(ctx.df, [key], k=k, n_salts=n_salts).collect()
        if not top:
            report.add(spec.section, spec.requirement, PASS,
                       f"no rows — no {key} skew")
            return stamp(report, __name__, "compile_hot_keys")
        hot = top[0]
        over = hot["x_mean"] > max_x_mean or (
            max_share is not None and hot["share"] > float(max_share))
        note = (" [sketch profile: counts exact, x_mean ~2% HLL rsd]"
                if method == "sketch" else "")
        if over:
            salts = max(1, min(4096, round(hot["x_mean"] ** 0.5)))
            offenders = ", ".join(
                f"{r[key]}={r['n_rows']} ({r['x_mean']:.1f}x mean)"
                for r in top if r["x_mean"] > max_x_mean
            ) or f"{hot[key]}={hot['n_rows']} ({hot['x_mean']:.1f}x mean)"
            report.add(
                spec.section, spec.requirement, severity,
                f"hot {key}(s): {offenders}; salted two-phase aggregation "
                f"recommended (suggested n_salts~{salts}) — see "
                f"skew.salted_agg{note}")
        else:
            report.add(
                spec.section, spec.requirement, PASS,
                f"hottest {key} = {hot[key]} at {hot['x_mean']:.1f}x the "
                f"mean key size (share {hot['share']:.4%}), within "
                f"max_x_mean={max_x_mean}{note}")
        return stamp(report, __name__, "compile_hot_keys")

    return DriverCheck(spec.check_id, fn)
