"""Time-series anomaly detection over metric run history.

The engine already audits cross-partition outliers
(``checkpoint.metric_outlier_partitions``, median/MAD across partitions
of one run) and release-over-release violation-rate jumps
(``checkpoint.violation_trend_audit``, prev store vs cur store). What
neither sees is a metric drifting **across many runs of the same
partition**: a null_rate creeping 0.001 -> 0.002 -> 0.004 passes every
absolute threshold and never doubles in one step, yet is exactly the
trend a corpus owner wants surfaced before release 40 fails hard.

These operators treat the checkpointed metrics store (north_star: "per-
partition lineage and metrics to a results table") as the time series it
is. Every detector is a pure window expression over
``(series keys) ORDER BY run order`` — O(runs x partitions x metrics)
rows, never O(data) — so auditing a year of 10^12-row validations costs
one small shuffle of the metrics table, not a re-scan of any corpus.

Detectors (deequ's anomaly-detection strategies, re-expressed as
Catalyst window frames instead of driver loops over collected history):

- :func:`trailing_zscore` — value vs mean/std of the previous ``window``
  points (``ROWS BETWEEN w PRECEDING AND 1 PRECEDING``). The frame
  excludes the current row so a spike cannot mask itself by inflating
  the trailing std (same self-masking concern as the MAD audit).
- :func:`relative_change` — value vs the immediately previous value
  (lag), flagging outside ``[1/max_ratio, max_ratio]``.
- :func:`ewma_residual` — exponentially-weighted moving average over a
  bounded trailing frame, folded with ``F.aggregate`` over the frame's
  ``collect_list`` (num' = num*(1-a) + x, den' = den*(1-a) + 1 — the
  textbook recursive EWMA as a catalyst fold, no Python in the loop).
- :func:`cusum_alarms` — two-sided CUSUM (Page 1954): cumulative
  standardized residuals vs a phase-I baseline; catches the SMALL
  persistent shift the three window detectors structurally miss.

Reference scope note: the reference validator emits absolute verdicts
only (e.g. temporal.py's fixed min/max span); trend auditing across runs
is the corpus-scale extension of its "compare against a requirement"
idea where the requirement is the metric's own history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: std floor: a perfectly flat history has std 0; any deviation would be
#: an infinite z. Flooring at max(min_std, 1e-9) keeps z finite and makes
#: "first change after a flat history" flag with a large-but-finite score.
DEFAULT_MIN_STD = 1e-9


def _series_window(keys: list[str], order_col: str) -> Window:
    return Window.partitionBy(*keys).orderBy(F.col(order_col))


def trailing_zscore(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    *,
    window: int = 7,
    k: float = 3.0,
    min_points: int = 3,
    min_std: float = DEFAULT_MIN_STD,
) -> DataFrame:
    """Score each point against the mean/std of its previous ``window``
    points in the same series.

    Adds columns ``t_n`` (points in the trailing frame), ``t_mean``,
    ``t_std`` (population std of the frame), ``zscore`` (NULL while
    ``t_n < min_points`` — not enough history to judge) and
    ``is_anomaly`` (``|zscore| > k``; NULL zscore => false, warm-up rows
    never flag).

    One shuffle on ``keys`` regardless of history length; the frame is
    row-bounded so state per series is O(window).
    """
    w = (
        _series_window(keys, order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    out = (
        df.withColumn("t_n", F.count(v).over(w))
        .withColumn("t_mean", F.avg(v).over(w))
        .withColumn("t_std", F.coalesce(F.stddev_pop(v).over(w), F.lit(0.0)))
    )
    z = (v - F.col("t_mean")) / F.greatest(F.col("t_std"), F.lit(min_std))
    out = out.withColumn(
        "zscore",
        F.when(F.col("t_n") >= min_points, F.round(z, 6)),
    )
    return out.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) > F.lit(k), F.lit(False)),
    )


def relative_change(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    *,
    max_ratio: float = 2.0,
    min_abs: float = 0.0,
) -> DataFrame:
    """Flag points whose ratio to the previous point leaves
    ``[1/max_ratio, max_ratio]``.

    Adds ``prev_value``, ``ratio`` (NULL on the first point or when the
    previous value is 0 — a 0 -> x step is reported via ``is_anomaly``
    directly when ``x > min_abs``) and ``is_anomaly``. ``min_abs``
    suppresses small-number noise: a count going 1 -> 3 triples but
    means nothing at 10^12-row scale.
    """
    w = _series_window(keys, order_col)
    v = F.col(value_col).cast("double")
    prev = F.lag(v).over(w)
    ratio = F.when(prev != 0, v / prev)
    flag_ratio = F.coalesce(
        (ratio > max_ratio) | (ratio < 1.0 / max_ratio), F.lit(False)
    )
    flag_from_zero = F.coalesce(
        (prev == 0) & (F.abs(v) > min_abs), F.lit(False)
    )
    big_enough = F.greatest(F.abs(v), F.abs(prev)) > min_abs
    return (
        df.withColumn("prev_value", prev)
        .withColumn("ratio", F.round(ratio, 6))
        .withColumn(
            "is_anomaly",
            (flag_ratio | flag_from_zero) & F.coalesce(big_enough, F.lit(False)),
        )
    )


def ewma_residual(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.3,
    window: int = 30,
    k: float = 3.0,
    min_points: int = 3,
    min_std: float = DEFAULT_MIN_STD,
) -> DataFrame:
    """Score each point against the EWMA of its trailing frame.

    The EWMA is folded over the frame's ``collect_list`` (frame rows
    arrive oldest-first) with the recursive form
    ``num' = num*(1-alpha) + x;  den' = den*(1-alpha) + 1`` so
    ``ewma = num/den`` equals ``sum x_i (1-alpha)^(age_i) / sum
    (1-alpha)^(age_i)`` — the standard bias-corrected EWMA — computed
    entirely in Catalyst (one ``aggregate`` higher-order expression; no
    Python, no UDF). The frame is bounded at ``window`` points, which
    truncates weights below ``(1-alpha)^window`` (< 2e-5 at the
    defaults) — the price of a row-bounded state instead of an unbounded
    recursive scan.

    Adds ``t_n``, ``ewma``, ``t_std`` (trailing population std, same
    frame), ``ew_zscore`` (residual / floored std, NULL during warm-up)
    and ``is_anomaly``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = _series_window(keys, order_col).rowsBetween(-window, -1)
    v = F.col(value_col).cast("double")
    hist = F.collect_list(v).over(w)
    decay = F.lit(1.0 - alpha)
    folded = F.aggregate(
        hist,
        F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den")),
        lambda acc, x: F.struct(
            (acc["num"] * decay + x).alias("num"),
            (acc["den"] * decay + F.lit(1.0)).alias("den"),
        ),
    )
    out = (
        df.withColumn("t_n", F.count(v).over(w))
        .withColumn("_fold", folded)
        .withColumn(
            "ewma",
            F.when(F.col("t_n") > 0,
                   F.col("_fold.num") / F.col("_fold.den")),
        )
        .withColumn("t_std", F.coalesce(F.stddev_pop(v).over(w), F.lit(0.0)))
        .drop("_fold")
    )
    z = (v - F.col("ewma")) / F.greatest(F.col("t_std"), F.lit(min_std))
    out = out.withColumn(
        "ew_zscore", F.when(F.col("t_n") >= min_points, F.round(z, 6))
    )
    return out.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("ew_zscore")) > F.lit(k), F.lit(False)),
    )


def metric_history_anomaly(
    metrics_df: DataFrame,
    lineage_df: DataFrame,
    metric: str,
    *,
    strategy: str = "trailing_zscore",
    window: int = 7,
    k: float = 3.0,
    alpha: float = 0.3,
    max_ratio: float = 2.0,
    min_points: int = 3,
    min_abs: float = 0.0,
    flagged_only: bool = True,
) -> DataFrame:
    """Audit one metric's run history per partition in the checkpointed
    results store.

    Joins the metrics store (suite_id, run_id, metric, value,
    partition_id) to lineage for ``committed_at`` (run_ids are opaque
    hex — commit time is the series order; re-runs of the same
    partition are distinct points, which is what an auditor wants: a
    re-validation that suddenly disagrees with its own history is the
    event). Series key = (suite_id, partition_id, metric); detector per
    ``strategy``: 'trailing_zscore' | 'ewma' | 'relative_change' |
    'cusum'.

    Store tables are O(partitions x checks x runs) — the audit never
    touches corpus data. Returns flagged rows only by default, with the
    detector's evidence columns, ordered for report rendering.
    """
    series = (
        metrics_df.where(
            (F.col("metric") == metric) & F.col("value").isNotNull()
        )
        .select("suite_id", "run_id", "partition_id", "metric", "value")
        .join(
            lineage_df.select("run_id", "partition_id", "committed_at"),
            ["run_id", "partition_id"],
        )
    )
    keys = ["suite_id", "partition_id", "metric"]
    if strategy == "trailing_zscore":
        scored = trailing_zscore(
            series, keys, "committed_at", "value",
            window=window, k=k, min_points=min_points,
        )
    elif strategy == "ewma":
        scored = ewma_residual(
            series, keys, "committed_at", "value",
            alpha=alpha, window=window, k=k, min_points=min_points,
        )
    elif strategy == "relative_change":
        scored = relative_change(
            series, keys, "committed_at", "value",
            max_ratio=max_ratio, min_abs=min_abs,
        )
    elif strategy == "cusum":
        # k doubles as the CUSUM alarm threshold h (sigma units; pass
        # k~4-5 for the textbook ARL trade-off); warm-up points double
        # as the phase-I calibration window
        scored = cusum_alarms(
            series, keys, "committed_at", "value",
            threshold_h=k, baseline_points=max(2, min_points),
        ).withColumnRenamed("run_order", "committed_at")
    else:
        raise ValueError(
            "strategy must be 'trailing_zscore', 'ewma', "
            f"'relative_change' or 'cusum', got {strategy!r}"
        )
    if flagged_only:
        scored = scored.where(F.col("is_anomaly"))
    return scored.orderBy("suite_id", "partition_id", "committed_at")


def cusum_alarms(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    *,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    baseline_points: int = 5,
    min_std: float = DEFAULT_MIN_STD,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page 1954,
    the classic SPC chart) — the detector for the failure mode the
    window detectors above structurally miss: a SMALL persistent shift.
    A +0.5 sigma step never trips a 3-sigma z-score and shrinks the
    relative change per step, but its cumulative sum grows without
    bound; CUSUM accumulates standardized residuals

        S+_i = max(0, S+_{i-1} + z_i - k)
        S-_i = max(0, S-_{i-1} - z_i - k)      z_i = (x_i - mu) / sd

    and alarms when either side exceeds ``threshold_h`` (in sigma
    units; the textbook ARL trade-off is k = half the shift to detect,
    h ~ 4-5). mu/sd calibrate on the series' first ``baseline_points``
    points (SPC "phase I"), std floored at ``min_std`` like
    trailing_zscore.

    Execution: ONE groupBy per series collecting the ordered run
    history, then a single Catalyst ``aggregate`` fold emitting the
    full (S+, S-) trajectory as an array, posexploded back to rows —
    no Python, no UDF. The fold carries an array accumulator, so cost
    is O(runs^2) array copying per series: fine for run HISTORIES
    (tens to thousands of points — store tables are O(runs), never
    O(corpus)), wrong for raw event series (use the windowed detectors
    above there).

    Returns one row per input point: keys, ``run_order`` (the order
    value), ``value``, ``cusum_pos``, ``cusum_neg`` (rounded 6dp),
    ``is_anomaly``.
    """
    if baseline_points < 2:
        raise ValueError(
            f"baseline_points must be >= 2, got {baseline_points}")
    if threshold_h <= 0 or slack_k < 0:
        raise ValueError("need threshold_h > 0 and slack_k >= 0")
    v = F.col(value_col).cast("double")
    per_key = df.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    v.alias("v")))
        ).alias("_series")
    )
    base_vals = F.transform(
        F.slice(F.col("_series"), 1, baseline_points), lambda s: s["v"])
    n_b = F.size(base_vals).cast("double")
    mu = F.aggregate(base_vals, F.lit(0.0), lambda a, x: a + x) / n_b
    ex2 = F.aggregate(base_vals, F.lit(0.0), lambda a, x: a + x * x) / n_b
    sd = F.greatest(F.sqrt(F.greatest(ex2 - mu * mu, F.lit(0.0))),
                    F.lit(min_std))
    scored = per_key.withColumn("_mu", mu).withColumn("_sd", sd)
    k_lit = F.lit(float(slack_k))

    def step(acc, s):
        z = (s["v"] - F.col("_mu")) / F.col("_sd")
        sp = F.greatest(F.lit(0.0), acc["sp"] + z - k_lit)
        sn = F.greatest(F.lit(0.0), acc["sn"] - z - k_lit)
        return F.struct(
            sp.alias("sp"), sn.alias("sn"),
            F.concat(acc["out"],
                     F.array(F.struct(sp.alias("sp"),
                                      sn.alias("sn")))).alias("out"),
        )

    folded = F.aggregate(
        F.col("_series"),
        F.struct(F.lit(0.0).alias("sp"), F.lit(0.0).alias("sn"),
                 F.array().cast("array<struct<sp:double,sn:double>>")
                 .alias("out")),
        step,
    )
    zipped = scored.withColumn("_tr", folded["out"]).select(
        *keys,
        F.posexplode(F.arrays_zip("_series", "_tr")).alias("_i", "_z"),
    )
    h = F.lit(float(threshold_h))
    return zipped.select(
        *keys,
        F.col("_z._series.o").alias("run_order"),
        F.col("_z._series.v").alias("value"),
        F.round(F.col("_z._tr.sp"), 6).alias("cusum_pos"),
        F.round(F.col("_z._tr.sn"), 6).alias("cusum_neg"),
        ((F.col("_z._tr.sp") > h) | (F.col("_z._tr.sn") > h))
        .alias("is_anomaly"),
    )
