"""Distribution-drift checks: KS statistic + PSI on binned histograms.

New capability required by the north_rule (no reference analog — the
reference has no drift checks; closest in spirit is its sampled
tool-compatibility transform check, checks/tool_compatibility/
cartopy.py:144-151). Two execution paths, same math:

1. **Fused path** (per-partition runner): the current histogram's bin
   counts are computed inside the single-scan Observation as
   ``sum(when(bucket == i, 1))`` array entries — zero extra passes; KS/PSI
   against the baseline is driver math on n_bins scalars.
2. **Grouped path** (whole-table, per-day drift): ``groupBy(day, bucket)
   .count()`` (tiny shuffle, map-side partials) then a *vectorized
   pandas UDF* via ``applyInPandas`` computes KS/PSI per day against the
   broadcast baseline — the suite's only Python-side compute, batched
   through Arrow (north_star mandate).

KS here is the binned approximation: max |ECDF_a - ECDF_b| evaluated at
bin edges — exact for binned data, bounded error vs the continuous KS
(documented limitation; tested against a pure-numpy reference
implementation at small scale).
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, DriftCheck

_MOD = __name__
_EPS = 1e-6


def log_width_bucket(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Log-spaced bin index in [1, n_bins] (clamped), NULL-safe.

    Expressed with built-in functions only so it stays in whole-stage
    codegen; the same formula is mirrored in the DuckDB oracle SQL.
    """
    x = F.greatest(col.cast("double"), F.lit(float(lo)))
    frac = (F.log(x) - math.log(lo)) / (math.log(hi) - math.log(lo))
    idx = F.floor(frac * n_bins) + 1
    return F.least(F.greatest(idx, F.lit(1)), F.lit(n_bins)).cast("int")


def linear_bucket(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Linear bin index in [1, n_bins] (clamped), NULL-safe."""
    frac = (col.cast("double") - lo) / (hi - lo)
    idx = F.floor(frac * n_bins) + 1
    return F.least(F.greatest(idx, F.lit(1)), F.lit(n_bins)).cast("int")


def ks_psi(counts_a: list[float], counts_b: list[float]) -> tuple[float, float]:
    """Binned KS statistic and PSI between two histograms (pure python/math).

    PSI uses epsilon-smoothed proportions (standard practice to avoid
    log(0)); KS is the max absolute ECDF gap at bin edges.
    """
    na, nb = sum(counts_a), sum(counts_b)
    if na == 0 or nb == 0:
        return float("nan"), float("nan")
    ks = 0.0
    ca = cb = 0.0
    psi = 0.0
    for a, b in zip(counts_a, counts_b):
        ca += a / na
        cb += b / nb
        ks = max(ks, abs(ca - cb))
        p = max(a / na, _EPS)
        q = max(b / nb, _EPS)
        psi += (p - q) * math.log(p / q)
    return ks, psi


def emd_binned(counts_a: list[float], counts_b: list[float]) -> float:
    """Normalized Earth-Mover's Distance (Wasserstein-1) between two
    histograms on the same bins, unit distance = one bin width:

        EMD = sum_{i<B} |CDF_a(i) - CDF_b(i)|  /  (B - 1)   in [0, 1]

    (the classic 1-D identity: W1 equals the area between the CDFs; the
    B-1 divisor is the max possible value — all mass at opposite ends —
    so thresholds are scale-free). Complements KS and PSI on the SAME
    bin counts: KS sees only the single worst ECDF gap and PSI washes
    out mass that moves a long way at low density, while EMD weights
    displacement BY distance — the metric that catches a slow tail
    migration (e.g. turn lengths creeping up one bin per release)
    before either trips. NaN when either side is empty, like ks_psi.
    """
    na, nb = sum(counts_a), sum(counts_b)
    if na == 0 or nb == 0 or len(counts_a) < 2:
        return float("nan")
    ca = cb = 0.0
    area = 0.0
    for a, b in zip(counts_a[:-1], counts_b[:-1]):  # CDF at last edge is 1=1
        ca += a / na
        cb += b / nb
        area += abs(ca - cb)
    return area / (len(counts_a) - 1)


def compile_drift(spec: CheckSpec, suite: CheckSuite) -> DriftCheck:
    """params: metric, expr (SQL producing the numeric), scale: 'log'|'linear',
    lo, hi, n_bins, max_ks, max_psi (FAIL thresholds), warn_ks, warn_psi,
    warn_emd, max_emd (normalized Wasserstein-1 on the same bins — see
    :func:`emd_binned`; unset = not enforced, like the others).
    """
    p = spec.params
    col = F.expr(p["expr"])
    n_bins = p.get("n_bins", 32)
    if p.get("scale", "log") == "log":
        bucket = log_width_bucket(col, p["lo"], p["hi"], n_bins)
    else:
        bucket = linear_bucket(col, p["lo"], p["hi"], n_bins)
    cid = spec.check_id

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        cur = [m.get(f"{cid}__bin_{i}") or 0 for i in range(1, n_bins + 1)]
        base = m.get(f"{cid}__baseline")
        if base is None:
            report.add(spec.section, spec.requirement, WARNING,
                       f"no baseline histogram for metric '{p['metric']}' — drift skipped")
            return stamp(report, _MOD, "compile_drift")
        ks, psi = ks_psi(cur, base)
        emd = emd_binned(cur, base)
        detail = (f"metric={p['metric']} ks={ks:.4f} psi={psi:.4f} "
                  f"emd={emd:.4f}")
        if ks != ks:  # NaN: empty side
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} (insufficient data)")
        elif (ks > p.get("max_ks", 1.0) or psi > p.get("max_psi", float("inf"))
              or emd > p.get("max_emd", float("inf"))):
            report.add(spec.section, spec.requirement, FAIL, detail)
        elif (ks > p.get("warn_ks", 1.0)
              or psi > p.get("warn_psi", float("inf"))
              or emd > p.get("warn_emd", float("inf"))):
            report.add(spec.section, spec.requirement, WARNING, detail)
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_drift")

    return DriftCheck(cid, bucket, n_bins, p["metric"], verdict)


# ---------------------------------------------------------------------------
# Grouped path: per-day drift over the whole table via applyInPandas.
# ---------------------------------------------------------------------------

def daily_drift(
    df: DataFrame,
    baseline: DataFrame,
    *,
    expr: str,
    metric: str,
    scale: str = "log",
    lo: float = 1.0,
    hi: float = 10000.0,
    n_bins: int = 32,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day KS/PSI of ``expr``'s distribution vs the baseline snapshot.

    Returns (day, metric, ks, psi, n). The heavy lifting is a
    ``groupBy(day, bucket).count()`` — partial aggregation makes the
    shuffle O(days x bins), not O(rows) — then one pandas-UDF group per
    day. Baseline rows are joined in (broadcast: days x bins rows).
    """
    col = F.expr(expr)
    bucket = (log_width_bucket if scale == "log" else linear_bucket)(col, lo, hi, n_bins)
    day = F.to_date(F.col(ts_col)).alias("day")
    hist = (
        df.select(day, bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("day", "bucket")
        .count()
    )
    # the baseline is n_bins rows — collect once on the driver and ship it
    # inside the UDF closure (a broadcast join would attach baseline mass
    # only to buckets the day observed, losing mass on fully-shifted days)
    base_rows = (
        baseline.where(F.col("metric") == metric).select("bin", "count").collect()
    )
    base_by_bin = {r["bin"]: float(r["count"]) for r in base_rows}
    bas_full = [base_by_bin.get(i, 0.0) for i in range(1, n_bins + 1)]

    out_schema = "day date, metric string, ks double, psi double, n long"

    def _per_day(pdf: pd.DataFrame) -> pd.DataFrame:
        full = pd.DataFrame({"bucket": range(1, n_bins + 1)})
        g = full.merge(pdf, on="bucket", how="left")
        cur = g["count"].fillna(0).to_numpy(dtype="float64")
        ks, psi = ks_psi(list(cur), bas_full)
        return pd.DataFrame(
            {
                "day": [pdf["day"].iloc[0]],
                "metric": [metric],
                "ks": [ks],
                "psi": [psi],
                "n": [int(cur.sum())],
            }
        )

    return hist.groupBy("day").applyInPandas(_per_day, schema=out_schema)


def daily_emd(
    df: DataFrame,
    baseline: DataFrame,
    *,
    expr: str,
    metric: str,
    scale: str = "log",
    lo: float = 1.0,
    hi: float = 10000.0,
    n_bins: int = 32,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day normalized Wasserstein-1 (EMD) of ``expr``'s distribution
    vs the baseline snapshot, INTEGER-EXACT: returns
    ``(day, n, emd_ppm)`` with

        emd_ppm = sum_{i<B} |cum_a_i * nb - cum_b_i * na| * 1e6
                  DIV (na * nb * (B - 1))

    — the cross-multiplied form of :func:`emd_binned` (area between the
    CDFs over B-1 interior edges, normalized to [0, 1e6]), so every
    engine computes the same BIGINT. Unlike :func:`daily_drift` (whose
    KS/PSI are float math in a pandas UDF), this stays entirely in
    whole-stage codegen: one O(days x bins) shuffle for the histogram,
    a days x bins grid (explode of a literal sequence — missing buckets
    MUST densify to 0 or the cumulative sums skip mass), two window
    sums over the grid, one groupBy(day) fold. Baseline cumulative
    counts ride the plan as literals (n_bins map entries; same
    driver-collect contract as daily_drift — a broadcast join would
    lose mass on buckets the day never observed).

    Overflow: the largest product, ``(B-1) * na * nb * 1e6``, must fit
    int64, so ``na * nb`` < ~3.8e11 at B=25 — ANSI mode aborts LOUDLY
    past that, never wraps. The baseline is user-supplied: at 10^12-row scale pass
    a sampled baseline (EMD depends on the baseline only through its
    distribution; nb is then bounded by the sample size).
    """
    from pyspark.sql import Window as W

    col = F.expr(expr)
    bucket = (log_width_bucket if scale == "log" else linear_bucket)(
        col, lo, hi, n_bins)
    day = F.to_date(F.col(ts_col)).alias("day")
    hist = (
        df.select(day, bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    base_rows = (
        baseline.where(F.col("metric") == metric)
        .select("bin", "count").collect()
    )
    base_by = {int(r["bin"]): int(r["count"]) for r in base_rows}
    cum_b: dict[int, int] = {}
    acc = 0
    for i in range(1, n_bins + 1):
        acc += base_by.get(i, 0)
        cum_b[i] = acc
    nb = acc
    if nb == 0:
        raise ValueError(f"baseline for metric {metric!r} is empty")
    grid = (
        hist.select("day").distinct()
        .select("day",
                F.explode(F.sequence(F.lit(1), F.lit(n_bins)))
                .alias("bucket"))
    )
    full = grid.join(hist, ["day", "bucket"], "left").select(
        "day", "bucket",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    wcum = (W.partitionBy("day").orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, 0))
    wday = W.partitionBy("day")
    cum_b_lit = F.element_at(
        F.create_map(*[F.lit(x) for kv in cum_b.items() for x in kv]),
        F.col("bucket"),
    ).cast("bigint")
    t = full.select(
        "day", "bucket",
        F.sum("cnt").over(wcum).alias("cum_a"),
        F.sum("cnt").over(wday).alias("na"),
        cum_b_lit.alias("cum_b"),
    )
    term = F.when(
        F.col("bucket") < n_bins,
        F.abs(F.col("cum_a") * F.lit(nb) - F.col("cum_b") * F.col("na")),
    ).otherwise(F.lit(0))
    out = t.groupBy("day").agg(
        F.max("na").alias("n"), F.sum(term).alias("_emd_scaled"))
    return out.select(
        "day", "n",
        F.expr(f"_emd_scaled * 1000000 DIV (n * {nb} * {n_bins - 1})")
        .alias("emd_ppm"),
    )


def build_baseline(
    df: DataFrame,
    *,
    expr: str,
    metric: str,
    scale: str = "log",
    lo: float = 1.0,
    hi: float = 10000.0,
    n_bins: int = 32,
) -> DataFrame:
    """Compute a baseline histogram snapshot (metric, bin, count) from a
    clean reference DataFrame (FIXTURES.md F4)."""
    col = F.expr(expr)
    bucket = (log_width_bucket if scale == "log" else linear_bucket)(col, lo, hi, n_bins)
    return (
        df.select(bucket.alias("bin"))
        .where(F.col("bin").isNotNull())
        .groupBy("bin")
        .count()
        .select(F.lit(metric).alias("metric"), "bin", "count")
    )


# ---------------------------------------------------------------------------
# Categorical drift: role/tool distribution vs a baseline snapshot.
# ---------------------------------------------------------------------------

def categorical_bucket(col: Column, categories: list[str]) -> Column:
    """Map a declared category list to bin indices 1..k; anything else —
    including NULL — lands in the k+1 'other' bin. A CASE chain over a
    short literal list stays in whole-stage codegen like the numeric
    bucketizers."""
    b = F.when(col == categories[0], 1)
    for i, c in enumerate(categories[1:], start=2):
        b = b.when(col == c, i)
    return b.otherwise(len(categories) + 1).cast("int")


def tvd_psi_cramers(
    counts_a: list[float], counts_b: list[float]
) -> tuple[float, float, float]:
    """Total variation distance, PSI, and Cramér's V between two category
    histograms (current=a vs baseline=b). TVD = half the L1 gap of the
    proportion vectors, in [0,1]. Cramér's V normalizes the
    goodness-of-fit chi-square statistic (expected = baseline
    proportions x current n) by n*(k-1) so it is threshold-friendly
    without a p-value table (no scipy dependency). Cells with ZERO
    baseline mass are excluded from the chi-square (an eps-smoothed
    expected count would make V an artifact of the eps choice; mass in
    novel categories is already captured by TVD and PSI, which use
    epsilon-smoothing as in :func:`ks_psi`)."""
    na, nb = sum(counts_a), sum(counts_b)
    if na == 0 or nb == 0:
        return float("nan"), float("nan"), float("nan")
    tvd = psi = chi2 = 0.0
    k = 0
    for a, b in zip(counts_a, counts_b):
        pa, pb = a / na, b / nb
        tvd += abs(pa - pb)
        p = max(pa, _EPS)
        q = max(pb, _EPS)
        psi += (p - q) * math.log(p / q)
        if pb > 0:
            k += 1
            exp = pb * na
            chi2 += (a - exp) ** 2 / exp
    v = math.sqrt(chi2 / (na * max(k - 1, 1)))
    return tvd / 2.0, psi, v


def compile_categorical_drift(spec: CheckSpec, suite: CheckSuite) -> DriftCheck:
    """params: metric, expr (SQL producing the category string),
    categories (declared list; others+NULL pool into one bin),
    warn_tvd/max_tvd, warn_psi/max_psi, warn_v/max_v.

    Rides the fused scan exactly like the numeric drift check — the
    bucket is a codegen'd CASE, the per-bin counts are Observation
    aggregates, and the comparison is driver math on k+1 scalars. The
    categorical complement of the binned-histogram family for the
    transcripts table's `role`/`tool` columns, whose drift (a new agent
    framework, a renamed tool) is invisible to numeric histograms.
    """
    p = spec.params
    cats = list(p["categories"])
    bucket = categorical_bucket(F.expr(p["expr"]), cats)
    n_bins = len(cats) + 1
    labels = cats + ["<other>"]
    cid = spec.check_id

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        cur = [m.get(f"{cid}__bin_{i}") or 0 for i in range(1, n_bins + 1)]
        base = m.get(f"{cid}__baseline")
        if base is None:
            report.add(spec.section, spec.requirement, WARNING,
                       f"no baseline for metric '{p['metric']}' — "
                       "categorical drift skipped")
            return stamp(report, _MOD, "compile_categorical_drift")
        tvd, psi, v = tvd_psi_cramers(cur, base)
        if tvd == tvd:  # not NaN: name the most-shifted category
            na, nb = sum(cur) or 1, sum(base) or 1
            gaps = [abs(a / na - b / nb) for a, b in zip(cur, base)]
            worst = labels[gaps.index(max(gaps))]
        detail = f"metric={p['metric']} tvd={tvd:.4f} psi={psi:.4f} v={v:.4f}"
        if tvd != tvd:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} (insufficient data)")
        elif (tvd > p.get("max_tvd", 1.0) or psi > p.get("max_psi", float("inf"))
              or v > p.get("max_v", float("inf"))):
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} worst='{worst}'")
        elif (tvd > p.get("warn_tvd", 1.0) or psi > p.get("warn_psi", float("inf"))
              or v > p.get("warn_v", float("inf"))):
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} worst='{worst}'")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_categorical_drift")

    return DriftCheck(cid, bucket, n_bins, p["metric"], verdict)


def build_categorical_baseline(
    df: DataFrame, *, expr: str, categories: list[str], metric: str
) -> DataFrame:
    """Categorical baseline snapshot (metric, bin, count) from a clean
    reference DataFrame — same shape as :func:`build_baseline`, so one
    baseline table serves both drift families."""
    bucket = categorical_bucket(F.expr(expr), list(categories))
    return (
        df.select(bucket.alias("bin"))
        .groupBy("bin")
        .count()
        .select(F.lit(metric).alias("metric"), "bin", "count")
    )


def build_suite_baseline(df: DataFrame, suite) -> DataFrame:
    """Baseline snapshot for EVERY drift check a suite declares, in one
    DataFrame (metric, bin, count). Walks ``suite.checks`` so a drift
    check added to a plan gets its baseline at every call site (CLI
    demo, test fixtures, bench setup) automatically — before this,
    each site hand-maintained the metric list and a new drift check
    silently degraded to the missing-baseline WARNING there.

    One union plan over the same input: Catalyst evaluates each
    branch's bucket against a shared scan of ``df`` when it is cached /
    checkpointed (the fixture pattern); at scale, prefer
    :func:`maintain_baseline` per metric, which this mirrors."""
    parts = []
    for spec in suite.checks:
        p = spec.params
        if spec.kind == "drift":
            parts.append(build_baseline(
                df, expr=p["expr"], metric=p["metric"],
                scale=p.get("scale", "log"), lo=p["lo"], hi=p["hi"],
                n_bins=p.get("n_bins", 32)))
        elif spec.kind == "categorical_drift":
            parts.append(build_categorical_baseline(
                df, expr=p["expr"], categories=list(p["categories"]),
                metric=p["metric"]))
    if not parts:
        raise ValueError(
            f"suite '{suite.suite_id}' declares no drift checks")
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


# ---------------------------------------------------------------------------
# Incremental baseline maintenance (rollup-machinery backed).
# ---------------------------------------------------------------------------

def baseline_bucket_expr(
    *, expr: str, scale: str = "log", lo: float = 1.0, hi: float = 10000.0,
    n_bins: int = 32, categories: list[str] | None = None,
):
    """The bin Column a drift metric's baseline snapshot counts over —
    shared by the whole-table builders above and the incremental path."""
    if categories is not None:
        return categorical_bucket(F.expr(expr), list(categories))
    f = log_width_bucket if scale == "log" else linear_bucket
    return f(F.expr(expr), lo, hi, n_bins)


def _baseline_specs():
    """The write-side and read-side of the incremental baseline MUST use
    the structurally identical (partial, merge) pair for the merge to
    reproduce the whole-table builders — one constructor, two callers."""
    return {"count": (F.count(F.lit(1)), F.sum("count"))}


def maintain_baseline(
    spark,
    table_path: str,
    store_path: str,
    *,
    metric: str,
    expr: str,
    scale: str = "log",
    lo: float = 1.0,
    hi: float = 10000.0,
    n_bins: int = 32,
    categories: list[str] | None = None,
    partition_key: str = "date",
    resume: bool = True,
    storage_options: dict | None = None,
) -> list[str]:
    """Maintain a drift-baseline histogram INCREMENTALLY: per-partition
    bin-count deltas via the rollup machinery (checkpoint.maintain_rollup,
    keys=["bin"], merge = sum) — at 10^12 rows the baseline over the
    clean history is itself too big to rebuild with a full scan every
    release, but bin counts are algebraic, so each new clean partition
    adds one partition-pruned scan and the snapshot is the O(n_bins)
    merge of deltas. Read it back with :func:`read_baseline`; the result
    is row-identical to :func:`build_baseline` /
    :func:`build_categorical_baseline` over the whole table.
    """
    from ..checkpoint import maintain_rollup

    bucket = baseline_bucket_expr(expr=expr, scale=scale, lo=lo, hi=hi,
                                  n_bins=n_bins, categories=categories)
    return maintain_rollup(
        spark, table_path, store_path, ["bin"], _baseline_specs(),
        rollup_id=f"baseline_{metric}", partition_key=partition_key,
        resume=resume, derive={"bin": bucket},
        storage_options=storage_options,
    )


def read_baseline(
    spark, store_path: str, *, metric: str,
    storage_options: dict | None = None,
) -> DataFrame:
    """(metric, bin, count) snapshot merged from the incremental store —
    drop-in for RunContext.baseline_df (union several metrics' reads)."""
    from ..checkpoint import read_rollup

    merged = read_rollup(
        spark, store_path, ["bin"], _baseline_specs(),
        rollup_id=f"baseline_{metric}", storage_options=storage_options,
    )
    return merged.select(F.lit(metric).alias("metric"), "bin", "count")
