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


def compile_drift(spec: CheckSpec, suite: CheckSuite) -> DriftCheck:
    """params: metric, expr (SQL producing the numeric), scale: 'log'|'linear',
    lo, hi, n_bins, max_ks, max_psi (FAIL thresholds), warn_ks, warn_psi.
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
        detail = f"metric={p['metric']} ks={ks:.4f} psi={psi:.4f}"
        if ks != ks:  # NaN: empty side
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} (insufficient data)")
        elif ks > p.get("max_ks", 1.0) or psi > p.get("max_psi", float("inf")):
            report.add(spec.section, spec.requirement, FAIL, detail)
        elif ks > p.get("warn_ks", 1.0) or psi > p.get("warn_psi", float("inf")):
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
