"""Single-pass column statistics checks.

All stats contribute aggregate expressions to ONE fused Observation that is
evaluated during the main scan (SURVEY.md §4 item 1) — the Spark analog of
the reference computing its temporal aggregates once and memoizing them
(checks/coords/variable_timestep.py:12,35-44). Cardinality uses
``approx_count_distinct`` (HyperLogLog) per the north_star; tests can flip
``exact=True`` for ``count_distinct`` parity with small-scale oracles.

Reference analogs:
- temporal coverage (span years >= min_years):
  checks/coords/temporal.py:11-62 — note the reference checks only the
  endpoint span despite the spec word "continuous" (temporal.py:37-39);
  we replicate the endpoint-span semantics exactly.
- null-as-missing-sentinel: spec README "NaN values for missing data" ->
  NULL here; null-rate thresholds per column.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import AggCheck, CheckSpec, CheckSuite

_MOD = __name__


def compile_null_rate(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """params: columns={col: max_null_rate}; warn_rate optional multiplier."""
    columns: dict[str, float] = spec.params["columns"]
    cid = spec.check_id
    exprs: dict[str, Any] = {f"{cid}__n_rows": F.count(F.lit(1))}
    for col in columns:
        exprs[f"{cid}__nulls__{col}"] = F.sum(
            F.when(F.col(col).isNull(), 1).otherwise(0)
        )

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n = m[f"{cid}__n_rows"] or 0
        for col, max_rate in columns.items():
            nulls = m[f"{cid}__nulls__{col}"] or 0
            rate = (nulls / n) if n else 0.0
            if rate > max_rate:
                report.add(spec.section, spec.requirement, FAIL,
                           f"null rate of '{col}' = {rate:.6f} > {max_rate} "
                           f"({nulls}/{n})")
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"null rate of '{col}' = {rate:.6f} <= {max_rate}")
        return stamp(report, _MOD, "compile_null_rate")

    return AggCheck(cid, exprs, verdict)


def compile_temporal_coverage(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """Endpoint span of ts >= min_years (ref: temporal.py:37-53 semantics).

    params: min_years: float
    """
    min_years: float = spec.params.get("min_years", 0.0)
    ts = suite.ts_col
    cid = spec.check_id
    exprs = {
        f"{cid}__ts_min": F.min(ts),
        f"{cid}__ts_max": F.max(ts),
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        lo, hi = m[f"{cid}__ts_min"], m[f"{cid}__ts_max"]
        if lo is None or hi is None:
            # ref temporal.py:54-60: parse failure -> FAIL row, suite continues
            report.add(spec.section, spec.requirement, FAIL,
                       "temporal coverage could not be determined (no timestamps)")
            return stamp(report, _MOD, "compile_temporal_coverage")
        years = (hi - lo).total_seconds() / (365.25 * 86400.0)
        if years >= min_years:
            report.add(spec.section, spec.requirement, PASS,
                       f"temporal coverage {years:.2f} years >= {min_years}")
        else:
            report.add(spec.section, spec.requirement, FAIL,
                       f"temporal coverage {years:.2f} years < {min_years}")
        return stamp(report, _MOD, "compile_temporal_coverage")

    return AggCheck(cid, exprs, verdict)


def compile_freshness(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """Data recency: the newest event must be within ``max_age_hours`` of
    ``as_of`` (the Deequ-style freshness/staleness gate — a feed that
    silently stopped ingesting passes every content check while serving
    week-old data).

    ``as_of`` is a REQUIRED explicit ISO timestamp (UTC), never the wall
    clock: the run context supplies it (e.g. the batch's cutoff or the
    orchestration run time), so reruns and resumed partitions produce
    byte-identical verdicts. Rides the fused scan's existing max(ts)
    shape — one aggregate, no extra pass.

    params: as_of: str (ISO, required), max_age_hours: float (required),
    warn_age_hours: float (optional advisory band below the hard bound).
    """
    from datetime import datetime, timezone

    as_of = datetime.fromisoformat(spec.params["as_of"])
    if as_of.tzinfo is None:
        as_of = as_of.replace(tzinfo=timezone.utc)
    max_age_h = float(spec.params["max_age_hours"])
    warn_age_h = spec.params.get("warn_age_hours")
    ts = suite.ts_col
    cid = spec.check_id
    exprs = {f"{cid}__ts_max": F.max(ts)}

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        hi = m[f"{cid}__ts_max"]
        if hi is None:
            report.add(spec.section, spec.requirement, FAIL,
                       "freshness could not be determined (no timestamps)")
            return stamp(report, _MOD, "compile_freshness")
        if hi.tzinfo is None:
            hi = hi.replace(tzinfo=timezone.utc)
        age_h = (as_of - hi).total_seconds() / 3600.0
        detail = (f"newest event is {age_h:.2f}h old at as_of="
                  f"{spec.params['as_of']}")
        if age_h > max_age_h:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} > {max_age_h}h")
        elif warn_age_h is not None and age_h > float(warn_age_h):
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} > advisory {warn_age_h}h")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_freshness")

    return AggCheck(cid, exprs, verdict)


def compile_cardinality(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """Distinct-count bounds via HLL sketch (north_star requirement).

    params: column; min_distinct / max_distinct (either optional);
    rsd: float = 0.05 (HLL relative std dev).
    """
    col = spec.params["column"]
    lo = spec.params.get("min_distinct")
    hi = spec.params.get("max_distinct")
    rsd = spec.params.get("rsd", 0.05)
    cid = spec.check_id
    agg = F.count_distinct(F.col(col)) if exact else F.approx_count_distinct(col, rsd)
    exprs = {f"{cid}__distinct__{col}": agg}

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        d = m[f"{cid}__distinct__{col}"] or 0
        kind = "exact" if exact else f"approx(rsd={rsd})"
        if lo is not None and d < lo:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{kind} distinct({col}) = {d} < {lo}")
        elif hi is not None and d > hi:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{kind} distinct({col}) = {d} > {hi}")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"{kind} distinct({col}) = {d} within bounds")
        return stamp(report, _MOD, "compile_cardinality")

    return AggCheck(cid, exprs, verdict)


def compile_numeric_bounds(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """min/max of a numeric/length expression within [lo, hi]; WARNING band.

    params: column (or expr: str), lo, hi, warn_lo, warn_hi (all optional).
    Analog of the reference's resolution/crop-size numeric comparisons
    (checks/coords/spatial.py:37-42,84-90).
    """
    expr = F.expr(spec.params["expr"]) if "expr" in spec.params else F.col(spec.params["column"])
    name = spec.params.get("expr", spec.params.get("column"))
    lo, hi = spec.params.get("lo"), spec.params.get("hi")
    warn_lo, warn_hi = spec.params.get("warn_lo"), spec.params.get("warn_hi")
    cid = spec.check_id
    exprs = {
        f"{cid}__min": F.min(expr),
        f"{cid}__max": F.max(expr),
        f"{cid}__avg": F.avg(expr),
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        mn, mx, av = m[f"{cid}__min"], m[f"{cid}__max"], m[f"{cid}__avg"]
        detail = f"{name}: min={mn} max={mx} avg={av}"
        if mn is None:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{name}: no non-null values")
        elif (lo is not None and mn < lo) or (hi is not None and mx > hi):
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} outside [{lo}, {hi}]")
        elif (warn_lo is not None and mn < warn_lo) or (warn_hi is not None and mx > warn_hi):
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} outside advisory band [{warn_lo}, {warn_hi}]")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_numeric_bounds")

    return AggCheck(cid, exprs, verdict)


def compile_quantile_bounds(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """A quantile of a numeric/length expression within [lo, hi]; WARNING
    band like ``numeric_bounds``. min/max bound the extremes; tails are
    where drift shows first (a p95 turn length can triple while min/max
    and mean barely move) — this is the tail-budget check.

    params: column (or expr: str), q in (0, 1), lo, hi, warn_lo, warn_hi
    (all bounds optional), accuracy (percentile_approx accuracy knob,
    default 10000 — error <= 1/accuracy of the rank).

    Scale: ``percentile_approx`` is a mergeable sketch aggregate
    (map-side partials) and is legal inside CollectMetrics, so the check
    RIDES the fused single-scan Observation — zero extra jobs, zero
    extra passes, like null_rate/numeric_bounds. Exactness tests pin the
    sketch against DuckDB's exact quantile in the driver-contract
    percentiles query instead (quantile checks don't need exact ranks,
    they need stable ones).
    """
    expr = F.expr(spec.params["expr"]) if "expr" in spec.params \
        else F.col(spec.params["column"])
    name = spec.params.get("expr", spec.params.get("column"))
    q = float(spec.params["q"])
    if not 0.0 < q < 1.0:
        raise ValueError(f"{spec.check_id}: q must be in (0, 1), got {q}")
    accuracy = int(spec.params.get("accuracy", 10000))
    lo, hi = spec.params.get("lo"), spec.params.get("hi")
    warn_lo, warn_hi = spec.params.get("warn_lo"), spec.params.get("warn_hi")
    cid = spec.check_id
    exprs = {f"{cid}__q": F.percentile_approx(expr, q, accuracy)}

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        v = m[f"{cid}__q"]
        detail = f"{name}: p{q * 100:g}={v}"
        if v is None:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{name}: no non-null values")
        elif (lo is not None and v < lo) or (hi is not None and v > hi):
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} outside [{lo}, {hi}]")
        elif (warn_lo is not None and v < warn_lo) or \
                (warn_hi is not None and v > warn_hi):
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} outside advisory band "
                       f"[{warn_lo}, {warn_hi}]")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_quantile_bounds")

    return AggCheck(cid, exprs, verdict)


def compile_unique_column(spec: CheckSpec, suite: CheckSuite, exact: bool = False):
    """A single column must be a primary key: count == count_distinct.

    Uniqueness needs an EXACT distinct count (the HLL sketch cannot prove
    it), and Spark disallows DISTINCT aggregates inside CollectMetrics —
    so this check runs as one dedicated aggregate job, column-pruned to
    the key column (a cheap single-column scan; the partial/final
    distinct agg is Catalyst-standard). For composite transcript keys the
    window-based ``unique_key`` check is the scale path that also emits
    per-row violations.

    params: column.
    """
    from ..suite import DriverCheck

    col = spec.params["column"]

    def fn(ctx) -> ValidationReport:
        report = ValidationReport()
        # driver checks run BEFORE the schema short-circuit gate — a
        # missing column must be a FAIL row, not an AnalysisException
        # (reference pattern: per-check error capture, temporal.py:54-60)
        if col not in ctx.df.columns:
            report.add(spec.section, spec.requirement, FAIL,
                       f"column '{col}' is missing — uniqueness not "
                       f"checkable")
            return stamp(report, _MOD, "compile_unique_column")
        row = ctx.df.agg(
            F.count(F.col(col)).alias("n"),
            F.count_distinct(F.col(col)).alias("d"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("nulls"),
        ).collect()[0]
        n, d, nulls = row["n"] or 0, row["d"] or 0, row["nulls"] or 0
        if nulls:
            report.add(spec.section, spec.requirement, FAIL,
                       f"'{col}' has {nulls} NULLs — cannot be a key")
        elif n != d:
            report.add(spec.section, spec.requirement, FAIL,
                       f"'{col}' has {n - d} duplicate values ({d} distinct "
                       f"of {n})")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"'{col}' is unique ({n} rows)")
        return stamp(report, _MOD, "compile_unique_column")

    return DriverCheck(spec.check_id, fn)


def compile_dup_rate(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """Exact-duplicate content rate: 1 - distinct(md5(col))/count(col).

    The validation-engine face of the dedup operator family
    (functions/dedup.py): a corpus whose duplicate fraction exceeds the
    advisory/hard thresholds fails the suite. Hashes ride the same fused
    scan — no extra pass, one 128-bit hash per row into the distinct
    sketch/agg.

    params: column, warn_frac=0.05, max_frac=0.2, rsd=0.02 (HLL; tests
    flip exact=True for parity with small-scale oracles — warn_frac must
    stay above the sketch's rsd so clean data cannot spuriously WARN).
    """
    col = spec.params["column"]
    warn_frac = spec.params.get("warn_frac", 0.05)
    max_frac = spec.params.get("max_frac", 0.2)
    rsd = spec.params.get("rsd", 0.02)
    cid = spec.check_id
    h = F.md5(F.col(col).cast("string"))
    agg = F.count_distinct(h) if exact else F.approx_count_distinct(h, rsd)
    exprs = {
        f"{cid}__n": F.count(F.col(col)),
        f"{cid}__d": agg,
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n, d = m[f"{cid}__n"] or 0, m[f"{cid}__d"] or 0
        frac = max(0.0, (n - d) / n) if n else 0.0
        kind = "exact" if exact else f"approx(rsd={rsd})"
        detail = (f"{kind} duplicate rate of '{col}' = {frac:.6f} "
                  f"({n - d}/{n})")
        if frac > max_frac:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} > {max_frac}")
        elif frac > warn_frac:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} > advisory {warn_frac}")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_dup_rate")

    return AggCheck(cid, exprs, verdict)


def compile_min_rows(spec: CheckSpec, suite: CheckSuite, exact: bool = False) -> AggCheck:
    """Table (or partition batch) must have >= min_rows rows.

    Analog of the reference's minimum-crop-size dimension check
    (checks/coords/spatial.py:76-96) — including its quirk of comparing a
    single bound, which here is just the one min_rows scalar.
    """
    min_rows = spec.params.get("min_rows", 1)
    cid = spec.check_id
    exprs = {f"{cid}__count": F.count(F.lit(1))}

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n = m[f"{cid}__count"] or 0
        status = PASS if n >= min_rows else FAIL
        report.add(spec.section, spec.requirement, status,
                   f"row count {n} {'>=' if status == PASS else '<'} {min_rows}")
        return stamp(report, _MOD, "compile_min_rows")

    return AggCheck(cid, exprs, verdict)
