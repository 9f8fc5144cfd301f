"""Table profiling and constraint suggestion: bootstrap a CheckSuite
from the data itself.

The reference ships hand-written spec modules (a human read the dataset
and typed the requirements, specs/source_data/radar_precipitation.py).
At 10^12 rows nobody hand-types null-rate thresholds for 40 columns per
table — the onboarding path is: profile one trusted release, emit the
suite it satisfies, review the JSON diff, commit it
(``suites/*.json``, ``--suite-file``). deequ calls this constraint
suggestion; here the profile is TWO fused scans regardless of column
count:

- scan 1: one ``agg`` carrying count / nulls / approx-distinct (HLL) /
  min / max / avg-length for EVERY profiled column — the same fused-
  Observation shape as the suite compiler, so profiling costs what one
  suite run costs.
- scan 2 (only if needed): ``collect_set`` for columns scan 1 proved
  low-cardinality, and EXACT ``count_distinct`` for columns scan 1
  suggests are key candidates (HLL cannot prove uniqueness; the exact
  distinct is column-pruned to the candidates). Skipped entirely when
  nothing qualifies.

Suggested checks deliberately encode the OBSERVED release plus slack
(not the tightest bound): a suite that fails on the very data that
generated it is noise; a suite that allows 2x the observed null rate
and a widened numeric range catches regressions without re-tuning on
every benign release.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .suite import CheckSpec, CheckSuite

#: columns whose (approx) distinct count is at most this are treated as
#: categorical and get a domain check with the observed value set
DEFAULT_DOMAIN_MAX_DISTINCT = 20
#: HLL relative std dev for the profiling scan
PROFILE_RSD = 0.02
#: a column is a key CANDIDATE when approx_distinct >= (1 - 3*rsd) * n;
#: candidacy is then settled by an exact distinct in scan 2


@dataclass
class ColumnProfile:
    name: str
    dtype: str  # Spark simpleString
    n_rows: int
    n_nulls: int
    approx_distinct: int
    min_value: Optional[str]  # canonical string form
    max_value: Optional[str]
    #: exact distinct — only computed for key candidates (else None)
    exact_distinct: Optional[int] = None
    #: observed value set for low-cardinality columns (else None)
    domain: Optional[list[str]] = None
    #: observed p99 for numeric columns (else None) — rides scan 1 as a
    #: percentile_approx sketch, feeds the quantile_bounds suggestion
    p99: Optional[float] = None

    @property
    def null_rate(self) -> float:
        return self.n_nulls / self.n_rows if self.n_rows else 0.0

    @property
    def is_unique(self) -> bool:
        return (
            self.exact_distinct is not None
            and self.n_nulls == 0
            and self.exact_distinct == self.n_rows
        )


_PROFILABLE = ("string", "int", "bigint", "smallint", "tinyint", "float",
               "double", "decimal", "date", "timestamp", "timestamp_ntz",
               "boolean")
_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double")


def _profilable(dtype: str) -> bool:
    return dtype.startswith(_PROFILABLE)


def profile_table(
    df: DataFrame,
    columns: Optional[list[str]] = None,
    *,
    domain_max_distinct: int = DEFAULT_DOMAIN_MAX_DISTINCT,
    rsd: float = PROFILE_RSD,
) -> list[ColumnProfile]:
    """Profile ``columns`` (default: every scalar column) in <= 2 scans.

    Arrays/structs/maps/binary are skipped — their checks (embedding
    dims, multimodal metadata) have dedicated operators; the profile
    covers the scalar surface a generic suite guards.
    """
    fields = [
        f for f in df.schema.fields
        if (columns is None or f.name in columns)
        and _profilable(f.dataType.simpleString())
    ]
    if not fields:
        return []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, n = F.col(f.name), f.name
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"nulls__{n}"),
            F.approx_count_distinct(c, rsd).alias(f"ad__{n}"),
            F.min(c).cast("string").alias(f"min__{n}"),
            F.max(c).cast("string").alias(f"max__{n}"),
        ]
        if f.dataType.simpleString() in _NUMERIC:
            # tail sketch rides the same scan (mergeable aggregate)
            aggs.append(F.percentile_approx(c.cast("double"), 0.99, 10000)
                        .alias(f"p99__{n}"))
    row = df.agg(*aggs).collect()[0]
    n_rows = row["__n"] or 0

    profiles = [
        ColumnProfile(
            name=f.name,
            dtype=f.dataType.simpleString(),
            n_rows=n_rows,
            n_nulls=row[f"nulls__{f.name}"] or 0,
            approx_distinct=row[f"ad__{f.name}"] or 0,
            min_value=row[f"min__{f.name}"],
            max_value=row[f"max__{f.name}"],
            p99=(row[f"p99__{f.name}"]
                 if f.dataType.simpleString() in _NUMERIC else None),
        )
        for f in fields
    ]

    # scan 2: exact distincts for key candidates + domains for low-card
    # columns. Both bounded by construction: candidates are column-pruned
    # exact aggs; domains are collect_set over <= ~domain_max_distinct
    # values (HLL err margin included via the 2x gate below).
    key_cands = [
        p for p in profiles
        if n_rows > 0 and p.n_nulls == 0
        and p.approx_distinct >= (1 - 3 * rsd) * n_rows
    ]
    domain_cands = [
        p for p in profiles
        if p.dtype == "string"
        and p.approx_distinct <= 2 * domain_max_distinct
        and p not in key_cands
    ]
    if key_cands or domain_cands:
        aggs2 = []
        for p in key_cands:
            aggs2.append(F.count_distinct(F.col(p.name)).alias(f"ed__{p.name}"))
        for p in domain_cands:
            aggs2.append(F.collect_set(F.col(p.name)).alias(f"dom__{p.name}"))
        row2 = df.agg(*aggs2).collect()[0]
        for p in key_cands:
            p.exact_distinct = row2[f"ed__{p.name}"]
        for p in domain_cands:
            vals = sorted(row2[f"dom__{p.name}"])
            if len(vals) <= domain_max_distinct:
                p.domain = vals
    return profiles


def _null_rate_budget(rate: float) -> float:
    """Observed rate -> suggested max rate: 0 stays 0 (a column that was
    never null SHOULD stay never-null); otherwise twice the observed
    rate, rounded UP at 6 decimals so re-running on the profiling data
    itself always passes."""
    if rate == 0.0:
        return 0.0
    return min(1.0, math.ceil(rate * 2 * 1e6) / 1e6)


def _widened_bounds(lo: float, hi: float) -> tuple[float, float]:
    """Widen [lo, hi] by 10% of the range each side (1.0 when the range
    is degenerate) — observed extremes are a sample, not the law."""
    pad = (hi - lo) * 0.1 or 1.0
    return lo - pad, hi + pad


def suggest_suite(
    df: DataFrame,
    suite_id: str = "suggested",
    *,
    profiles: Optional[list[ColumnProfile]] = None,
    domain_max_distinct: int = DEFAULT_DOMAIN_MAX_DISTINCT,
    min_rows_fraction: float = 0.5,
) -> CheckSuite:
    """Profile ``df`` and emit the CheckSuite it satisfies (with slack).

    Emitted kinds: required_columns (exact schema), min_rows (half the
    observed volume by default), null_rate (observed budget per column),
    unique_column (proven-unique columns), domain (low-cardinality
    strings; nullable iff nulls were observed), numeric_bounds (widened
    observed range), temporal_coverage (half the observed span) when a
    timestamp column exists.

    The result round-trips through ``suite_to_json`` — the intended
    workflow is suggest -> review the JSON -> commit to ``suites/`` —
    and running it on the profiled data itself passes every check
    (pinned by tests/test_profiler.py).
    """
    profs = profiles if profiles is not None else profile_table(
        df, domain_max_distinct=domain_max_distinct)
    if not profs:
        raise ValueError("no profilable scalar columns to suggest from")
    n_rows = profs[0].n_rows
    checks: list[CheckSpec] = [
        CheckSpec(
            "required_columns", "required_columns", "1 schema",
            "The table MUST expose the profiled columns with their "
            "observed types.",
            {"required": {p.name: p.dtype for p in profs}},
        ),
        CheckSpec(
            "min_rows", "min_rows", "2 size",
            f"The batch SHOULD carry at least {min_rows_fraction:.0%} of "
            "the profiled volume.",
            {"min_rows": max(1, int(n_rows * min_rows_fraction))},
        ),
    ]
    budgets = {p.name: _null_rate_budget(p.null_rate) for p in profs}
    checks.append(CheckSpec(
        "null_rates", "null_rate", "3 nulls",
        "Null rates MUST NOT exceed twice the profiled rates "
        "(never-null columns stay never-null).",
        {"columns": budgets},
    ))
    ts_col = None
    for p in profs:
        if p.is_unique:
            checks.append(CheckSpec(
                f"unique_{p.name}", "unique_column", "4 keys",
                f"'{p.name}' was unique in the profiled release and MUST "
                "stay a key.",
                {"column": p.name},
            ))
        if p.domain is not None:
            checks.append(CheckSpec(
                f"domain_{p.name}", "domain", "5 domains",
                f"'{p.name}' MUST stay within its observed value set.",
                {"column": p.name, "allowed": p.domain,
                 "nullable": p.n_nulls > 0},
            ))
        if p.dtype in _NUMERIC and p.min_value is not None:
            lo, hi = _widened_bounds(float(p.min_value), float(p.max_value))
            checks.append(CheckSpec(
                f"bounds_{p.name}", "numeric_bounds", "6 bounds",
                f"'{p.name}' SHOULD stay within 110% of its observed "
                "range.",
                {"expr": p.name, "lo": lo, "hi": hi},
            ))
            if p.p99 is not None:
                # advisory tail budget: +25% (floor 1.0) over observed
                # p99 — generous so sketch merge-order wobble on a
                # re-run can never trip it (WARNING only, never gates)
                warn_hi = round(p.p99 + max(0.25 * abs(p.p99), 1.0), 6)
                checks.append(CheckSpec(
                    f"tail_{p.name}", "quantile_bounds", "6 bounds",
                    f"The p99 of '{p.name}' SHOULD stay within 125% of "
                    "its profiled tail (tails drift before min/max "
                    "move).",
                    {"expr": p.name, "q": 0.99, "warn_hi": warn_hi},
                ))
        if p.dtype in ("timestamp", "timestamp_ntz") and ts_col is None:
            ts_col = p.name
    if ts_col is not None and n_rows > 1:
        span_years = _span_years(next(p for p in profs if p.name == ts_col))
        checks.append(CheckSpec(
            "temporal_coverage", "temporal_coverage", "7 temporal",
            "The table SHOULD span at least half the profiled time range.",
            {"min_years": round(span_years / 2, 6)},
        ))
    suite = CheckSuite(suite_id, checks)
    if ts_col is not None:
        suite.ts_col = ts_col
    return suite


def _span_years(p: ColumnProfile) -> float:
    """Observed ts span in years from the profile's canonical strings."""
    from datetime import datetime

    def parse(s: str) -> datetime:
        return datetime.fromisoformat(s)

    if p.min_value is None or p.max_value is None:
        return 0.0
    span = parse(p.max_value) - parse(p.min_value)
    return span.total_seconds() / (365.25 * 24 * 3600)


def profile_to_df(spark, profiles: list[ColumnProfile]) -> DataFrame:
    """Render a profile as a DataFrame (for reports / the metrics store)."""
    rows = [
        (p.name, p.dtype, p.n_rows, p.n_nulls, round(p.null_rate, 8),
         p.approx_distinct, p.exact_distinct, p.min_value, p.max_value,
         p.domain, p.p99)
        for p in profiles
    ]
    return spark.createDataFrame(
        rows,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_distinct long, exact_distinct long, "
        "min_value string, max_value string, domain array<string>, "
        "p99 double",
    )


def numeric_correlations(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over the given
    numeric columns, in ONE aggregate job.

    Output is long-form: (col_a, col_b, corr, covar, n) for every
    unordered pair (col_a < col_b positionally), where n counts rows
    with both sides non-null (the pairs both aggregates actually used).

    Shape at scale: all C(k,2) corr/covar/count aggregates are
    codegen'd JVM aggregates (streaming co-moment partials, map-side
    combine) evaluated in a single scan; the long-form pivot is a
    driver-free explode of a literal-indexed struct array over the ONE
    aggregate row. No Python rows, no second pass, no shuffle beyond
    the single aggregate exchange.

    Profiling use: a |r| ~ 1 pair is a redundant (derivable) column —
    a dedup candidate at storage time and an fd_constant/sql_predicate
    candidate in a suggested suite; an unexpectedly-zero r where the
    schema implies dependence is a wiring bug surfaced before training.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns to correlate")
    aggs = []
    pairs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            pairs.append((a, b))
            aggs.append(F.corr(a, b).alias(f"__r_{i}_{j}"))
            aggs.append(F.covar_samp(a, b).alias(f"__c_{i}_{j}"))
            aggs.append(
                F.count(F.when(F.col(a).isNotNull()
                               & F.col(b).isNotNull(), 1))
                .alias(f"__n_{i}_{j}")
            )
    agg = df.agg(*aggs)
    structs = []
    k = 0
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = pairs[k]
            structs.append(F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__r_{i}_{j}").alias("corr"),
                F.col(f"__c_{i}_{j}").alias("covar"),
                F.col(f"__n_{i}_{j}").alias("n"),
            ))
            k += 1
    return (
        agg.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.corr", "p.covar", "p.n")
    )
