"""Point-anomaly validation checks: trailing-window volume anomalies
and Benford first-digit distribution conformance.

Division of labor inside the anomaly family:

- operators/drift.py compares DISTRIBUTIONS between a run and a
  baseline snapshot (KS/PSI/categorical/joint);
- functions/anomaly.py watches METRIC HISTORY across many runs of the
  checkpointed metrics store (trailing z-score / relative change /
  EWMA — float detectors tested against a pure-Python reference);
- THIS module is the raw-data *point* check with an EXACT cross-engine
  oracle: "today's volume for this key is wildly off its own recent
  trail" (the day a feed silently halves, or a retry storm doubles one
  event type), and "this value column's first-digit distribution
  stopped looking like real-world amounts". Both verdicts are
  integer-only, so DuckDB agrees bit-for-bit.

The reference's temporal checks (the span/continuity verdict in
/root/reference/mlcast_dataset_validator/checks/coords/temporal.py:37-53)
are the closest analog: both turn "the time axis looks wrong" into a
per-slice verdict.

Design notes (scale + exactness):

- :func:`volume_anomaly` is one ``groupBy(key, day)`` (the only
  shuffle; map-side partial counts make the exchange O(keys x days),
  not O(rows)) followed by a per-key ROWS window over the DAILY table —
  which is vocabulary-sized, so the window's sort is negligible. At
  10^12 rows the daily table for, say, 10^5 keys x 3 years is ~10^8
  rows: the window stage runs on one-ten-thousandth of the input.
- The spike/drop verdict is ALL-INTEGER: a day is a spike when
  ``cnt * trail_days >= spike_factor * trail_sum`` (i.e. the day is at
  least ``spike_factor``x its trailing mean) and a drop when
  ``cnt * trail_days * drop_factor <= trail_sum`` — cross-multiplied so
  no division ever happens. Exact on every engine by construction (the
  same trick as functions/lm.py's quantized log-probs).
- ROWS (not RANGE) windows mean zero-event days are simply absent on
  both engines — the trail is "the last k OBSERVED days". A day with
  zero rows cannot be flagged (there is no row to flag); the drop rule
  catches the partial-outage day, the freshness check
  (operators/stats.py) catches the total-silence case. Documented
  contract, mirrored by the oracle.
- :func:`benford_profile` quantizes values to integer cents FIRST
  (``CAST(round(value * scale) AS BIGINT)``), takes the first digit
  from the integer's decimal string (exact on every engine — no
  float log10 near power-of-ten boundaries, the classic Benford
  implementation bug), and compares observed per-digit ppm
  (``n * 1e6 DIV total`` — integer division) against the Benford
  expectation as ppm LITERALS (they sum to exactly 1e6). One
  ``groupBy(digit)`` with map-side partials: 9 output rows regardless
  of input size.

Reference analog for the verdict shape: tri-state PASS/WARN-style
labeling per slice as in checks/coords/temporal.py:40-53.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: Benford first-digit expectation, parts-per-million. Rounded from
#: log10(1 + 1/d) x 1e6; the nine literals sum to EXACTLY 1_000_000, so
#: both engines compare against identical integers.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
assert sum(BENFORD_PPM.values()) == 1_000_000


def volume_anomaly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    min_trail_days: int = 3,
    spike_factor: int = 2,
    drop_factor: int = 2,
) -> DataFrame:
    """Per-(key, day) event counts labeled against the key's own
    trailing ``window_days`` observed days:

    - ``SPIKE``  — cnt >= spike_factor x trailing mean,
    - ``DROP``   — cnt <= trailing mean / drop_factor,
    - ``OK``     — inside the band,
    - ``WARMUP`` — fewer than ``min_trail_days`` observed trail days
      (first days of a key carry no evidence either way).

    Returns ``(key, day, cnt, trail_sum, trail_days, status)`` with the
    verdict computed by integer cross-multiplication (exact; see module
    docstring). Factors are integers >= 2 by contract — the check is a
    coarse outage/storm tripwire, not a forecaster.
    """
    if spike_factor < 2 or drop_factor < 2:
        raise ValueError("spike_factor and drop_factor must be >= 2")
    if min_trail_days < 1 or window_days < min_trail_days:
        raise ValueError("need window_days >= min_trail_days >= 1")
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        W.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    t = daily.select(
        "key", "day", "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("trail_sum"),
        F.count("cnt").over(w).alias("trail_days"),
    )
    spike = (F.col("cnt") * F.col("trail_days")
             >= F.lit(spike_factor) * F.col("trail_sum"))
    drop = (F.col("cnt") * F.col("trail_days") * F.lit(drop_factor)
            <= F.col("trail_sum"))
    status = (
        F.when(F.col("trail_days") < min_trail_days, F.lit("WARMUP"))
        .when(spike, F.lit("SPIKE"))
        .when(drop, F.lit("DROP"))
        .otherwise(F.lit("OK"))
    )
    return t.select("key", "day", "cnt", "trail_sum", "trail_days",
                    status.alias("status"))


def volume_anomaly_sql(
    table: str,
    key_expr: str,
    ts_expr: str,
    window_days: int = 7,
    min_trail_days: int = 3,
    spike_factor: int = 2,
    drop_factor: int = 2,
) -> str:
    """DuckDB mirror of :func:`volume_anomaly` (same ROWS window, same
    integer cross-multiplied verdicts)."""
    return f"""
        WITH daily AS (
          SELECT {key_expr} AS key, CAST({ts_expr} AS DATE) AS day,
                 count(*)::BIGINT AS cnt
          FROM {table} GROUP BY 1, 2),
        t AS (
          SELECT key, day, cnt,
                 COALESCE(SUM(cnt) OVER w, 0)::BIGINT AS trail_sum,
                 COUNT(cnt) OVER w AS trail_days
          FROM daily
          WINDOW w AS (PARTITION BY key ORDER BY day
                       ROWS BETWEEN {window_days} PRECEDING
                       AND 1 PRECEDING))
        SELECT key, day, cnt, trail_sum, trail_days,
               CASE WHEN trail_days < {min_trail_days} THEN 'WARMUP'
                    WHEN cnt * trail_days >= {spike_factor} * trail_sum
                      THEN 'SPIKE'
                    WHEN cnt * trail_days * {drop_factor} <= trail_sum
                      THEN 'DROP'
                    ELSE 'OK' END AS status
        FROM t"""


def _first_digit(n: Column) -> Column:
    """First decimal digit of a positive BIGINT, via its exact decimal
    string — immune to the float-log10 boundary bug (1000.0 whose
    log10 computes as 2.999... yields digit 10 under the naive
    ``n / 10^floor(log10 n)`` formulation). NULL for n <= 0: the
    non-positive branch must be unevaluatable-safe, not merely
    filtered — ANSI-mode subexpression elimination can hoist this cast
    out of an enclosing ``when`` guard, and '-3' -> '-' would then
    abort the whole job with CAST_INVALID_INPUT."""
    pos = F.nullif(F.greatest(n, F.lit(0)), F.lit(0))
    return F.substring(pos.cast("string"), 1, 1).cast("int")


def benford_profile(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
    tolerance_ppm: int = 20000,
) -> DataFrame:
    """Observed vs expected Benford first-digit distribution of
    ``value_col``: quantize to ``round(value * scale)`` integer units,
    drop non-positive values, count by first digit, and report ppm
    deviation per digit. Returns
    ``(digit, n, observed_ppm, expected_ppm, dev_ppm, status)`` —
    <= 9 rows whatever the input size. ``status`` is ``DEVIANT`` when
    ``dev_ppm > tolerance_ppm`` else ``OK``.

    Benford conformance is a screening check — uniform synthetic data
    deviates by construction, invoices conform; either way the CHECK's
    numbers are exact, so the oracle comparison is too (digit counts
    are integers, observed ppm is integer division, expectations are
    shared literals summing to exactly 1e6)."""
    units = F.round(F.col(value_col) * scale, 0).cast("bigint")
    counted = (
        df.select(units.alias("u"))
        .where(F.col("u") > 0)
        .groupBy(_first_digit(F.col("u")).alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(W.partitionBy())
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]),
        F.col("digit"),
    )
    # integer-division ppm: expr() because DIV is SQL-only syntax
    t = counted.withColumn("total", total).select(
        "digit", "n",
        F.expr("n * 1000000 DIV total").alias("observed_ppm"),
        expected.alias("expected_ppm"),
    )
    dev = F.abs(F.col("observed_ppm") - F.col("expected_ppm"))
    return t.select(
        "digit", "n", "observed_ppm", "expected_ppm",
        dev.alias("dev_ppm"),
        F.when(dev > tolerance_ppm, F.lit("DEVIANT"))
        .otherwise(F.lit("OK")).alias("status"),
    )


def compile_benford(spec, suite):
    """Declarative Benford first-digit conformance, riding the fused
    single-scan Observation as 10 conditional sums (9 digit counters +
    the positive-value total) — ZERO extra jobs, unlike the volume
    check below whose per-(key, day) output can't fit an Observation
    row. params:

    - ``column`` — numeric column to screen (required),
    - ``scale`` — integer quantization factor (default 100 = cents),
    - ``tolerance_ppm`` — per-digit deviation band (default 20000),
    - ``max_deviant_digits`` — verdict threshold (default 0),
    - ``severity`` — 'WARNING' (default; Benford is a screen, not
      proof of corruption) or 'FAIL'.

    The verdict math is the same integer arithmetic as
    :func:`benford_profile` (ppm by integer division vs the exact-sum
    literals), done driver-side on the 10 observed counters.
    """
    from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
    from ..suite import AggCheck

    column = spec.params["column"]
    scale = int(spec.params.get("scale", 100))
    tolerance_ppm = int(spec.params.get("tolerance_ppm", 20000))
    max_deviant = int(spec.params.get("max_deviant_digits", 0))
    severity = spec.params.get("severity", WARNING)
    if severity not in (WARNING, FAIL):
        raise ValueError(f"benford severity must be WARNING or FAIL, "
                         f"got {severity!r}")
    cid = spec.check_id
    units = F.round(F.col(column) * scale, 0).cast("bigint")
    digit = _first_digit(units)
    exprs = {
        f"{cid}__bf_n": F.sum(F.when(units > 0, 1).otherwise(0)),
    }
    for d in range(1, 10):
        exprs[f"{cid}__bf_{d}"] = F.sum(
            F.when((units > 0) & (digit == d), 1).otherwise(0))

    def verdict(m) -> ValidationReport:
        report = ValidationReport()
        total = int(m.get(f"{cid}__bf_n") or 0)
        if total == 0:
            report.add(spec.section, spec.requirement, PASS,
                       f"no positive '{column}' values — Benford screen "
                       f"vacuously passes")
            return stamp(report, __name__, "compile_benford")
        deviant = []
        for d in range(1, 10):
            n_d = int(m.get(f"{cid}__bf_{d}") or 0)
            obs_ppm = n_d * 1_000_000 // total
            dev = abs(obs_ppm - BENFORD_PPM[d])
            if dev > tolerance_ppm:
                deviant.append(f"digit {d}: {obs_ppm}ppm vs "
                               f"{BENFORD_PPM[d]}ppm expected")
        if len(deviant) > max_deviant:
            report.add(
                spec.section, spec.requirement, severity,
                f"'{column}' first-digit distribution deviates from "
                f"Benford on {len(deviant)} digit(s) (> "
                f"max_deviant_digits={max_deviant}, tolerance "
                f"{tolerance_ppm}ppm, n={total}): " + "; ".join(deviant))
        else:
            report.add(
                spec.section, spec.requirement, PASS,
                f"'{column}' first-digit distribution within "
                f"{tolerance_ppm}ppm of Benford on >= "
                f"{9 - max_deviant} of 9 digits (n={total})")
        return stamp(report, __name__, "compile_benford")

    return AggCheck(cid, exprs, verdict)


def compile_volume_anomaly(spec, suite):
    """Declarative trailing-window volume check. params:

    - ``key`` — slice column (default None = one global daily series;
      e.g. ``role`` slices per speaker, a feed/source column per feed),
    - ``window_days`` / ``min_trail_days`` / ``spike_factor`` /
      ``drop_factor`` — :func:`volume_anomaly` knobs,
    - ``severity`` — 'WARNING' (default: a volume excursion is an
      operational signal, not per-row corruption) or 'FAIL' to gate,
    - ``max_anomaly_days`` — verdict threshold: more than this many
      SPIKE+DROP days flips the verdict (default 0 — any anomaly day
      reports).

    Runs as a DriverCheck with its own bounded jobs (the hot_keys
    precedent, skew.py compile_hot_keys): the per-(key, day) counting
    CANNOT ride the fused single-scan Observation (unbounded output
    cardinality), so it is one extra scan whose shuffle is
    O(keys x days), plus two jobs over that daily table (status counts
    + most-recent example days, capped at 5). Detail carries the
    offending days so the finding is directly actionable.
    """
    from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
    from ..suite import DriverCheck

    key = spec.params.get("key")
    window_days = int(spec.params.get("window_days", 7))
    min_trail_days = int(spec.params.get("min_trail_days", 3))
    spike_factor = int(spec.params.get("spike_factor", 2))
    drop_factor = int(spec.params.get("drop_factor", 2))
    severity = spec.params.get("severity", WARNING)
    max_anomaly_days = int(spec.params.get("max_anomaly_days", 0))
    if severity not in (WARNING, FAIL):
        raise ValueError(f"volume_anomaly severity must be WARNING or "
                         f"FAIL, got {severity!r}")

    def fn(ctx) -> ValidationReport:
        report = ValidationReport()
        df = ctx.df
        key_col = key
        if key_col is None:
            df = df.withColumn("_vol_key", F.lit("all"))
            key_col = "_vol_key"
        out = volume_anomaly(
            df, key_col, suite.ts_col, window_days=window_days,
            min_trail_days=min_trail_days, spike_factor=spike_factor,
            drop_factor=drop_factor,
        )
        anom = out.where(F.col("status").isin("SPIKE", "DROP"))
        counts = {r["status"]: r["n"] for r in
                  anom.groupBy("status")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        n_spike = int(counts.get("SPIKE", 0))
        n_drop = int(counts.get("DROP", 0))
        label = f"key={key}" if key else "global"
        if n_spike + n_drop > max_anomaly_days:
            ex = anom.orderBy(F.desc("day")).limit(5).collect()
            days = ", ".join(
                f"{r['day']}"
                + (f" [{r['key']}]" if key else "")
                + f" {r['status'].lower()} cnt={r['cnt']}"
                  f" vs trail {r['trail_sum']}/{r['trail_days']}d"
                for r in ex)
            report.add(
                spec.section, spec.requirement, severity,
                f"{n_spike} spike / {n_drop} drop day(s) ({label}, "
                f">= {spike_factor}x / <= 1/{drop_factor}x the trailing "
                f"{window_days}-observed-day mean); most recent: {days}")
        else:
            report.add(
                spec.section, spec.requirement, PASS,
                f"daily volume ({label}) within {spike_factor}x band of "
                f"its trailing {window_days}-observed-day mean "
                f"({n_spike + n_drop} anomaly day(s) <= "
                f"max_anomaly_days={max_anomaly_days})")
        return stamp(report, __name__, "compile_volume_anomaly")

    return DriverCheck(check_id=spec.check_id, fn=fn)


def benford_profile_sql(
    table: str,
    value_expr: str,
    scale: int = 100,
    tolerance_ppm: int = 20000,
) -> str:
    """DuckDB mirror of :func:`benford_profile` (same quantization,
    same string-based first digit, same literal expectations)."""
    cases = " ".join(
        f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items())
    return f"""
        WITH u AS (
          SELECT CAST(round({value_expr} * {scale}) AS BIGINT) AS u
          FROM {table}),
        counted AS (
          SELECT CAST(substring(CAST(u AS VARCHAR), 1, 1) AS INT)
                   AS digit,
                 count(*)::BIGINT AS n
          FROM u WHERE u > 0 GROUP BY 1),
        t AS (
          SELECT digit, n,
                 (n * 1000000) // SUM(n) OVER () AS observed_ppm,
                 CASE digit {cases} END AS expected_ppm
          FROM counted)
        SELECT digit, n, observed_ppm, expected_ppm,
               abs(observed_ppm - expected_ppm) AS dev_ppm,
               CASE WHEN abs(observed_ppm - expected_ppm)
                         > {tolerance_ppm}
                    THEN 'DEVIANT' ELSE 'OK' END AS status
        FROM t"""
