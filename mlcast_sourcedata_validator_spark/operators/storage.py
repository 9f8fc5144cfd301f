"""Storage-layout checks: codec, partitioning, format version.

Reference analogs (all metadata-only, never reading payload data):
- chunk-per-timestep layout: checks/data_vars/chunking.py:12-53 — here:
  the table directory must be hive-partitioned by the expected key
  (e.g. ``date=``), the analog of "one chunk per timestep"
  (specs/source_data/radar_precipitation.py:125-133).
- compression codec: checks/data_vars/compression.py:12-130 — tri-state:
  FAIL if uncompressed (when required), PASS if the recommended codec
  (zstd), WARNING otherwise. Codec read from Parquet footers via pyarrow
  on a bounded sample of files (driver-side; footers are KBs).
- format version + consolidated metadata:
  checks/global_attributes/zarr_format.py:13-88 — here: Parquet format
  version from the footer; for Iceberg tables this would be the
  ``format-version`` property + snapshot existence via the catalog.

Graceful degradation: when the table path is unknown, its remote backend
is unavailable (fsspec not installed), or footers are unreadable, these
emit WARNING rows and never FAIL — mirroring the reference's
optional-dependency pattern (checks/tool_compatibility/gdal.py:133-140).

Paths may be local, ``memory://`` or any fsspec URL (``s3://`` ...) — the
reference's ``storage_options`` plumbing (specs/cli.py:140-160) arrives
via ``RunContext.storage_options``. The file walk is BOUNDED: sampling 8
footers stops listing after 8 matches instead of walking a potentially
million-file table on the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..sources import fs
from ..suite import AggCheck, CheckSpec, CheckSuite, DriverCheck, RowCheck, RunContext

_MOD = __name__
_MAX_FOOTER_SAMPLE = 8


def _footer_info_from_files(
    files: list[str], storage_options=None
) -> tuple[set[str], set[str]]:
    """(codecs, format_versions) from a list of parquet file paths —
    footers are KBs, read through the fs layer so remote tables sample
    identically."""
    import pyarrow.parquet as pq

    codecs: set[str] = set()
    versions: set[str] = set()
    for f in files:
        with fs.open_file(f, "rb", storage_options) as fh:
            md = pq.ParquetFile(fh).metadata
            versions.add(md.format_version)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for c in range(g.num_columns):
                    codecs.add(g.column(c).compression.lower())
    return codecs, versions


def _sample_footer_info(ctx: RunContext) -> tuple[set[str], set[str]]:
    """Bounded footer sample for a table reference: catalog identifiers
    sample file paths via Iceberg's ``.files`` metadata table (or
    ``inputFiles()`` fallback); filesystem paths use the early-exit
    parquet walk — never a full listing either way."""
    from ..sources import catalog

    if catalog.is_table_identifier(ctx.table_path):
        files = catalog.sample_file_paths(ctx.spark, ctx.table_path,
                                          _MAX_FOOTER_SAMPLE)
    else:
        files = fs.list_parquet_files(ctx.table_path,
                                      limit=_MAX_FOOTER_SAMPLE,
                                      storage_options=ctx.storage_options)
    return _footer_info_from_files(files, ctx.storage_options)


def _table_dir_state(ctx: RunContext) -> tuple[bool, str | None]:
    """(usable, warning_detail): False when the reference is unset,
    absent, or on an unreachable remote backend. Catalog identifiers are
    always usable (their existence fails loudly at read time)."""
    from ..sources.catalog import is_table_identifier

    if not ctx.table_path:
        return False, "table path unavailable"
    if is_table_identifier(ctx.table_path):
        return True, None
    try:
        if not fs.isdir(ctx.table_path, ctx.storage_options):
            return False, f"table path {ctx.table_path} is not a directory"
    except fs.FsUnavailable as exc:
        return False, str(exc)
    return True, None


def compile_codec(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: require_compression=True, recommended='zstd'."""
    require = spec.params.get("require_compression", True)
    recommended = spec.params.get("recommended", "zstd").lower()

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        ok, why = _table_dir_state(ctx)
        if not ok:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{why} — codec check skipped")
            return stamp(report, _MOD, "compile_codec")
        try:
            codecs, _ = _sample_footer_info(ctx)
        except Exception as exc:  # footer unreadable -> degrade, never abort
            report.add(spec.section, spec.requirement, WARNING,
                       f"could not read parquet footers: {exc}")
            return stamp(report, _MOD, "compile_codec")
        if not codecs:
            report.add(spec.section, spec.requirement, WARNING,
                       "no parquet files found — codec check skipped")
        elif codecs == {"uncompressed"} and require:
            report.add(spec.section, spec.requirement, FAIL,
                       "data is uncompressed but compression is required")
        elif codecs <= {recommended}:
            report.add(spec.section, spec.requirement, PASS,
                       f"compression codec is the recommended '{recommended}'")
        else:
            report.add(spec.section, spec.requirement, WARNING,
                       f"codecs {sorted(codecs)} differ from recommended "
                       f"'{recommended}'")
        return stamp(report, _MOD, "compile_codec")

    return DriverCheck(spec.check_id, fn)


def compile_partitioning(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: partition_key (hive dir prefix, e.g. 'date')."""
    key = spec.params.get("partition_key", "date")

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        ok, why = _table_dir_state(ctx)
        if not ok:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{why} — partitioning check skipped")
            return stamp(report, _MOD, "compile_partitioning")
        from ..sources.catalog import is_table_identifier, partition_columns

        if is_table_identifier(ctx.table_path):
            # catalog path: the partition SPEC comes from the catalog
            # (Iceberg partition spec / hive partition columns) — no
            # directory listing at all
            try:
                pcols = partition_columns(ctx.spark, ctx.table_path)
            except Exception as exc:
                report.add(spec.section, spec.requirement, WARNING,
                           f"could not read partition spec: {exc}")
                return stamp(report, _MOD, "compile_partitioning")
            if key in pcols:
                report.add(spec.section, spec.requirement, PASS,
                           f"catalog table partitioned by '{key}' "
                           f"(spec: {pcols})")
            else:
                report.add(spec.section, spec.requirement, FAIL,
                           f"catalog table partition spec {pcols} does not "
                           f"include '{key}'")
            return stamp(report, _MOD, "compile_partitioning")
        try:
            parts = [
                d for d in fs.listdir(ctx.table_path, ctx.storage_options)
                if d.startswith(f"{key}=")
                and fs.isdir(fs.join(ctx.table_path, d), ctx.storage_options)
            ]
        except Exception as exc:
            # remote backends raise arbitrary (non-OSError) exceptions on
            # auth/transient failures; a flaky listing must degrade to
            # WARNING like the footer-sampling checks, never abort the suite
            report.add(spec.section, spec.requirement, WARNING,
                       f"could not list table directory: {exc}")
            return stamp(report, _MOD, "compile_partitioning")
        if parts:
            report.add(spec.section, spec.requirement, PASS,
                       f"table partitioned by '{key}' ({len(parts)} partitions)")
        else:
            report.add(spec.section, spec.requirement, FAIL,
                       f"table is not partitioned by '{key}'")
        return stamp(report, _MOD, "compile_partitioning")

    return DriverCheck(spec.check_id, fn)


def compile_format(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: allowed_versions=('1.0','2.4','2.6') — parquet format versions.

    Analog of zarr_format v2/v3 membership (zarr_format.py:45-88).
    """
    allowed = set(spec.params.get("allowed_versions", ("1.0", "2.4", "2.6")))

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        ok, why = _table_dir_state(ctx)
        if not ok:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{why} — format check skipped")
            return stamp(report, _MOD, "compile_format")
        try:
            _, versions = _sample_footer_info(ctx)
        except Exception as exc:
            report.add(spec.section, spec.requirement, WARNING,
                       f"could not read parquet footers: {exc}")
            return stamp(report, _MOD, "compile_format")
        bad = versions - allowed
        if not versions:
            report.add(spec.section, spec.requirement, WARNING,
                       "no parquet files found — format check skipped")
        elif bad:
            report.add(spec.section, spec.requirement, FAIL,
                       f"parquet format versions {sorted(bad)} not in {sorted(allowed)}")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"parquet format versions {sorted(versions)} allowed")
        return stamp(report, _MOD, "compile_format")

    return DriverCheck(spec.check_id, fn)


def compile_partition_alignment(
    spec: CheckSpec, suite: CheckSuite
) -> list:
    """Rows must physically live in the hive partition their event time
    derives — the misrouted-ingest check.

    The layout checks above verify the partition SPEC exists
    (``compile_partitioning``, the analog of the reference's
    chunk-per-timestep layout rule, checks/data_vars/chunking.py:12-53);
    this one verifies the DATA honours it: a row with
    ``ts = 2026-01-02T…`` sitting in ``date=2026-01-01/`` silently
    corrupts every partition-pruned read (incremental rollups, drift
    baselines, resume-from-checkpoint all trust partition == event-day).
    The reference has no analog because a single Zarr dataset has no
    partition routing; at 10^12 rows it is one of the first ingest bugs
    a validation engine must catch.

    Spark-native mechanics: the physical partition is recovered from
    ``input_file_name()`` — a metadata literal per split, evaluated
    MAP-SIDE on the scan with one short ``regexp_extract``, so the check
    rides the fused scan like every other row predicate and works in
    BOTH run shapes (whole-table read AND ``run_partitioned``'s
    one-partition batches, which drop the partition column but keep the
    ``date=<p>`` path segment). A second fused aggregate counts how many
    rows carried a recoverable partition at all, so "table isn't
    file-backed / isn't partitioned" degrades to WARNING instead of a
    vacuous PASS — the optional-capability pattern of the driver-side
    storage checks above.

    params:
      partition_key: hive key in the path (default 'date')
      fmt: date_format pattern ts must route by (default 'yyyy-MM-dd')
      column: compare against this materialized partition column instead
        of the file path (for catalog tables whose scans don't expose
        hive paths); NULL column values are not flagged (null_rate owns
        nullness)
      max_violations: allowed misrouted rows before FAIL (default 0)

    NULL ``ts`` rows are never flagged here (cannot derive a route;
    null_rate owns them). Partition values are compared as raw path
    text — date values never need URL-escaping.
    """
    key = spec.params.get("partition_key", "date")
    fmt = spec.params.get("fmt", "yyyy-MM-dd")
    column = spec.params.get("column")
    max_viol = spec.params.get("max_violations", 0)
    ts = suite.ts_col

    expected = F.date_format(F.col(ts).cast("timestamp"), fmt)
    pre_cols: dict = {}
    if column is not None:
        actual = F.col(column).cast("string")
    else:
        # [/\\] guard: 'update=' must not satisfy key='date'.
        # input_file_name() is non-deterministic to Catalyst, so the
        # recovered route is PRE-PROJECTED onto the scan (RowCheck
        # pre_cols) — CollectMetrics accepts the projected attribute
        # where it would reject the inline expression.
        route_col = f"__pa_route_{spec.check_id}"
        raw = F.regexp_extract(
            F.input_file_name(), f"[/\\\\]{key}=([^/\\\\]+)", 1)
        pre_cols[route_col] = F.when(raw != "", raw)  # '' -> NULL
        actual = F.col(route_col)

    pred = actual.isNotNull() & expected.isNotNull() & (actual != expected)
    detail = F.concat(
        F.lit(f"{ts}-derived partition "), expected,
        F.lit(f" != stored {key}="), actual,
    )
    seen_metric = f"__pa_seen_{spec.check_id}"

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        seen = int(m.get(seen_metric) or 0)
        if n_viol > max_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} rows stored in a {key}= partition that "
                       f"does not match date_format({ts}, '{fmt}')"
                       + (f" (> {max_viol} allowed)" if max_viol else ""))
        elif seen == 0:
            report.add(spec.section, spec.requirement, WARNING,
                       f"no rows carried a recoverable {key}= partition "
                       "(table not hive-partitioned or not file-backed) — "
                       "alignment not checkable")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"all {seen} partition-routed rows aligned with "
                       f"date_format({ts}, '{fmt}')"
                       + (f" ({n_viol} <= {max_viol} allowed)"
                          if n_viol else ""))
        return stamp(report, _MOD, "compile_partition_alignment")

    def agg_verdict(m: dict[str, Any]) -> ValidationReport:
        return ValidationReport()  # verdict lives on the RowCheck

    return [
        AggCheck(spec.check_id,
                 {seen_metric:
                  F.sum(F.when(actual.isNotNull(), 1).otherwise(0))
                  .cast("long")},
                 agg_verdict),
        RowCheck(spec.check_id, pred, detail, verdict, pre_cols=pre_cols),
    ]


def compile_clustering(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """Clustering-quality check: is the table's PHYSICAL layout actually
    clustered on its declared key columns?

    params: ``columns`` (required list), ``max_avg_span`` (default 0.5),
    ``severity`` ('WARNING' default — layout is an operational hazard,
    not data corruption; pass 'FAIL' to gate).

    Metric: per-FILE min/max of each declared column (one scan grouped
    by ``input_file_name()``, map-side combinable), normalized by the
    global range — the average per-file normalized span is the fraction
    of the column's domain a typical file straddles. 1.0 means every
    file spans everything (file-level min/max pruning skips nothing);
    well-clustered layouts score ~1/n_files. This is the validator-side
    audit of what ``functions/layout.py zorder_write`` produces, and the
    engine-scale analog of the reference's chunk-layout contract
    (checks/data_vars/chunking.py:29-44 — one chunk per timestep).

    Runs as a DriverCheck with its own two bounded agg jobs (per-file
    stats stay distributed; only the per-column averages collect), like
    ``hot_keys`` — per-file aggregation cannot ride the fused
    Observation. Opt-in: not in the perf-pinned base suites. Degrades
    to WARNING when the input is not file-backed (in-memory DataFrames
    have no files to measure).
    """
    cols = spec.params.get("columns")
    if not cols:
        raise ValueError("clustering check requires params['columns']")
    max_avg_span = float(spec.params.get("max_avg_span", 0.5))
    severity = spec.params.get("severity", WARNING)
    if severity not in (WARNING, FAIL):
        raise ValueError(f"clustering severity must be WARNING or FAIL, "
                         f"got {severity!r}")

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            d = F.col(c).cast("double")
            aggs += [F.min(d).alias(f"_lo_{c}"), F.max(d).alias(f"_hi_{c}")]
        per_file = (
            ctx.df.groupBy(F.input_file_name().alias("_file")).agg(*aggs)
        )
        # second (tiny) agg: global range + mean per-file span, all
        # distributed — only one row ever reaches the driver
        spans = []
        for c in cols:
            g = (F.max(f"_hi_{c}") - F.min(f"_lo_{c}"))
            spans += [
                F.avg(F.col(f"_hi_{c}") - F.col(f"_lo_{c}")).alias(f"_as_{c}"),
                g.alias(f"_g_{c}"),
            ]
        row = per_file.agg(
            F.count(F.lit(1)).alias("_nf"),
            F.max(F.when(F.col("_file") == "", 1).otherwise(0)).alias("_nofile"),
            *spans,
        ).first()
        if row["_nf"] == 0:
            report.add(spec.section, spec.requirement, PASS,
                       "no rows — clustering trivially satisfied")
            return stamp(report, _MOD, "compile_clustering")
        if row["_nofile"] == 1:
            report.add(spec.section, spec.requirement, WARNING,
                       "input is not file-backed — clustering layout "
                       "not measurable")
            return stamp(report, _MOD, "compile_clustering")
        results = {}
        for c in cols:
            g = row[f"_g_{c}"]
            results[c] = (row[f"_as_{c}"] / g) if g and g > 0 else 0.0
        offenders = {c: s for c, s in results.items() if s > max_avg_span}
        summary = ", ".join(f"{c}={s:.3f}" for c, s in results.items())
        if offenders:
            report.add(
                spec.section, spec.requirement, severity,
                f"poorly clustered over {row['_nf']} files: avg "
                f"normalized per-file span {summary} (max_avg_span="
                f"{max_avg_span}); files will not prune on "
                f"{sorted(offenders)} — re-layout with "
                f"layout.zorder_write({sorted(results)})")
        else:
            report.add(
                spec.section, spec.requirement, PASS,
                f"clustered: avg normalized per-file span {summary} over "
                f"{row['_nf']} files (max_avg_span={max_avg_span})")
        return stamp(report, _MOD, "compile_clustering")

    return DriverCheck(spec.check_id, fn)
