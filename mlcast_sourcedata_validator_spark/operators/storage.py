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

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..sources import fs
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

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
