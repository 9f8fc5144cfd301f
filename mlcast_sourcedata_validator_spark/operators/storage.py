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

Graceful degradation: when the table path is unknown or footers are
unreadable, these emit WARNING rows and never FAIL — mirroring the
reference's optional-dependency pattern (checks/tool_compatibility/
gdal.py:133-140).
"""

from __future__ import annotations

import os

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

_MOD = __name__
_MAX_FOOTER_SAMPLE = 8


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _footer_info(files: list[str]) -> tuple[set[str], set[str]]:
    """(codecs, format_versions) from a bounded sample of parquet footers."""
    import pyarrow.parquet as pq

    codecs: set[str] = set()
    versions: set[str] = set()
    for f in files[:_MAX_FOOTER_SAMPLE]:
        md = pq.ParquetFile(f).metadata
        versions.add(md.format_version)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                codecs.add(g.column(c).compression.lower())
    return codecs, versions


def compile_codec(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: require_compression=True, recommended='zstd'."""
    require = spec.params.get("require_compression", True)
    recommended = spec.params.get("recommended", "zstd").lower()

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        if not ctx.table_path or not os.path.isdir(ctx.table_path):
            report.add(spec.section, spec.requirement, WARNING,
                       "table path unavailable — codec check skipped")
            return stamp(report, _MOD, "compile_codec")
        try:
            codecs, _ = _footer_info(_parquet_files(ctx.table_path))
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
        if not ctx.table_path or not os.path.isdir(ctx.table_path):
            report.add(spec.section, spec.requirement, WARNING,
                       "table path unavailable — partitioning check skipped")
            return stamp(report, _MOD, "compile_partitioning")
        parts = [
            d for d in os.listdir(ctx.table_path)
            if d.startswith(f"{key}=") and os.path.isdir(os.path.join(ctx.table_path, d))
        ]
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
        if not ctx.table_path or not os.path.isdir(ctx.table_path):
            report.add(spec.section, spec.requirement, WARNING,
                       "table path unavailable — format check skipped")
            return stamp(report, _MOD, "compile_format")
        try:
            _, versions = _footer_info(_parquet_files(ctx.table_path))
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
