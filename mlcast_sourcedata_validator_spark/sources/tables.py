"""Table access layer.

The design target is an Iceberg catalog table (north_rule); the sandbox has
no Iceberg runtime jar, so the reader resolves in order:

1. ``catalog.db.table`` identifiers via ``spark.read.table`` (Iceberg when
   the runtime is on the classpath — partition pruning, snapshot reads and
   the ``.files``/``.partitions`` metadata tables come for free),
2. a filesystem path via ``spark.read.parquet`` (hive-partitioned dirs give
   the same partition-pruning behavior through Catalyst's file index).

This mirrors the reference's single ``xr.open_zarr(path, storage_options)``
entry point (specs/source_data/radar_precipitation.py:63) with fsspec-style
transparency between local and object-store paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


#: extension -> Spark reader format for filesystem references
_EXT_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".jsonl": "json",
    ".json": "json",
    ".csv": "csv",
}

#: formats whose schema inference scans DATA (json reads every record,
#: csv at least one full pass) — at 10^12 rows inference must be bounded
_INFER_SCANS_DATA = {"json", "csv"}


def _detect_format(ref: str) -> str:
    base = ref.rstrip("/")
    for ext, fmt in _EXT_FORMATS.items():
        if base.endswith(ext):
            return fmt
    return "parquet"


def infer_schema_bounded(
    spark: SparkSession, ref: str, fmt: str, max_files: int = 1,
    options: dict | None = None,
):
    """Schema inference capped to the first ``max_files`` data files.

    Spark's JSON inference reads EVERY record of EVERY file (CSV at
    least a full first pass) — a full-corpus scan before the real scan
    at 10^12 rows. Training-data shards share one schema, so inferring
    from one file is both safe and O(file). Raises if no data file is
    found (a schema must then be passed explicitly).
    """
    from . import fs

    if os.path.isfile(ref):
        sample: list[str] | str = ref
    else:
        exts = tuple(e for e, f in _EXT_FORMATS.items() if f == fmt)
        sample = [
            p for p in fs.iter_files(ref)
            if p.endswith(exts)
        ][:max_files]
        if not sample:
            raise ValueError(
                f"no {fmt} data files under {ref!r} to infer a schema "
                f"from — pass schema= explicitly")
    reader = spark.read.options(**(options or {}))
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return getattr(reader, fmt)(sample).schema


def read_table(
    spark: SparkSession,
    ref: str,
    fmt: str | None = None,
    schema=None,
    options: dict | None = None,
) -> DataFrame:
    """Read an Iceberg identifier or a filesystem table (local or remote
    URI — Spark's Hadoop FileSystems resolve the scheme).

    ``fmt`` defaults from the extension (.parquet/.orc/.jsonl/.json/
    .csv; directories default to parquet). Self-describing formats
    (parquet/orc) read schema from footers — O(1). For json/csv pass
    ``schema`` (the scale path: no inference at all); when omitted, the
    schema is inferred from the FIRST data file only
    (:func:`infer_schema_bounded`) — never a full-corpus inference pass.
    """
    if not (os.path.exists(ref) or "://" in ref or ref.startswith("file:")):
        return spark.read.table(ref)
    fmt = fmt or _detect_format(ref)
    reader = spark.read.options(**(options or {}))
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt in _INFER_SCANS_DATA:
        if schema is None:
            schema = infer_schema_bounded(spark, ref, fmt, options=options)
        reader = reader.schema(schema)
    elif schema is not None:
        reader = reader.schema(schema)
    return getattr(reader, fmt)(ref)


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)


def list_date_partitions(
    table_path: str, key: str = "date", storage_options: dict | None = None
) -> list[str]:
    """Hive-partition values under a table dir — local or remote URL
    (fallback for Iceberg's ``.partitions`` metadata table)."""
    from . import fs

    if not fs.isdir(table_path, storage_options):
        return []
    vals = []
    for d in fs.listdir(table_path, storage_options):
        if d.startswith(f"{key}=") and fs.isdir(
            fs.join(table_path, d), storage_options
        ):
            vals.append(d.split("=", 1)[1])
    return vals
