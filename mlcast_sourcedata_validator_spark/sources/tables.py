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


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read an Iceberg identifier or a parquet path/directory (local or
    remote URI — Spark's Hadoop FileSystems resolve the scheme)."""
    if os.path.exists(ref) or "://" in ref or ref.startswith("file:"):
        return spark.read.parquet(ref)
    return spark.read.table(ref)


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
