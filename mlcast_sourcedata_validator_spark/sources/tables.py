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
    """Read an Iceberg identifier or a parquet path/directory."""
    if os.path.exists(ref) or ref.startswith(("file:", "s3:", "s3a:", "hdfs:")):
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


def list_date_partitions(table_path: str, key: str = "date") -> list[str]:
    """Hive-partition values under a table dir (fallback for Iceberg's
    ``.partitions`` metadata table)."""
    if not os.path.isdir(table_path):
        return []
    vals = []
    for d in sorted(os.listdir(table_path)):
        if d.startswith(f"{key}=") and os.path.isdir(os.path.join(table_path, d)):
            vals.append(d.split("=", 1)[1])
    return vals
