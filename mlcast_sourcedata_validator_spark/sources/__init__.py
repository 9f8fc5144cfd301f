"""Table readers + storage metadata (Iceberg-first with Parquet fallback)."""
