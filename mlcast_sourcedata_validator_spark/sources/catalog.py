"""Catalog-backed table metadata — the Iceberg ``Table.properties()`` /
metadata-tables analog of the reference's ``ds.attrs`` + ``.zmetadata``
reads (checks/global_attributes/zarr_format.py:13-42, licensing.py:69-78).

A suite's ``table_path`` may be a filesystem path (handled by fs.py +
the JSON sidecar) OR a catalog identifier like ``db.transcripts`` /
``cat.db.transcripts``. For identifiers:

- properties      -> ``SHOW TBLPROPERTIES`` (Iceberg surfaces
  ``Table.properties()`` here, including ``format-version``)
- partition spec  -> ``spark.catalog.listColumns(...).isPartition``
- file sampling   -> Iceberg ``<ident>.files`` metadata table with a
  LIMIT (reads O(limit) manifest entries — the scale path), falling back
  to ``DataFrame.inputFiles()`` for non-Iceberg catalog tables (a full
  file listing: fine for hive-style tables at test scale, and the reason
  the Iceberg branch is tried first).

Everything degrades to a warning string rather than raising — the same
optional-capability posture as the fs layer.
"""

from __future__ import annotations

import re
from typing import Optional

_IDENT_RE = re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}"
)


def is_table_identifier(ref: Optional[str]) -> bool:
    """True when ``ref`` names a catalog table (db.tbl) rather than a
    filesystem path/URL. An existing local path wins over the catalog
    (same precedence as ``tables.read_table``): ``--table events`` run
    next to an ``events/`` directory means the directory."""
    import os

    if not ref or "://" in ref or "/" in ref or "\\" in ref:
        return False
    if os.path.exists(ref):
        return False
    return bool(_IDENT_RE.fullmatch(ref))


def catalog_properties(spark, ident: str) -> dict[str, str]:
    rows = spark.sql(f"SHOW TBLPROPERTIES {ident}").collect()
    return {r["key"]: r["value"] for r in rows}


def set_catalog_properties(spark, ident: str, props: dict[str, str]) -> None:
    kv = ", ".join(
        "'{}'='{}'".format(k.replace("'", "''"), str(v).replace("'", "''"))
        for k, v in props.items()
    )
    spark.sql(f"ALTER TABLE {ident} SET TBLPROPERTIES ({kv})")


def partition_columns(spark, ident: str) -> list[str]:
    return [c.name for c in spark.catalog.listColumns(ident) if c.isPartition]


def sample_file_paths(spark, ident: str, limit: int) -> list[str]:
    """First ``limit`` data-file paths of a catalog table.

    Iceberg's ``.files`` metadata table serves this from manifests in
    O(limit); the ``inputFiles()`` fallback lists every file of the
    table on the driver — acceptable for hive-style tables, which is why
    it is the fallback and not the path of record.
    """
    try:
        rows = spark.sql(
            f"SELECT file_path FROM {ident}.files LIMIT {int(limit)}"
        ).collect()
        return [r[0] for r in rows]
    except Exception:
        return sorted(spark.table(ident).inputFiles())[: int(limit)]
