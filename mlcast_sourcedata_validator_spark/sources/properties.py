"""Table-level properties (the ``ds.attrs`` analog).

The reference reads global attributes straight off the dataset
(``ds.attrs``: license at checks/global_attributes/licensing.py:69-78,
``consistent_timestep_start`` at checks/coords/variable_timestep.py:124).
The Spark mapping is Iceberg table properties (``Table.properties()`` /
``TBLPROPERTIES``); the Parquet fallback stores the same dict as a
``_table_properties.json`` sidecar in the table directory (same spirit as
Zarr's consolidated ``.zmetadata`` sidecar the reference checks at
checks/global_attributes/zarr_format.py:13-42).
"""

from __future__ import annotations

import json
from typing import Optional

from . import fs

SIDECAR = "_table_properties.json"


def read_table_properties(
    table_path: Optional[str], storage_options: Optional[dict] = None,
    spark=None,
) -> dict[str, str]:
    """Properties for a table reference; {} when absent/unreadable (the
    checks then FAIL/WARN on missing required properties, like the
    reference does for missing attrs).

    The reference may be a filesystem path (local, memory:// or any
    fsspec URL — JSON sidecar) or, when ``spark`` is given, a catalog
    identifier like ``db.transcripts`` — then ``SHOW TBLPROPERTIES``
    serves them (Iceberg's ``Table.properties()`` surface).

    An unreachable remote scheme (fsspec not installed) raises
    :class:`fs.FsUnavailable` so callers can WARN instead of silently
    treating the table as property-less.
    """
    if not table_path:
        return {}
    from .catalog import catalog_properties, is_table_identifier

    if spark is not None and is_table_identifier(table_path):
        try:
            return catalog_properties(spark, table_path)
        except Exception:
            return {}
    p = fs.join(table_path, SIDECAR)
    try:
        data = json.loads(fs.read_text(p, storage_options))
        return {str(k): str(v) for k, v in data.items()}
    except fs.FsUnavailable:
        raise
    except (OSError, ValueError):
        return {}


def read_properties_or_warning(
    table_path: Optional[str], storage_options: Optional[dict] = None,
    spark=None,
) -> tuple[dict[str, str], Optional[str]]:
    """(props, None), or ({}, warning_detail) when the path's backend is
    unavailable — the degrade-to-WARNING contract property checks share."""
    try:
        return read_table_properties(table_path, storage_options, spark), None
    except fs.FsUnavailable as exc:
        return {}, str(exc)


def write_table_properties(
    table_path: str, props: dict[str, str],
    storage_options: Optional[dict] = None,
    spark=None,
) -> None:
    from .catalog import is_table_identifier, set_catalog_properties

    if spark is not None and is_table_identifier(table_path):
        set_catalog_properties(spark, table_path, props)
        return
    fs.write_text(
        fs.join(table_path, SIDECAR),
        json.dumps(props, indent=2, sort_keys=True),
        storage_options,
    )
