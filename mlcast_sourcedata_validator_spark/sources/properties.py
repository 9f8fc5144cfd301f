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
import os
from typing import Optional

SIDECAR = "_table_properties.json"


def read_table_properties(table_path: Optional[str]) -> dict[str, str]:
    """Properties for a table path; {} when absent/unreadable (the checks
    then FAIL/WARN on missing required properties, like the reference does
    for missing attrs)."""
    if not table_path:
        return {}
    p = os.path.join(table_path, SIDECAR)
    try:
        with open(p) as f:
            data = json.load(f)
        return {str(k): str(v) for k, v in data.items()}
    except (OSError, ValueError):
        return {}


def write_table_properties(table_path: str, props: dict[str, str]) -> None:
    os.makedirs(table_path, exist_ok=True)
    with open(os.path.join(table_path, SIDECAR), "w") as f:
        json.dump(props, f, indent=2, sort_keys=True)
