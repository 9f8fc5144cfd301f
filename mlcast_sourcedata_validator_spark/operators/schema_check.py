"""Driver-side schema assertions — zero scans.

Reference analogs:
- required coordinate/column presence with expected roles:
  checks/coords/names.py:170-275 (rule-driven presence check over
  ds.coords metadata; here: required columns with expected Spark types)
- dim order + dtype membership: checks/data_vars/data_structure.py:12-63
  (exact tuple-compare of dims; dtype string in allowed list)

Like the reference, these never touch data: Spark gives us the schema from
the DataFrame plan / catalog, so the checks are free at any scale.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

_MOD = __name__

#: simpleString names accepted for each logical type family
_TYPE_FAMILIES = {
    "string": {"string"},
    "int": {"int", "bigint", "smallint", "tinyint"},
    "timestamp": {"timestamp", "timestamp_ntz"},
    "float": {"float", "double"},
}


def compile_required_columns(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """Required columns exist with types in the allowed family.

    params: required = {col_name: type_family}; forbid_extra: bool = False;
    expected_order: list[str] | None (exact prefix order, analog of the
    reference's exact dim-order compare at data_structure.py:32-44).
    """
    required: dict[str, str] = spec.params["required"]
    forbid_extra: bool = spec.params.get("forbid_extra", False)
    expected_order = spec.params.get("expected_order")

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        actual: dict[str, str] = {
            f.name: f.dataType.simpleString() for f in ctx.df.schema.fields
        }
        for col, family in required.items():
            allowed = _TYPE_FAMILIES.get(family, {family})
            if col not in actual:
                report.add(spec.section, spec.requirement, FAIL,
                           f"required column '{col}' is missing")
            elif actual[col] not in allowed:
                report.add(
                    spec.section, spec.requirement, FAIL,
                    f"column '{col}' has type {actual[col]}, expected one of "
                    f"{sorted(allowed)}",
                )
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"column '{col}': {actual[col]}")
        if forbid_extra:
            extra = [c for c in actual if c not in required]
            if extra:
                report.add(spec.section, spec.requirement, WARNING,
                           f"unexpected columns present: {extra}")
        if expected_order:
            prefix = [f.name for f in ctx.df.schema.fields][: len(expected_order)]
            if prefix != list(expected_order):
                report.add(
                    spec.section, spec.requirement, FAIL,
                    f"column order {prefix} != expected {list(expected_order)}",
                )
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"column order matches {list(expected_order)}")
        return stamp(report, _MOD, "compile_required_columns")

    return DriverCheck(spec.check_id, fn)


def schema_signature(df) -> str:
    """Canonical ``name:type`` list of a DataFrame's schema — the stored
    form of the schema-drift baseline (a readable spec, not a hash, so
    the drift verdict can NAME what changed). ``;``-separated because
    simpleString types may themselves contain commas
    (``decimal(10,2)``, ``struct<a:int,b:string>``)."""
    return ";".join(f"{f.name}:{f.dataType.simpleString()}"
                    for f in df.schema.fields)


def record_schema(df, table_ref: str, spark=None,
                  property_key: str = "schema_signature") -> str:
    """Persist the current schema signature into the table's properties
    (sidecar or catalog) — run once at table creation / after an
    intentional migration; `schema_drift` then compares every batch
    against it."""
    from ..sources.properties import (
        read_table_properties,
        write_table_properties,
    )

    sig = schema_signature(df)
    # merge: the filesystem sidecar is a whole-file write — clobbering
    # the license/conditional properties while recording the schema
    # would silently un-declare them
    props = dict(read_table_properties(table_ref, spark=spark))
    props[property_key] = sig
    write_table_properties(table_ref, props, spark=spark)
    return sig


def compile_schema_drift(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """Schema EVOLUTION check: the live schema must match the signature
    recorded in table properties — the temporal analog of the fixed
    required-columns check (drift over versions rather than rows;
    complements the distributional drift checks in drift.py). Zero
    scans. params: property_key='schema_signature',
    severity_on_missing='WARNING' (a table without a recorded baseline
    warns rather than fails — same posture as the drift-baseline
    checks).

    Verdicts name the change: added / removed / retyped columns and
    order-only changes are reported separately.
    """
    key = spec.params.get("property_key", "schema_signature")

    def fn(ctx: RunContext) -> ValidationReport:
        from ..sources.properties import read_properties_or_warning

        report = ValidationReport()
        props, warn = read_properties_or_warning(
            ctx.table_path, spark=ctx.spark,
            storage_options=ctx.storage_options)
        if warn is not None or key not in props:
            detail = warn or f"no '{key}' recorded — schema-drift check skipped"
            report.add(spec.section, spec.requirement, WARNING, detail)
            return stamp(report, _MOD, "compile_schema_drift")
        recorded = props[key]
        live = schema_signature(ctx.df)
        if live == recorded:
            report.add(spec.section, spec.requirement, PASS,
                       "schema matches the recorded signature")
            return stamp(report, _MOD, "compile_schema_drift")
        rec = dict(p.split(":", 1) for p in recorded.split(";") if p)
        cur = dict(p.split(":", 1) for p in live.split(";") if p)
        added = sorted(set(cur) - set(rec))
        removed = sorted(set(rec) - set(cur))
        retyped = sorted(c for c in set(cur) & set(rec) if cur[c] != rec[c])
        if not (added or removed or retyped):
            report.add(spec.section, spec.requirement, WARNING,
                       "schema drift: column ORDER changed "
                       f"(recorded {list(rec)}, live {list(cur)})")
        else:
            parts = []
            if added:
                parts.append(f"added {added}")
            if removed:
                parts.append(f"removed {removed}")
            if retyped:
                parts.append(
                    "retyped "
                    + str([f"{c}: {rec[c]} -> {cur[c]}" for c in retyped]))
            report.add(spec.section, spec.requirement, FAIL,
                       "schema drift vs recorded signature: "
                       + "; ".join(parts))
        return stamp(report, _MOD, "compile_schema_drift")

    return DriverCheck(spec.check_id, fn)


TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
