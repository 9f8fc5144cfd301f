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
