"""Domain-membership checks (role / tool columns).

Replicates the reference's normalization + tri-state semantics from
checks/data_vars/naming.py:45-158:

- values are compared after ``lower(trim(...))`` (naming.py:93-95, and
  checks/coords/names.py:79-81 for the rule engine);
- a value that is in the allowed domain *after* normalization but is not in
  canonical form yields a WARNING, not a FAIL — the analog of the
  "allowed unit but not the canonical unit" branch at naming.py:133-156;
- a value outside the domain (after normalization) is a FAIL.

Compiled entirely to JVM-side Column expressions (``F.lower/F.trim/isin``)
— no Python in the row path (input_hint mandate).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, RowCheck

_MOD = __name__


def _norm(col):
    return F.lower(F.trim(col))


def compile_domain(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """params: column, allowed: list[str], nullable: bool = False.

    Emits two RowChecks: ``<id>`` (FAIL: outside domain) and
    ``<id>_canonical`` (WARNING: in domain only after normalization).
    """
    col = spec.params["column"]
    allowed = [a.lower() for a in spec.params["allowed"]]
    nullable = spec.params.get("nullable", False)
    c = F.col(col)

    null_bad = F.lit(False) if nullable else c.isNull()
    out_of_domain = null_bad | (c.isNotNull() & ~_norm(c).isin(allowed))
    detail_fail = F.concat(F.lit(f"{col}="), F.coalesce(c, F.lit("NULL")),
                           F.lit(" not in allowed domain"))

    def verdict_fail(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} rows with {col} outside domain {allowed}")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"all {col} values in domain {allowed}")
        return stamp(report, _MOD, "compile_domain")

    noncanonical = c.isNotNull() & _norm(c).isin(allowed) & (c != _norm(c))
    detail_warn = F.concat(F.lit(f"{col}='"), c, F.lit("' not canonical (expected '"),
                           _norm(c), F.lit("')"))

    def verdict_warn(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, WARNING,
                       f"{n_viol} rows with non-canonical {col} spelling")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"all {col} values canonical")
        return stamp(report, _MOD, "compile_domain")

    return [
        RowCheck(spec.check_id, out_of_domain, detail_fail, verdict_fail),
        RowCheck(f"{spec.check_id}_canonical", noncanonical, detail_warn,
                 verdict_warn, severity=WARNING),
    ]


def compile_sql_predicate(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """Generic row invariant: an arbitrary SQL predicate that flags
    violating rows (compiled via ``F.expr`` — stays a JVM Column
    expression, so it fuses into the shared scan like every built-in
    check).

    params: violation_when (SQL boolean: True = violation),
            detail (optional SQL string expression rendered per row),
            severity ('FAIL' default), max_violations (0 default: any
            violation fails; a positive bound makes small counts a PASS).
    """
    pred_sql = spec.params["violation_when"]
    detail_sql = spec.params.get("detail")
    severity = spec.params.get("severity", FAIL)
    max_viol = spec.params.get("max_violations", 0)
    pred = F.coalesce(F.expr(pred_sql), F.lit(False))
    detail = (F.expr(detail_sql).cast("string") if detail_sql
              else F.lit(f"row violates: {pred_sql}"))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol > max_viol:
            report.add(spec.section, spec.requirement, severity,
                       f"{n_viol} rows violate '{pred_sql}'"
                       + (f" (> {max_viol} allowed)" if max_viol else ""))
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"{n_viol} rows violate '{pred_sql}' "
                       f"(<= {max_viol} allowed)" if n_viol else
                       f"no rows violate '{pred_sql}'")
        return stamp(report, _MOD, "compile_sql_predicate")

    return [RowCheck(spec.check_id, pred, detail, verdict,
                     severity=severity)]


def compile_conditional_column(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """A column must be set iff a row condition holds (tool iff role='tool').

    Conditional-requirement analog of
    checks/global_attributes/conditional.py:27-67 (attribute required iff a
    data-derived condition holds), applied per row instead of per dataset.

    params: column, when: SQL bool expr, allowed: list[str] | None.
    """
    col = spec.params["column"]
    cond = F.expr(spec.params["when"])
    allowed = [a.lower() for a in spec.params.get("allowed", [])]
    c = F.col(col)

    bad_when_required = cond & (
        c.isNull() | (~_norm(c).isin(allowed) if allowed else F.lit(False))
    )
    bad_when_forbidden = (~cond) & c.isNotNull()
    pred = bad_when_required | bad_when_forbidden
    detail = F.when(
        bad_when_required,
        F.concat(F.lit(f"{col}="), F.coalesce(c, F.lit("NULL")),
                 F.lit(f" invalid where ({spec.params['when']})")),
    ).otherwise(
        F.concat(F.lit(f"{col}="), F.coalesce(c, F.lit("NULL")),
                 F.lit(f" must be NULL where NOT ({spec.params['when']})"))
    )

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} rows violate conditional presence of {col}")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"{col} presence consistent with condition")
        return stamp(report, _MOD, "compile_conditional_column")

    return [RowCheck(spec.check_id, pred, detail, verdict)]


def compile_json_validity(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """A string column must hold well-formed JSON (objects), optionally
    with required top-level keys — malformed tool-call payloads and
    metadata blobs are a classic transcript-ingest failure that schema
    checks cannot see (the column type is just STRING).

    params: column; required_keys (list[str], optional); nullable
    (default True — NULL passes; False makes NULL a violation);
    severity ('FAIL' default); max_violations (0 default).

    Parsing is ``from_json`` to ``map<string,string>`` — a JVM-side
    expression that yields NULL on malformed input instead of raising,
    so the check rides the fused single-scan Observation like every
    other row predicate (no second pass, no Python).
    """
    col = spec.params["column"]
    required = list(spec.params.get("required_keys", []))
    nullable = bool(spec.params.get("nullable", True))
    severity = spec.params.get("severity", FAIL)
    max_viol = int(spec.params.get("max_violations", 0))
    c = F.col(col)
    parsed = F.from_json(c, "map<string,string>")

    malformed = c.isNotNull() & parsed.isNull()
    missing = F.lit(False)
    for k in required:
        missing = missing | (
            c.isNotNull() & parsed.isNotNull()
            & ~F.map_contains_key(parsed, F.lit(k))
        )
    null_bad = c.isNull() if not nullable else F.lit(False)
    pred = malformed | missing | null_bad
    detail = F.when(
        malformed,
        F.concat(F.lit(f"{col} is not valid JSON: "),
                 F.substring(c, 1, 80)),
    ).when(null_bad, F.lit(f"{col} must not be NULL")).otherwise(
        F.lit(f"{col} missing required key(s) {required}"))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        what = f"malformed/incomplete JSON in {col}"
        if n_viol > max_viol:
            report.add(spec.section, spec.requirement, severity,
                       f"{n_viol} rows with {what}"
                       + (f" (> {max_viol} allowed)" if max_viol else ""))
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"{n_viol} rows with {what} (<= {max_viol} allowed)"
                       if n_viol else f"all {col} payloads are valid JSON")
        return stamp(report, _MOD, "compile_json_validity")

    return [RowCheck(spec.check_id, pred, detail, verdict,
                     severity=severity)]
