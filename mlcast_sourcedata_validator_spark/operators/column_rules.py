"""Rule-driven column-role detection — the reference's coordinate rule
engine re-expressed over StructField metadata.

Reference semantics (checks/coords/names.py):
- a rule is a dict of conditions; a column matches a rule iff ALL
  conditions match (names.py:84-124 — every attr=value pair must match,
  values case-normalized: lower/strip, 'axis' compared upper);
- a column matches a category iff ANY of the category's rules match
  (names.py:127-148);
- each required category found -> PASS naming the column; missing ->
  FAIL; and a final composite FAIL row summarizes every missing category
  (names.py:236-268).

Here a rule may constrain the column name (case-insensitive equality or
prefix), its Spark type family, and key=value pairs in
``StructField.metadata`` (the per-column attrs analog of xarray coord
attrs). Pure driver-side schema work — zero scans at any table size.
"""

from __future__ import annotations

from typing import Any

from ..report import FAIL, PASS, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

_MOD = __name__

#: metadata keys compared upper-cased (ref: 'axis' at names.py:114-116)
_UPPER_KEYS = {"axis"}


def _norm(key: str, value: Any) -> str:
    s = str(value).strip()
    return s.upper() if key in _UPPER_KEYS else s.lower()


def _matches_rule(field, rule: dict[str, Any]) -> bool:
    """ALL conditions must hold (names.py:84-124)."""
    for cond, expected in rule.items():
        if cond == "name":
            if field.name.strip().lower() != str(expected).strip().lower():
                return False
        elif cond == "name_prefix":
            if not field.name.strip().lower().startswith(str(expected).lower()):
                return False
        elif cond == "type":
            from .schema_check import _TYPE_FAMILIES

            allowed = _TYPE_FAMILIES.get(expected, {expected})
            if field.dataType.simpleString() not in allowed:
                return False
        elif cond == "metadata":
            md = field.metadata or {}
            for k, v in expected.items():
                if k not in md or _norm(k, md[k]) != _norm(k, v):
                    return False
        else:
            raise ValueError(f"unknown rule condition {cond!r}")
    return True


def find_columns(schema, rules: list[dict[str, Any]]) -> list[str]:
    """Columns matching ANY rule (names.py:127-148)."""
    return [
        f.name for f in schema.fields
        if any(_matches_rule(f, r) for r in rules)
    ]


def compile_column_rules(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: categories = {category: {"rules": [...], "required": True}}.

    PASS/FAIL per category plus a composite FAIL row when any required
    category is missing (names.py:236-268 shape).
    """
    categories: dict[str, dict[str, Any]] = spec.params["categories"]

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        missing = []
        for cat, cfg in categories.items():
            found = find_columns(ctx.df.schema, cfg["rules"])
            required = cfg.get("required", True)
            if found:
                report.add(spec.section, spec.requirement, PASS,
                           f"category '{cat}': matched column(s) {found}")
            elif required:
                report.add(spec.section, spec.requirement, FAIL,
                           f"category '{cat}': no column matches any rule")
                missing.append(cat)
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"category '{cat}': optional, not present")
        if missing:
            # composite failure row (names.py:236-268)
            report.add(spec.section, spec.requirement, FAIL,
                       f"required column categories missing: {missing}")
        return stamp(report, _MOD, "compile_column_rules")

    return DriverCheck(spec.check_id, fn)
