"""Conditionally-required table properties: required iff a data-derived
condition holds.

Reference analog: checks/global_attributes/conditional.py:13-67 — the
``consistent_timestep_start`` attribute is required *iff* the dataset has
variable timesteps, where the condition reuses the memoized timestep
analysis (conditional.py:18, variable_timestep.py:35-44). Unknown
conditional attributes raise, as in the reference (conditional.py:52-58).

Spark mapping: the condition is an aggregate over the window-enriched plan
(global count of distinct consecutive ts diffs). The compiler evaluates
all such aggregates in one lightweight *post-aggregate* job over the slim
(conv_id, turn_idx, ts) projection — the explicit-shared-aggregate
replacement for the reference's id(ds) memo cache.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import PASS, WARNING, ValidationReport, stamp
from ..sources.properties import read_properties_or_warning
from ..suite import CheckSpec, CheckSuite, PostAggCheck

_MOD = __name__

#: condition name -> (needed enrichment columns, agg exprs builder,
#: truth fn over the agg row) — the CONDITION_FUNCTIONS registry analog
#: (conditional.py:22-24)
CONDITIONS = {
    "variable_timestep": {
        "needs": ("dt",),
        # HLL, not count_distinct: the expression must be legal inside a
        # CollectMetrics observation (distinct aggregates are not) so the
        # condition rides the main action; HLL is exact at tiny
        # cardinalities, and the truth test is only "> 1"
        "exprs": lambda cid: {
            f"{cid}__n_distinct_dt": F.approx_count_distinct(F.col("_dt"), 0.01)
        },
        "truth": lambda cid, m: (m.get(f"{cid}__n_distinct_dt") or 0) > 1,
        "describe": "timesteps are variable",
    },
}


def compile_conditional_property(spec: CheckSpec, suite: CheckSuite) -> PostAggCheck:
    """params: property, condition (name in CONDITIONS), severity='WARNING'.

    Missing-when-required yields WARNING by default — the reference emits a
    WARNING, not a FAIL, for a missing consistent_timestep_start
    (variable_timestep.py:124-139).
    """
    prop = spec.params["property"]
    cond_name = spec.params.get("condition", "variable_timestep")
    severity = spec.params.get("severity", WARNING)
    if cond_name not in CONDITIONS:
        # reference parity: unknown conditional attr raises (conditional.py:52-58)
        raise ValueError(f"unknown condition {cond_name!r} for {spec.check_id}")
    cond = CONDITIONS[cond_name]
    cid = spec.check_id

    def verdict(m: dict[str, Any], ctx) -> ValidationReport:
        report = ValidationReport()
        if ctx.table_path is None:
            report.add(spec.section, spec.requirement, WARNING,
                       "table properties unavailable — conditional check skipped")
            return stamp(report, _MOD, "compile_conditional_property")
        if not cond["truth"](cid, m):
            report.add(spec.section, spec.requirement, PASS,
                       f"condition '{cond_name}' not met; property '{prop}' "
                       f"not required")
            return stamp(report, _MOD, "compile_conditional_property")
        props, fs_warn = read_properties_or_warning(
            ctx.table_path, ctx.storage_options, ctx.spark)
        if fs_warn:
            report.add(spec.section, spec.requirement, WARNING,
                       f"conditional check skipped: {fs_warn}")
            return stamp(report, _MOD, "compile_conditional_property")
        if prop in props:
            report.add(spec.section, spec.requirement, PASS,
                       f"{cond['describe']} and property '{prop}'="
                       f"'{props[prop]}' is present")
        else:
            report.add(spec.section, spec.requirement, severity,
                       f"{cond['describe']} but table property '{prop}' "
                       f"is missing")
        return stamp(report, _MOD, "compile_conditional_property")

    return PostAggCheck(cid, cond["exprs"](cid), verdict, needs=cond["needs"])
