"""Referential-integrity check: conv_id must exist in the registry.

Reference analog: checks/data_vars/georeferencing.py:12-67 — every data
var's ``grid_mapping`` attribute must name an existing variable (a
foreign-key existence check done by dict lookup on the driver). At
transcript scale this becomes a join against the conversations registry.

Spark-first design: the registry side is broadcast when small (dimension
table), so the check adds NO shuffle to the main pass — the compiler folds
the join into the same scan that evaluates the row predicates. To keep the
violations table at conversation granularity (not row granularity), the
predicate only fires on each conversation's first row (``_rn == 1``),
which the shared window enrichment already provides.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import FAIL, PASS, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, RowCheck
from .ordering import RN

_MOD = __name__

#: column the compiler adds from the registry join (non-null = conv exists)
REG_MARKER = "_reg_conv_id"


def compile_refint(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """params: none beyond the suite's registry_df (RunContext).

    One violation row per dangling conversation, stamped on its first turn.
    """
    pred = (F.col(RN) == 1) & F.col(REG_MARKER).isNull()
    detail = F.lit("conv_id not present in conversations registry")

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} conversations missing from registry")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "every conv_id present in registry")
        return stamp(report, _MOD, "compile_refint")

    return [RowCheck(spec.check_id, pred, detail, verdict, needs_window=True)]
