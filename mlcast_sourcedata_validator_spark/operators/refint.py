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


def compile_reconciliation(spec: CheckSpec, suite: CheckSuite,
                           partition_scoped: bool = False):
    """Cross-table aggregate reconciliation against the registry:
    per-key aggregates of the validated table must equal declared
    registry columns within tolerance (e.g. ``min(ts)`` per conversation
    equals the registry's ``started_at``).

    params:
      - ``key``: join key (default: the suite's conv col)
      - ``rules``: list of ``{"agg_sql", "expect", "atol", "rtol"}``
        (see :func:`..functions.behavior.reconcile_aggregates`)
      - ``max_examples``: mismatched keys quoted in the detail (default 3)
      - ``severity``: FAIL (default) or WARNING

    Runs as a DriverCheck with its own bounded job (one key shuffle with
    map-side partials + a join of two aggregate-sized relations), like
    ``conv_duplicates``/``hot_keys`` — per-key cross-table state cannot
    ride the fused row-level Observation. Catches header-vs-detail drift
    (partial reloads, double-applied deltas) that within-table checks
    and row-membership refint are both blind to.

    Reference analog: the reference's referential check
    (georeferencing.py:41-65) is existence-only; it has no cross-table
    value reconciliation.
    """
    from ..functions.behavior import reconcile_aggregates
    from ..report import WARNING
    from ..suite import DriverCheck

    key = spec.params.get("key", suite.conv_col)
    rules = spec.params.get("rules")
    if not rules:
        raise ValueError(f"{spec.check_id}: reconciliation needs 'rules'")
    for i, r in enumerate(rules):
        missing = {"agg_sql", "expect"} - set(r)
        if missing:
            raise ValueError(
                f"{spec.check_id}: rules[{i}] missing {sorted(missing)}")
    max_examples = int(spec.params.get("max_examples", 3))
    severity = spec.params.get("severity", FAIL)
    if severity not in (WARNING, FAIL):
        raise ValueError(f"reconciliation severity must be WARNING or "
                         f"FAIL, got {severity!r}")
    if partition_scoped:
        # a one-date-partition batch sees only a conversation's SLICE:
        # its per-key aggregates (min(ts), counts, sums) legitimately
        # differ from the registry's whole-conversation declarations —
        # comparing them would false-FAIL every conversation that spans
        # partitions. Whole-table reconciliation is the rollup/audit
        # layer's job in checkpointed mode (functions/rollup.py), so the
        # check declares itself out of scope instead of guessing.
        raise ValueError(
            f"{spec.check_id}: reconciliation is whole-table only — a "
            "partition batch's per-key aggregates cannot be compared to "
            "the registry's whole-conversation declarations; run it via "
            "--whole-table or reconcile the maintained rollup instead")

    def fn(ctx) -> ValidationReport:
        report = ValidationReport()
        if ctx.registry_df is None:
            raise ValueError(
                f"{spec.check_id}: reconciliation check needs registry_df")
        bad = reconcile_aggregates(ctx.df, ctx.registry_df, key, rules)
        # one aggregate job: total mismatches + bounded exemplars
        top = (
            bad.groupBy("rule_idx", "expect_col")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.slice(F.sort_array(F.collect_set(key)), 1, max_examples)
                 .alias("examples"))
            .orderBy("rule_idx")
            .collect()
        )
        if top:
            parts = [
                f"rule {t['rule_idx']} ({rules[t['rule_idx']]['agg_sql']} vs "
                f"{t['expect_col']}): {t['n']} mismatched key(s), e.g. "
                f"{', '.join(str(x) for x in t['examples'])}"
                for t in top
            ]
            report.add(spec.section, spec.requirement, severity,
                       "registry reconciliation failed — " + "; ".join(parts))
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"{len(rules)} aggregate rule(s) reconcile with the "
                       f"registry on every {key}")
        return stamp(report, _MOD, "compile_reconciliation")

    return [DriverCheck(spec.check_id, fn)]
