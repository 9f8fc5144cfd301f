"""Text-quality check kinds for document corpora: quality-score band and
sentence-repetition rate, riding the fused single scan.

These fold the §2C text-analysis operators (functions/text.py
``quality_score`` and the dup-sentence part of ``text_repetition``) into
the declarative validation engine — the reference folds its per-variable
heuristics into check functions the same way
(/root/reference/mlcast_dataset_validator/checks/data_vars/structure.py:24-58
derives verdicts from per-variable derived quantities). Both kinds
compile to pure JVM Column expressions over the text column:

- the aggregate band rides the shared Observation (zero extra jobs),
- the per-row floor explodes violations MAP-SIDE,

so ``documents_v1``'s plan stays zero-shuffle. The shuffle-bearing
repetition signal (``top_token_ratio``: token explode + two id-keyed
aggs) deliberately stays a standalone operator in functions/text.py —
folding it in would cost the suite its single-scan/zero-exchange shape
for a signal that is only needed on corpora that already failed the
cheap screens.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, functions as F

from ..functions.text import quality_score
from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import AggCheck, CheckSpec, CheckSuite, RowCheck

_MOD = __name__


def dup_sentence_ratio(text: Column) -> Column:
    """Fraction of '. '-separated sentences that repeat an earlier one —
    pure array expressions (split/array_distinct), zero shuffle. Single
    source of truth shared with functions/text.text_repetition's
    formula."""
    sents = F.split(text, "\\. ")
    return F.round(
        1 - F.size(F.array_distinct(sents)).cast("double") / F.size(sents), 6
    )


def compile_text_quality(
    spec: CheckSpec, suite: CheckSuite
) -> list[AggCheck | RowCheck]:
    """params: column ('text'), floor (per-row FAIL threshold, default
    0.3), max_low_frac (fraction of sub-floor docs tolerated, default
    0.01 FAIL / warn_low_frac 0.001 WARNING), min_avg (corpus mean
    quality WARNING floor, default 0.5)."""
    col = spec.params.get("column", "text")
    floor = spec.params.get("floor", 0.3)
    max_low_frac = spec.params.get("max_low_frac", 0.01)
    warn_low_frac = spec.params.get("warn_low_frac", 0.001)
    min_avg = spec.params.get("min_avg", 0.5)
    cid = spec.check_id
    q = quality_score(F.col(col))
    exprs = {
        f"{cid}__avg_q": F.avg(q),
        f"{cid}__n_low": F.sum(F.when(q < floor, 1).otherwise(0)),
        f"{cid}__n": F.count(F.lit(1)),
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        avg_q, n_low, n = m[f"{cid}__avg_q"], m[f"{cid}__n_low"], m[f"{cid}__n"]
        if not n:
            report.add(spec.section, spec.requirement, WARNING,
                       "no rows — quality check skipped")
            return stamp(report, _MOD, "compile_text_quality")
        frac = (n_low or 0) / n
        detail = (f"avg quality={avg_q:.4f}, {n_low} of {n} docs "
                  f"({frac:.4%}) below floor {floor}")
        if frac > max_low_frac:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} — exceeds {max_low_frac:.2%}")
        elif frac > warn_low_frac or (avg_q is not None and avg_q < min_avg):
            report.add(spec.section, spec.requirement, WARNING, detail)
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_text_quality")

    def row_verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        # the band verdict above carries the PASS/WARN/FAIL decision; the
        # row check exists to EMIT the offending documents as violation
        # rows (always PASS — informational rows, like domain's WARNING
        # spelling rows)
        report = ValidationReport()
        report.add(spec.section, spec.requirement, PASS,
                   f"{n_viol} sub-floor documents listed in violations")
        return stamp(report, _MOD, "compile_text_quality")

    row = RowCheck(
        cid, q < floor,
        F.concat(F.lit(f"quality "), F.round(q, 4).cast("string"),
                 F.lit(f" < floor {floor}")),
        row_verdict, severity=WARNING,
    )
    return [AggCheck(cid, exprs, verdict), row]


def compile_pii(
    spec: CheckSpec, suite: CheckSuite
) -> list[AggCheck | RowCheck]:
    """PII screen as a declarative check: per-row regexp hit counts over
    the shared :data:`functions.text.PII_PATTERNS` classes, riding the
    fused scan (map-side; zero shuffle). params: column ('text'),
    max_frac (fraction of PII-bearing docs tolerated before FAIL,
    default 0.0 — any PII fails), warn_frac (default 0.0 — any PII at
    least warns). The violation rows name WHICH classes hit, so the
    quarantined docs can be routed straight to
    :func:`functions.text.redact_pii`."""
    from ..functions.text import PII_PATTERNS

    col = spec.params.get("column", "text")
    max_frac = spec.params.get("max_frac", 0.0)
    warn_frac = spec.params.get("warn_frac", 0.0)
    cid = spec.check_id
    t = F.col(col)
    class_hits = {
        name: F.coalesce(F.regexp_count(t, F.lit(p)), F.lit(0))
        for name, p in PII_PATTERNS.items()
    }
    any_hit = None
    for name in PII_PATTERNS:
        c = class_hits[name] > 0
        any_hit = c if any_hit is None else (any_hit | c)
    exprs = {
        f"{cid}__n_pii": F.sum(F.when(any_hit, 1).otherwise(0)),
        f"{cid}__n": F.count(F.lit(1)),
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n_pii, n = m[f"{cid}__n_pii"], m[f"{cid}__n"]
        if not n:
            report.add(spec.section, spec.requirement, WARNING,
                       "no rows — PII check skipped")
            return stamp(report, _MOD, "compile_pii")
        frac = (n_pii or 0) / n
        detail = f"{n_pii} of {n} docs ({frac:.4%}) contain PII patterns"
        if frac > max_frac:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} — exceeds {max_frac:.2%}")
        elif frac > warn_frac:
            report.add(spec.section, spec.requirement, WARNING, detail)
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_pii")

    def row_verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        report.add(spec.section, spec.requirement, PASS,
                   f"{n_viol} PII-bearing documents listed in violations")
        return stamp(report, _MOD, "compile_pii")

    detail = F.concat(
        F.lit("pii classes: "),
        F.concat_ws(",", F.array_compact(F.array(*[
            F.when(class_hits[name] > 0,
                   F.concat(F.lit(f"{name}="),
                            class_hits[name].cast("string")))
            for name in PII_PATTERNS
        ]))),
    )
    row = RowCheck(cid, F.coalesce(any_hit, F.lit(False)), detail,
                   row_verdict, severity=WARNING)
    return [AggCheck(cid, exprs, verdict), row]


def compile_text_repetition(
    spec: CheckSpec, suite: CheckSuite
) -> list[AggCheck | RowCheck]:
    """params: column ('text'), max_dup_sentence_ratio (per-row violation
    threshold, default 0.5), max_frac (fraction of repetitive docs
    tolerated: default 0.02 FAIL / warn_frac 0.005 WARNING)."""
    col = spec.params.get("column", "text")
    max_ratio = spec.params.get("max_dup_sentence_ratio", 0.5)
    max_frac = spec.params.get("max_frac", 0.02)
    warn_frac = spec.params.get("warn_frac", 0.005)
    cid = spec.check_id
    ratio = dup_sentence_ratio(F.col(col))
    pred = F.coalesce(ratio > max_ratio, F.lit(False))
    exprs = {
        f"{cid}__n_rep": F.sum(F.when(pred, 1).otherwise(0)),
        f"{cid}__avg_ratio": F.avg(ratio),
        f"{cid}__n": F.count(F.lit(1)),
    }

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n_rep, avg_r, n = m[f"{cid}__n_rep"], m[f"{cid}__avg_ratio"], m[f"{cid}__n"]
        if not n:
            report.add(spec.section, spec.requirement, WARNING,
                       "no rows — repetition check skipped")
            return stamp(report, _MOD, "compile_text_repetition")
        frac = (n_rep or 0) / n
        detail = (f"{n_rep} of {n} docs ({frac:.4%}) have dup-sentence "
                  f"ratio > {max_ratio}; corpus avg={avg_r:.4f}")
        if frac > max_frac:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} — exceeds {max_frac:.2%}")
        elif frac > warn_frac:
            report.add(spec.section, spec.requirement, WARNING, detail)
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_text_repetition")

    def row_verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        report.add(spec.section, spec.requirement, PASS,
                   f"{n_viol} repetitive documents listed in violations")
        return stamp(report, _MOD, "compile_text_repetition")

    row = RowCheck(
        cid, pred,
        F.concat(F.lit("dup_sentence_ratio "),
                 ratio.cast("string"), F.lit(f" > {max_ratio}")),
        row_verdict, severity=WARNING,
    )
    return [AggCheck(cid, exprs, verdict), row]


def compile_gopher_rules(
    spec: CheckSpec, suite: CheckSuite
) -> list[AggCheck | RowCheck]:
    """The Gopher/MassiveText 7-rule quality filter (Rae et al. 2021,
    appendix A1.1) as a declarative check: per-rule fail counts ride the
    fused scan's Observation (zero extra jobs — the rule booleans are
    integer cross-multiplied expressions from
    :func:`functions.text.gopher_exprs`, the same single source of
    truth as the standalone ``gopher_quality`` operator and its DuckDB
    oracle). params: column ('text'), max_fail_frac (fraction of docs
    failing the conjunction tolerated before FAIL, default 0.1),
    warn_fail_frac (default 0.02). Violation rows carry WHICH rules
    failed per document, so the quarantine routes straight back to the
    offending filter."""
    from ..functions.text import gopher_exprs

    col = spec.params.get("column", "text")
    max_fail_frac = spec.params.get("max_fail_frac", 0.1)
    warn_fail_frac = spec.params.get("warn_fail_frac", 0.02)
    cid = spec.check_id
    t = F.coalesce(F.col(col), F.lit(""))
    _, rules = gopher_exprs(t, spec.params.get("rules"))
    passed = None
    for c in rules.values():
        passed = c if passed is None else passed & c
    exprs: dict[str, Column] = {
        f"{cid}__n_fail": F.sum(F.when(~passed, 1).otherwise(0)),
        f"{cid}__n": F.count(F.lit(1)),
    }
    for name, c in rules.items():
        exprs[f"{cid}__{name}"] = F.sum(F.when(~c, 1).otherwise(0))

    def verdict(m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        n_fail, n = m[f"{cid}__n_fail"], m[f"{cid}__n"]
        if not n:
            report.add(spec.section, spec.requirement, WARNING,
                       "no rows — Gopher quality check skipped")
            return stamp(report, _MOD, "compile_gopher_rules")
        frac = (n_fail or 0) / n
        per_rule = ", ".join(
            f"{name}={m[f'{cid}__{name}'] or 0}" for name in rules)
        detail = (f"{n_fail} of {n} docs ({frac:.4%}) fail the Gopher "
                  f"rule set [{per_rule}]")
        if frac > max_fail_frac:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} — exceeds {max_fail_frac:.2%}")
        elif frac > warn_fail_frac:
            report.add(spec.section, spec.requirement, WARNING, detail)
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_gopher_rules")

    def row_verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        report.add(spec.section, spec.requirement, PASS,
                   f"{n_viol} Gopher-failing documents listed in violations")
        return stamp(report, _MOD, "compile_gopher_rules")

    detail = F.concat(
        F.lit("gopher rules failed: "),
        F.concat_ws(",", F.array_compact(F.array(*[
            F.when(~c, F.lit(name)) for name, c in rules.items()
        ]))),
    )
    row = RowCheck(cid, ~passed, detail, row_verdict, severity=WARNING)
    return [AggCheck(cid, exprs, verdict), row]
