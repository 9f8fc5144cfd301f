"""License property check — full parity with the reference's 4-way verdict.

Replicates checks/global_attributes/licensing.py:47-150 exactly:

1. ``license`` property missing -> FAIL, early return (licensing.py:69-76).
2. Not a valid SPDX expression -> FAIL if ``require_spdx`` else WARNING,
   with up-to-3 fuzzy suggestions from difflib close-matches (cutoff 0.6)
   over the known-license keys (licensing.py:36-44, 89-108); early return
   on the FAIL path (licensing.py:101).
3. Normalized license in the recommended list -> PASS (licensing.py:123).
4. Contains an NC/ND token -> WARNING when ``warn_on_restricted``
   (substring test on the upper-cased expression, licensing.py:124-137).
5. Otherwise -> WARNING "requires case-by-case review" (licensing.py:139-148).

The reference normalizes via the ``license_expression`` package; that
library is optional here (import-try). Without it, normalization falls
back to case-insensitive matching against a built-in SPDX id list — the
same graceful-degradation posture as the reference's GDAL/cartopy checks
(gdal.py:21-36).
"""

from __future__ import annotations

import difflib

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..sources.properties import read_properties_or_warning
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

_MOD = __name__

#: subset of SPDX identifiers relevant to open-data licensing (the
#: reference defers to the license_expression index; this is the offline
#: fallback vocabulary)
KNOWN_SPDX = [
    "CC0-1.0", "CC-BY-4.0", "CC-BY-3.0", "CC-BY-SA-4.0", "CC-BY-SA-3.0",
    "CC-BY-NC-4.0", "CC-BY-NC-SA-4.0", "CC-BY-ND-4.0", "CC-BY-NC-ND-4.0",
    "ODbL-1.0", "ODC-By-1.0", "PDDL-1.0", "MIT", "Apache-2.0",
    "BSD-3-Clause", "GPL-3.0-only", "LGPL-3.0-only", "EUPL-1.2",
    "OGL-UK-3.0", "Unlicense",
]

_RESTRICTED_TOKENS = ("-NC", "-ND")  # non-commercial / no-derivatives

#: SPDX license-exception ids the offline fallback recognizes after WITH
KNOWN_EXCEPTIONS = [
    "Classpath-exception-2.0", "GCC-exception-3.1", "LLVM-exception",
    "GPL-3.0-linking-exception", "Autoconf-exception-3.0",
]


def _normalize_fallback(value: str) -> str | None:
    """Offline SPDX *expression* normalizer: full ``AND``/``OR``/``WITH``
    grammar with parentheses and ``+`` suffixes, canonicalizing each
    license id case-insensitively against KNOWN_SPDX (exception ids
    against KNOWN_EXCEPTIONS). Returns the canonical-cased expression or
    None if any token is unknown / the syntax is invalid — so
    ``"MIT OR Apache-2.0"`` verdicts identically with and without the
    license_expression package (reference licensing.py:16-33 parses the
    same grammar)."""
    by_lower = {k.lower(): k for k in KNOWN_SPDX}
    exc_lower = {k.lower(): k for k in KNOWN_EXCEPTIONS}
    toks = value.replace("(", " ( ").replace(")", " ) ").split()
    if not toks:
        return None
    out: list[str] = []
    depth = 0
    #: state machine: an expression alternates id-or-'(' with op-or-')'
    expect_id = True
    i = 0
    while i < len(toks):
        t = toks[i]
        low = t.lower()
        if expect_id:
            if t == "(":
                out.append("(")
                depth += 1
            else:
                base, plus = (low[:-1], "+") if low.endswith("+") else (low, "")
                if base not in by_lower:
                    return None
                lic = by_lower[base] + plus
                # WITH binds tighter than AND/OR: consume it here
                if i + 2 < len(toks) and toks[i + 1].lower() == "with":
                    exc = exc_lower.get(toks[i + 2].lower())
                    if exc is None:
                        return None
                    lic = f"{lic} WITH {exc}"
                    i += 2
                out.append(lic)
                expect_id = False
        else:
            if t == ")":
                if depth == 0:
                    return None
                out.append(")")
                depth -= 1
            elif low in ("and", "or"):
                out.append(low.upper())
                expect_id = True
            else:
                return None
        i += 1
    if depth != 0 or expect_id:
        return None
    # render with the same spacing conventions license_expression uses
    s = " ".join(out).replace("( ", "(").replace(" )", ")")
    return s


def _normalize(value: str) -> str | None:
    """Canonical SPDX expression for ``value``, or None if unrecognized.

    Uses the license_expression package when importable (reference parity,
    licensing.py:16-33); falls back to the offline expression parser.
    """
    try:
        from license_expression import get_spdx_licensing  # type: ignore

        licensing = get_spdx_licensing()
        parsed = licensing.parse(value, validate=True)
        return str(parsed)
    except ImportError:
        return _normalize_fallback(value)
    except Exception:
        return None


def _suggest(value: str, max_suggestions: int = 3, cutoff: float = 0.6) -> list[str]:
    """Fuzzy suggestions, mirroring licensing.py:36-44 (difflib, top 3,
    cutoff 0.6, case-insensitive)."""
    by_lower = {k.lower(): k for k in KNOWN_SPDX}
    hits = difflib.get_close_matches(
        value.strip().lower(), list(by_lower), n=max_suggestions, cutoff=cutoff
    )
    return [by_lower[h] for h in hits]


def compile_license(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: require_spdx=True, recommended=[...], warn_on_restricted=True,
    property='license'."""
    require_spdx = spec.params.get("require_spdx", True)
    recommended = {r.lower() for r in spec.params.get("recommended", [])}
    warn_restricted = spec.params.get("warn_on_restricted", True)
    prop = spec.params.get("property", "license")

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        if ctx.table_path is None:
            report.add(spec.section, spec.requirement, WARNING,
                       "table properties unavailable — license check skipped")
            return stamp(report, _MOD, "compile_license")
        props, fs_warn = read_properties_or_warning(
            ctx.table_path, ctx.storage_options, ctx.spark)
        if fs_warn:
            report.add(spec.section, spec.requirement, WARNING,
                       f"license check skipped: {fs_warn}")
            return stamp(report, _MOD, "compile_license")
        raw = props.get(prop)
        # 1. missing -> FAIL, early return (licensing.py:69-76)
        if raw is None or not str(raw).strip():
            report.add(spec.section, spec.requirement, FAIL,
                       f"table property '{prop}' is missing")
            return stamp(report, _MOD, "compile_license")
        raw = str(raw).strip()
        norm = _normalize(raw)
        # 2. invalid SPDX -> FAIL/WARNING with suggestions
        if norm is None:
            sugg = _suggest(raw)
            hint = f"; did you mean {sugg}?" if sugg else ""
            status = FAIL if require_spdx else WARNING
            report.add(spec.section, spec.requirement, status,
                       f"'{raw}' is not a valid SPDX license expression{hint}")
            if status == FAIL:
                # early return like licensing.py:101
                return stamp(report, _MOD, "compile_license")
            norm = raw  # continue with the raw value (licensing.py:104-118)
        # 3. recommended -> PASS
        if norm.lower() in recommended:
            report.add(spec.section, spec.requirement, PASS,
                       f"license '{norm}' is in the recommended list")
        # 4. NC/ND -> WARNING
        elif warn_restricted and any(
            t in norm.upper() for t in _RESTRICTED_TOKENS
        ):
            report.add(spec.section, spec.requirement, WARNING,
                       f"license '{norm}' restricts commercial use or "
                       f"derivatives (NC/ND)")
        # 5. otherwise -> WARNING case-by-case (licensing.py:139-148)
        else:
            report.add(spec.section, spec.requirement, WARNING,
                       f"license '{norm}' requires case-by-case review")
        return stamp(report, _MOD, "compile_license")

    return DriverCheck(spec.check_id, fn)


def compile_required_property(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """A table property must exist (optionally with an allowed domain).

    params: property, allowed: list[str] | None, severity='FAIL'.
    Analog of the reference's plain global-attribute presence checks.
    """
    prop = spec.params["property"]
    allowed = spec.params.get("allowed")
    severity = spec.params.get("severity", FAIL)

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        if ctx.table_path is None:
            report.add(spec.section, spec.requirement, WARNING,
                       "table properties unavailable — property check skipped")
            return stamp(report, _MOD, "compile_required_property")
        props, fs_warn = read_properties_or_warning(
            ctx.table_path, ctx.storage_options, ctx.spark)
        if fs_warn:
            report.add(spec.section, spec.requirement, WARNING,
                       f"property check skipped: {fs_warn}")
            return stamp(report, _MOD, "compile_required_property")
        val = props.get(prop)
        if val is None:
            report.add(spec.section, spec.requirement, severity,
                       f"table property '{prop}' is missing")
        elif allowed is not None and val not in allowed:
            report.add(spec.section, spec.requirement, severity,
                       f"table property '{prop}'='{val}' not in {allowed}")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"table property '{prop}'='{val}'")
        return stamp(report, _MOD, "compile_required_property")

    return DriverCheck(spec.check_id, fn)
