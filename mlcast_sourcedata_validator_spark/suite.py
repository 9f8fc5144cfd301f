"""Declarative CheckSuite model + registry.

The reference's "query plan" is a hard-coded sequential spec function
(/root/reference/mlcast_dataset_validator/specs/source_data/
radar_precipitation.py:38-270) discovered by a pkgutil walk
(specs/cli.py:18-44). Here the suite is *data*: an ordered list of
``CheckSpec`` rows that the compiler fuses into one Spark scan per
partition, plus a module-level registry for CLI dispatch.

Contribution types returned by each check's ``compile_*`` function:

- ``DriverCheck`` — pure driver-side assertion over schema / storage
  metadata; zero scans (reference analog: data_structure.py, names.py —
  metadata checks that never materialize data).
- ``AggCheck``    — aggregate expressions merged into the fused
  ``Observation`` evaluated during the main scan; verdict is a function of
  the observed row (analog: temporal.py min/max span verdict).
- ``RowCheck``    — per-row violation predicate (True = violation) with a
  detail expression; violations become rows in the violations table, the
  verdict is a function of the violation count (analog: naming.py per-var
  loop emitting per-offender details).
- ``WindowCheck`` — RowCheck evaluated after lag/row_number enrichment over
  ``Window.partitionBy(conv).orderBy(turn)`` (analog:
  variable_timestep.py consecutive-diff analysis).
- ``DriftCheck``  — histogram-binned distribution comparison vs a baseline
  snapshot (KS + PSI); bins come from the same fused Observation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column

from .report import ValidationReport


@dataclass
class CheckSpec:
    """One declarative check: WHAT to verify, not HOW (params only)."""

    check_id: str
    kind: str  # schema|storage|stats|row|window|refint|drift|custom
    section: str
    requirement: str
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class CheckSuite:
    suite_id: str
    checks: list[CheckSpec]
    # column bindings (input_hint schema by default)
    conv_col: str = "conv_id"
    turn_col: str = "turn_idx"
    ts_col: str = "ts"

    def spec(self, check_id: str) -> CheckSpec:
        for c in self.checks:
            if c.check_id == check_id:
                return c
        raise KeyError(check_id)


# --- compiled contribution types -------------------------------------------


@dataclass
class DriverCheck:
    check_id: str
    fn: Callable[["RunContext"], ValidationReport]


@dataclass
class AggCheck:
    check_id: str
    #: metric name -> aggregate Column; names must be globally unique
    exprs: dict[str, Column]
    #: observed metrics dict -> report
    verdict: Callable[[dict[str, Any]], ValidationReport]


@dataclass
class RowCheck:
    check_id: str
    #: True = this row violates the check
    pred: Column
    #: string Column rendered into the violation row's detail
    detail: Column
    #: (n_violations, metrics) -> report
    verdict: Callable[[int, dict[str, Any]], ValidationReport]
    needs_window: bool = False
    #: severity used for the violation rows ("FAIL" or "WARNING")
    severity: str = "FAIL"
    #: columns the compiler must project onto the scan BEFORE the fused
    #: Observation (same mechanism as the drift bucket projection):
    #: required when pred/detail derive from a non-deterministic source
    #: (e.g. input_file_name()) — CollectMetrics rejects those inline,
    #: but accepts a projected attribute. name -> Column expression.
    pre_cols: dict = field(default_factory=dict)


@dataclass
class PostAggCheck:
    """Aggregate over the window-enriched slim plan, evaluated in one
    shared post-aggregate job (the explicit replacement for the
    reference's memoized shared analysis, variable_timestep.py:12,35-44).
    ``needs`` declares required enrichment columns (e.g. 'dt')."""

    check_id: str
    #: metric name -> aggregate Column over the enriched plan
    exprs: dict[str, Column]
    #: (metrics, ctx) -> report
    verdict: Callable[..., ValidationReport]
    needs: tuple = ()


@dataclass
class DriftCheck:
    check_id: str
    #: column expression producing the bin index (int, 1..n_bins)
    bucket: Column
    n_bins: int
    metric: str  # name in the baseline snapshot table
    verdict: Callable[[dict[str, Any]], ValidationReport]


@dataclass
class RunContext:
    """Everything a compiled suite needs at run time."""

    spark: Any
    df: Any  # input transcripts DataFrame (one partition batch or whole table)
    suite: CheckSuite
    run_id: str
    partition_id: Optional[str] = None
    registry_df: Any = None  # conversations registry (refint parent)
    baseline_df: Any = None  # drift baseline histograms
    table_path: Optional[str] = None  # for storage checks
    #: fsspec storage options for remote table paths (the reference's
    #: --s3-endpoint-url/--s3-anon plumbing, specs/cli.py:140-160)
    storage_options: Optional[dict] = None
    exact: bool = False  # tests: exact countDistinct instead of HLL
    #: cap the violations table to at most this many EXAMPLE rows per
    #: check (compiler._cap_examples). Verdict counts stay exact — they
    #: ride the fused Observations. None = emit every violation row.
    violations_limit: Optional[int] = None


# --- suite registry (analog of specs/cli.py module discovery) ---------------

_REGISTRY: dict[str, Callable[[], CheckSuite]] = {}
_DISCOVERED = False


def register_suite(name: str):
    def deco(fn: Callable[[], CheckSuite]):
        _REGISTRY[name] = fn
        return fn
    return deco


def discover_suites() -> None:
    """pkgutil-walk the ``plans`` package and import every module so its
    ``@register_suite`` decorators run — the reference's dynamic spec
    discovery (specs/cli.py:18-44 walks ``specs/<stage>/<product>``).
    Adding a new table type = dropping a module into ``plans/``; no
    registry edit."""
    global _DISCOVERED
    if _DISCOVERED:
        return
    import importlib
    import pkgutil

    from . import plans

    for m in pkgutil.iter_modules(plans.__path__):
        if not m.name.startswith("_"):
            importlib.import_module(f"{plans.__name__}.{m.name}")
    _DISCOVERED = True


def get_suite(name: str) -> CheckSuite:
    discover_suites()
    return _REGISTRY[name]()


def list_suites() -> list[str]:
    discover_suites()
    return sorted(_REGISTRY)


# --- declarative serialization: suites as shippable data --------------------
# A CheckSpec is literal data (ids, kinds, requirement text, JSON params),
# so a whole suite round-trips through JSON — teams can version, review
# and deploy check suites as plain files with no Python module, the way
# the north_star's "declarative check suites" reads. The reference's
# equivalent surface is a hard-coded spec *module* per product
# (/root/reference/mlcast_dataset_validator/specs/source_data/
# radar_precipitation.py:38-270); here the spec is a document.

SUITE_FILE_VERSION = 1


def suite_to_dict(suite: CheckSuite) -> dict:
    return {
        "version": SUITE_FILE_VERSION,
        "suite_id": suite.suite_id,
        "conv_col": suite.conv_col,
        "turn_col": suite.turn_col,
        "ts_col": suite.ts_col,
        "checks": [
            {
                "check_id": c.check_id,
                "kind": c.kind,
                "section": c.section,
                "requirement": c.requirement,
                "params": c.params,
            }
            for c in suite.checks
        ],
    }


def suite_from_dict(d: dict) -> CheckSuite:
    """Validate + build a CheckSuite from parsed JSON. Fails loudly on
    version/shape problems, duplicate check_ids, and kinds the compiler
    does not know (a typo'd kind must die at LOAD time, not as a
    KeyError mid-run on a 1000-executor cluster)."""
    if not isinstance(d, dict) or "checks" not in d or "suite_id" not in d:
        raise ValueError("suite file must be an object with "
                         "'suite_id' and 'checks'")
    ver = d.get("version", SUITE_FILE_VERSION)
    if ver != SUITE_FILE_VERSION:
        raise ValueError(f"unsupported suite file version {ver!r} "
                         f"(this engine reads version {SUITE_FILE_VERSION})")
    from .compiler import _COMPILERS  # late import: compiler imports us

    checks, seen = [], set()
    for i, c in enumerate(d["checks"]):
        missing = {"check_id", "kind", "section", "requirement"} - set(c)
        if missing:
            raise ValueError(f"checks[{i}] missing fields {sorted(missing)}")
        if c["kind"] not in _COMPILERS:
            raise ValueError(
                f"checks[{i}] ({c['check_id']!r}): unknown kind "
                f"{c['kind']!r}; known kinds: {sorted(_COMPILERS)}")
        if c["check_id"] in seen:
            raise ValueError(f"duplicate check_id {c['check_id']!r}")
        seen.add(c["check_id"])
        params = c.get("params", {})
        if not isinstance(params, dict):
            raise ValueError(f"checks[{i}] params must be an object")
        checks.append(CheckSpec(c["check_id"], c["kind"], c["section"],
                                c["requirement"], params))
    return CheckSuite(
        suite_id=d["suite_id"],
        checks=checks,
        conv_col=d.get("conv_col", "conv_id"),
        turn_col=d.get("turn_col", "turn_idx"),
        ts_col=d.get("ts_col", "ts"),
    )


def suite_to_json(suite: CheckSuite) -> str:
    import json

    return json.dumps(suite_to_dict(suite), indent=2)


def suite_from_json(text: str) -> CheckSuite:
    import json

    return suite_from_dict(json.loads(text))


def load_suite_file(path: str) -> CheckSuite:
    """Load a suite from a JSON file (local or remote — same fsspec
    surface as every other sidecar read)."""
    from .sources import fs

    return suite_from_json(fs.read_text(path))
