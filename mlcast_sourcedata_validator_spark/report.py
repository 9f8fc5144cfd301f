"""Result / ValidationReport model and its Spark mapping.

Reproduces the reference's output data model (see
/root/reference/mlcast_dataset_validator/specs/base.py:13-137):

- ``Result``: section / requirement / status / detail plus module+function
  lineage (base.py:13-27); status domain is exactly {FAIL, WARNING, PASS},
  validated at construction (base.py:22-27 — the docstring's "INFO" level
  would be rejected by the reference too).
- ``ValidationReport``: list of results with order-preserving union-all
  merge semantics (``+=`` base.py:64-76, ``+`` base.py:78-90), summarize
  (base.py:52-62), has_fails (base.py:130-137; drives the exit code,
  specs/cli.py:172), console_print (base.py:92-128).

The reference's ``ok`` flag is initialized True and never flipped by
``add()`` (base.py:30-33,75,88) — effectively dead; the real failure
criterion is has_fails().  We keep the same semantics.

Spark mapping: small verdict rows stay driver-side (like the reference);
at scale they are appended to a *results table* with suite/run/partition
lineage, and offending rows go to a separate *violations table* instead of
free-text details (the reference embeds values in the detail string, e.g.
checks/coords/spatial.py:54 — untenable at 10^12 rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FAIL = "FAIL"
WARNING = "WARNING"
PASS = "PASS"
_VALID_STATUSES = (FAIL, WARNING, PASS)

#: schema of the persisted results table (SURVEY.md §1.4)
RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("suite_id", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), True),
        T.StructField("section", T.StringType(), False),
        T.StructField("requirement", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),
        T.StructField("module", T.StringType(), True),
        T.StructField("function", T.StringType(), True),
    ]
)

#: schema of the persisted violations table (engine addition per north_rule:
#: per-row offenders get (conv_id, turn_idx, check_id, detail) rows)
VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("check_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("partition_id", T.StringType(), True),
    ]
)


@dataclass
class Result:
    """One check outcome row (ref: specs/base.py:13-27)."""

    section: str
    requirement: str
    status: str
    detail: str = ""
    module: Optional[str] = None
    function: Optional[str] = None

    def __post_init__(self) -> None:
        if self.status not in _VALID_STATUSES:
            raise ValueError(
                f"status must be one of {_VALID_STATUSES}, got {self.status!r}"
            )


@dataclass
class ValidationReport:
    """Ordered collection of Results with union-all merge algebra."""

    ok: bool = True  # kept for parity with the reference; see module docstring
    results: list[Result] = field(default_factory=list)

    def add(
        self,
        section: str,
        requirement: str,
        status: str,
        detail: str = "",
        module: Optional[str] = None,
        function: Optional[str] = None,
    ) -> None:
        self.results.append(Result(section, requirement, status, detail, module, function))

    def __iadd__(self, other: "ValidationReport") -> "ValidationReport":
        self.ok = self.ok and other.ok
        self.results.extend(other.results)
        return self

    def __add__(self, other: "ValidationReport") -> "ValidationReport":
        merged = ValidationReport(ok=self.ok and other.ok)
        merged.results = list(self.results) + list(other.results)
        return merged

    def summarize(self) -> dict[str, int]:
        counts = {FAIL: 0, WARNING: 0, PASS: 0}
        for r in self.results:
            counts[r.status] += 1
        return counts

    def has_fails(self) -> bool:
        return any(r.status == FAIL for r in self.results)

    def has_warnings(self) -> bool:
        return any(r.status == WARNING for r in self.results)

    def console_print(self) -> str:
        """Plain-text analog of the reference's rich table (base.py:92-128).

        The function column strips this package's prefix, mirroring
        base.py:113-116.
        """
        emoji = {FAIL: "[FAIL]", WARNING: "[WARN]", PASS: "[PASS]"}
        prefix = "mlcast_sourcedata_validator_spark.operators."
        lines = []
        for r in self.results:
            fn = ""
            if r.module and r.function:
                mod = r.module
                if mod.startswith(prefix):
                    mod = mod[len(prefix):]
                fn = f"{mod}.{r.function}"
            lines.append(
                f"{emoji[r.status]:7s} {r.section} | {r.requirement} | {r.detail} | {fn}"
            )
        s = self.summarize()
        lines.append(
            f"summary: {s[FAIL]} fails, {s[WARNING]} warnings, {s[PASS]} passes"
        )
        out = "\n".join(lines)
        print(out)
        return out

    def to_dict(
        self,
        suite_id: str,
        run_id: str,
        partition_id: Optional[str] = None,
    ) -> dict:
        """Machine-readable report for CI pipelines: the same rows
        ``to_df`` emits plus the summary and exit code (driver-side;
        a report is O(#checks) rows)."""
        s = self.summarize()
        return {
            "suite_id": suite_id,
            "run_id": run_id,
            "partition_id": partition_id,
            "summary": {"fails": s[FAIL], "warnings": s[WARNING],
                        "passes": s[PASS]},
            "exit_code": 1 if self.has_fails() else 0,
            "results": [
                {"section": r.section, "requirement": r.requirement,
                 "status": r.status, "detail": r.detail,
                 "module": r.module, "function": r.function}
                for r in self.results
            ],
        }

    def to_json(
        self,
        suite_id: str,
        run_id: str,
        partition_id: Optional[str] = None,
    ) -> str:
        import json

        return json.dumps(self.to_dict(suite_id, run_id, partition_id),
                          indent=2)

    # -- Spark mapping ----------------------------------------------------

    def to_df(
        self,
        spark: SparkSession,
        suite_id: str,
        run_id: str,
        partition_id: Optional[str] = None,
    ) -> DataFrame:
        rows = [
            (suite_id, run_id, partition_id, r.section, r.requirement, r.status,
             r.detail, r.module, r.function)
            for r in self.results
        ]
        return spark.createDataFrame(rows, schema=RESULTS_SCHEMA)


def stamp(report: ValidationReport, module: str, function: str) -> ValidationReport:
    """Attach module/function lineage to every result that lacks it.

    Engine analog of the reference's @log_function_call decorator
    (utils/logging_decorator.py:6-19).
    """
    for r in report.results:
        if r.module is None:
            r.module = module
        if r.function is None:
            r.function = function
    return report


def empty_violations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=VIOLATIONS_SCHEMA)
