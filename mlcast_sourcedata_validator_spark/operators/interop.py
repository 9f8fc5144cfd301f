"""Tool-compatibility / roundtrip checks.

Reference analogs:
- GDAL roundtrip: export a sample slice to GeoTIFF, re-open, assert the
  geotransform + projection survive (checks/tool_compatibility/
  gdal.py:102-251). Spark analog: write a bounded sample of the batch to
  Parquet, read it back, assert schema equality and exact row equality
  (``exceptAll`` both ways).
- cartopy sampled transform: take a strided sample, apply the transform,
  assert no NaNs appear (cartopy.py:34-180). Spark analog: sampled
  decode probe — every sampled text row must survive a UTF-8
  encode/decode roundtrip (binary cast there and back).

Both degrade to WARNING instead of aborting when anything in the
environment fails — the reference's pattern at gdal.py:133-140, 243-249.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, DriverCheck, RunContext

_MOD = __name__


def compile_roundtrip(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: sample_rows=100 — write/read-back equality on a sample."""
    n = spec.params.get("sample_rows", 100)

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        tmp = tempfile.mkdtemp(prefix="roundtrip_")
        try:
            sample = ctx.df.limit(n).localCheckpoint()
            sample.write.mode("overwrite").parquet(tmp)
            back = ctx.spark.read.parquet(tmp)
            # names+types only: parquet legitimately widens nullability
            shape = lambda df: [(f.name, f.dataType.simpleString())  # noqa: E731
                                for f in df.schema.fields]
            if shape(back) != shape(sample):
                report.add(spec.section, spec.requirement, FAIL,
                           f"schema changed across parquet roundtrip: "
                           f"{back.schema.simpleString()}")
            elif (sample.exceptAll(back).isEmpty()
                  and back.exceptAll(sample).isEmpty()):
                report.add(spec.section, spec.requirement, PASS,
                           f"{n}-row sample survives parquet write/read "
                           f"roundtrip exactly")
            else:
                report.add(spec.section, spec.requirement, FAIL,
                           "row values changed across parquet roundtrip")
        except Exception as exc:  # degrade, never abort (gdal.py:243-249)
            report.add(spec.section, spec.requirement, WARNING,
                       f"roundtrip check could not run: {exc}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return stamp(report, _MOD, "compile_roundtrip")

    return DriverCheck(spec.check_id, fn)


def compile_sampled_decode(spec: CheckSpec, suite: CheckSuite) -> DriverCheck:
    """params: column='text', fraction=0.01, seed=7, max_rows=10000.

    Sampled probe (cartopy.py:144-151 pattern): encode->decode roundtrip
    must preserve every sampled value; NULLs are skipped (they are the
    null-rate check's business).
    """
    column = spec.params.get("column", "text")
    fraction = spec.params.get("fraction", 0.01)
    seed = spec.params.get("seed", 7)
    max_rows = spec.params.get("max_rows", 10000)

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        try:
            c = F.col(column)
            bad = (
                ctx.df.sample(fraction=fraction, seed=seed)
                .limit(max_rows)
                .where(c.isNotNull())
                .where(F.decode(F.encode(c, "utf-8"), "utf-8") != c)
                .count()
            )
            if bad:
                report.add(spec.section, spec.requirement, FAIL,
                           f"{bad} sampled '{column}' values do not survive "
                           f"a utf-8 encode/decode roundtrip")
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"sampled '{column}' values survive utf-8 "
                           f"roundtrip (fraction={fraction})")
        except Exception as exc:
            report.add(spec.section, spec.requirement, WARNING,
                       f"sampled decode check could not run: {exc}")
        return stamp(report, _MOD, "compile_sampled_decode")

    return DriverCheck(spec.check_id, fn)
