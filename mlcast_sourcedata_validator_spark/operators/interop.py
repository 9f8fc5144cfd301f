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
    """params: sample_rows=100 — write/read-back equality on a sample.

    The sample is fetched with ``take(n)`` (incremental collect: Spark
    tries 1 partition, escalating only if short) and rebuilt as a
    driver-local DataFrame — the earlier ``limit(n).localCheckpoint()``
    form materialized the limit through an RDD checkpoint, which runs a
    task on EVERY partition of the scan (measured 1-7 s of the suite
    wall on a 64-bucket table; at 10^12 rows it would be millions of
    task launches for a 100-row probe)."""
    n = spec.params.get("sample_rows", 100)

    def fn(ctx: RunContext) -> ValidationReport:
        report = ValidationReport()
        tmp = tempfile.mkdtemp(prefix="roundtrip_")
        try:
            sample = ctx.spark.createDataFrame(ctx.df.take(n),
                                               schema=ctx.df.schema)
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


def compile_sampled_decode(spec: CheckSpec, suite: CheckSuite):
    """params: column='text', fraction=0.01, seed=7, max_rows=10000,
    mode='sampled'|'full'.

    ``mode='sampled'`` (default): sampled probe (cartopy.py:144-151
    pattern): encode->decode roundtrip must preserve every sampled
    value; NULLs are skipped (they are the null-rate check's business).

    ``mode='full'``: the check becomes an AggCheck riding the fused
    single-scan Observation — FULL coverage at zero extra jobs. The
    reference sampled because its probe (a cartopy transform) is
    expensive per element; a utf-8 encode/decode is two JVM expressions,
    so sampling buys nothing here: the sampled form costs a whole extra
    job (its mid-plan GlobalLimit sweeps a LocalLimit task over every
    scan partition — measured 0.8-4 s of the suite wall) to check LESS.
    The flagship transcripts_v1 suite ships in full mode; 'sampled'
    stays for probes over columns too hot to double-scan in the fused
    pass. The expression cannot throw (encode('utf-8') always yields
    valid bytes — unpaired surrogates become replacement chars, which
    is exactly the corruption the decode-compare then flags), so full
    mode needs no runtime degrade path.
    """
    column = spec.params.get("column", "text")
    fraction = spec.params.get("fraction", 0.01)
    seed = spec.params.get("seed", 7)
    max_rows = spec.params.get("max_rows", 10000)
    mode = spec.params.get("mode", "sampled")
    if mode not in ("sampled", "full"):
        raise ValueError(f"sampled_decode mode must be 'sampled' or "
                         f"'full', got {mode!r}")

    if mode == "full":
        from ..suite import AggCheck

        cid = spec.check_id
        c = F.col(column)
        bad_expr = F.sum(
            F.when(
                c.isNotNull()
                & (F.decode(F.encode(c, "utf-8"), "utf-8") != c),
                1,
            ).otherwise(0)
        )

        def verdict(m) -> ValidationReport:
            report = ValidationReport()
            bad = int(m.get(f"{cid}__decode_bad") or 0)
            if bad:
                report.add(spec.section, spec.requirement, FAIL,
                           f"{bad} '{column}' values do not survive a "
                           f"utf-8 encode/decode roundtrip (full scan)")
            else:
                report.add(spec.section, spec.requirement, PASS,
                           f"every '{column}' value survives utf-8 "
                           f"roundtrip (full scan)")
            return stamp(report, _MOD, "compile_sampled_decode")

        return AggCheck(cid, {f"{cid}__decode_bad": bad_expr}, verdict)

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
