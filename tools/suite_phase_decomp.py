"""Per-phase wall decomposition of the bucketed suite run at local[32]
vs local[8] — finds the Amdahl constant behind the bucketed layout's
sub-0.8 raw scaling ratio (BENCH/bucketed_calibration_r05.json showed
the 64-task scan constraint is NOT it: a matched bucket-constrained
ideal job scales 0.71-0.95).

Phases timed separately (run_suite internals, replayed here in order):
  compile   — compile_suite + build_suite_plan (pure driver)
  driver    — the DriverChecks, each timed (storage/license/roundtrip/
              sampled_decode run their own small fixed-size jobs)
  fused     — violations localCheckpoint + Observation gets (the ONE
              big scan job; this is the part the layout accelerates)
  post      — shared post-aggregates + drift joins + verdict assembly
              (approximated as remainder of run_suite wall)

Output: JSON to stdout + BENCH/suite_phase_decomp_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

ROUNDS = int(os.environ.get("DECOMP_ROUNDS", "2"))


def one_level(cores: int) -> dict:
    from mlcast_sourcedata_validator_spark.compiler import (
        build_suite_plan, compile_suite, run_suite,
    )
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite

    s = bench._session(cores)
    bench.attach_bucketed_tables(s)
    df = s.table("bench_bkt_t")
    registry = s.table("bench_bkt_reg")
    baseline = __import__("pyspark.sql", fromlist=["x"])  # placeholder
    baseline = s.read.parquet(bench.BENCH_BASELINE)
    suite = get_suite("transcripts_v1")
    ctx = RunContext(spark=s, df=df, suite=suite, run_id="decomp",
                     registry_df=registry, baseline_df=baseline,
                     table_path=bench.BENCH_TABLE)

    out: dict = {"cores": cores, "rounds": []}
    for _ in range(ROUNDS):
        r: dict = {}
        t0 = time.time()
        cs = compile_suite(suite, exact=False, partition_scoped=False)
        r["compile_suite"] = round(time.time() - t0, 3)

        t0 = time.time()
        per_driver = {}
        for cid, dc in cs.driver_checks:
            td = time.time()
            dc.fn(ctx)
            per_driver[cid] = round(time.time() - td, 3)
        r["driver_checks"] = round(time.time() - t0, 3)
        r["per_driver"] = per_driver

        t0 = time.time()
        plan = build_suite_plan(ctx, cs)
        r["build_plan"] = round(time.time() - t0, 3)

        t0 = time.time()
        viol = plan.violations.localCheckpoint()
        _ = viol.count()
        r["fused_job"] = round(time.time() - t0, 3)

        t0 = time.time()
        m = dict(plan.obs.get) if plan.obs is not None else {}
        if plan.post_obs is not None and plan.enriched is not None:
            try:
                m.update(plan.post_obs.get)
            except Exception:
                pass
        r["observations"] = round(time.time() - t0, 3)

        t0 = time.time()
        res = run_suite(ctx)
        r["full_run_suite"] = round(time.time() - t0, 3)
        r["n_rows"] = res.n_input_rows
        out["rounds"].append(r)
        print(f"cores={cores} {json.dumps(r)}", file=sys.stderr)
    s.stop()
    return out


def main() -> int:
    res = {"hi": one_level(32), "lo": one_level(8)}
    blob = json.dumps(res)
    print(blob)
    with open(os.path.join(REPO, "BENCH",
                           "suite_phase_decomp_r05.json"), "w") as f:
        f.write(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
