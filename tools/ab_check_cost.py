"""Interleaved A/B of the transcripts_v1 check set on the bench table:
attribute the round-2 -> round-3 suite-throughput delta per added check.

Round 3 added three checks to the benched suite (schema_drift,
drift_role_dist, drift_tool_dist) and BENCH_r03 recorded a 1.72M -> 1.47M
turns/s dip. This tool runs, on ONE session and the SAME input files,
interleaved repetitions of:

  full      — the current transcripts_v1 set
  -<check>  — full minus one added check (one variant per check)
  r2set     — full minus all three (the round-2 benched set)

and prints one JSON line with per-variant median walls and the marginal
cost of each check (median(full) - median(full - check)). Interleaving
(variant order re-run per round) spreads ambient sandbox load across
variants instead of biasing whichever ran during a spike.

Usage: python tools/ab_check_cost.py [rounds]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses the bench table + session config)
from mlcast_sourcedata_validator_spark.compiler import run_suite  # noqa: E402
from mlcast_sourcedata_validator_spark.suite import (  # noqa: E402
    CheckSuite,
    RunContext,
    get_suite,
)

ADDED_IN_R3 = ["schema_drift", "drift_role_dist", "drift_tool_dist"]
ADDED_IN_R4 = ["role_grammar", "loop_detection",
               "drift_role_tool_joint"]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = bench._session(bench.CPUS)
    bench.ensure_bench_table(spark)
    df = spark.read.parquet(bench.BENCH_TABLE).drop("date")
    registry = spark.read.parquet(bench.BENCH_REGISTRY)
    baseline = spark.read.parquet(bench.BENCH_BASELINE)

    full = get_suite("transcripts_v1")

    def variant(excluded: list[str], vid: str) -> CheckSuite:
        return CheckSuite(
            suite_id=vid,
            checks=[c for c in full.checks if c.check_id not in excluded],
        )

    variants: dict[str, CheckSuite] = {"full": full}
    for name in ADDED_IN_R3 + ADDED_IN_R4:
        if any(c.check_id == name for c in full.checks):
            variants[f"-{name}"] = variant([name], f"ab_minus_{name}")
    variants["r2set"] = variant(
        [n for n in ADDED_IN_R3 + ADDED_IN_R4
         if any(c.check_id == n for c in full.checks)], "ab_r2set")

    def run_once(suite: CheckSuite) -> float:
        t0 = time.time()
        res = run_suite(RunContext(
            spark=spark, df=df, suite=suite, run_id="ab",
            registry_df=registry, baseline_df=baseline,
            table_path=bench.BENCH_TABLE))
        assert res.n_input_rows > 0
        return time.time() - t0

    # warm: one throwaway full run so JVM/code caches don't bill variant 1
    run_once(full)

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(rounds):
        for key, suite in variants.items():
            w = min(run_once(suite), run_once(suite))
            walls[key].append(w)
            print(f"  round {r} {key}: {w:.3f}s", file=sys.stderr)

    med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    marginal = {name: round(med["full"] - med[f"-{name}"], 3)
                for name in ADDED_IN_R3 + ADDED_IN_R4
                if f"-{name}" in med}
    out = {
        "metric": "suite_check_marginal_cost",
        "unit": "sec",
        "rounds": rounds,
        "n_turns": df.count(),
        "median_wall": med,
        "walls": {k: [round(x, 3) for x in v] for k, v in walls.items()},
        "marginal_cost_sec": marginal,
        "r3_set_minus_r2_set": round(med["full"] - med["r2set"], 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
