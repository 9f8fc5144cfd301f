"""Interleaved A/B: full transcripts_v1 suite on the date-partitioned
bench layout vs the conv_id-bucketed layout (checkpoint.write_bucketed_table)
on the SAME rows, at BOTH parallelism levels (local[32] / local[8]).

The bucketed layout elides the suite's only shuffle (the conv_id window
Exchange; the refint join co-locates too). This tool measures what that
is worth in wall clock AND in N->4N scaling efficiency: a shuffle is the
stage boundary whose disk/network serialization scales worst, so the
bucketed suite should both run faster and scale closer to the ideal-job
ceiling.

Layout variants are interleaved within each round so ambient sandbox
load drifts across both rather than biasing one. The bucketed copy is
written ONCE (external table under .cache/) and re-attached per session
via checkpoint.register_bucketed_table — the in-memory catalog forgets
bucketing metadata between sessions, the files do not.

Usage: python tools/ab_bucketed.py [rounds]   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses the bench table + session config)
from mlcast_sourcedata_validator_spark.checkpoint import (  # noqa: E402
    register_bucketed_table,
    write_bucketed_table,
)
from mlcast_sourcedata_validator_spark.compiler import run_suite  # noqa: E402
from mlcast_sourcedata_validator_spark.suite import (  # noqa: E402
    RunContext,
    get_suite,
)

BUCKETED_T = os.path.join(bench.REPO, ".cache", "bench_bucketed_t")
BUCKETED_R = os.path.join(bench.REPO, ".cache", "bench_bucketed_reg")
N_BUCKETS = 64


def _attach(spark) -> None:
    t_schema = spark.read.parquet(BUCKETED_T).schema
    r_schema = spark.read.parquet(BUCKETED_R).schema
    register_bucketed_table(spark, "ab_bkt_t", BUCKETED_T, t_schema,
                            "conv_id", N_BUCKETS, ["conv_id", "turn_idx"])
    register_bucketed_table(spark, "ab_bkt_reg", BUCKETED_R, r_schema,
                            "conv_id", N_BUCKETS, ["conv_id"])


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    suite = get_suite("transcripts_v1")

    # --- one-time: bench table + its bucketed copy ------------------------
    spark = bench._session(bench.CPUS)
    bench.ensure_bench_table(spark)
    meta_path = BUCKETED_T + "_meta.json"
    try:
        bkt_meta = json.load(open(meta_path))
    except Exception:
        bkt_meta = {}
    if not (os.path.isdir(BUCKETED_T) and os.path.isdir(BUCKETED_R)
            and bkt_meta.get("n_convs") == bench.N_CONVS):
        df = spark.read.parquet(bench.BENCH_TABLE).drop("date")
        write_bucketed_table(df, "ab_bkt_t", "conv_id", N_BUCKETS,
                             ["conv_id", "turn_idx"], path=BUCKETED_T)
        reg = spark.read.parquet(bench.BENCH_REGISTRY)
        write_bucketed_table(reg, "ab_bkt_reg", "conv_id", N_BUCKETS,
                             ["conv_id"], path=BUCKETED_R)
        with open(meta_path, "w") as f:
            json.dump({"n_convs": bench.N_CONVS}, f)
    spark.stop()

    def run_once(spark, layout: str) -> tuple[float, int]:
        if layout == "partitioned":
            df = spark.read.parquet(bench.BENCH_TABLE).drop("date")
            reg = spark.read.parquet(bench.BENCH_REGISTRY)
        else:
            df = spark.table("ab_bkt_t")
            reg = spark.table("ab_bkt_reg")
        baseline = spark.read.parquet(bench.BENCH_BASELINE)
        t0 = time.time()
        res = run_suite(RunContext(
            spark=spark, df=df, suite=suite, run_id=f"ab_{layout}",
            registry_df=reg, baseline_df=baseline,
            table_path=bench.BENCH_TABLE))
        assert res.n_input_rows > 0
        return time.time() - t0, res.n_input_rows

    walls: dict[str, dict[int, list[float]]] = {
        "partitioned": {bench.CPUS: [], bench.LOW_CPUS: []},
        "bucketed": {bench.CPUS: [], bench.LOW_CPUS: []},
    }
    n_rows = 0
    for r in range(rounds):
        for cores in (bench.CPUS, bench.LOW_CPUS):
            spark = bench._session(cores)
            _attach(spark)
            # warm the session once so JVM startup doesn't bill layout 1
            run_once(spark, "partitioned")
            order = (["partitioned", "bucketed"] if r % 2 == 0
                     else ["bucketed", "partitioned"])
            for layout in order:
                w1, n_rows = run_once(spark, layout)
                w2, _ = run_once(spark, layout)
                walls[layout][cores].append(min(w1, w2))
                print(f"  r{r} local[{cores}] {layout}: "
                      f"{walls[layout][cores][-1]:.2f}s", file=sys.stderr)
            spark.stop()

    out: dict = {"metric": "suite_layout_ab", "unit": "sec",
                 "rounds": rounds, "n_turns": n_rows,
                 "n_buckets": N_BUCKETS}
    for layout in walls:
        hi = statistics.median(walls[layout][bench.CPUS])
        lo = statistics.median(walls[layout][bench.LOW_CPUS])
        factor = bench.CPUS / bench.LOW_CPUS
        out[layout] = {
            "median_wall_hi": round(hi, 3),
            "median_wall_lo": round(lo, 3),
            "walls_hi": [round(w, 3) for w in walls[layout][bench.CPUS]],
            "walls_lo": [round(w, 3) for w in walls[layout][bench.LOW_CPUS]],
            "turns_per_sec_hi": round(n_rows / hi, 1),
            "scaling_efficiency_raw": round(lo / (factor * hi), 3),
        }
    out["bucketed_speedup_hi"] = round(
        out["partitioned"]["median_wall_hi"]
        / out["bucketed"]["median_wall_hi"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
