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
load drifts across both rather than biasing one. Table setup, session
config and the per-layout suite runner are bench.py's own
(ensure_bucketed_table / attach_bucketed_tables / run_suite_once) — one
bucketing spec, shared by the bench and this tool, so the two can never
desynchronize.

Usage: python tools/ab_bucketed.py [rounds]   (prints one JSON line)
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses the bench table + session config)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    # --- one-time: bench table + its bucketed copy ------------------------
    spark = bench._session(bench.CPUS)
    bench.ensure_bench_table(spark)
    bench.ensure_bucketed_table(spark)
    spark.stop()

    walls: dict[str, dict[int, list[float]]] = {
        "partitioned": {bench.CPUS: [], bench.LOW_CPUS: []},
        "bucketed": {bench.CPUS: [], bench.LOW_CPUS: []},
    }
    n_rows = 0
    for r in range(rounds):
        for cores in (bench.CPUS, bench.LOW_CPUS):
            spark = bench._session(cores)
            bench.attach_bucketed_tables(spark)
            # warm the session once so JVM startup doesn't bill layout 1
            bench.run_suite_once(spark, "partitioned")
            order = (["partitioned", "bucketed"] if r % 2 == 0
                     else ["bucketed", "partitioned"])
            for layout in order:
                w1, n_rows = bench.run_suite_once(spark, layout)
                w2, _ = bench.run_suite_once(spark, layout)
                walls[layout][cores].append(min(w1, w2))
                print(f"  r{r} local[{cores}] {layout}: "
                      f"{walls[layout][cores][-1]:.2f}s", file=sys.stderr)
            spark.stop()

    out: dict = {"metric": "suite_layout_ab", "unit": "sec",
                 "rounds": rounds, "n_turns": n_rows,
                 "n_buckets": bench.N_BUCKETS}
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
