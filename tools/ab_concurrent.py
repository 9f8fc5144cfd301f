"""Interleaved A/B: run_partitioned serial vs max_concurrent over the
SAME bench-table partitions at local[8].

The bench table's date partitions are small (~54k turns each), so the
per-partition fixed cost (driver round-trips, tiny final stages) is a
large fraction of each job — the regime a 10^12-turn table's
1000-partition validation run is in per executor. Concurrency fills the
stage-tail idle; commits stay serialized (the engine's lock), so the
win measured here is pure compute overlap.

Usage: python tools/ab_concurrent.py [rounds] [n_partitions] [conc] [cores]
Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from mlcast_sourcedata_validator_spark.checkpoint import (  # noqa: E402
    run_partitioned,
)
from mlcast_sourcedata_validator_spark.suite import get_suite  # noqa: E402


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    conc = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    suite = get_suite("transcripts_v1")

    spark = bench._session(cores)
    bench.ensure_bench_table(spark)
    registry = spark.read.parquet(bench.BENCH_REGISTRY).localCheckpoint()
    baseline = spark.read.parquet(bench.BENCH_BASELINE).localCheckpoint()

    walls: dict[str, list[float]] = {"serial": [], "concurrent": []}
    fails: dict[str, int] = {}

    def once(mode: str) -> float:
        out = tempfile.mkdtemp(prefix=f"abconc_{mode}_")
        t0 = time.time()
        s = run_partitioned(
            spark, suite, bench.BENCH_TABLE, out,
            registry_df=registry, baseline_df=baseline,
            max_partitions=n_parts,
            max_concurrent=(conc if mode == "concurrent" else 1),
        )
        w = time.time() - t0
        assert len(s.processed) == n_parts
        fails[mode] = s.n_fails
        shutil.rmtree(out, ignore_errors=True)
        return w

    once("serial")  # warm the JVM/scan caches off the books
    for r in range(rounds):
        order = (["serial", "concurrent"] if r % 2 == 0
                 else ["concurrent", "serial"])
        for mode in order:
            walls[mode].append(once(mode))
            print(f"  r{r} {mode}: {walls[mode][-1]:.2f}s", file=sys.stderr)
    assert fails["serial"] == fails["concurrent"]

    med_s = statistics.median(walls["serial"])
    med_c = statistics.median(walls["concurrent"])
    print(json.dumps({
        "metric": "partitioned_run_concurrency_ab", "unit": "sec",
        "cores": cores, "n_partitions": n_parts, "max_concurrent": conc,
        "serial_walls": [round(w, 2) for w in walls["serial"]],
        "concurrent_walls": [round(w, 2) for w in walls["concurrent"]],
        "median_serial": round(med_s, 2),
        "median_concurrent": round(med_c, 2),
        "speedup": round(med_s / med_c, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
