"""One-off large-scale scaling evidence (round 3, VERDICT item 10):
run the full transcripts_v1 suite over a ~100M-turn synthetic table at
local[8] and local[32] and report throughput at both plus normalized
scaling efficiency — the point where the ~3s constant driver/Catalyst
term is fully amortized (<~5% of wall) so the measurement reflects
executor-side scaling, which is what the north_rule criterion is about.

Usage: python tools/bench_scale.py [n_convs]   (default 7,000,000
~= 99M turns; the table is built once under .cache/bench_transcripts
via bench.ensure_bench_table and reused by later runs at the same size).
Prints one JSON line mirroring bench.py's scaling keys.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 7_000_000
os.environ["BENCH_N_CONVS"] = str(N_CONVS)

import bench  # noqa: E402  (picks up BENCH_N_CONVS)

bench.N_CONVS = N_CONVS


def main() -> int:
    s = bench._session(bench.CPUS)
    bench.ensure_bench_table(s)
    s.stop()

    suite_walls = {bench.CPUS: [], bench.LOW_CPUS: []}
    calib_walls = {bench.CPUS: [], bench.LOW_CPUS: []}
    n_rows = 0
    # 2 interleaved rounds, min-of-2 per session (the table is ~2.5x the
    # per-round bench size; keep total wall reasonable)
    for _round in range(2):
        for cores in (bench.CPUS, bench.LOW_CPUS):
            s = bench._session(cores)
            w1, n_rows = bench.run_suite_once(s)
            w2, _ = bench.run_suite_once(s)
            suite_walls[cores].append(min(w1, w2))
            c1 = bench.calibration_once(s, cores)
            c2 = bench.calibration_once(s, cores)
            calib_walls[cores].append(min(c1, c2))
            s.stop()
            print(f"  round {_round} cores={cores}: suite={min(w1, w2):.2f}s "
                  f"calib={min(c1, c2):.2f}s", file=sys.stderr)

    factor = bench.CPUS / bench.LOW_CPUS
    wall_hi = min(suite_walls[bench.CPUS])
    wall_lo = min(suite_walls[bench.LOW_CPUS])
    per_round_raw, per_round_norm = [], []
    for r in range(len(suite_walls[bench.CPUS])):
        rr = suite_walls[bench.LOW_CPUS][r] / (factor * suite_walls[bench.CPUS][r])
        rc = calib_walls[bench.LOW_CPUS][r] / (factor * calib_walls[bench.CPUS][r])
        per_round_raw.append(round(rr, 3))
        per_round_norm.append(round(rr / rc, 3) if rc > 0 else float("nan"))

    print(json.dumps({
        "metric": "large_scale_suite_scaling",
        "suite_turns": n_rows,
        "suite_wall_sec_hi": round(wall_hi, 3),
        "suite_wall_sec_lo": round(wall_lo, 3),
        "suite_turns_per_sec_hi": round(n_rows / wall_hi, 1),
        "suite_turns_per_sec_lo": round(n_rows / wall_lo, 1),
        "cores_hi": bench.CPUS,
        "cores_lo": bench.LOW_CPUS,
        "scaling_per_round_raw": per_round_raw,
        "scaling_per_round_normalized": per_round_norm,
        "calibration_walls_hi": [round(w, 3) for w in calib_walls[bench.CPUS]],
        "calibration_walls_lo": [round(w, 3) for w in calib_walls[bench.LOW_CPUS]],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
