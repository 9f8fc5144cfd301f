"""Bucket-count vs core-count scaling study (round-5 VERDICT item 3).

Round 4's flagship conv_id-bucketed zero-Exchange layout beat the plain
layout on absolute throughput but scored 0.58-0.74 normalized 8->32
scaling efficiency across all five r4 bench runs (vs >=1.0 unbucketed)
— below the north rule's >=0.8 criterion. Prime suspect: the fixed
64-bucket layout. A bucketed scan is one task per bucket (bucket files
are NOT splittable — splitting would break the co-partitioning the
zero-Exchange plan relies on), so bucket count is a hard parallelism
cap and, more subtly, sets the wave granularity: 64 buckets at 32
cores is exactly 2 waves with zero slack to absorb task-length
variance, while at 8 cores the same layout runs 8 waves and hides it.

Protocol: for each bucket count, write a conv_id-bucketed copy of the
~39.5M-turn bench table (+ registry), then interleave rounds of the
full suite at local[32] and local[8] (min-of-2 walls per session, same
as bench.py), with the bench calibration job (ideal scan+agg over the
same files) for the per-round hardware ceiling. Reported per bucket
count: hi/lo walls, raw and normalized 8->32 efficiency per round,
median-of-clean-rounds headline (bench.py's contamination rule).

Output: one JSON blob on stdout, also written to
BENCH/bucket_study_r05.json. Findings + the shipped sizing rule land
in BENCH/BASELINE.md and checkpoint.suggest_bucket_count.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses the bench cache + session config)
from mlcast_sourcedata_validator_spark.checkpoint import (  # noqa: E402
    register_bucketed_table, write_bucketed_table)

BUCKET_COUNTS = [int(x) for x in
                 os.environ.get("STUDY_BUCKETS", "64,128,256").split(",")]
ROUNDS = int(os.environ.get("STUDY_ROUNDS", "3"))
HI, LO = 32, 8


def study_paths(nb: int) -> tuple[str, str]:
    return (os.path.join(REPO, ".cache", f"study_bkt_t_{nb}"),
            os.path.join(REPO, ".cache", f"study_bkt_reg_{nb}"))


def ensure_copies() -> None:
    s = bench._session(HI)
    bench.ensure_bench_table(s)
    for nb in BUCKET_COUNTS:
        pt, pr = study_paths(nb)
        if os.path.isdir(pt) and os.path.isdir(pr):
            continue
        print(f"writing {nb}-bucket copy...", file=sys.stderr)
        df = s.read.parquet(bench.BENCH_TABLE).drop("date")
        write_bucketed_table(df, f"study_t_{nb}", "conv_id", nb,
                             ["conv_id", "turn_idx"], path=pt)
        reg = s.read.parquet(bench.BENCH_REGISTRY)
        write_bucketed_table(reg, f"study_r_{nb}", "conv_id", nb,
                             ["conv_id"], path=pr)
    s.stop()


def attach(s, nb: int) -> tuple[str, str]:
    pt, pr = study_paths(nb)
    tn, rn = f"study_t_{nb}", f"study_r_{nb}"
    register_bucketed_table(s, tn, pt, s.read.parquet(pt).schema,
                            "conv_id", nb, ["conv_id", "turn_idx"])
    register_bucketed_table(s, rn, pr, s.read.parquet(pr).schema,
                            "conv_id", nb, ["conv_id"])
    return tn, rn


def suite_once(s, tn: str, rn: str) -> tuple[float, int]:
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite

    df = s.table(tn)
    registry = s.table(rn)
    baseline = s.read.parquet(bench.BENCH_BASELINE)
    t0 = time.time()
    res = run_suite(RunContext(
        spark=s, df=df, suite=get_suite("transcripts_v1"), run_id="study",
        registry_df=registry, baseline_df=baseline,
        table_path=bench.BENCH_TABLE))
    wall = time.time() - t0
    assert res.n_input_rows > 0
    return wall, res.n_input_rows


def main() -> int:
    ensure_copies()
    walls: dict = {nb: {HI: [], LO: []} for nb in BUCKET_COUNTS}
    calib: dict = {nb: {HI: [], LO: []} for nb in BUCKET_COUNTS}
    n_rows = 0
    for rnd in range(ROUNDS):
        for cores in (HI, LO):
            s = bench._session(cores)
            for nb in BUCKET_COUNTS:
                tn, rn = attach(s, nb)
                w1, n_rows = suite_once(s, tn, rn)
                w2, _ = suite_once(s, tn, rn)
                walls[nb][cores].append(min(w1, w2))
                pt, _ = study_paths(nb)
                t0 = time.time()
                from pyspark.sql import functions as F
                s.read.parquet(pt).agg(
                    F.sum(F.length("text")), F.min("ts"), F.max("ts")
                ).collect()
                c1 = time.time() - t0
                t0 = time.time()
                s.read.parquet(pt).agg(
                    F.sum(F.length("text")), F.min("ts"), F.max("ts")
                ).collect()
                c2 = time.time() - t0
                calib[nb][cores].append(min(c1, c2))
                print(f"round {rnd} cores {cores} nb {nb}: "
                      f"suite {walls[nb][cores][-1]:.2f}s "
                      f"calib {calib[nb][cores][-1]:.2f}s", file=sys.stderr)
            s.stop()

    factor = HI / LO
    out: dict = {"n_rows": n_rows, "rounds": ROUNDS,
                 "bucket_counts": BUCKET_COUNTS, "per_bucket": {}}
    for nb in BUCKET_COUNTS:
        sw, cw = walls[nb], calib[nb]
        wall_hi, wall_lo = min(sw[HI]), min(sw[LO])
        cal_hi, cal_lo = min(cw[HI]), min(cw[LO])
        per_round_norm, clean = [], []
        for r in range(ROUNDS):
            rr = sw[LO][r] / (factor * sw[HI][r])
            rc = cw[LO][r] / (factor * cw[HI][r])
            per_round_norm.append(round(rr / rc, 3) if rc > 0 else None)
            contaminated = (cw[HI][r] > 2 * cal_hi or cw[LO][r] > 2 * cal_lo
                            or sw[HI][r] > 2 * wall_hi
                            or sw[LO][r] > 2 * wall_lo)
            if not contaminated and per_round_norm[-1] is not None:
                clean.append(per_round_norm[-1])
        if not clean:
            clean = [x for x in per_round_norm if x is not None]
        out["per_bucket"][str(nb)] = {
            "suite_wall_hi": round(wall_hi, 3),
            "suite_wall_lo": round(wall_lo, 3),
            "suite_walls_hi": [round(x, 3) for x in sw[HI]],
            "suite_walls_lo": [round(x, 3) for x in sw[LO]],
            "calib_wall_hi": round(cal_hi, 3),
            "calib_wall_lo": round(cal_lo, 3),
            "thr_hi_turns_per_sec": round(n_rows / wall_hi, 1),
            "raw_eff": round((n_rows / wall_hi)
                             / (factor * n_rows / wall_lo), 3),
            "ceiling_eff": round((cal_lo / cal_hi) / factor, 3),
            "per_round_normalized": per_round_norm,
            "normalized_eff_headline": round(statistics.median(clean), 3),
        }
    blob = json.dumps(out)
    print(blob)
    out_name = os.environ.get("STUDY_OUT", "bucket_study_r05.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        f.write(blob + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
