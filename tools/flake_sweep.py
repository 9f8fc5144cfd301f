"""Round-5 VERDICT item 9: chase the one-off
test_streaming_dedup_bounded_state_matches_batch_distinct failure to
ground. 50 repeats of the exact streaming-vs-batch equality across
shuffle-partition counts (8/32/64) and with background CPU load for a
subset — repeats run INSIDE a long-lived session per config, matching
the loaded-suite context of the original failure. Every per-type diff
is logged. Outcome feeds BENCH/BASELINE.md: 50x green => closed as
environment; any failure => the instrumented diff pinpoints whether
dedup state or sum merge drifted."""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def _burn(stop_at: float) -> None:
    x = 0
    while time.time() < stop_at:
        x = (x * 1103515245 + 12345) % (2**31)


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from mlcast_sourcedata_validator_spark.session import get_spark

    # (shuffle_partitions, repeats, under_cpu_load)
    plan = [(8, 12, False), (32, 12, False), (64, 13, False),
            (32, 13, True)]
    fails = []
    run_i = 0
    for sp, reps, load in plan:
        spark = get_spark(app_name=f"flake_sp{sp}_{load}", cores=8,
                          shuffle_partitions=sp)
        ev = spark.read.parquet(f"{SF}/events.parquet")
        exp = {r.event_type: (r.n_events, r.sum_value)
               for r in ev.dropDuplicates(["event_id"])
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum(F.col("value").cast("decimal(24,6)"))
                            .cast("double"), 4).alias("sum_value"))
               .collect()}
        burners = []
        if load:
            stop_at = time.time() + 600
            burners = [multiprocessing.Process(target=_burn,
                                               args=(stop_at,))
                       for _ in range(8)]
            for b in burners:
                b.start()
        try:
            for _ in range(reps):
                run_i += 1
                got = {r.event_type: (r.n_events, r.sum_value)
                       for r in entry.queries()["streaming_dedup_events"](
                           spark, SF).collect()}
                diff = {k: (got.get(k), exp.get(k))
                        for k in set(got) | set(exp)
                        if got.get(k) != exp.get(k)}
                ok = not diff
                print(f"run {run_i} sp={sp} load={load}: "
                      f"{'OK' if ok else 'FAIL ' + json.dumps(diff)}",
                      file=sys.stderr, flush=True)
                if not ok:
                    fails.append({"run": run_i, "sp": sp, "load": load,
                                  "diff": {k: list(map(list, v))
                                           for k, v in diff.items()}})
        finally:
            for b in burners:
                b.terminate()
            spark.stop()
    out = {"runs": run_i, "fails": fails}
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "flake_sweep_r05.json"), "w") as f:
        json.dump(out, f)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
