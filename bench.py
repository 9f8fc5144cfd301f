"""Benchmark harness (driver contract).

Measures two things and prints ONE JSON line:

1. Headline operator queries from __spark_entry__.py at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` — per-query wall seconds.
2. Full transcripts_v1 suite throughput (validated turns/sec) on a
   >=1M-turn synthetic transcripts table at TWO parallelism levels
   (local[8] vs local[32]) on the SAME input files — the sandbox evidence
   for the north_rule's N -> 4N executor scaling criterion:
   efficiency = thr(32) / (4 * thr(8)).

The synthetic bench table is generated once (seed-fixed) under
.cache/bench_transcripts and reused.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(2, CPUS // 4)
BENCH_TABLE = os.path.join(REPO, ".cache", "bench_transcripts")
BENCH_BASELINE = os.path.join(REPO, ".cache", "bench_baseline")
BENCH_REGISTRY = os.path.join(REPO, ".cache", "bench_registry")
BENCH_META = os.path.join(REPO, ".cache", "bench_meta.json")
# conv_id-bucketed copy of the same rows (suite runs shuffle-free on it;
# see checkpoint.write_bucketed_table + BENCH/ab_bucketed_r04.json)
BUCKETED_T = os.path.join(REPO, ".cache", "bench_bucketed_t")
BUCKETED_R = os.path.join(REPO, ".cache", "bench_bucketed_reg")
BUCKETED_META = BUCKETED_T + "_meta.json"
N_BUCKETS = 64
# ~40M turns: at the previous 9.9M-turn size the suite wall at local[32]
# was ~6s, of which ~3s is size-independent (plan analysis, driver-side
# sampled checks, job scheduling) — Amdahl caps measured 8->32 scaling at
# ~0.6 no matter how well the parallel part scales. 4x the data amortizes
# the constant term so the scaling measurement reflects the executor-side
# work the north_rule criterion is about (real 100TB runs are minutes
# long and never constant-dominated).
N_CONVS = int(os.environ.get("BENCH_N_CONVS", "2800000"))

HEADLINE = [
    "q1_pricing_summary",
    "lineitem_top_line_per_order",
    "top_customers_revenue",
    "stats_events",
    "timestep_analysis_events",
    "hist_value_events",
    "drift_psi_events",
    "minhash_lsh_pairs_documents",
    "lsh_verified_near_dups_documents",
    "ngram_jaccard_pairs_documents",
    "simhash_documents",
    "text_profile_documents",
    "embedding_cosine_topk",
    "multimodal_meta_documents",
    "asof_last_purchase_events",
    "range_count_purchase_window_events",
    "q5_local_supplier_volume",
    "streaming_hourly_counts_events",
    "streaming_dedup_events",
    # round-3 additions (new keys are additive — cross-round per-query
    # comparisons on the original names are unaffected)
    "categorical_drift_events",
    "incremental_rollup_events",
    "incremental_dedup_documents",
    "table_diff_events",
    "budget_tail_events",
    # round-4 additions (additive, same rationale)
    "dsir_weights_documents",
    "skew_profile_events",
    "funnel_conversion_events",
    "streaming_sessions_events",
    "loop_runs_events",
    "embedding_drift_embeddings",
    # round-4 fifth-session additions (additive, same rationale)
    "gopher_quality_documents",
    "bpe_vocab_documents",
    # round-5 additions (additive, same rationale): bounded-state
    # Misra-Gries heavy hitters, batch + streaming composition
    "heavy_hitters_documents",
    "streaming_hot_types_events",
    # round-5 continuation-session additions (additive, same
    # rationale): point-anomaly checks, integer-exact EMD drift,
    # Count-Min point-frequency sketch
    "volume_anomaly_events",
    "benford_value_events",
    "emd_drift_events",
    "cm_freq_events",
]


def _session(cores: int):
    from mlcast_sourcedata_validator_spark.session import get_spark

    return get_spark(app_name=f"bench_{cores}", cores=cores,
                     shuffle_partitions=max(8, cores * 2))


def ensure_bench_table(spark) -> None:
    from pyspark.sql import functions as F

    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_suite_baseline,
    )
    from mlcast_sourcedata_validator_spark.suite import get_suite
    from mlcast_sourcedata_validator_spark.synth import generate_transcripts

    # rev 2: suite-driven baseline (covers the categorical + joint-drift
    # metrics the hand-built rev-1 baseline lacked, so those checks ran
    # as missing-baseline WARNINGs at bench time)
    baseline_rev = 2
    try:
        meta = json.load(open(BENCH_META))
    except Exception:
        meta = {}
    table_ok = (os.path.isdir(BENCH_TABLE) and os.path.isdir(BENCH_REGISTRY)
                and meta.get("n_convs") == N_CONVS)
    baseline_ok = (os.path.isdir(BENCH_BASELINE)
                   and meta.get("baseline_rev") == baseline_rev)
    if table_ok and baseline_ok:
        return
    if not table_ok:
        # size changed (e.g. the 9.9M -> 40M turn bump): rebuild all
        shutil.rmtree(BENCH_TABLE, ignore_errors=True)
        shutil.rmtree(BENCH_REGISTRY, ignore_errors=True)
        df = generate_transcripts(spark, n_convs=N_CONVS, seed=42,
                                  n_output_partitions=CPUS * 2)
        # 1 file per date partition: at 10M rows, 8 files/partition
        # yields ~76 KB files and the suite measures file-open overhead
        # instead of compute (measured 14.6s -> 7.9s warm, 143s -> 9s
        # cold). Real tables size files toward 128 MB-1 GB;
        # 1/partition is the honest analog here.
        write_partitioned_transcripts(df, BENCH_TABLE, files_per_partition=1)
        from mlcast_sourcedata_validator_spark.sources.properties import (
            write_table_properties,
        )
        write_table_properties(BENCH_TABLE,
                               {"license": "CC-BY-4.0",
                                "consistent_timestep_start": "true"})
        # registry is its own table at real scale — precompute once
        spark.read.parquet(BENCH_TABLE).select("conv_id").distinct() \
            .coalesce(4).write.mode("overwrite").parquet(BENCH_REGISTRY)
    # baseline alone is cheap (N_CONVS/20 clean convs) — a rev bump
    # never forces regenerating the multi-GB bench table
    shutil.rmtree(BENCH_BASELINE, ignore_errors=True)
    clean = generate_transcripts(spark, n_convs=max(2000, N_CONVS // 20), seed=43)
    build_suite_baseline(clean, get_suite("transcripts_v1")) \
        .coalesce(1).write.mode("overwrite").parquet(BENCH_BASELINE)
    with open(BENCH_META, "w") as f:
        json.dump({"n_convs": N_CONVS, "baseline_rev": baseline_rev}, f)
    _ = F  # keep import local-use explicit


def ensure_bucketed_table(spark) -> None:
    """Write-once conv_id-bucketed copy of the bench rows (+ registry)."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_bucketed_table,
    )

    try:
        meta = json.load(open(BUCKETED_META))
    except Exception:
        meta = {}
    if (os.path.isdir(BUCKETED_T) and os.path.isdir(BUCKETED_R)
            and meta.get("n_convs") == N_CONVS):
        return
    df = spark.read.parquet(BENCH_TABLE).drop("date")
    write_bucketed_table(df, "bench_bkt_t", "conv_id", N_BUCKETS,
                         ["conv_id", "turn_idx"], path=BUCKETED_T)
    reg = spark.read.parquet(BENCH_REGISTRY)
    write_bucketed_table(reg, "bench_bkt_reg", "conv_id", N_BUCKETS,
                         ["conv_id"], path=BUCKETED_R)
    with open(BUCKETED_META, "w") as f:
        json.dump({"n_convs": N_CONVS}, f)


def attach_bucketed_tables(spark) -> None:
    """Re-attach the bucketed dirs to THIS session's catalog (bucketing
    is table metadata; a plain parquet read forgets the layout)."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        register_bucketed_table,
    )

    register_bucketed_table(
        spark, "bench_bkt_t", BUCKETED_T,
        spark.read.parquet(BUCKETED_T).schema,
        "conv_id", N_BUCKETS, ["conv_id", "turn_idx"])
    register_bucketed_table(
        spark, "bench_bkt_reg", BUCKETED_R,
        spark.read.parquet(BUCKETED_R).schema,
        "conv_id", N_BUCKETS, ["conv_id"])


def run_suite_once(spark, layout: str = "partitioned") -> tuple[float, int]:
    """Run the full suite on the bench table; return (wall_sec, n_rows).

    ``layout='bucketed'`` reads the conv_id-bucketed catalog tables
    (attach_bucketed_tables must have run in this session): the fused
    plan is then Exchange-free — same checks, same verdicts."""
    from pyspark.sql import functions as F

    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite

    if layout == "bucketed":
        df = spark.table("bench_bkt_t")
        registry = spark.table("bench_bkt_reg")
    else:
        df = spark.read.parquet(BENCH_TABLE).drop("date")
        registry = spark.read.parquet(BENCH_REGISTRY)
    baseline = spark.read.parquet(BENCH_BASELINE)
    suite = get_suite("transcripts_v1")
    t0 = time.time()
    res = run_suite(
        RunContext(spark=spark, df=df, suite=suite, run_id="bench",
                   registry_df=registry, baseline_df=baseline,
                   table_path=BENCH_TABLE)
    )
    wall = time.time() - t0
    assert res.n_input_rows > 0
    _ = F
    return wall, res.n_input_rows


def calibration_once(spark, cores: int, layout: str = "partitioned") -> float:
    """The measured parallel-scaling ceiling: an IDEAL zero-shuffle,
    zero-Python Spark job over the SAME bench table (scan + fused agg of
    sum(length(text)) and ts min/max). This is the right comparator for
    the suite: it shares the scan's I/O + memory-bandwidth profile, which
    on this sandbox (SMT-paired vCPUs, clock throttling under multi-core
    load) scales well below 4x from N to 4N threads even with zero
    engine-side overhead — measured ~2.5x. A pure-CPU hash burn was used
    in earlier rounds; it overstates the ceiling for scan-bound work
    because arithmetic scales better across SMT siblings than memory
    traffic does. Protocol documented in BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    src = BUCKETED_T if layout == "bucketed" else BENCH_TABLE
    t0 = time.time()
    spark.read.parquet(src).agg(
        F.sum(F.length("text")), F.min("ts"), F.max("ts")
    ).collect()
    return time.time() - t0


def main() -> int:
    import __spark_entry__ as entry_mod

    result: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1]}

    # --- phase 1: headline queries at SF_DIR on local[CPUS] ----------------
    spark = _session(CPUS)
    ensure_bench_table(spark)
    ensure_bucketed_table(spark)
    # headline set spans the driver window AND the demoted oracle twins
    qs = dict(entry_mod.queries())
    qs.update(entry_mod.extra_queries())
    # warm the JVM + parquet reader once so the first row measures the
    # query, not session init (rounds 1-2 charged ~4s of warmup to q1)
    from pyspark.sql import functions as F
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")) \
        .agg(F.count(F.lit(1))).collect()
    # per-query MEDIAN over 3 interleaved repetitions (whole headline
    # list swept 3x, so ambient load drifts across all queries rather
    # than biasing one): single-shot numbers drove two rounds of
    # noise-chasing (~2.5x ambient variance on this shared sandbox).
    # "queries" stays a flat {name: sec} map for cross-round comparison;
    # "queries_spread" carries [min, max] so a reader can judge noise.
    reps: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _rep in range(3):
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            reps[name].append(time.time() - t0)
            print(f"  {name}: {reps[name][-1]:.3f}s ({n} rows)",
                  file=sys.stderr)
    import statistics as _stats
    per_query = {name: round(_stats.median(ts), 3)
                 for name, ts in reps.items()}
    query_spread = {name: [round(min(ts), 3), round(max(ts), 3)]
                    for name, ts in reps.items()}
    spark.stop()

    # --- phase 2: suite throughput at two parallelism levels ---------------
    # Interleaved rounds (hi, lo, hi, lo, ...) with min-of-2 per session and
    # min across rounds: the sandbox has heavy ambient wall-clock noise, and
    # min-of-interleaved is the least-contended sample at each level.
    # Both layouts per session, interleaved: "partitioned" (the
    # round-1..3 protocol — cross-round continuity) and "bucketed"
    # (conv_id-bucketed catalog tables; the fused plan is Exchange-free,
    # see checkpoint.write_bucketed_table + BENCH/ab_bucketed_r04.json).
    LAYOUTS = ("partitioned", "bucketed")
    suite_walls: dict = {L: {CPUS: [], LOW_CPUS: []} for L in LAYOUTS}
    calib_walls: dict = {L: {CPUS: [], LOW_CPUS: []} for L in LAYOUTS}
    n_rows = 0
    # 3 interleaved rounds (was 2): ambient contention on this shared
    # sandbox moves walls up to ~3x; one extra round of minima measurably
    # stabilizes the efficiency ratio
    for _round in range(3):
        for cores in (CPUS, LOW_CPUS):
            s = _session(cores)
            attach_bucketed_tables(s)
            for L in LAYOUTS:
                w1, n_rows = run_suite_once(s, L)
                w2, _ = run_suite_once(s, L)
                suite_walls[L][cores].append(min(w1, w2))
                c1 = calibration_once(s, cores, L)
                c2 = calibration_once(s, cores, L)
                calib_walls[L][cores].append(min(c1, c2))
            s.stop()

    import statistics

    factor = CPUS / LOW_CPUS

    def _scaling(layout: str) -> dict:
        """Headline + per-round scaling metrics for one layout.

        Per-round pairing: a round's sessions run back-to-back, so its
        suite/ideal-job walls saw comparable ambient load — normalizing
        within a round is more faithful than pairing minima that may
        come from different contention regimes. All rounds are reported
        for scrutiny; a round whose calibration or suite wall diverges
        >2x from the best round's is CONTAMINATED (ambient load moved
        between its measurements) and is excluded from the headline,
        which is the MEDIAN of the clean rounds — never the max (round 2
        headlined a max() of 5.237 from exactly such a round)."""
        sw, cw = suite_walls[layout], calib_walls[layout]
        wall_hi, wall_lo = min(sw[CPUS]), min(sw[LOW_CPUS])
        cal_hi, cal_lo = min(cw[CPUS]), min(cw[LOW_CPUS])
        thr_hi, thr_lo = n_rows / wall_hi, n_rows / wall_lo
        raw_eff = thr_hi / (factor * thr_lo)
        ceiling_eff = (cal_lo / cal_hi) / factor
        norm_eff = raw_eff / ceiling_eff if ceiling_eff > 0 else float("nan")
        per_round_raw, per_round_norm, clean_rounds = [], [], []
        for r in range(len(sw[CPUS])):
            rr = sw[LOW_CPUS][r] / (factor * sw[CPUS][r])
            rc = cw[LOW_CPUS][r] / (factor * cw[CPUS][r])
            per_round_raw.append(round(rr, 3))
            per_round_norm.append(round(rr / rc, 3) if rc > 0 else float("nan"))
            contaminated = (
                cw[CPUS][r] > 2.0 * cal_hi
                or cw[LOW_CPUS][r] > 2.0 * cal_lo
                or sw[CPUS][r] > 2.0 * wall_hi
                or sw[LOW_CPUS][r] > 2.0 * wall_lo
            )
            if not contaminated:
                clean_rounds.append(per_round_norm[-1])
        if not clean_rounds:  # all rounds contended: fall back to everything
            clean_rounds = per_round_norm
        return {
            "wall_hi": wall_hi, "wall_lo": wall_lo,
            "cal_hi": cal_hi, "cal_lo": cal_lo,
            "thr_hi": thr_hi, "thr_lo": thr_lo,
            "raw_eff": raw_eff, "ceiling_eff": ceiling_eff,
            "norm_eff": norm_eff,
            "per_round_raw": per_round_raw,
            "per_round_norm": per_round_norm,
            "clean_rounds": clean_rounds,
            "headline_norm": statistics.median(clean_rounds),
        }

    part = _scaling("partitioned")
    bkt = _scaling("bucketed")

    result.update(
        {
            "metric": "full_suite_wall_sec",
            "value": round(part["wall_hi"], 3),
            "unit": "sec",
            # cross-round continuity: the bench table grew 4x in round 2
            # (9.88M -> 39.5M turns, see BENCH/BASELINE.md) — compare
            # suite_turns_per_sec_*, not raw wall seconds, across rounds
            "note": f"wall over {n_rows} turns; per-round comparable "
                    f"metric is suite_turns_per_sec_hi",
            "queries": per_query,
            "queries_spread": query_spread,
            "suite_turns": n_rows,
            "suite_turns_per_sec_hi": round(part["thr_hi"], 1),
            "suite_turns_per_sec_lo": round(part["thr_lo"], 1),
            "cores_hi": CPUS,
            "cores_lo": LOW_CPUS,
            "scaling_efficiency_raw": round(part["raw_eff"], 3),
            "hardware_ceiling_efficiency": round(part["ceiling_eff"], 3),
            # headline = MEDIAN of non-contaminated rounds (calibration
            # wall within 2x of the best round's); min-paired kept as the
            # conservative floor, per-round list as the full evidence
            "scaling_efficiency_normalized": round(part["headline_norm"], 3),
            "scaling_efficiency_normalized_minpaired": round(part["norm_eff"], 3),
            "scaling_per_round_raw": part["per_round_raw"],
            "scaling_per_round_normalized": part["per_round_norm"],
            "scaling_rounds_used": len(part["clean_rounds"]),
            # raw calibration walls (ideal scan+agg over the same table):
            # lets a reader judge how contended the shared sandbox was
            # during THIS run — compare across runs
            "calibration_wall_sec_hi": round(part["cal_hi"], 3),
            "calibration_wall_sec_lo": round(part["cal_lo"], 3),
            # --- conv_id-bucketed layout: same rows, same checks, the
            # suite's only shuffle elided by table layout ---------------
            "suite_turns_per_sec_hi_bucketed": round(bkt["thr_hi"], 1),
            "suite_turns_per_sec_lo_bucketed": round(bkt["thr_lo"], 1),
            "scaling_efficiency_raw_bucketed": round(bkt["raw_eff"], 3),
            "hardware_ceiling_efficiency_bucketed": round(bkt["ceiling_eff"], 3),
            "scaling_efficiency_normalized_bucketed": round(bkt["headline_norm"], 3),
            "scaling_per_round_normalized_bucketed": bkt["per_round_norm"],
            "bucketed_speedup_hi": round(part["wall_hi"] / bkt["wall_hi"], 3),
        }
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
