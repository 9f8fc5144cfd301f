"""Incremental keyed rollup: merge(rollup(parts)) == rollup(whole) for any
split; transcript specs; derived metrics stay out of the merge cycle."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.rollup import (
    keyed_rollup,
    merge_rollups,
    transcript_rollup_specs,
    with_derived,
)
from mlcast_sourcedata_validator_spark.synth import generate_transcripts


def _assert_df_equal(a, b):
    # dtypes (name, type) must match exactly; nullability may differ
    # (count() is non-nullable, its sum() merge is nullable)
    assert a.dtypes == b.dtypes, f"{a.dtypes} != {b.dtypes}"
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_merge_of_any_split_equals_full_rollup(spark):
    df = generate_transcripts(spark, n_convs=120, seed=11)
    specs = transcript_rollup_specs()
    full = keyed_rollup(df, ["conv_id"], specs)
    # three deterministic splits of different shapes: by hash, by turn
    # parity, by ts threshold — each split severs conversations mid-way
    for split_col in [
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(3)),
        F.col("turn_idx") % 2,
        (F.col("ts") > F.lit("2024-01-03 00:00:00").cast("timestamp")).cast("int"),
    ]:
        tagged = df.withColumn("_part", split_col)
        parts = [
            keyed_rollup(tagged.where(F.col("_part") == v).drop("_part"),
                         ["conv_id"], specs)
            for v in [r["_part"] for r in tagged.select("_part").distinct().collect()]
        ]
        _assert_df_equal(merge_rollups(parts, ["conv_id"], specs), full)


def test_merge_is_associative_and_accepts_merged_input(spark):
    df = generate_transcripts(spark, n_convs=60, seed=12)
    specs = transcript_rollup_specs()
    third = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(3))
    tagged = df.withColumn("_p", third)
    p = [keyed_rollup(tagged.where(F.col("_p") == i).drop("_p"),
                      ["conv_id"], specs) for i in range(3)]
    left_first = merge_rollups(
        [merge_rollups(p[:2], ["conv_id"], specs), p[2]], ["conv_id"], specs)
    all_at_once = merge_rollups(p, ["conv_id"], specs)
    _assert_df_equal(left_first, all_at_once)


def test_transcript_specs_values(spark):
    rows = [
        ("c1", 0, "system", "sys prompt", None, "2024-01-01 00:00:00"),
        ("c1", 1, "user", "hello", None, "2024-01-01 00:00:10"),
        ("c1", 2, "assistant", "hi there", None, "2024-01-01 00:00:20"),
        ("c1", 3, "tool", "result", "search", "2024-01-01 00:01:00"),
        ("c2", 0, "user", None, None, "2024-01-02 08:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["conv_id"]: r for r in with_derived(
        keyed_rollup(df, ["conv_id"], transcript_rollup_specs())
    ).collect()}
    c1 = out["c1"]
    assert c1["n_turns"] == 4 and c1["n_user"] == 1 and c1["n_assistant"] == 1
    assert c1["n_system"] == 1 and c1["n_tool_calls"] == 1
    assert int(c1["total_chars"]) == len("sys prompt") + 5 + 8 + 6
    assert c1["min_turn_idx"] == 0 and c1["max_turn_idx"] == 3
    assert c1["duration_sec"] == 60.0
    assert c1["tool_call_rate"] == 0.25
    # NULL text counts as 0 chars, not NULL-poisoned
    assert int(out["c2"]["total_chars"]) == 0 and out["c2"]["n_turns"] == 1


def test_empty_delta_merge_is_identity(spark):
    df = generate_transcripts(spark, n_convs=30, seed=13)
    specs = transcript_rollup_specs()
    full = keyed_rollup(df, ["conv_id"], specs)
    empty = keyed_rollup(df.where(F.lit(False)), ["conv_id"], specs)
    _assert_df_equal(merge_rollups([full, empty], ["conv_id"], specs), full)


def test_maintained_rollup_matches_direct_and_resumes(spark, tmp_path):
    """maintain_rollup over a 4-day table == direct whole-table rollup;
    interrupted maintenance resumes without reprocessing; an uncommitted
    (crashed) delta is invisible to read_rollup and redone on resume."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
        write_partitioned_transcripts,
    )

    df = generate_transcripts(spark, n_convs=60, seed=17).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    specs = transcript_rollup_specs()

    # interrupted first pass: only 2 partitions committed
    first = maintain_rollup(spark, table, store, ["conv_id"], specs,
                            max_partitions=2)
    assert len(first) == 2
    partial = read_rollup(spark, store, ["conv_id"], specs)
    assert partial.count() > 0

    # crash simulation: a delta dir written WITHOUT its commit marker
    # must not be readable state
    fake = keyed_rollup(df.limit(5), ["conv_id"], specs)
    fake.write.mode("overwrite").parquet(
        str(tmp_path / "roll/deltas/conv_rollup/partition_id=9999-01-01"))
    assert read_rollup(spark, store, ["conv_id"], specs).exceptAll(partial).count() == 0

    # resume: remaining partitions only
    second = maintain_rollup(spark, table, store, ["conv_id"], specs)
    assert set(first).isdisjoint(second) and len(first) + len(second) == 4

    merged = read_rollup(spark, store, ["conv_id"], specs)
    direct = keyed_rollup(spark.read.parquet(table).drop("date"),
                          ["conv_id"], specs)
    assert merged.dtypes == direct.dtypes
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    # idempotent: nothing left to do
    assert maintain_rollup(spark, table, store, ["conv_id"], specs) == []

    # concurrent maintenance of a fresh store == the serial store's state
    store2 = str(tmp_path / "roll_conc")
    conc = maintain_rollup(spark, table, store2, ["conv_id"], specs,
                           max_concurrent=3)
    assert sorted(conc) == sorted(first + second)
    merged2 = read_rollup(spark, store2, ["conv_id"], specs)
    assert merged2.exceptAll(merged).count() == 0
    assert merged.exceptAll(merged2).count() == 0
    assert maintain_rollup(spark, table, store2, ["conv_id"], specs,
                           max_concurrent=3) == []


def test_contiguity_audit_catches_cross_partition_gap(spark, tmp_path):
    """A turn gap at a date-partition boundary is invisible to the
    per-partition window checks but caught by the rollup audit."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        contiguity_audit,
    )
    from mlcast_sourcedata_validator_spark.report import FAIL
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite

    rows = []
    # conv "ok": turns 0-5 split 0-2 / 3-5 across two days — contiguous
    for i in range(6):
        day = "2024-06-01" if i < 3 else "2024-06-02"
        rows.append(("ok", i, "assistant" if i % 2 else "user", "t", None,
                     f"{day} 12:00:{i:02d}"))
    # conv "gap": day 1 has 0-2, day 2 resumes at 4 (turn 3 lost at the
    # boundary) — each day is INTERNALLY contiguous
    for i in [0, 1, 2, 4, 5]:
        day = "2024-06-01" if i < 3 else "2024-06-02"
        rows.append(("gap", i, "assistant" if i % 2 else "user", "t", None,
                     f"{day} 12:00:{i:02d}"))
    # conv "dup": turn 2 appears on BOTH days
    for day, i in [("2024-06-01", 0), ("2024-06-01", 1), ("2024-06-01", 2),
                   ("2024-06-02", 2), ("2024-06-02", 3)]:
        rows.append(("dup", i, "assistant" if i % 2 else "user", "t", None,
                     f"{day} 12:00:{i:02d}"))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = str(tmp_path / "tbl")
    write_partitioned_transcripts(df, table)

    # per-partition validation sees NO contiguity/uniqueness FAILs: each
    # day is internally clean
    suite = get_suite("transcripts_v1")
    registry = df.select("conv_id").distinct().localCheckpoint()
    for day in ["2024-06-01", "2024-06-02"]:
        batch = spark.read.option("basePath", table).parquet(
            f"{table}/date={day}").drop("date")
        res = run_suite(RunContext(spark=spark, df=batch, suite=suite,
                                   run_id=f"d-{day}", registry_df=registry,
                                   partition_id=day))
        ordering_fails = [r for r in res.report.results
                          if r.status == FAIL and r.section.startswith("3")]
        assert ordering_fails == [], ordering_fails

    # the rollup audit catches both boundary anomalies, names them, and
    # passes the clean conversation
    specs = transcript_rollup_specs()
    store = str(tmp_path / "roll")
    maintain_rollup(spark, table, store, ["conv_id"], specs)
    audit = {r["conv_id"]: r["reason"]
             for r in contiguity_audit(
                 read_rollup(spark, store, ["conv_id"], specs)).collect()}
    assert audit == {"gap": "gap", "dup": "duplicate"}


def test_boundary_audit_catches_interleave_and_ts_regression(spark, tmp_path):
    """Turn ranges interleaved across partitions (merged span perfect, so
    contiguity_audit passes) and a boundary event-time regression — both
    invisible to per-partition checks, both caught from delta rows alone."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
        read_rollup_deltas,
    )
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        boundary_audit,
        contiguity_audit,
    )

    rows = []
    # conv "ok": clean split 0-2 / 3-5, boundary-monotonic timestamps
    for i in range(6):
        day = "2024-06-01" if i < 3 else "2024-06-02"
        rows.append(("ok", i, "user", "t", None, f"{day} 12:00:{i:02d}"))
    # conv "mix": day 1 holds EVEN turns 0,2,4; day 2 holds ODD turns
    # 1,3,5 with ts consistent with turn order WITHIN each day. Merged
    # span 0..5 with 6 turns -> contiguity_audit passes; ranges overlap.
    for i in [0, 2, 4]:
        rows.append(("mix", i, "user", "t", None, f"2024-06-01 12:00:{i:02d}"))
    for i in [1, 3, 5]:
        rows.append(("mix", i, "user", "t", None, f"2024-06-02 12:00:{i:02d}"))
    # conv "tsr": turns split 0-1 / 2-3 (no range overlap) but batch 2's
    # first EVENT time is earlier than batch 1's last — possible when
    # partitions are INGESTION batches, not date(ts) (a late-arriving
    # shard landed in the wrong batch). date(ts) partitioning makes this
    # impossible by construction, so the table below is written as
    # explicit batch dirs rather than via write_partitioned_transcripts.
    rows += [("tsr", 0, "user", "t", None, "2024-06-01 12:00:00"),
             ("tsr", 1, "user", "t", None, "2024-06-01 12:00:30"),
             ("tsr", 2, "user", "t", None, "2024-06-01 11:00:00"),
             ("tsr", 3, "user", "t", None, "2024-06-01 11:00:05")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = str(tmp_path / "tbl")
    batch1 = (
        ((F.col("conv_id") == "ok") & (F.col("turn_idx") < 3))
        | ((F.col("conv_id") == "mix") & (F.col("turn_idx") % 2 == 0))
        | ((F.col("conv_id") == "tsr") & (F.col("turn_idx") < 2))
    )
    df.where(batch1).write.parquet(f"{table}/date=2024-06-01")
    df.where(~batch1).write.parquet(f"{table}/date=2024-06-02")

    store = str(tmp_path / "roll")
    specs = transcript_rollup_specs()
    maintain_rollup(spark, table, store, ["conv_id"], specs)

    # span audit: all three convs are span-clean
    assert contiguity_audit(
        read_rollup(spark, store, ["conv_id"], specs)).count() == 0

    got = {(r["conv_id"], r["reason"])
           for r in boundary_audit(read_rollup_deltas(spark, store)).collect()}
    assert got == {("mix", "turn_overlap"), ("tsr", "ts_regression")}


def test_table_rollup_hll_sketch_merges_across_partitions(spark, tmp_path):
    """keys=[] table-level rollup: the HLL conversation sketch written to
    per-partition parquet deltas unions into a whole-corpus distinct
    estimate without rescanning history."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        table_rollup_specs,
    )

    df = generate_transcripts(spark, n_convs=300, seed=19).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    specs = table_rollup_specs()
    done = maintain_rollup(spark, table, store, [], specs,
                           rollup_id="table_stats")
    assert len(done) == 4
    row = read_rollup(spark, store, [], specs, rollup_id="table_stats") \
        .select(
            "n_turns",
            F.hll_sketch_estimate("conv_sketch").alias("n_convs"),
        ).collect()[0]
    assert row["n_turns"] == df.count()
    exact = df.select("conv_id").distinct().count()
    assert abs(row["n_convs"] - exact) / exact < 0.05


def test_two_rollup_ids_share_one_store(spark, tmp_path):
    """Per-conv and table-level rollups at the SAME rollup_path must not
    clobber each other (deltas are namespaced by rollup_id)."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        table_rollup_specs,
    )

    df = generate_transcripts(spark, n_convs=40, seed=23).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(2)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    conv_specs = transcript_rollup_specs()
    tbl_specs = table_rollup_specs()
    maintain_rollup(spark, table, store, ["conv_id"], conv_specs)
    maintain_rollup(spark, table, store, [], tbl_specs,
                    rollup_id="table_stats")
    conv = read_rollup(spark, store, ["conv_id"], conv_specs)
    tbl = read_rollup(spark, store, [], tbl_specs, rollup_id="table_stats")
    assert conv.count() == df.select("conv_id").distinct().count()
    assert tbl.collect()[0]["n_turns"] == df.count()
    # and the per-conv state equals a direct rollup (not table-level rows)
    direct = keyed_rollup(df, ["conv_id"], conv_specs)
    assert conv.exceptAll(direct).count() == 0


def test_cli_exit_1_on_rollup_audit_violation(spark, tmp_path):
    """A boundary gap that per-partition validation passes must still
    drive the CLI exit code to 1 through the rollup audits."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_partitioned_transcripts,
    )
    from mlcast_sourcedata_validator_spark.cli import main

    rows = []
    for i in [0, 1, 2]:
        rows.append(("g", i, "user", "t", None, f"2024-06-01 12:00:{i:02d}"))
    for i in [4, 5]:  # boundary gap: turn 3 lost between the days
        rows.append(("g", i, "user", "t", None, f"2024-06-02 12:00:{i:02d}"))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = str(tmp_path / "tbl")
    write_partitioned_transcripts(df, table)
    reg = str(tmp_path / "reg")
    df.select("conv_id").distinct().write.parquet(reg)

    rc = main(["--suite", "transcripts_v1", "--table", table,
               "--results", str(tmp_path / "store"),
               "--conv-rollup", str(tmp_path / "roll"),
               "--registry", reg, "--cores", "8"])
    assert rc == 1


def test_compact_rollup_preserves_state_and_resume(spark, tmp_path):
    """Compaction rewrites N deltas as one base: merged state identical
    before/after, maintenance resume still skips compacted partitions,
    new deltas merge on top, and a second compaction folds base+new."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        compact_rollup,
        maintain_rollup,
        read_rollup,
        read_rollup_deltas,
        write_partitioned_transcripts,
    )

    df = generate_transcripts(spark, n_convs=60, seed=29).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    specs = transcript_rollup_specs()

    # maintain 3 of 4 partitions, then compact them into one base
    maintain_rollup(spark, table, store, ["conv_id"], specs, max_partitions=3)
    before = read_rollup(spark, store, ["conv_id"], specs).collect()
    base = compact_rollup(spark, store, ["conv_id"], specs)
    assert base and base.startswith("__base-")
    after = read_rollup(spark, store, ["conv_id"], specs)
    assert sorted(map(tuple, before)) == sorted(map(tuple, after.collect()))
    # fan-in trimmed: only the base delta is active
    assert read_rollup_deltas(spark, store).select("partition_id") \
        .distinct().count() == 1

    # resume must NOT redo the compacted partitions — only the 4th
    new = maintain_rollup(spark, table, store, ["conv_id"], specs)
    assert len(new) == 1
    full = read_rollup(spark, store, ["conv_id"], specs)
    direct = keyed_rollup(spark.read.parquet(table).drop("date"),
                          ["conv_id"], specs)
    assert full.exceptAll(direct).count() == 0
    assert direct.exceptAll(full).count() == 0

    # second compaction folds base + the new delta; state still exact
    assert compact_rollup(spark, store, ["conv_id"], specs)
    full2 = read_rollup(spark, store, ["conv_id"], specs)
    assert full2.exceptAll(direct).count() == 0
    assert direct.exceptAll(full2).count() == 0
    # nothing active to compact now -> no-op
    assert compact_rollup(spark, store, ["conv_id"], specs) is None


def test_content_index_cross_partition_dup_and_incremental_dedup(spark, tmp_path):
    """The maintained content-hash index (a) flags duplicates that live
    in DIFFERENT date partitions — invisible to any single-partition
    dedup pass — and (b) dedups a new batch against history without
    rescanning raw history, equal to global keep-min dedup."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        maintain_rollup,
        read_rollup,
    )
    from mlcast_sourcedata_validator_spark.functions.dedup import (
        content_index_specs,
        dedup_against_index,
        exact_dedup,
    )

    rows = [
        # day 1
        (0, "alpha text", "2024-06-01 10:00:00"),
        (1, "beta text", "2024-06-01 11:00:00"),
        # day 2: doc 2 duplicates doc 0 (cross-partition), doc 3 fresh
        (2, "alpha text", "2024-06-02 10:00:00"),
        (3, "gamma text", "2024-06-02 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    table = str(tmp_path / "docs")
    df.withColumn("date", F.to_date("ts")).write.partitionBy("date") \
        .parquet(table)

    store = str(tmp_path / "idx")
    specs = content_index_specs("doc_id")
    maintain_rollup(spark, table, store, ["text_hash"], specs,
                    rollup_id="content_index",
                    derive={"text_hash": F.md5("text")})
    index = read_rollup(spark, store, ["text_hash"], specs,
                        rollup_id="content_index")
    # global dup audit from the index alone: exactly the alpha content
    dups = index.where("n_copies > 1").collect()
    assert len(dups) == 1 and dups[0]["n_copies"] == 2 and dups[0]["min_id"] == 0

    # day 3 arrives: one historical dup, one batch-internal dup pair
    batch = spark.createDataFrame(
        [(10, "beta text"), (11, "delta text"), (12, "delta text")],
        "doc_id long, text string")
    kept = dedup_against_index(batch, index, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept.collect()) == [11]
    # equivalence: history-kept + batch-kept == global keep-min dedup
    all_docs = df.select("doc_id", "text").unionByName(batch)
    global_kept = sorted(
        r["doc_id"] for r in exact_dedup(all_docs, "doc_id", "text").collect())
    hist_kept = sorted(
        r["doc_id"]
        for r in exact_dedup(df.select("doc_id", "text"), "doc_id", "text").collect())
    assert sorted(hist_kept + [r["doc_id"] for r in kept.collect()]) == global_kept


def test_rollup_plans_keep_partial_aggregation(spark):
    """Scale pins: the delta rollup and the merge are each ONE exchange
    with map-side partial aggregation (partial+final HashAggregate) —
    the property that makes per-partition deltas tiny and the merge
    shuffle O(#keys)."""
    df = generate_transcripts(spark, n_convs=40, seed=31)
    specs = transcript_rollup_specs()
    delta_plan = keyed_rollup(df, ["conv_id"], specs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert delta_plan.count("Exchange") == 1
    assert delta_plan.count("HashAggregate") >= 2  # partial + final
    half = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2))
    parts = [keyed_rollup(df.where(half == i), ["conv_id"], specs)
             for i in range(2)]
    merge_plan = merge_rollups(parts, ["conv_id"], specs) \
        ._jdf.queryExecution().executedPlan().toString()
    # the merge itself adds exactly one more exchange over the union
    assert merge_plan.count("Exchange") <= 3
    assert "HashAggregate" in merge_plan


def test_compaction_survives_no_resume_and_base_is_boundary_frontier(
    spark, tmp_path
):
    """(a) resume=False must NOT resurrect compacted partitions next to
    the base (their mass lives there); (b) a NEW partition that
    interleaves with compacted history is still caught — the base delta
    is the boundary chain's head."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        compact_rollup,
        maintain_rollup,
        read_rollup,
        read_rollup_deltas,
    )
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        boundary_audit,
    )

    rows = [("c", i, "user", "t", None, f"2024-06-0{d} 12:00:{i:02d}")
            for d, i in [(1, 0), (1, 1), (2, 2), (2, 3)]]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = str(tmp_path / "tbl")
    df.withColumn("date", F.to_date("ts")).write.partitionBy("date") \
        .parquet(table)
    store = str(tmp_path / "roll")
    specs = transcript_rollup_specs()
    maintain_rollup(spark, table, store, ["conv_id"], specs)
    compact_rollup(spark, store, ["conv_id"], specs)

    # (a) resume=False: nothing to redo — compacted partitions stay folded
    assert maintain_rollup(spark, table, store, ["conv_id"], specs,
                           resume=False) == []
    merged = read_rollup(spark, store, ["conv_id"], specs).collect()
    assert len(merged) == 1 and merged[0]["n_turns"] == 4  # not doubled

    # (b) day 3 arrives with turns 2,3 AGAIN (interleaves with history
    # that now lives only in the base delta)
    late = spark.createDataFrame(
        [("c", 2, "user", "t", None, "2024-06-03 12:00:02"),
         ("c", 3, "user", "t", None, "2024-06-03 12:00:03")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late.write.parquet(f"{table}/date=2024-06-03")
    assert maintain_rollup(spark, table, store, ["conv_id"], specs) == \
        ["2024-06-03"]
    out = boundary_audit(read_rollup_deltas(spark, store)).collect()
    assert [(r["conv_id"], r["partition_id"], r["reason"]) for r in out] == \
        [("c", "2024-06-03", "turn_overlap")]


def test_vacuum_rollup_deletes_only_dead_dirs(spark, tmp_path):
    """checkpoint.vacuum_rollup: COMPACTED delta dirs and unmarked
    crash-orphan __base-*__ dirs are physically deleted; active deltas
    and pending (unmarked, non-base) partitions survive; merged state is
    bit-identical before/after; vacuum is idempotent."""
    import os

    from mlcast_sourcedata_validator_spark.checkpoint import (
        compact_rollup,
        maintain_rollup,
        read_rollup,
        vacuum_rollup,
        write_partitioned_transcripts,
    )

    df = generate_transcripts(spark, n_convs=50, seed=31).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-07-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(3)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    specs = transcript_rollup_specs()
    maintain_rollup(spark, table, store, ["conv_id"], specs)
    assert compact_rollup(spark, store, ["conv_id"], specs)

    deltas = os.path.join(store, "deltas", "conv_rollup")
    # plant a crash orphan (base dir written, marker never appended) and
    # a pending partition (maintenance output whose marker append died)
    orphan = os.path.join(deltas, "partition_id=__base-deadbeef__")
    pending = os.path.join(deltas, "partition_id=2024-09-99")
    for d in (orphan, pending):
        os.makedirs(d)
        open(os.path.join(d, "part-0.parquet"), "wb").close()

    before = sorted(map(tuple,
                        read_rollup(spark, store, ["conv_id"], specs)
                        .collect()))
    rep = vacuum_rollup(spark, store)
    # every pre-compaction delta + the orphan base died
    assert "__base-deadbeef__" in rep["deleted"]
    assert len(rep["deleted"]) >= 4  # 3 date partitions + orphan
    assert len(rep["kept_active"]) == 1  # the compaction base
    assert rep["kept_pending"] == ["2024-09-99"]
    assert not os.path.exists(orphan)
    assert os.path.exists(pending)
    on_disk = {n for n in os.listdir(deltas) if n.startswith("partition_id=")}
    assert len(on_disk) == 2  # active base + pending

    after = sorted(map(tuple,
                       read_rollup(spark, store, ["conv_id"], specs)
                       .collect()))
    assert after == before

    # idempotent + paranoid mode leaves unmarked bases alone
    assert vacuum_rollup(spark, store)["deleted"] == []
    os.makedirs(orphan)
    assert vacuum_rollup(
        spark, store, delete_orphan_bases=False)["deleted"] == []
    assert os.path.exists(orphan)


def test_change_aware_rollup_maintenance(spark, tmp_path):
    """detect_changes on maintain_rollup: a rewritten source partition
    gets its delta recomputed (merged rollup equals a fresh whole-table
    rollup of the NEW data); an unchanged store is a no-op; a changed
    partition whose delta was already compacted raises (merge-only
    specs cannot retract the old mass)."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        compact_rollup,
        maintain_rollup,
        read_rollup,
        write_partitioned_transcripts,
    )

    df = generate_transcripts(spark, n_convs=40, seed=19).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(3)) * 86400
                          + F.col("turn_idx") * 10),
    )
    table = str(tmp_path / "tbl")
    store = str(tmp_path / "roll")
    write_partitioned_transcripts(df, table)
    specs = transcript_rollup_specs()

    parts = sorted(maintain_rollup(spark, table, store, ["conv_id"], specs))
    assert len(parts) == 3
    # unchanged: change-aware maintenance finds nothing to do
    assert maintain_rollup(spark, table, store, ["conv_id"], specs,
                           detect_changes=True) == []

    # rewrite one source partition with DIFFERENT data (drop one conv)
    target = parts[0]
    pdir = f"{table}/date={target}"
    pdata = spark.read.parquet(pdir).localCheckpoint()
    drop_conv = pdata.select("conv_id").orderBy("conv_id").first()[0]
    pdata.where(F.col("conv_id") != drop_conv) \
        .write.mode("overwrite").parquet(pdir)

    # plain maintenance is blind; change-aware recomputes exactly it
    assert maintain_rollup(spark, table, store, ["conv_id"], specs) == []
    redone = maintain_rollup(spark, table, store, ["conv_id"], specs,
                             detect_changes=True)
    assert redone == [target]
    merged = read_rollup(spark, store, ["conv_id"], specs)
    direct = keyed_rollup(spark.read.parquet(table).drop("date"),
                          ["conv_id"], specs)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    # compact, then rewrite another source partition: hard error — the
    # old mass is in the base and cannot be retracted
    compact_rollup(spark, store, ["conv_id"], specs)
    target2 = parts[1]
    pdir2 = f"{table}/date={target2}"
    p2 = spark.read.parquet(pdir2).localCheckpoint()
    p2.repartition(2).write.mode("overwrite").parquet(pdir2)
    with pytest.raises(ValueError, match="compacted into the base"):
        maintain_rollup(spark, table, store, ["conv_id"], specs,
                        detect_changes=True)
