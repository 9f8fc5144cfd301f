"""Plan-shape regression tests: the fused suite must stay one-scan /
one-shuffle with map-side predicate evaluation. These assert structural
properties of the *physical plan string*, so a future change that silently
adds a shuffle or drops the fused Observation fails here, not in a
benchmark three rounds later."""

import re

import pytest

from mlcast_sourcedata_validator_spark.compiler import (
    build_suite_plan,
    compile_suite,
)
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def plan_str(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pl") / "t")
    df = generate_transcripts(spark, n_convs=50, seed=2)
    df.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    reg = generate_conversations_registry(stored)
    ctx = RunContext(spark=spark, df=stored, suite=get_suite("transcripts_v1"),
                     run_id="p", registry_df=reg)
    plan = build_suite_plan(ctx, compile_suite(ctx.suite))
    return plan.violations._jdf.queryExecution().executedPlan().toString()


def test_single_scan_of_the_transcripts_table(plan_str):
    # 1 scan for the transcripts + 1 for the registry = exactly 2
    assert plan_str.count("Scan parquet") == 2


def test_metrics_ride_the_scan(plan_str):
    assert "CollectMetrics" in plan_str


def test_single_bigside_shuffle(plan_str):
    # exchanges: >=1 for the window (big side); the registry side may add a
    # distinct-exchange + broadcast. The BIG side must contribute exactly
    # one hash partitioning on conv_id feeding the window sort.
    exchanges = re.findall(r"Exchange hashpartitioning\(conv_id#\d+", plan_str)
    assert len(exchanges) == 1, plan_str[:2000]


def test_exactly_one_window(plan_str):
    # uniqueness + contiguity + monotonicity + refint marker all share ONE
    # window operator
    assert plan_str.count("Window [") == 1


def test_row_hits_computed_before_the_shuffle(plan_str):
    # the map-side hits array (role/tool domain checks) must appear UNDER
    # the exchange: the project containing 'role_domain' must come later in
    # the bottom-up plan string than the exchange line... simpler: the
    # shuffle's input already contains _row_hits
    m = re.search(r"Exchange hashpartitioning\(conv_id#\d+.*", plan_str)
    assert m is not None
    below = plan_str[m.end():]
    assert "role_domain" in below, "row hits must be computed below the exchange"


def test_partition_pruned_batch_reads_single_partition(spark, tmp_path):
    """run_partitioned reads one date= dir per batch — the scan location
    must point at that partition only."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_partitioned_transcripts,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = generate_transcripts(spark, n_convs=30, seed=4).withColumn(
        "ts", F.to_timestamp(F.lit("2024-03-01"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(3)) * 86400
                          + F.col("turn_idx")),
    )
    write_partitioned_transcripts(df, path)
    batch = spark.read.option("basePath", path).parquet(f"{path}/date=2024-03-02")
    files = batch.inputFiles()
    assert files and all("date=2024-03-02" in f for f in files)
    n_all = spark.read.parquet(path).count()
    assert 0 < batch.count() < n_all


def test_bucketed_tables_join_without_shuffle(spark):
    """Co-located join strategy: two tables bucketed by the join key join
    with ZERO Exchange nodes — the layout a 100 TB deployment uses for
    repeated conv_id joins (registry, prior-run results)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("v"))
    b = spark.range(0, 2_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("w"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name, df in (("bkt_a", a), ("bkt_b", b)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            df.write.bucketBy(8, "user_id").sortBy("user_id") \
                .mode("overwrite").saveAsTable(name)
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 2_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_ngram_default_plan_has_no_shingle_selfjoin(spark, sf_dir):
    """The candidates-first default must never execute the quadratic
    shingle self-join: the global path's plan joins on the exploded
    shingle column, the bounded default verifies candidate pairs via
    array_intersect and joins only on doc ids."""
    import re

    from mlcast_sourcedata_validator_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    auto = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    glob = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold=0.5, method="global")
    shingle_join = re.compile(r"Join \[s#\d+[L]?\], \[s#\d+[L]?\]")
    pa = auto._jdf.queryExecution().executedPlan().toString()
    pg = glob._jdf.queryExecution().executedPlan().toString()
    assert shingle_join.search(pg), "oracle twin should self-join on shingles"
    assert not shingle_join.search(pa), pa
    assert "array_intersect" in pa


def test_ann_lsh_topk_plan_is_map_side(spark, sf_dir):
    """The RHP bucket must be an inline expression filtered on the corpus
    scan: exactly ONE parquet scan and NO hash exchange on the id column
    (the round-2 plan joined an (id, bucket) signature table back to the
    corpus — two scans + an id shuffle for a value the scan computes in
    place)."""
    from mlcast_sourcedata_validator_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [0.1 * ((i % 7) - 3) for i in range(64)]
    df = sim.ann_lsh_topk(emb, "vec_id", "embedding", q, k=10, n_planes=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange hashpartitioning(vec_id" not in plan, plan


def test_embedding_lsh_explicit_dim_has_no_probe_job(spark, sf_dir):
    """With dim passed explicitly the pair pipeline is built without any
    driver-side .first() probe — constructing the DataFrame triggers zero
    Spark jobs."""
    from mlcast_sourcedata_validator_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sim.embedding_lsh_near_dup_pairs(emb, "vec_id", "embedding",
                                     threshold=0.4, n_tables=4, n_planes=2,
                                     dim=64)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_parallelism_guard_gated_by_input_size(spark, sf_dir):
    """_ensure_parallelism's size floor: cheap-per-row pipelines (simhash,
    multimodal) must NOT repartition a small input (measured net loss),
    while the explode-heavy minhash path keeps its round-robin spread
    (measured 2-4x win at every size)."""
    from mlcast_sourcedata_validator_spark.functions import dedup as dd
    from mlcast_sourcedata_validator_spark.functions import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < dd._estimated_bytes(docs) < dd.CHEAP_PATH_MIN_BYTES

    def rr(df):
        return "RoundRobinPartitioning" in (
            df._jdf.queryExecution().executedPlan().toString())

    assert not rr(dd.simhash(docs, "doc_id", "text"))
    assert not rr(dd.simhash64(docs, "doc_id", "text"))
    media = mm.attach_fake_media(docs, "text")
    assert not rr(mm.extract_media_meta(media, "doc_id", "media"))
    assert rr(dd.minhash_signatures(docs, "doc_id", "text"))


def test_suite_plan_zero_exchange_on_bucketed_table(spark, tmp_path_factory):
    """Bucketed-layout scale path (checkpoint.write_bucketed_table): with
    transcripts AND registry bucketed by conv_id at the same bucket count,
    the fused suite plan has ZERO Exchange nodes — the window's clustering
    and the refint join's distribution are both satisfied straight off the
    scan. The suite's only per-run shuffle becomes a one-time layout
    decision at ingest; verdicts and violations stay identical to the
    plain-parquet run."""
    from pyspark.sql import functions as F

    from mlcast_sourcedata_validator_spark.checkpoint import (
        write_bucketed_table,
    )
    from mlcast_sourcedata_validator_spark.compiler import run_suite

    df = generate_transcripts(spark, n_convs=120, seed=7).localCheckpoint()
    reg = generate_conversations_registry(df).localCheckpoint()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the registry join exercises the bucketed
        # co-location (AQE would otherwise broadcast this tiny fixture)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(df, "bkt_suite_t", "conv_id", 8,
                             ["conv_id", "turn_idx"])
        write_bucketed_table(reg, "bkt_suite_reg", "conv_id", 8, ["conv_id"])
        suite = get_suite("transcripts_v1")
        ctx_b = RunContext(spark=spark, df=spark.table("bkt_suite_t"),
                           suite=suite, run_id="bkt",
                           registry_df=spark.table("bkt_suite_reg"))
        plan = build_suite_plan(ctx_b, compile_suite(suite))
        pstr = plan.violations._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in pstr, pstr[:3000]
        # exactly one file per bucket (repartition aligned with the bucket
        # hash), the precondition for the scan reporting sorted output
        files = [f for f in spark.table("bkt_suite_t").inputFiles()]
        assert len(files) == 8, files

        res_b = run_suite(ctx_b)
        ctx_p = RunContext(spark=spark, df=df, suite=suite, run_id="plain",
                           registry_df=reg)
        res_p = run_suite(ctx_p)
        assert res_b.report.summarize() == res_p.report.summarize()
        assert res_b.n_violations == res_p.n_violations
        assert res_b.n_input_rows == res_p.n_input_rows == df.count()
        viol_cmp = (
            res_b.violations.select("check_id", "conv_id", "turn_idx")
            .exceptAll(res_p.violations.select("check_id", "conv_id",
                                               "turn_idx"))
        )
        assert viol_cmp.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_suite_t")
        spark.sql("DROP TABLE IF EXISTS bkt_suite_reg")


def test_repair_transcripts_single_exchange(spark):
    """The whole repair (role/tool normalization map-side, key dedup +
    reindex as two Windows over the same conv_id clustering) costs ONE
    hash exchange — the suite's own shuffle budget."""
    from mlcast_sourcedata_validator_spark.functions.repair import (
        repair_transcripts,
    )
    from mlcast_sourcedata_validator_spark.synth import generate_transcripts

    out = repair_transcripts(generate_transcripts(spark, n_convs=20, seed=3))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning\(conv_id#\d+",
                          plan)) == 1, plan[:3000]
    assert plan.count("Exchange") == 1, plan[:3000]


def test_gopher_quality_plan_is_map_side(spark, sf_dir):
    """gopher_quality is pure row expressions: one parquet scan, zero
    Exchange — the filter pipelines with the scan at any corpus size."""
    from mlcast_sourcedata_validator_spark.functions.text import (
        gopher_quality)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = gopher_quality(docs, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange" not in plan, plan


def test_semantic_decontaminate_plan_broadcasts_eval(spark, sf_dir):
    """The eval side must broadcast (no sort-merge join, no corpus-side
    pre-join exchange): the only Exchange is the per-id max aggregate."""
    from mlcast_sourcedata_validator_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from pyspark.sql import functions as F
    df = sim.semantic_decontaminate(
        emb.where(F.col("label") != 0), emb.where(F.col("label") == 0),
        "vec_id", "embedding", threshold=0.45, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # exactly one hash exchange: the groupBy(vec_id) max
    assert plan.count("Exchange hashpartitioning") == 1, plan
