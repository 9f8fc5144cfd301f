"""Sampled partitioned runs: per-partition conversation-level sampling,
__sample_fraction stamping, and unchanged resume semantics."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.checkpoint import (
    read_metrics,
    run_partitioned,
    write_partitioned_transcripts,
)
from mlcast_sourcedata_validator_spark.functions.sampling import hash_uniform
from mlcast_sourcedata_validator_spark.sources.properties import (
    write_table_properties,
)
from mlcast_sourcedata_validator_spark.suite import get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stbl") / "transcripts")
    df = generate_transcripts(spark, n_convs=80, seed=23)
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(3)) * 86400
                          + F.col("turn_idx") * 10),
    )
    write_partitioned_transcripts(df, path)
    write_table_properties(path, {"license": "CC-BY-4.0",
                                  "consistent_timestep_start": "true"})
    return path


@pytest.fixture(scope="module")
def registry(spark, table):
    return generate_conversations_registry(
        spark.read.parquet(table)
    ).localCheckpoint()


@pytest.mark.slow
def test_sampled_partitioned_run(spark, table, registry, tmp_path):
    suite = get_suite("transcripts_v1")
    full_store = str(tmp_path / "full")
    samp_store = str(tmp_path / "samp")
    full = run_partitioned(spark, suite, table, full_store,
                           registry_df=registry)
    samp = run_partitioned(spark, suite, table, samp_store,
                           registry_df=registry,
                           sample_fraction=0.5, sample_seed=9)
    assert samp.processed == full.processed
    # each partition validated strictly fewer rows, and exactly the rows
    # of sampled-in conversations
    tbl = spark.read.parquet(table)
    for p in full.processed:
        n_full = full.results[p].n_input_rows
        n_samp = samp.results[p].n_input_rows
        assert 0 < n_samp < n_full
        expect = (tbl.where(F.col("date") == p)
                  .where(hash_uniform(F.col("conv_id"), 9) < 0.5).count())
        assert n_samp == expect
    # the fraction is stamped into every partition's metrics rows
    m = read_metrics(spark, samp_store)
    stamped = (m.where(F.col("metric") == "__sample_fraction")
               .select(F.col("partition_id").cast("string"), "value")
               .collect())
    assert {r["partition_id"] for r in stamped} == set(samp.processed)
    assert all(r["value"] == 0.5 for r in stamped)
    # the full store has no such stamp
    mf = read_metrics(spark, full_store)
    assert mf.where(F.col("metric") == "__sample_fraction").count() == 0


def test_sampled_resume_skips_committed(spark, table, registry, tmp_path):
    suite = get_suite("transcripts_v1")
    store = str(tmp_path / "res")
    first = run_partitioned(spark, suite, table, store, registry_df=registry,
                            sample_fraction=0.5, sample_seed=9,
                            max_partitions=1)
    assert len(first.processed) == 1
    second = run_partitioned(spark, suite, table, store, registry_df=registry,
                             sample_fraction=0.5, sample_seed=9)
    assert first.processed[0] in second.skipped
    assert set(second.processed).isdisjoint(first.processed)


def test_bad_fraction_raises_before_commit(spark, table, registry, tmp_path):
    suite = get_suite("transcripts_v1")
    with pytest.raises(Exception, match="sample_fraction"):
        run_partitioned(spark, suite, table, str(tmp_path / "bad"),
                        registry_df=registry, sample_fraction=1.5)
