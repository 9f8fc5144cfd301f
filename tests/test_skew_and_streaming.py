"""Salted two-phase aggregation equivalence on the Zipf fixture; streaming
micro-batch validation via foreachBatch availableNow."""

from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.report import FAIL
from mlcast_sourcedata_validator_spark.skew import salted_agg, salted_count
from mlcast_sourcedata_validator_spark.streaming.validate_stream import (
    validate_stream,
)
from mlcast_sourcedata_validator_spark.suite import get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
)


def test_salted_count_equals_plain_groupby(spark):
    df = generate_transcripts(spark, n_convs=150, seed=9)  # Zipf head keys
    plain = df.groupBy("conv_id").count()
    salted = salted_count(df, ["conv_id"], n_salts=8)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_agg_minmax_sum(spark):
    df = generate_transcripts(spark, n_convs=100, seed=5)
    plain = df.groupBy("conv_id").agg(
        F.max("ts").alias("max_ts"),
        F.sum(F.length("text")).alias("chars"),
    )
    salted = salted_agg(
        df, ["conv_id"],
        {
            "max_ts": (F.max("ts"), F.max("max_ts")),
            "chars": (F.sum(F.length("text")), F.sum("chars")),
        },
        n_salts=8,
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_streaming_validation_available_now(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    clean = generate_transcripts(spark, n_convs=80, seed=13)
    clean.write.mode("overwrite").parquet(src)
    registry = generate_conversations_registry(clean).localCheckpoint()

    stream = spark.readStream.schema(clean.schema).parquet(src)
    seen = {}

    def on_batch(batch_id, res):
        seen[batch_id] = res.report.summarize()

    q = validate_stream(
        spark, stream, get_suite("transcripts_v1"), ckpt, run_id="s1",
        registry_df=registry, on_batch=on_batch,
    )
    q.awaitTermination(120)
    assert seen, "no micro-batch was validated"
    for summary in seen.values():
        assert summary[FAIL] == 0
