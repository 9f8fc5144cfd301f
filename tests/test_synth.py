"""Synthetic generator: determinism + the per-turn text-equality invariant."""

from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.synth import (
    generate_transcripts,
    inject_violations,
)


def test_deterministic_per_turn_text_equality(spark):
    """Same seed => identical rows under the stable (conv_id, turn_idx) sort
    — the input_hint invariant ("per-turn text equality under stable turn
    ordering")."""
    a = generate_transcripts(spark, n_convs=80, seed=42)
    b = generate_transcripts(spark, n_convs=80, seed=42)
    joined = a.alias("a").join(
        b.alias("b"),
        on=[F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx")],
        how="full",
    )
    mismatches = joined.where(
        ~(F.col("a.text").eqNullSafe(F.col("b.text")))
        | ~(F.col("a.ts").eqNullSafe(F.col("b.ts")))
        | ~(F.col("a.role").eqNullSafe(F.col("b.role")))
    ).count()
    assert mismatches == 0
    assert a.count() == b.count() > 0


def test_different_seed_differs(spark):
    a = generate_transcripts(spark, n_convs=50, seed=1)
    b = generate_transcripts(spark, n_convs=50, seed=2)
    same = a.intersect(b).count()
    assert same < a.count()


def test_schema_matches_input_hint(spark):
    df = generate_transcripts(spark, n_convs=5)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
        ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
    ]


def test_ts_strictly_increasing_and_turns_contiguous(spark):
    from pyspark.sql import Window as W
    df = generate_transcripts(spark, n_convs=60, seed=7)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        df.withColumn("lag_ts", F.lag("ts").over(w))
        .withColumn("lag_t", F.lag("turn_idx").over(w))
        .where(
            (F.col("lag_ts").isNotNull() & (F.col("ts") <= F.col("lag_ts")))
            | (F.col("lag_t").isNotNull() & (F.col("turn_idx") != F.col("lag_t") + 1))
        )
        .count()
    )
    assert bad == 0
    firsts = df.groupBy("conv_id").agg(F.min("turn_idx").alias("m")).where("m != 0").count()
    assert firsts == 0


def test_injection_counts_are_exact(spark):
    df = generate_transcripts(spark, n_convs=300, seed=42)
    dirty, expected = inject_violations(df, k=5, seed=42)
    for cls, keys in expected.items():
        assert len(keys) == 5, cls
    # dup rows really duplicated
    dup_pred = dirty.groupBy("conv_id", "turn_idx").count().where("count > 1")
    assert dup_pred.count() == 5
