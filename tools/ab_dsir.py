"""A/B: DSIR per-document scoring as (A) the shipped zero-shuffle
map-side `aggregate` over the token array with the log-ratio table as a
plan literal, vs (B) the textbook explode -> broadcast-join(ratio table)
-> groupBy(doc) sum. Same log_ratios, same output (asserted), interleaved
repetitions, medians reported.

Usage: python tools/ab_dsir.py [n_copies] [reps]
Writes BENCH/ab_dsir_r04.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mlcast_sourcedata_validator_spark.functions import sampling as S  # noqa: E402
from mlcast_sourcedata_validator_spark.session import get_spark  # noqa: E402

N_COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
B = 256
SEED = 7


def scored_join(df, lr, spark):
    """Variant B: explode + broadcast join + re-agg (one full shuffle of
    the corpus on doc id)."""
    ratio = spark.createDataFrame(
        [(b, v) for b, v in enumerate(lr)], "b int, lr long")
    toks = df.select(
        "doc_id",
        F.explode(S.dsir_tokens(F.col("text"))).alias("_t"),
    ).select("doc_id", S.dsir_bucket(F.col("_t"), B, SEED)
             .cast("int").alias("b"))
    sums = (toks.join(F.broadcast(ratio), "b")
            .groupBy("doc_id").agg(F.sum("lr").alias("weight_q")))
    return df.select("doc_id").join(sums, "doc_id", "left") \
        .select("doc_id", F.coalesce("weight_q", F.lit(0)).alias("weight_q"))


def main():
    spark = get_spark(app_name="ab_dsir", cores=32, shuffle_partitions=64)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # upscale: n_copies distinct doc ids per source doc, text perturbed by
    # a per-copy suffix so token sets are not all identical
    big = (
        base.crossJoin(spark.range(N_COPIES).select(F.col("id").alias("c")))
        .select(
            (F.col("doc_id") * N_COPIES + F.col("c")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" copyword"),
                     F.col("c").cast("string")).alias("text"),
            "lang",
        )
        .repartition(64)
        .localCheckpoint()
    )
    n = big.count()
    lr = S.dsir_log_ratios(big, "text", F.col("lang") == "en", B, SEED)

    # equality once before timing
    a = S.dsir_weights(big, "doc_id", "text", F.col("lang") == "en",
                       B, SEED, log_ratios=lr).select("doc_id", "weight_q")
    b = scored_join(big, lr, spark)
    mism = a.join(b, "doc_id") \
        .where(a["weight_q"] != b["weight_q"]).count()
    assert mism == 0, f"{mism} weight mismatches between variants"

    walls = {"literal": [], "join": []}
    for _ in range(REPS):
        for name, frame in (("literal", a), ("join", b)):
            t0 = time.monotonic()
            frame.agg(F.sum("weight_q"), F.count(F.lit(1))).collect()
            walls[name].append(round(time.monotonic() - t0, 3))
    out = {
        "n_docs": n,
        "n_buckets": B,
        "reps": REPS,
        "walls": walls,
        "median_literal_sec": statistics.median(walls["literal"]),
        "median_join_sec": statistics.median(walls["join"]),
    }
    out["speedup_join_over_literal"] = round(
        out["median_join_sec"] / out["median_literal_sec"], 3)
    print(json.dumps(out))
    with open("BENCH/ab_dsir_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
