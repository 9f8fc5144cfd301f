"""Streaming windowed Misra-Gries heavy hitters
(streaming/hot_keys.py): per-window bounded state across micro-batches,
snapshot semantics, watermark drop of late rows."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.streaming.hot_keys import (
    hot_keys_stream,
    latest_topk_sql,
)


def _feed(spark, tmp_path, name, rows, mtime):
    df = spark.createDataFrame(rows, "k string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
    part = [f for f in os.listdir(tmp_path / name)
            if f.endswith(".parquet")][0]
    dst = str(tmp_path / "feed" / (name + ".parquet"))
    os.rename(str(tmp_path / name / part), dst)
    os.utime(dst, (mtime, mtime))


@pytest.mark.slow
def test_hot_keys_stream_bounded_state_across_batches(spark, tmp_path):
    os.makedirs(str(tmp_path / "feed"))
    now = _time.time()
    t1 = "2024-01-01 00:00:"
    # batch 1, window W1 [00:00,00:01): a x3, b x2, c, d -> capacity 3
    # saturates: decrement by the 4th-largest (1) leaves {a:2, b:1}
    _feed(spark, tmp_path, "f1",
          [("a", f"{t1}01"), ("a", f"{t1}02"), ("a", f"{t1}03"),
           ("b", f"{t1}04"), ("b", f"{t1}05"),
           ("c", f"{t1}06"), ("d", f"{t1}07")], now - 30)
    # batch 2: W1 gets b x2 + e (no shrink: 3 counters), and one row in
    # W2 advances the watermark past W1's end
    _feed(spark, tmp_path, "f2",
          [("b", f"{t1}08"), ("b", f"{t1}09"), ("e", f"{t1}10"),
           ("x", "2024-01-01 00:02:00")], now - 20)
    # batch 3: a LATE W1 row (behind the watermark) must be dropped and
    # must not resurrect / re-emit W1 state
    _feed(spark, tmp_path, "f3",
          [("z", f"{t1}11"), ("x", "2024-01-01 00:03:00")], now - 10)

    stream = (spark.readStream.schema("k string, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "feed")))
    out = hot_keys_stream(stream, "k", window="1 minute",
                          watermark="0 seconds", capacity=3)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("hotk").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM hotk").collect()
    w1 = [r for r in rows if r.w_start.minute == 0 and r.w_start.hour == 0]
    # two snapshots of W1 (batches 1 and 2) and nothing from batch 3
    assert {r.seq for r in w1} == {1, 2}
    s1 = {r.key: r.est for r in w1 if r.seq == 1}
    s2 = {r.key: r.est for r in w1 if r.seq == 2}
    assert s1 == {"a": 2, "b": 1}
    assert s2 == {"a": 2, "b": 3, "e": 1}
    assert "z" not in {r.key for r in w1}  # late row dropped

    # reader: latest snapshot only, ranked, cut at k
    top2 = [(r.key, r.n) for r in
            spark.sql(latest_topk_sql("hotk", 2)).collect()
            if r.w_start.minute == 0]
    assert top2 == [("b", 3), ("a", 2)]


def test_hot_keys_stream_exact_when_unsaturated(spark, tmp_path):
    """capacity > distinct keys in every window -> no decrement ever runs
    and the drained top-k equals the batch exact per-window top-k (the
    extras-oracle regime)."""
    os.makedirs(str(tmp_path / "feed"))
    rows = [(k, f"2024-01-01 0{h}:00:{s:02d}")
            for h in (0, 1)
            for k, reps in (("a", 5), ("b", 3), ("c", 1))
            for s in range(reps)]
    _feed(spark, tmp_path, "f1", rows, _time.time() - 5)
    stream = (spark.readStream.schema("k string, ts timestamp")
              .parquet(str(tmp_path / "feed")))
    out = hot_keys_stream(stream, "k", window="1 hour",
                          watermark="1 hour", capacity=64)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("hotk2").trigger(availableNow=True).start())
    q.awaitTermination()
    got = [(str(r.w_start), r.key, r.n) for r in
           spark.sql(latest_topk_sql("hotk2", 2)).collect()]
    assert got == [("2024-01-01 00:00:00", "a", 5),
                   ("2024-01-01 00:00:00", "b", 3),
                   ("2024-01-01 01:00:00", "a", 5),
                   ("2024-01-01 01:00:00", "b", 3)]
