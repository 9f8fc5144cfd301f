"""Conversation-granular operators (functions/conversations.py):
fingerprints, whole-conversation dedup, template turns, prefix
containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import conversations as C


def _conv(conv, texts):
    return [(conv, i, t) for i, t in enumerate(texts)]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id: string, turn_idx: int, text: string")


def test_fingerprint_is_order_and_content_sensitive(spark):
    base = _df(spark, _conv("a", ["x", "y", "z"]))
    reordered = _df(spark, [("b", 0, "y"), ("b", 1, "x"), ("b", 2, "z")])
    edited = _df(spark, _conv("c", ["x", "y", "Z"]))
    twin = _df(spark, _conv("d", ["x", "y", "z"]))
    fps = {r.conv: r.fingerprint for r in C.conv_fingerprints(
        base.union(reordered).union(edited).union(twin),
        "conv_id", ["turn_idx"], "text").collect()}
    assert fps["a"] == fps["d"]
    assert len({fps["a"], fps["b"], fps["c"]}) == 3


def test_dedup_conversations_keeps_min_key_unit(spark):
    """Identical conversations dedup as a UNIT (all turns of the min-key
    copy survive, every turn of the loser goes) even though each
    individual turn text also appears in other, distinct conversations."""
    rows = (_conv("a", ["hi", "ok"]) + _conv("b", ["hi", "ok"])
            + _conv("c", ["hi", "no"]))
    out = C.dedup_conversations(_df(spark, rows), "conv_id",
                                ["turn_idx"], "text")
    got = sorted((r.conv_id, r.turn_idx) for r in out.collect())
    assert got == [("a", 0), ("a", 1), ("c", 0), ("c", 1)]


def test_template_turns_threshold_and_counts(spark):
    rows = (_conv("a", ["canned", "u1"]) + _conv("b", ["canned", "u2"])
            + _conv("c", ["canned", "canned"]) + _conv("d", ["u3", "u4"]))
    out = C.template_turns(_df(spark, rows), "conv_id", "text",
                           min_convs=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.text == "canned" and r.n_convs == 3 and r.n_turns == 4


def test_prefix_containment_exact_pairs(spark):
    """s1 is a proper prefix of l1; identical conversations (a==a2) are
    NOT prefix pairs; single-turn conversations emit no bogus prefixes
    (the sequence(1,0) descending-range guard)."""
    rows = (_conv("l1", ["p", "q", "r", "s"]) + _conv("s1", ["p", "q"])
            + _conv("a", ["m", "n"]) + _conv("a2", ["m", "n"])
            + _conv("one", ["solo"]))
    out = C.prefix_containment_pairs(_df(spark, rows), "conv_id",
                                     ["turn_idx"], "text", prefix_depth=8)
    got = sorted((r.short_conv, r.long_conv, r.n_short)
                 for r in out.collect())
    assert got == [("s1", "l1", 2)]


def test_prefix_depth_bounds_fanout_and_detection(spark):
    """prefix_depth is the documented contract: a short conversation
    LONGER than the depth cannot be detected; the long side's prefix
    fanout is capped at depth rows."""
    long_texts = [f"t{i}" for i in range(10)]
    rows = _conv("long", long_texts) + _conv("short", long_texts[:6])
    df = _df(spark, rows)
    hit = C.prefix_containment_pairs(df, "conv_id", ["turn_idx"], "text",
                                     prefix_depth=8).collect()
    assert [(r.short_conv, r.long_conv) for r in hit] == [("short", "long")]
    miss = C.prefix_containment_pairs(df, "conv_id", ["turn_idx"], "text",
                                      prefix_depth=4).collect()
    assert miss == []


def test_conv_ops_match_events_scale_construction(spark, sf_dir):
    """The planted-duplicate construction the extras oracles use, checked
    structurally at sf0.001: dedup returns exactly the original events;
    prefix pairs include every planted (truncated, original) pair."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "props")
    dup = ev.withColumn("user_id", F.col("user_id") + 1_000_000)
    out = C.dedup_conversations(ev.unionByName(dup), "user_id",
                                ["ts", "event_id"], "props")
    assert out.count() == ev.count()
    assert out.where(F.col("user_id") >= 1_000_000).count() == 0


def test_conv_duplicates_check_verdicts(spark):
    """Declarative conv_duplicates check: PASS on distinct conversations,
    WARNING naming the largest copy groups on planted duplicates, FAIL
    when gated, PASS on empty input."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    def suite(params):
        return CheckSuite("convdup_t", [CheckSpec(
            "conv_duplicates", "conv_duplicates", "3.6 dedup",
            "Conversations MUST NOT be whole-unit copies.", params)],
            conv_col="conv_id", turn_col="turn_idx")

    clean = _df(spark, _conv("a", ["x", "y"]) + _conv("b", ["x", "z"]))
    res = run_suite(RunContext(spark=spark, df=clean, suite=suite({}),
                               run_id="c"))
    assert [r.status for r in res.report.results] == ["PASS"]

    dup = _df(spark, _conv("a", ["x", "y"]) + _conv("b", ["x", "y"])
              + _conv("c", ["x", "y"]) + _conv("d", ["q", "r"]))
    res2 = run_suite(RunContext(spark=spark, df=dup, suite=suite({}),
                                run_id="d"))
    r2 = res2.report.results[0]
    assert r2.status == "WARNING"
    assert "2 of 4" in r2.detail and "3x" in r2.detail \
        and "conv a" in r2.detail and "dedup_conversations" in r2.detail

    res3 = run_suite(RunContext(
        spark=spark, df=dup, suite=suite({"severity": "FAIL"}),
        run_id="e"))
    assert res3.exit_code() == 1
    # a loose budget tolerates the planted 50% duplication
    res4 = run_suite(RunContext(
        spark=spark, df=dup, suite=suite({"max_dup_frac": 0.6}),
        run_id="f"))
    assert [r.status for r in res4.report.results] == ["PASS"]

    empty = clean.where("1=0")
    res5 = run_suite(RunContext(spark=spark, df=empty, suite=suite({}),
                                run_id="g"))
    assert [r.status for r in res5.report.results] == ["PASS"]


def test_dedup_prefix_conversations_collapses_chains(spark):
    """a ⊂ b ⊂ c collapses to c alone in ONE pass; non-contained and
    exact-duplicate conversations are untouched (exact dup is
    dedup_conversations' job — composable, not overlapping)."""
    rows = (_conv("a", ["x"]) + _conv("b", ["x", "y"])
            + _conv("c", ["x", "y", "z"])
            + _conv("d", ["q", "r"]) + _conv("d2", ["q", "r"]))
    out = C.dedup_prefix_conversations(_df(spark, rows), "conv_id",
                                       ["turn_idx"], "text")
    got = sorted({r.conv_id for r in out.collect()})
    assert got == ["c", "d", "d2"]
    # composed with whole-unit dedup: exactly one canonical copy remains
    both = C.dedup_conversations(out, "conv_id", ["turn_idx"], "text")
    assert sorted({r.conv_id for r in both.collect()}) == ["c", "d"]
