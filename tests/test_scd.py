"""SCD2 history derivation + incremental merge (functions/scd.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.scd import (
    scd2_from_log,
    scd2_merge,
)


def _rows(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in df.select(
            "k", "state", "valid_from", "valid_to", "is_current"
        ).collect()
    )


class TestScd2:
    @pytest.fixture(scope="class")
    def log(self, spark):
        # key a: 3 versions (x, y, x) with a repeat observation inside
        # version y; key b: single observation; key c: NULL-state version
        # in the middle (null-safe change detection)
        rows = [
            ("a", 1, "x"), ("a", 2, "y"), ("a", 3, "y"), ("a", 4, "x"),
            ("b", 1, "z"),
            ("c", 1, "p"), ("c", 2, None), ("c", 3, None), ("c", 4, "p"),
        ]
        return spark.createDataFrame(rows, "k: string, t: int, state: string")

    def test_from_log_versions(self, log):
        out = scd2_from_log(log, ["k"], "t", ["state"])
        got = _rows(out)
        assert got == sorted([
            ("a", "x", "1", "2", "False"),
            ("a", "y", "2", "4", "False"),
            ("a", "x", "4", "None", "True"),
            ("b", "z", "1", "None", "True"),
            ("c", "p", "1", "2", "False"),
            ("c", "None", "2", "4", "False"),
            ("c", "p", "4", "None", "True"),
        ])

    def test_exactly_one_current_per_key(self, log):
        out = scd2_from_log(log, ["k"], "t", ["state"])
        per_key = (
            out.groupBy("k")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
            .collect()
        )
        assert all(r["n_cur"] == 1 for r in per_key)

    def test_merge_equals_full_rederivation(self, spark, log):
        # batch = everything after t=2 (unordered within the batch is
        # fine; the guard only requires after-current-version)
        hist_log = log.where("t <= 2")
        updates = log.where("t > 2")
        history = scd2_from_log(hist_log, ["k"], "t", ["state"])
        merged = scd2_merge(history, updates, ["k"], "t", ["state"])
        full = scd2_from_log(log, ["k"], "t", ["state"])
        assert _rows(merged) == _rows(full)

    def test_merge_rejects_past_rewrite(self, spark, log):
        # an update BEFORE key a's current version (valid_from=4 after a
        # full build) is unanswerable from the compressed table -> loud
        # failure, not silent divergence
        history = scd2_from_log(log, ["k"], "t", ["state"])
        stale = spark.createDataFrame(
            [("a", 2, "w")], "k: string, t: int, state: string"
        )
        with pytest.raises(Exception, match="raw-log replay"):
            scd2_merge(history, stale, ["k"], "t", ["state"]).collect()

    def test_merge_new_keys_and_untouched_passthrough(self, spark, log):
        history = scd2_from_log(log, ["k"], "t", ["state"])
        updates = spark.createDataFrame(
            [("d", 1, "q"), ("d", 2, "r")], "k: string, t: int, state: string"
        )
        merged = scd2_merge(history, updates, ["k"], "t", ["state"])
        # new key derived
        d_rows = _rows(merged.where("k = 'd'"))
        assert d_rows == sorted([
            ("d", "q", "1", "2", "False"),
            ("d", "r", "2", "None", "True"),
        ])
        # untouched keys byte-identical to prior history
        assert _rows(merged.where("k <> 'd'")) == _rows(history)

    def test_merge_same_state_update_is_noop_version(self, spark, log):
        history = scd2_from_log(log, ["k"], "t", ["state"])
        # b's current state is z; observing z again must NOT open a
        # new version
        updates = spark.createDataFrame(
            [("b", 9, "z")], "k: string, t: int, state: string"
        )
        merged = scd2_merge(history, updates, ["k"], "t", ["state"])
        assert _rows(merged.where("k = 'b'")) == [
            ("b", "z", "1", "None", "True")
        ]

    def test_multi_attr_change_detection(self, spark):
        rows = [("a", 1, "x", 10), ("a", 2, "x", 11), ("a", 3, "x", 11)]
        df = spark.createDataFrame(rows, "k: string, t: int, s: string, v: int")
        out = scd2_from_log(df, ["k"], "t", ["s", "v"])
        got = sorted(
            (r["s"], r["v"], r["valid_from"], r["valid_to"])
            for r in out.collect()
        )
        assert got == [("x", 10, 1, 2), ("x", 11, 2, None)]
