"""Distributed Bloom filter + bloom-gated incremental dedup
(functions/bloom.py, functions/dedup.py dedup_against_index_bloom).

The contract under test: a Bloom "no" is NEVER wrong (zero false
negatives), so the prefiltered dedup is row-identical to the exact form
for every input and every fpp — the filter only reduces how many rows
enter the index anti-join.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.bloom import (
    BloomFilter,
    bloom_build,
    bloom_from_bytes,
    bloom_merge,
    bloom_params,
    bloom_to_bytes,
    with_bloom_flag,
)
from mlcast_sourcedata_validator_spark.functions.dedup import (
    content_index_specs,
    dedup_against_index,
    dedup_against_index_bloom,
)
from mlcast_sourcedata_validator_spark.functions.rollup import keyed_rollup


class TestBloomFilter:
    @pytest.fixture(scope="class")
    def built(self, spark):
        keys = spark.range(10_000).select(
            F.concat(F.lit("k"), F.col("id")).alias("v")
        )
        return keys, bloom_build(keys, "v", n_items=10_000, fpp=0.01, seed=7)

    def test_no_false_negatives(self, spark, built):
        keys, bf = built
        hits = (
            with_bloom_flag(keys, "v", bf)
            .agg(F.sum(F.col("_bloom_hit").cast("int")))
            .first()[0]
        )
        assert hits == 10_000  # every member MUST probe true

    def test_fpp_within_design_band(self, spark, built):
        _, bf = built
        others = spark.range(20_000, 40_000).select(
            F.concat(F.lit("k"), F.col("id")).alias("v")
        )
        fp = (
            with_bloom_flag(others, "v", bf)
            .agg(F.sum(F.col("_bloom_hit").cast("int")))
            .first()[0]
        )
        # design fpp 1% over 20k disjoint probes -> ~200; 3x headroom
        assert fp < 600
        assert 0.003 < bf.fpp_estimate() < 0.03

    def test_merge_equals_whole_build(self, spark, built):
        keys, bf = built
        h1 = bloom_build(keys.where("v < 'k5'"), "v", n_items=10_000,
                         fpp=0.01, seed=7)
        h2 = bloom_build(keys.where("v >= 'k5'"), "v", n_items=10_000,
                         fpp=0.01, seed=7)
        merged = bloom_merge(h1, h2)
        assert (merged.words == bf.words).all()

    def test_merge_rejects_mismatched_params(self, built):
        _, bf = built
        other = BloomFilter(
            words=np.zeros(8, dtype=np.uint64), m=512, k=3, seed=7, n_items=1
        )
        with pytest.raises(ValueError, match="different params"):
            bloom_merge(bf, other)

    def test_serde_roundtrip(self, built):
        _, bf = built
        rt = bloom_from_bytes(bloom_to_bytes(bf))
        assert (rt.words == bf.words).all()
        assert (rt.m, rt.k, rt.seed, rt.n_items) == (
            bf.m, bf.k, bf.seed, bf.n_items)

    def test_params_sizing(self):
        m, k = bloom_params(1_000_000, 0.01)
        assert m % 64 == 0
        # textbook optimum: ~9.59 bits/key, k ~ 7
        assert 9_500_000 < m < 9_700_000
        assert k == 7
        with pytest.raises(ValueError, match="shard"):
            bloom_params(10**12, 1e-9)

    def test_empty_build_probes_all_false(self, spark):
        empty = spark.range(0).select(F.col("id").cast("string").alias("v"))
        bf = bloom_build(empty, "v", n_items=0)
        probe = spark.range(100).select(F.col("id").cast("string").alias("v"))
        hits = (
            with_bloom_flag(probe, "v", bf)
            .agg(F.sum(F.col("_bloom_hit").cast("int")))
            .first()[0]
        )
        assert hits == 0


class TestBloomGatedIncrementalDedup:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # i % 7 == 0 rows carry NULL text (one content group); the rest
        # collide on text i % 300 so history/batch overlap heavily
        docs = spark.createDataFrame(
            [(i, f"text{i % 300}" if i % 7 else None) for i in range(1_000)],
            "doc_id: long, text: string",
        )
        hist = docs.where("doc_id < 400")
        batch = docs.where("doc_id >= 400")
        index = keyed_rollup(
            hist.withColumn("text_hash", F.md5("text")),
            ["text_hash"],
            content_index_specs("doc_id"),
        )
        return batch, index

    @pytest.mark.parametrize("fpp", [0.5, 0.01])
    def test_equals_exact_form_at_any_fpp(self, corpus, fpp):
        batch, index = corpus
        exact = sorted(
            r.doc_id
            for r in dedup_against_index(batch, index, "doc_id", "text")
            .collect()
        )
        gated = sorted(
            r.doc_id
            for r in dedup_against_index_bloom(
                batch, index, "doc_id", "text", fpp=fpp
            ).collect()
        )
        assert gated == exact

    def test_prebuilt_filter_reused(self, spark, corpus):
        batch, index = corpus
        idx_hashes = index.select(
            F.coalesce(F.col("text_hash"), F.lit("__null_content__"))
            .alias("h")
        )
        bf = bloom_build(idx_hashes, "h", n_items=301, fpp=0.01, seed=0)
        exact = sorted(
            r.doc_id
            for r in dedup_against_index(batch, index, "doc_id", "text")
            .collect()
        )
        gated = sorted(
            r.doc_id
            for r in dedup_against_index_bloom(
                batch, index, "doc_id", "text", bloom=bf
            ).collect()
        )
        assert gated == exact

    def test_join_sees_only_probable_hits(self, spark, corpus):
        """The point of the prefilter: rows the filter clears never reach
        the anti-join. Fresh-content fraction surviving to the join is
        bounded by true-dup rate + fpp."""
        batch, index = corpus
        idx_hashes = index.select(
            F.coalesce(F.col("text_hash"), F.lit("__null_content__"))
            .alias("h")
        )
        bf = bloom_build(idx_hashes, "h", n_items=301, fpp=0.01, seed=0)
        sentinel = F.lit("__null_content__")
        batch_hashes = batch.select(
            F.coalesce(F.md5("text"), sentinel).alias("h")
        ).distinct()
        flagged = with_bloom_flag(batch_hashes, "h", bf, "_maybe")
        n_total = flagged.count()
        n_maybe = flagged.where("_maybe").count()
        n_true_dups = batch_hashes.join(
            idx_hashes.distinct(), "h", "left_semi"
        ).count()
        # every true dup must be flagged; false positives bounded well
        # under the clean-content count at fpp=1%
        assert n_maybe >= n_true_dups
        assert n_maybe - n_true_dups <= max(3, 0.05 * n_total)
