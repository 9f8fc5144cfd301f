"""Product quantization ANN (functions/similarity.py pq_*): compressed
codes + asymmetric-distance search with exact re-rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import mlcast_sourcedata_validator_spark.functions.similarity as sim


class TestPQ:
    @pytest.fixture(scope="class")
    def fitted(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = emb.where("vec_id != 0").localCheckpoint()
        qv = [float(v) for v in emb.where("vec_id = 0").first()["embedding"]]
        books = sim.pq_fit(corpus, "embedding", dim=64,
                           n_subspaces=8, n_codes=16, seed=7)
        enc = sim.pq_encode(corpus, "vec_id", "embedding", books)
        return corpus, qv, books, enc

    def test_codebook_shape_and_code_range(self, fitted):
        corpus, _, books, enc = fitted
        assert (len(books), len(books[0]), len(books[0][0])) == (8, 16, 8)
        rng = enc.select(
            F.min(F.array_min("codes")).alias("lo"),
            F.max(F.array_max("codes")).alias("hi"),
            F.min(F.size("codes")).alias("w"),
        ).first()
        assert 0 <= rng["lo"] and rng["hi"] <= 15 and rng["w"] == 8
        assert enc.count() == corpus.count()

    def test_encode_is_map_side(self, fitted):
        """Encoding must ride the scan: pure Column expressions, zero
        Exchange — at 10^12 vectors this is an ingest-time projection,
        not a job of its own."""
        _, _, _, enc = fitted
        plan = enc._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # no Python in the path

    def test_exact_mode_equals_brute_force(self, fitted):
        """rerank_factor=None: every id flows through ADC into the exact
        re-rank, so the result equals brute-force cosine_topk EXACTLY,
        independent of codebook quality — the driver-gate invariant."""
        corpus, qv, books, enc = fitted
        brute = sim.cosine_topk(
            corpus, "vec_id", "embedding", qv, k=10).collect()
        got = sim.pq_topk(enc, corpus, "vec_id", "embedding", qv, books,
                          k=10, rerank_factor=None).collect()
        assert [(r.vec_id, r.cosine) for r in got] == \
            [(r.vec_id, r.cosine) for r in brute]

    def test_truncated_rerank_recall(self, fitted):
        """The real scale path (rank compressed codes, re-rank a small
        candidate pool): deterministic fixture recall@10 with a 4x pool
        measured at 0.8 — pinned with margin."""
        corpus, qv, books, enc = fitted
        brute = {r.vec_id for r in sim.cosine_topk(
            corpus, "vec_id", "embedding", qv, k=10).collect()}
        approx = {r.vec_id for r in sim.pq_topk(
            enc, corpus, "vec_id", "embedding", qv, books,
            k=10, rerank_factor=4).collect()}
        assert len(approx & brute) / 10 >= 0.7

    def test_adc_exact_on_reconstructed_vectors(self, spark, fitted):
        """ADC scores ``dot(q, reconstruction(codes))``: for a vector
        whose subvectors ARE codebook centroids, the reconstruction is
        the vector itself, so ADC equals the exact dot product."""
        _, qv, books, _ = fitted
        # build 3 synthetic vectors from centroid picks (j-th subspace
        # uses centroid (i*3 + j) % 16)
        vecs = []
        for i in range(3):
            v = []
            for j in range(8):
                v.extend(books[j][(i * 3 + j) % 16])
            vecs.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(vecs, "vec_id: int, embedding: array<double>")
        enc = sim.pq_encode(df, "vec_id", "embedding", books)
        scored = enc.select(
            "vec_id",
            sim.adc_score_expr("codes", books, qv).alias("adc"),
        ).collect()
        exact = {i: sum(a * b for a, b in zip(qv, v)) for i, v in vecs}
        for r in scored:
            assert abs(r["adc"] - exact[r["vec_id"]]) < 1e-6
