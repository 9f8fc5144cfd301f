"""Product quantization ANN (functions/similarity.py pq_*): compressed
codes + asymmetric-distance search with exact re-rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import mlcast_sourcedata_validator_spark.functions.similarity as sim


@pytest.mark.slow
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


@pytest.mark.slow
class TestIVFPQ:
    @pytest.fixture(scope="class")
    def built(self, spark, sf_dir, tmp_path_factory):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [float(v) for v in emb.where("vec_id = 0").first()["embedding"]]
        rest = emb.where("vec_id != 0").localCheckpoint()
        idx = str(tmp_path_factory.mktemp("ivfpq") / "index")
        meta = sim.ivfpq_build_index(rest, "vec_id", "embedding", idx,
                                     dim=64, n_lists=8, n_subspaces=8,
                                     n_codes=16, seed=7)
        return rest, qv, idx, meta

    def test_exact_mode_equals_brute_force(self, spark, built):
        """nprobe=n_lists + rerank_factor=None: every vector flows
        through the exact re-rank — equals brute force EXACTLY,
        independent of centroid/codebook quality."""
        rest, qv, idx, _ = built
        brute = [(r.vec_id, r.cosine) for r in sim.cosine_topk(
            rest, "vec_id", "embedding", qv, k=10).collect()]
        got = [(r.vec_id, r.cosine) for r in sim.ivfpq_topk(
            spark, idx, "vec_id", "embedding", qv, k=10,
            nprobe=8, rerank_factor=None).collect()]
        assert got == brute

    def test_sublinear_probe_recall(self, spark, built):
        """The real scale path: 2-of-8 lists + 4x rerank pool keeps
        measured recall@10 = 0.7 on the fixture; 4 lists + 8x pool
        recovers 1.0 — pinned with margin."""
        rest, qv, idx, _ = built
        brute = {r.vec_id for r in sim.cosine_topk(
            rest, "vec_id", "embedding", qv, k=10).collect()}
        narrow = {r.vec_id for r in sim.ivfpq_topk(
            spark, idx, "vec_id", "embedding", qv, k=10,
            nprobe=2, rerank_factor=4).collect()}
        wide = {r.vec_id for r in sim.ivfpq_topk(
            spark, idx, "vec_id", "embedding", qv, k=10,
            nprobe=4, rerank_factor=8).collect()}
        assert len(narrow & brute) / 10 >= 0.5
        assert len(wide & brute) / 10 >= 0.8

    def test_plan_prunes_partitions_and_columns(self, spark, built):
        """The 10^12-vector contract: (a) unprobed list_id directories
        are partition-pruned (predicate INSIDE PartitionFilters, strict
        file subset read); (b) the ADC ranking scan reads ONLY
        (id, codes) — the raw embedding column appears in the re-rank
        candidate scan alone (parquet column pruning)."""
        import re

        _, qv, idx, _ = built
        df = sim.ivfpq_topk(spark, idx, "vec_id", "embedding", qv,
                            k=10, nprobe=2, rerank_factor=4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*list_id", plan), plan
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        adc = [s for s in schemas if "codes" in s]
        assert adc and all("embedding" not in s for s in adc), schemas
        read_files = lambda q: (  # noqa: E731
            spark.read.parquet(idx).where(q)
            .select(F.input_file_name()).distinct().count()
        )
        assert 0 < read_files("list_id IN (0,1)") < read_files("true")

    def test_residual_codes_differ_from_raw_pq(self, spark, built):
        """The index encodes RESIDUALS (v - coarse centroid), not raw
        vectors: re-encoding the raw vectors with the stored codebooks
        must disagree with the stored codes for most rows (if they
        matched, the residual step silently vanished)."""
        _, _, idx, meta = built
        stored = spark.read.parquet(idx)
        raw = stored.select(
            "vec_id", "codes",
            sim.pq_encode_expr(
                F.col("embedding").cast("array<double>"),
                meta["codebooks"]).alias("raw_codes"),
        )
        n = raw.count()
        same = raw.where(F.col("codes") == F.col("raw_codes")).count()
        assert same < n / 2
