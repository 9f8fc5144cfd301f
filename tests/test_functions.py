"""Training-data pipeline ops: planted duplicates must be found; ANN must
approximate brute force; multimodal plumbing must batch correctly."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import dedup as dd
from mlcast_sourcedata_validator_spark.functions import multimodal as mm
from mlcast_sourcedata_validator_spark.functions import similarity as sim
from mlcast_sourcedata_validator_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    """60 distinct docs + 3 exact dup pairs + 2 near-dup pairs (one word
    changed)."""
    base = [
        (i, " ".join(f"w{(i * 13 + j * 7) % 97}" for j in range(30)))
        for i in range(60)
    ]
    rows = list(base)
    nid = 100
    for i in (5, 6, 7):  # exact dups
        rows.append((nid, base[i][1])); nid += 1
    for i in (10, 11):  # near dups: one token changed
        toks = base[i][1].split(); toks[3] = "CHANGED"
        rows.append((nid, " ".join(toks))); nid += 1
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()


def test_exact_dup_groups_and_dedup(spark, docs):
    groups = dd.exact_dup_groups(docs, "doc_id", "text").collect()
    assert len(groups) == 3 and all(g["n_docs"] == 2 for g in groups)
    deduped = dd.exact_dedup(docs, "doc_id", "text")
    assert deduped.count() == docs.count() - 3
    # representative kept is the min id
    kept = {r.doc_id for r in deduped.collect()}
    assert {5, 6, 7} <= kept and not ({100, 101, 102} & kept)


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b)
             for r in dd.minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    # exact dups always collide in every band; near dups (1/30 tokens
    # changed => shingle jaccard ~0.87) should collide in >=1 of 4 bands
    assert (5, 100) in pairs and (6, 101) in pairs and (7, 102) in pairs
    assert (10, 103) in pairs and (11, 104) in pairs


def test_ngram_jaccard_scores_planted_pairs(spark, docs):
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text",
                                           n=3, threshold=0.5).collect()}
    assert got[(5, 100)] == 1.0
    assert 0.5 < got[(10, 103)] < 1.0


def test_ngram_jaccard_auto_vs_global_contract(spark, docs):
    """The bounded default (method='auto': LSH candidates + per-pair
    array_intersect verify) is precision-1 (subset of the global
    self-join, identical scores) and recall-complete in the
    high-similarity regime the 4x4 banding targets. This fixture is
    adversarial — its modular construction plants many mid-similarity
    (0.5-0.87) pairs where banded-MinHash collision probability is well
    below 1, so equality is asserted only on the planted dup pairs (the
    driver's documents tables have no mid-band pairs;
    tools/check_oracles.py pins auto==global there at both SFs)."""
    auto = {(r.id_a, r.id_b, r.jaccard)
            for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text",
                                            n=3, threshold=0.5).collect()}
    glob = {(r.id_a, r.id_b, r.jaccard)
            for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                            threshold=0.5,
                                            method="global").collect()}
    assert auto <= glob and len(auto) >= 5
    # every emitted score is the exact global score (precision 1)
    glob_scores = {(a, b): j for a, b, j in glob}
    assert all(glob_scores[(a, b)] == j for a, b, j in auto)
    # the planted exact + one-token-changed near-dups are always recalled
    assert {(a, b) for a, b, _ in auto} >= {
        (5, 100), (6, 101), (7, 102), (10, 103), (11, 104)}


def test_ngram_jaccard_global_shingle_df_cap(spark, docs):
    """A df-cap far above every shingle's document frequency leaves the
    global result untouched (the safety valve is exact until it fires)."""
    uncapped = {(r.id_a, r.id_b, r.jaccard)
                for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                                threshold=0.5,
                                                method="global").collect()}
    capped = {(r.id_a, r.id_b, r.jaccard)
              for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                              threshold=0.5, method="global",
                                              max_shingle_df=1000).collect()}
    assert capped == uncapped


def test_lsh_candidates_feed_jaccard_verify(spark, docs):
    cand = dd.minhash_lsh_candidates(docs, "doc_id", "text")
    verified = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                      threshold=0.8, candidates=cand)
    pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    assert {(5, 100), (6, 101), (7, 102), (10, 103), (11, 104)} <= pairs


def test_simhash64_banded_equals_self_join(spark, docs):
    """64-bit (xxhash64) SimHash: the pigeonhole-banded search must equal
    the O(n^2) self-join exactly (max_bucket_size=None), and planted
    dups/near-dups must land within the Hamming radius."""
    ref = {(r.id_a, r.id_b, r.hamming)
           for r in dd.simhash64_pairs(docs, "doc_id", "text",
                                       max_hamming=6).collect()}
    banded = {(r.id_a, r.id_b, r.hamming)
              for r in dd.simhash64_banded_pairs(
                  docs, "doc_id", "text", max_hamming=6,
                  max_bucket_size=None).collect()}
    assert banded == ref
    pairs = {(a, b) for a, b, _ in ref}
    assert {(5, 100), (6, 101), (7, 102)} <= pairs  # exact dups: ham 0
    sig = {r.doc_id: r.simhash64
           for r in dd.simhash64(docs, "doc_id", "text").collect()}
    assert sig[5] == sig[100]
    # one token of 30 changed: few bits flip on a 64-bit fingerprint
    assert bin((sig[10] ^ sig[103]) & (2**64 - 1)).count("1") <= 16


def test_connected_components_chain_and_clusters(spark, docs):
    """Hash-min label propagation: a 6-node chain (diameter 5, forces
    multiple rounds) plus a triangle and an isolated pair — every node
    labeled with its component's min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain 1-6
         (10, 11), (11, 12), (10, 12),             # triangle
         (20, 21)],                                # pair
        "id_a long, id_b long",
    )
    got = {r.node: r.cluster_id
           for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    with pytest.raises(RuntimeError, match="converge"):
        dd.connected_components(pairs, max_iter=1)


def test_connected_components_reliable_checkpoint_resume(spark, tmp_path):
    """checkpoint_dir makes label propagation durable + resumable: a run
    killed by max_iter leaves committed round parquet behind; a re-run
    with the same dir resumes from the last committed round (round_0001
    is NOT recomputed — pinned via its _SUCCESS mtime) and converges to
    the localCheckpoint answer; a third run short-circuits on the
    _CONVERGED marker with zero new round dirs."""
    import os

    # 8-node chain: diameter 7 -> needs several hash-min rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long")
    expect = {r.node: r.cluster_id
              for r in dd.connected_components(pairs).collect()}
    ckpt = str(tmp_path / "cc")

    with pytest.raises(RuntimeError, match="converge"):
        dd.connected_components(pairs, max_iter=2, checkpoint_dir=ckpt)
    assert os.path.exists(f"{ckpt}/round_0002/_SUCCESS")
    assert not os.path.exists(f"{ckpt}/_CONVERGED")
    mtime_r1 = os.path.getmtime(f"{ckpt}/round_0001/_SUCCESS")

    got = {r.node: r.cluster_id
           for r in dd.connected_components(
               pairs, max_iter=25, checkpoint_dir=ckpt).collect()}
    assert got == expect
    assert os.path.getmtime(f"{ckpt}/round_0001/_SUCCESS") == mtime_r1
    assert os.path.exists(f"{ckpt}/_CONVERGED")

    rounds_before = sorted(d for d in os.listdir(ckpt)
                           if d.startswith("round_"))
    again = {r.node: r.cluster_id
             for r in dd.connected_components(
                 pairs, max_iter=25, checkpoint_dir=ckpt).collect()}
    assert again == expect
    assert sorted(d for d in os.listdir(ckpt)
                  if d.startswith("round_")) == rounds_before

    # a converged dir re-run with a SMALLER max_iter than the converged
    # round number must still return the CONVERGED labels (the committed
    # rounds are discovered by listing, not probed up to max_iter —
    # otherwise an earlier round's pre-convergence labels come back
    # silently)
    n_rounds = len(rounds_before) - 1  # minus round_0000
    assert n_rounds > 2
    small = {r.node: r.cluster_id
             for r in dd.connected_components(
                 pairs, max_iter=2, checkpoint_dir=ckpt).collect()}
    assert small == expect


def test_dedup_clusters_on_planted_dups(spark, docs):
    out = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_representative)
           for r in dd.dedup_clusters(docs, "doc_id", "text",
                                      threshold=0.8).collect()}
    # each planted dup pair lands in one cluster (the fixture's modular
    # construction adds further >=0.8 pairs, so clusters may be larger
    # than 2); exactly the min-id member is the representative
    for a, b in [(5, 100), (6, 101), (7, 102), (10, 103), (11, 104)]:
        assert out[a][0] == out[b][0]
        assert not out[b][2]  # the copy is never the representative
    clusters: dict[int, list[int]] = {}
    for doc, (cid, size, rep) in out.items():
        clusters.setdefault(cid, []).append(doc)
        assert rep == (doc == cid)
    for cid, members in clusters.items():
        assert cid == min(members)
        assert all(out[m][1] == len(members) for m in members)


def test_simhash_near_dups_have_small_hamming(spark, docs):
    sh = {r.doc_id: r.simhash for r in dd.simhash(docs, "doc_id", "text").collect()}
    assert sh[5] == sh[100]  # identical text -> identical simhash
    ham = bin(sh[10] ^ sh[103]).count("1")
    assert ham <= 6  # one token of 30 changed


def test_simhash_banded_pairs_equal_self_join(spark, docs):
    ref = {(r.id_a, r.id_b, r.hamming)
           for r in dd.simhash_pairs(docs, "doc_id", "text",
                                     max_hamming=3).collect()}
    banded = {(r.id_a, r.id_b, r.hamming)
              for r in dd.simhash_banded_pairs(docs, "doc_id", "text",
                                               max_hamming=3).collect()}
    assert banded == ref and len(ref) > 0


def test_cosine_topk_and_ann_recall(spark):
    import math
    # 3 clusters of unit vectors around orthogonal axes + noise
    rows = []
    for i in range(90):
        axis = i % 3
        v = [0.0] * 16
        v[axis] = 1.0
        v[(axis + 5) % 16] = 0.3 * math.sin(i * 0.7)
        v[(axis + 9) % 16] = 0.2 * math.cos(i * 1.3)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = rows[0][1]
    brute = [r.vec_id for r in
             sim.cosine_topk(emb.where("vec_id != 0"), "vec_id", "embedding",
                             query, k=10).collect()]
    ann = [r.vec_id for r in
           sim.ann_lsh_topk(emb.where("vec_id != 0"), "vec_id", "embedding",
                            query, k=10, n_planes=6, multiprobe=1).collect()]
    recall = len(set(brute) & set(ann)) / 10
    assert recall >= 0.7, (brute, ann)
    # brute-force order is by true cosine: cluster-0 members only
    assert all(v % 3 == 0 for v in brute)


def test_cosine_topk_batch_matches_per_query(spark):
    import math
    rows = []
    for i in range(60):
        v = [math.sin(i * 0.3 + d) for d in range(8)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = emb.where("vec_id >= 2")
    qs = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    batch = sim.cosine_topk_batch(corpus, "vec_id", "embedding", qs, k=5)
    got = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in batch.collect()}
    for qid in (0, 1):
        single = sim.cosine_topk(corpus, "vec_id", "embedding",
                                 rows[qid][1], k=5).collect()
        for rank, r in enumerate(single, start=1):
            assert got[(qid, rank)] == (r.vec_id, r.cosine)


def test_embedding_lsh_near_dup_recall_and_precision(spark):
    import math
    rows = []
    for i in range(90):
        axis = i % 3
        v = [0.0] * 16
        v[axis] = 1.0
        v[(axis + 5) % 16] = 0.3 * math.sin(i * 0.7)
        v[(axis + 9) % 16] = 0.2 * math.cos(i * 1.3)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {(r.id_a, r.id_b): r.cosine for r in
             dd.embedding_near_dup_pairs(emb, "vec_id", "embedding",
                                         threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in
           sim.embedding_lsh_near_dup_pairs(emb, "vec_id", "embedding",
                                            threshold=0.9).collect()}
    assert len(brute) > 50
    # precision 1.0: every LSH pair is exact-verified, so values match brute
    assert all(brute.get(k) == v for k, v in lsh.items())
    # multi-table recall on ~0.9-cosine clusters
    assert len(lsh) / len(brute) >= 0.8


def test_pair_verify_join_stage_compiles_at_dim64(spark):
    """The verify join's generated code must COMPILE at the production
    dim=64: the 3 x dim expanded cosine inlined into the join's
    whole-stage doConsume used to trip janino method limits and silently
    degrade the hot verify stage to interpreted eval (fixed by
    precomputing per-row norms before the join). codegen.fallback=false
    turns any compile failure back into a hard error, so this pins the
    plan's compilability, not just its answer."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        pairs = sim.embedding_lsh_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.9, dim=64)
        assert pairs.count() >= 0
        qs = emb.where("vec_id < 3").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        topk = sim.cosine_topk_batch(emb, "vec_id", "embedding", qs,
                                     k=5, dim=64)
        assert topk.count() == 15
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_ivf_topk_probe_all_equals_brute_force(spark):
    import math
    rows = []
    for i in range(90):
        axis = i % 3
        v = [0.0] * 16
        v[axis] = 1.0
        v[(axis + 5) % 16] = 0.3 * math.sin(i * 0.7)
        v[(axis + 9) % 16] = 0.2 * math.cos(i * 1.3)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rest = emb.where("vec_id != 0")
    query = rows[0][1]
    cents = sim.ivf_fit(rest, "embedding", n_lists=4, seed=7)
    assert len(cents) == 4 and len(cents[0]) == 16
    brute = [(r.vec_id, r.cosine) for r in
             sim.cosine_topk(rest, "vec_id", "embedding", query, k=10).collect()]
    # probing every list is exactly brute force, independent of clustering
    full = [(r.vec_id, r.cosine) for r in
            sim.ivf_topk(rest, "vec_id", "embedding", query, cents,
                         k=10, nprobe=4).collect()]
    assert full == brute
    # probing 1 list still finds most of the true top-k (clusters align
    # with the 3 planted axes)
    one = {r.vec_id for r in
           sim.ivf_topk(rest, "vec_id", "embedding", query, cents,
                        k=10, nprobe=1).collect()}
    assert len(one & {v for v, _ in brute}) / 10 >= 0.7


def test_text_profile_fields(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog runs over the hill"),
         (2, "der hund und die katze ist nicht da und das ist gut"),
         (3, "!!!"), (4, "")],
        "doc_id long, text string",
    )
    prof = {r.doc_id: r for r in tx.text_profile(df, "doc_id", "text").collect()}
    assert prof[1].lang_guess == "en" and prof[2].lang_guess == "de"
    assert prof[1].n_tokens == 12
    assert prof[3].lang_guess == "und" and prof[3].quality < 0.5
    assert prof[4].n_tokens == 0 and prof[4].fingerprint is None
    assert prof[1].fingerprint is not None


def test_multimodal_meta_and_batching(spark):
    df = spark.createDataFrame(
        [(i, "x" * (i * 100)) for i in range(1, 30)], "doc_id long, text string"
    )
    media = mm.attach_fake_media(df, "text")
    assert dict(media.dtypes)["media"] == "binary"
    meta = mm.extract_media_meta(media, "doc_id")
    rows = {r.doc_id: r for r in meta.collect()}
    assert rows[5].byte_len == 500 and rows[5].width == 500 and rows[5].height == 0
    assert rows[15].byte_len == 1500 and rows[15].width == 1500 % 1024 \
        and rows[15].height == 1
    assert all(r.format == "fake/v1" for r in rows.values())


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"not an image")


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(1, "a" * 200)], "doc_id long, text string")
    media = mm.attach_fake_media(df, "text")
    frames = mm.frame_sample(media, "doc_id", every_n_bytes=64).collect()
    assert len(frames) == 4  # offsets 0, 64, 128, 192
    assert frames[0].frame_bytes == "a" * 64


def test_lsh_hot_bucket_guard(spark):
    """max_bucket_size drops degenerate mega-buckets (boilerplate clusters)
    instead of expanding them quadratically; None stays exact."""
    same = [(i, "the same boilerplate text repeated here again and again ok")
            for i in range(12)]
    distinct = [(100 + i, " ".join(f"u{i}w{j * (i + 3)}" for j in range(12)))
                for i in range(4)]
    df = spark.createDataFrame(same + distinct, "doc_id long, text string")
    exact = dd.minhash_lsh_candidates(df, "doc_id", "text")
    assert exact.count() >= 12 * 11 // 2  # the boilerplate clique
    capped = dd.minhash_lsh_candidates(df, "doc_id", "text", max_bucket_size=8)
    cap_ids = {r.id_a for r in capped.collect()} | {r.id_b for r in capped.collect()}
    assert not any(i < 12 for i in cap_ids)  # clique buckets dropped

    s_exact = dd.simhash_banded_pairs(df, "doc_id", "text")
    s_capped = dd.simhash_banded_pairs(df, "doc_id", "text", max_bucket_size=8)
    assert s_capped.count() <= s_exact.count()


def test_ivf_persisted_index_partition_pruning(spark, tmp_path):
    """The materialized IVF index is a hive table partitioned by list_id:
    an nprobe search must (a) prune unprobed list directories at the file
    index (plan shows PartitionFilters and reads a strict subset of
    files), and (b) with nprobe == n_lists equal brute-force top-k."""
    from mlcast_sourcedata_validator_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(v) for v in
          emb.where("vec_id = 0").select("embedding").first()[0]]
    rest = emb.where("vec_id != 0").localCheckpoint()
    idx = str(tmp_path / "ivf_index")
    cents = sim.ivf_build_index(rest, "vec_id", "embedding", idx,
                                n_lists=8, seed=7)
    assert len(cents) == 8

    probed = sim.ivf_topk_indexed(spark, idx, "vec_id", "embedding",
                                  qv, k=10, nprobe=2)
    import re

    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the list_id predicate must be INSIDE the PartitionFilters bracket —
    # 'PartitionFilters: []' with list_id elsewhere would mean pruning
    # was lost (e.g. a cast wrapped the partition column)
    assert re.search(r"PartitionFilters: \[[^\]]*list_id", plan), plan
    # files actually READ under the filter (inputFiles() ignores filters)
    read_files = lambda q: (  # noqa: E731
        spark.read.parquet(idx).where(q)
        .select(F.input_file_name()).distinct().count()
    )
    assert 0 < read_files("list_id IN (0,1)") < read_files("true")

    exact = {r.vec_id for r in sim.cosine_topk(rest, "vec_id", "embedding",
                                               qv, k=10).collect()}
    full = sim.ivf_topk_indexed(spark, idx, "vec_id", "embedding",
                                qv, k=10, nprobe=8)
    assert {r.vec_id for r in full.collect()} == exact
    # sublinear probe keeps decent recall on this data
    got = {r.vec_id for r in probed.collect()}
    assert len(got & exact) >= 5


def _cluster_vecs():
    import math

    rows = []
    for i in range(90):
        axis = i % 3
        v = [0.0] * 16
        v[axis] = 1.0
        v[(axis + 5) % 16] = 0.3 * math.sin(i * 0.7)
        v[(axis + 9) % 16] = 0.2 * math.cos(i * 1.3)
        rows.append((i, v))
    return rows


def test_ivf_fit_sampled_still_exact_at_full_probe(spark):
    """A capped fit (max_fit_rows / sample_fraction) changes WHICH
    centroids come out, but probing every list must still equal brute
    force — search exactness never depends on fit quality."""
    rows = _cluster_vecs()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rest = emb.where("vec_id != 0")
    query = rows[0][1]
    brute = [(r.vec_id, r.cosine) for r in
             sim.cosine_topk(rest, "vec_id", "embedding", query, k=10).collect()]
    capped = sim.ivf_fit(rest, "embedding", n_lists=4, seed=7, max_fit_rows=40)
    assert len(capped) == 4
    got = [(r.vec_id, r.cosine) for r in
           sim.ivf_topk(rest, "vec_id", "embedding", query, capped,
                        k=10, nprobe=4).collect()]
    assert got == brute
    frac = sim.ivf_fit(rest, "embedding", n_lists=4, seed=7,
                       sample_fraction=0.5)
    got2 = [(r.vec_id, r.cosine) for r in
            sim.ivf_topk(rest, "vec_id", "embedding", query, frac,
                         k=10, nprobe=4).collect()]
    assert got2 == brute
    # the capped fit really is capped: deterministic sample stays <= cap
    n_sampled = rest.sample(fraction=min(1.0, 1.1 * 40 / 89), seed=7) \
                    .limit(40).count()
    assert n_sampled <= 40


def test_ngram_hot_shingle_fail_action(spark):
    """hot_shingle_action='fail' trips loudly when a shingle's document
    frequency exceeds max_shingle_df, and is byte-identical to the
    uncapped result when none does."""
    base = [(i, f"unique{i} words here alpha beta gamma{i}") for i in range(6)]
    hot = [(100 + i, "common shingle text tail" + "x" * i) for i in range(4)]
    docs = spark.createDataFrame(base + hot, "doc_id long, text string")
    # 'common shingle text' appears in 4 docs > cap of 3 -> must raise
    with pytest.raises(Exception, match="max_shingle_df"):
        dd.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.1, method="global",
            max_shingle_df=3, hot_shingle_action="fail",
        ).collect()
    # cap above every df: fail-mode == uncapped exactly
    uncapped = sorted(map(tuple, dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, method="global",
    ).collect()))
    guarded = sorted(map(tuple, dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, method="global",
        max_shingle_df=100, hot_shingle_action="fail",
    ).collect()))
    assert guarded == uncapped and len(uncapped) > 0
    with pytest.raises(ValueError, match="hot_shingle_action"):
        dd.ngram_jaccard_pairs(docs, "doc_id", "text", method="global",
                               max_shingle_df=3, hot_shingle_action="explode")


def test_lsh_verified_and_clusters_bucket_cap_passthrough(spark):
    """max_bucket_size reaches the candidate stage from both
    lsh_verified_near_dups and dedup_clusters: a tiny cap suppresses the
    one big near-dup bucket; None recovers every pair (the oracle-paired
    parameterization)."""
    docs = spark.createDataFrame(
        [(i, "the same exact duplicated sentence repeated for all docs")
         for i in range(5)] + [(10, "a totally different unrelated text")],
        "doc_id long, text string",
    )
    full = dd.lsh_verified_near_dups(docs, "doc_id", "text", n=3,
                                     threshold=0.5, max_bucket_size=None)
    assert full.count() == 10  # C(5,2) identical-doc pairs
    capped = dd.lsh_verified_near_dups(docs, "doc_id", "text", n=3,
                                       threshold=0.5, max_bucket_size=4)
    assert capped.count() == 0
    cl_full = dd.dedup_clusters(docs, "doc_id", "text", n=3, threshold=0.5,
                                max_bucket_size=None)
    assert cl_full.count() == 5
    cl_capped = dd.dedup_clusters(docs, "doc_id", "text", n=3, threshold=0.5,
                                  max_bucket_size=4)
    assert cl_capped.count() == 0


def test_threshold_tuned_auto_bands_recall_complete(spark, sf_dir):
    """bands_for_threshold tunes the LSH S-curve to the query threshold:
    at 0.5 it widens to 16x1 banding (pair recall ~1-0.5^16), and the
    auto method equals the exact global self-join on the fixture corpus
    (round 2's fixed 4x4 banding missed a borderline pair at sf0.1)."""
    assert dd.bands_for_threshold(0.5) == (16, 1)
    assert dd.bands_for_threshold(0.7) == (8, 2)
    b, r = dd.bands_for_threshold(0.9)
    assert b * r <= 16 and r >= 2
    with pytest.raises(ValueError, match="exceeds"):
        dd.minhash_lsh_candidates(
            spark.range(1).selectExpr("id as doc_id", "'x' as text"),
            "doc_id", "text", n_bands=9, band_size=2)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    auto = {(r.id_a, r.id_b) for r in dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    glob = {(r.id_a, r.id_b) for r in dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, method="global").collect()}
    assert auto == glob and len(glob) > 0


def test_pii_profile_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+x@example.org or 555-123-4567"),
            (2, "server at 192.168.1.10 and ssn 123-45-6789"),
            (3, "perfectly clean text with numbers 12345 and a date 2024-01-02"),
            (4, "two mails: a@b.io c@d.co and ip 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    prof = {r.doc_id: r for r in tx.pii_profile(docs, "doc_id", "text").collect()}
    assert prof[1].n_email == 1 and prof[1].n_phone == 1 and prof[1].has_pii
    assert prof[2].n_ipv4 == 1 and prof[2].n_ssn == 1 and prof[2].has_pii
    assert not prof[3].has_pii and prof[3].n_phone == 0 and prof[3].n_ssn == 0
    assert prof[4].n_email == 2 and prof[4].n_ipv4 == 1

    red = tx.redact_pii(docs, "text")
    # redaction is complete: re-profiling the redacted text finds nothing
    reprof = tx.pii_profile(red, "doc_id", "text").collect()
    assert all(not r.has_pii for r in reprof), reprof
    texts = {r.doc_id: r.text for r in red.collect()}
    assert "[EMAIL]" in texts[1] and "[PHONE]" in texts[1]
    assert "[IPV4]" in texts[2] and "[SSN]" in texts[2]
    assert texts[3] == "perfectly clean text with numbers 12345 and a date 2024-01-02"
    # typed-token redaction preserves surrounding text
    assert texts[1].startswith("contact me at [EMAIL] or ")


def test_decontaminate_flags_and_filter(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # exact copy of the eval doc
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # long shared n-gram run (contaminated by overlap)
            (2, "prefix words then the quick brown fox jumps over something"),
            # shares no 5-gram with the eval doc
            (3, "completely unrelated text about spark query planning"),
            # shares a few tokens but no full 5-gram
            (4, "the dog sat quietly while the fox slept all day"),
        ],
        "doc_id long, text string",
    )
    flags = {r.doc_id: r for r in dd.decontaminate_flags(
        train, "doc_id", "text", eval_df, "text", n=5, min_hits=1).collect()}
    assert flags[1].exact_hit and flags[1].ngram_hits > 0
    assert 2 in flags and not flags[2].exact_hit and flags[2].ngram_hits >= 1
    assert 3 not in flags and 4 not in flags

    clean = dd.decontaminate(train, "doc_id", "text", eval_df, "text",
                             n=5, min_hits=1)
    assert {r.doc_id for r in clean.collect()} == {3, 4}
    # min_hits raises the bar: doc 2 shares fewer 5-grams than the exact copy
    strict = dd.decontaminate_flags(train, "doc_id", "text", eval_df, "text",
                                    n=5, min_hits=4)
    ids = {r.doc_id for r in strict.collect()}
    assert 1 in ids and 2 not in ids


def test_deterministic_sampling_family(spark):
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    df = spark.createDataFrame(
        [(i, ["web", "books", "logs"][i % 3]) for i in range(3000)],
        "doc_id long, source string",
    )
    # retry/partitioning independence: same rows regardless of layout
    s1 = {r.doc_id for r in
          sp.deterministic_sample(df, "doc_id", 0.3, seed=5).collect()}
    s2 = {r.doc_id for r in
          sp.deterministic_sample(df.repartition(17), "doc_id", 0.3,
                                  seed=5).collect()}
    assert s1 == s2 and 0.25 < len(s1) / 3000 < 0.35
    # monotone in fraction: a smaller sample is a subset of a larger one
    s_small = {r.doc_id for r in
               sp.deterministic_sample(df, "doc_id", 0.1, seed=5).collect()}
    assert s_small <= s1
    # different seeds decorrelate
    s3 = {r.doc_id for r in
          sp.deterministic_sample(df, "doc_id", 0.3, seed=6).collect()}
    overlap = len(s1 & s3) / len(s1)
    assert 0.15 < overlap < 0.45  # ~0.3 expected under independence

    mix = sp.sample_by_mixture(df, "doc_id", "source",
                               {"web": 1.0, "books": 0.2}, default=0.0)
    by_src = {r.source: r.n for r in
              mix.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["web"] == 1000 and "logs" not in by_src
    assert 120 < by_src["books"] < 280

    cap = sp.stratified_cap(df, "source", "doc_id", k=7, seed=1)
    per = [r.n for r in cap.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert per == [7, 7, 7]
    # cap is deterministic too
    again = sp.stratified_cap(df.repartition(13), "source", "doc_id",
                              k=7, seed=1)
    assert {r.doc_id for r in cap.collect()} == {r.doc_id for r in again.collect()}


def test_stratified_cap_hot_two_step_exact(spark):
    """The skewed-stratum two-step: one stratum 100x the others; the
    pre-filtered form must (a) show the broadcast threshold filter in
    the plan, (b) window far fewer rows than the input, (c) return
    EXACTLY the single-window answer."""
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    rows = [(i, "hot") for i in range(20000)] + \
           [(100000 + i, ["warm", "cool"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    plain = sp.stratified_cap(df, "source", "doc_id", k=11, seed=3)
    two = sp.stratified_cap(df, "source", "doc_id", k=11, seed=3,
                            hot_threshold=1000, oversample=8.0)
    got_plain = sorted((r.source, r.doc_id) for r in plain.collect())
    got_two = sorted((r.source, r.doc_id) for r in two.collect())
    assert got_two == got_plain
    assert len([p for p in got_two if p[0] == "hot"]) == 11
    # warm/cool are below hot_threshold -> kept whole (n_s < k keeps all)
    assert len([p for p in got_two if p[0] == "warm"]) == 11

    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the threshold filter is map-side: a Filter mentioning _t_s
    assert "_t_s" in plan

    # survivor volume entering the window is bounded ~oversample*k per
    # hot stratum, not n_s: verify via the pre-filter criterion directly
    u = sp.hash_uniform(F.col("doc_id"), 3)
    pre_hot = df.where((F.col("source") == "hot") &
                       (u < F.lit(8.0 * 11 / 20000.0))).count()
    assert pre_hot < 400  # vs 20000 unfiltered


def test_stratified_cap_short_stratum_fallback_exact(spark):
    """Force the pre-filter to undersample (oversample < 1 => t_s keeps
    fewer than k rows in expectation) and pin that the exact-fallback
    branch still returns the single-window answer."""
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    df = spark.createDataFrame([(i, "hot") for i in range(5000)],
                               "doc_id long, source string")
    plain = sp.stratified_cap(df, "source", "doc_id", k=50, seed=7)
    starved = sp.stratified_cap(df, "source", "doc_id", k=50, seed=7,
                                hot_threshold=100, oversample=0.2)
    assert sorted(r.doc_id for r in starved.collect()) == \
        sorted(r.doc_id for r in plain.collect())


def test_stratified_cap_null_stratum_survives_short_redo(spark):
    """NULL keys form their own stratum; when a short hot stratum takes
    the redo branch, the NOT-IN exclusion must not silently drop the
    NULL stratum (NOT IN is NULL for NULL keys)."""
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    rows = ([(i, "hot") for i in range(5000)]
            + [(100000 + i, None) for i in range(120)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sp.stratified_cap(df, "source", "doc_id", k=50, seed=7)
    # oversample=0.2 starves the hot stratum -> redo branch taken
    starved = sp.stratified_cap(df, "source", "doc_id", k=50, seed=7,
                                hot_threshold=100, oversample=0.2)
    key = lambda p: (p[0] is None, p[0] or "", p[1])  # noqa: E731
    got = sorted(((r.source, r.doc_id) for r in starved.collect()), key=key)
    assert got == sorted(
        ((r.source, r.doc_id) for r in plain.collect()), key=key)
    assert len([p for p in got if p[0] is None]) == 50


def test_prioritized_dedup_prefers_low_rank(spark):
    from mlcast_sourcedata_validator_spark.functions.dedup import (
        prioritized_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "same content", 2),   # crawl copy
            (2, "same content", 0),   # curated copy -> survives
            (3, "same content", 1),
            (4, "unique a", 2),
            (5, "tie content", 1),
            (6, "tie content", 1),    # tie -> min id 5 survives
        ],
        "doc_id long, text string, rank int",
    )
    kept = {r.doc_id for r in
            prioritized_dedup(df, "doc_id", "text", "rank").collect()}
    assert kept == {2, 4, 5}


def test_pack_sequences_concat_then_chunk(spark):
    from mlcast_sourcedata_validator_spark.functions.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 50), (5, 300)],
        "doc_id long, n_toks int",
    )
    out = {r.doc_id: r for r in
           pack_sequences(df, "doc_id", "n_toks", budget=256).collect()}
    # stream: 0,100,200,300,350 -> packs of 256
    assert [out[i].start_offset for i in range(1, 6)] == [0, 100, 200, 300, 350]
    assert [out[i].pack_id for i in range(1, 6)] == [0, 0, 0, 1, 1]
    assert out[2].pack_offset == 100 and out[4].pack_offset == 300 - 256
    # doc 2 spans 100..199 (within pack 0); doc 3 spans 200..299 -> straddles
    assert not out[2].straddles_boundary and out[3].straddles_boundary
    # doc 5 spans 350..649 -> crosses the 512 boundary
    assert out[5].straddles_boundary

    # per-shard packing: each shard starts its own stream at offset 0
    sharded = df.withColumn("shard", (F.col("doc_id") % 2).cast("int"))
    per = {(r.shard, r.doc_id): r.start_offset for r in
           pack_sequences(sharded, "doc_id", "n_toks", budget=256,
                          partition_col="shard").collect()}
    assert per[(1, 1)] == 0 and per[(0, 2)] == 0
    assert per[(1, 3)] == 100 and per[(0, 4)] == 100
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "n_toks", budget=0)


def test_pack_sequences_global_form_guarded_at_scale(spark):
    """The global (partition_col=None) form is ONE window task; it must
    refuse big inputs instead of silently serializing. spark.range gives
    a large Catalyst size estimate without materializing anything."""
    from mlcast_sourcedata_validator_spark.functions.packing import (
        GLOBAL_PACK_MAX_BYTES,
        pack_sequences,
    )

    big = spark.range((GLOBAL_PACK_MAX_BYTES // 8) * 2) \
        .select(F.col("id").alias("doc_id"),
                F.lit(10).alias("n_toks"))
    with pytest.raises(ValueError, match="ONE window task"):
        pack_sequences(big, "doc_id", "n_toks", budget=256)
    # sharded and opt-in forms still construct (plans only, no execution)
    pack_sequences(big.withColumn("shard", F.col("doc_id") % 64),
                   "doc_id", "n_toks", budget=256, partition_col="shard")
    pack_sequences(big, "doc_id", "n_toks", budget=256,
                   allow_global_over_estimate=True)
    # small-corpus behavior unchanged: global form below the estimate
    small = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, n_toks int")
    assert pack_sequences(small, "doc_id", "n_toks", budget=8).count() == 2


def test_upsample_mixture_weights(spark):
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    df = spark.createDataFrame(
        [(i, ["books", "web", "logs"][i % 3]) for i in range(3000)],
        "doc_id long, source string",
    )
    up = sp.upsample_mixture(df, "doc_id", "source",
                             {"books": 2.5, "web": 1.0, "logs": 0.25},
                             seed=4)
    by_src = {r.source: r.n for r in
              up.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # books x2.5: every doc twice + ~half a third time
    assert 2300 < by_src["books"] < 2700
    assert by_src["web"] == 1000
    assert 170 < by_src["logs"] < 330
    # copy indices are 0-based per doc and deterministic across layouts
    copies = {(r.doc_id, r.copy_idx) for r in up.collect()}
    again = {(r.doc_id, r.copy_idx) for r in
             sp.upsample_mixture(df.repartition(11), "doc_id", "source",
                                 {"books": 2.5, "web": 1.0, "logs": 0.25},
                                 seed=4).collect()}
    assert copies == again
    books_copies = [c for (d, c) in copies if d % 3 == 0 and d == 0]
    assert set(books_copies) in ({0, 1}, {0, 1, 2})
    # weight 1.0 -> exactly one copy with copy_idx 0
    web = [c for (d, c) in copies if d % 3 == 1]
    assert set(web) == {0}


def test_shuffle_into_shards(spark):
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    out = sp.shuffle_into_shards(df, "doc_id", n_shards=8, seed=3)
    rows = out.collect()
    assert len(rows) == 4000
    # shard ids cover [0, 8); balanced in expectation (universal hash)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert set(by_shard) == set(range(8))
    assert all(250 < len(v) < 750 for v in by_shard.values())
    # positions are contiguous 1..n within every shard
    for v in by_shard.values():
        assert sorted(r.shard_pos for r in v) == list(range(1, len(v) + 1))
    # actually shuffled: within-shard order decorrelated from id order
    for v in by_shard.values():
        ids_in_pos_order = [r.doc_id for r in
                            sorted(v, key=lambda r: r.shard_pos)]
        assert ids_in_pos_order != sorted(ids_in_pos_order)
    # pure function of the ids: identical layout under any input
    # partitioning (the property df.orderBy(rand()) lacks)
    again = {(r.doc_id, r.shard_id, r.shard_pos) for r in
             sp.shuffle_into_shards(df.repartition(13), "doc_id",
                                    n_shards=8, seed=3).collect()}
    assert again == {(r.doc_id, r.shard_id, r.shard_pos) for r in rows}
    # seed changes the layout
    other = {(r.doc_id, r.shard_id) for r in
             sp.shuffle_into_shards(df, "doc_id", n_shards=8,
                                    seed=4).collect()}
    assert other != {(r.doc_id, r.shard_id) for r in rows}


def test_remove_frequent_lines(spark):
    from mlcast_sourcedata_validator_spark.functions import boilerplate as bp

    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique alpha\nunique beta", "en"),
            (2, f"{banner}\nunique gamma", "en"),
            (3, f"unique delta\n{banner}\nunique epsilon", "fr"),
            (4, banner, "en"),                # all-boilerplate -> ''
            (5, "totally original", "en"),    # untouched
            (6, None, "en"),                  # NULL text -> ''
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: (r.text, r.lang)
           for r in bp.remove_frequent_lines(docs, "doc_id", "text",
                                             min_df=3).collect()}
    assert out[1] == ("unique alpha\nunique beta", "en")
    assert out[2] == ("unique gamma", "en")
    # order of surviving lines preserved (boilerplate was in the middle)
    assert out[3] == ("unique delta\nunique epsilon", "fr")
    assert out[4] == ("", "en")
    assert out[5] == ("totally original", "en")
    assert out[6] == ("", "en")
    # repeated within ONE doc but nowhere else: document frequency is
    # distinct-docs, so it survives
    docs2 = spark.createDataFrame(
        [(1, "same\nsame\nsame"), (2, "other")], "doc_id long, text string")
    out2 = {r.doc_id: r.text for r in bp.remove_frequent_lines(
        docs2, "doc_id", "text", min_df=2).collect()}
    assert out2[1] == "same\nsame\nsame"
    # literal (non-regex) delimiter: '.' must not mean "any char"
    docs3 = spark.createDataFrame(
        [(1, "boil.keep one"), (2, "boil.keep two")],
        "doc_id long, text string")
    out3 = {r.doc_id: r.text for r in bp.remove_frequent_lines(
        docs3, "doc_id", "text", min_df=2, delimiter=".").collect()}
    assert out3[1] == "keep one"
    # out_col keeps the original text column intact
    kept = bp.remove_frequent_lines(
        docs, "doc_id", "text", min_df=3, out_col="clean").collect()
    assert {r.doc_id: r.text is not None or r.clean == ""
            for r in kept}[6] is True


def test_frequent_spans(spark):
    from mlcast_sourcedata_validator_spark.functions import boilerplate as bp

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a the quick brown dog"),
            (3, "the quick brown fox runs"),
            (4, "the quick brown fox jumps the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    got = {r.span: r.df_count
           for r in bp.frequent_spans(docs, "doc_id", "text",
                                      n=3, min_df=3).collect()}
    # per-document distinct: doc 4's internal repeat counts once
    assert got == {"the quick brown": 4, "quick brown fox": 3}


def test_tail_by_budget_keeps_latest_suffix(spark):
    """Context-window prep: each conversation's most recent turns whose
    token total fits the budget; an oversized single turn drops out."""
    from mlcast_sourcedata_validator_spark.functions.packing import (
        tail_by_budget,
    )
    from mlcast_sourcedata_validator_spark.functions.text import (
        ws_token_count,
    )

    rows = [
        # conv a: 4 turns of 3 tokens each; budget 7 -> last 2 turns
        ("a", 0, "one two three"), ("a", 1, "x y z"),
        ("a", 2, "p q r"), ("a", 3, "u v w"),
        # conv b: the latest turn alone exceeds the budget -> empty
        ("b", 0, "s"), ("b", 1, " ".join(["t"] * 10)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    kept = tail_by_budget(df, ["conv_id"], "turn_idx",
                          ws_token_count(F.col("text")), 7.0)
    got = sorted((r["conv_id"], r["turn_idx"]) for r in kept.collect())
    assert got == [("a", 2), ("a", 3)]


def test_diff_tables_classifies_and_ignores_column_order(spark):
    """added/removed/changed classification is exact; NULL-safe; column
    ORDER differences between snapshots do not register as changes."""
    import pytest as _pytest

    from mlcast_sourcedata_validator_spark.functions.diff import diff_tables

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, "z", 3.0), (4, None, 4.0)],
        "id long, s string, v double")
    # b: row 1 unchanged (different column order), row 2 NULL->value,
    # row 3 removed, row 5 added, row 4 unchanged incl. NULL string
    b = spark.createDataFrame(
        [("x", 1, 1.0), ("y", 2, 2.0), ("q", 5, 5.0), (None, 4, 4.0)],
        "s string, id long, v double")
    got = {r["id"]: r["change"]
           for r in diff_tables(a, b, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}
    # no comparable columns -> explicit error, not an empty diff
    with _pytest.raises(ValueError):
        diff_tables(a.select("id"), b.select("id"), ["id"])


def test_dedup_against_index_null_text_and_hash_col_safety(spark):
    """NULL-text rows form ONE content group (exact_dedup's groupBy
    semantics) instead of vanishing through non-null-safe joins; a
    caller's own text_hash column passes through untouched."""
    from mlcast_sourcedata_validator_spark.functions.dedup import (
        dedup_against_index,
    )

    index = spark.createDataFrame(
        [("somehash", 2, 0)], "text_hash string, n_copies long, min_id long")
    batch = spark.createDataFrame(
        [(10, None, "keepme"), (11, None, "keepme2"), (12, "fresh", "x")],
        "doc_id long, text string, text_hash string")
    kept = dedup_against_index(batch, index, "doc_id", "text")
    rows = {r["doc_id"]: r for r in kept.collect()}
    # one representative of the NULL-content group + the fresh doc
    assert sorted(rows) == [10, 12]
    assert "text_hash" in kept.columns and rows[10]["text_hash"] == "keepme"

    # a historical NULL-content entry suppresses new NULL-text rows
    index2 = spark.createDataFrame(
        [(None, 1, 0)], "text_hash string, n_copies long, min_id long")
    kept2 = dedup_against_index(batch.drop("text_hash"), index2,
                                "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept2.collect()) == [12]


def test_diff_tables_null_keys_match_null_safely(spark):
    from mlcast_sourcedata_validator_spark.functions.diff import diff_tables

    a = spark.createDataFrame([(None, "same"), (1, "x")], "id long, v string")
    b = spark.createDataFrame([(None, "same"), (1, "y")], "id long, v string")
    got = [(r["id"], r["change"]) for r in diff_tables(a, b, ["id"]).collect()]
    # the NULL-keyed unchanged row reports NOTHING; only id=1 changed
    assert got == [(1, "changed")]


def test_tail_by_budget_rejects_negative_weights(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from mlcast_sourcedata_validator_spark.functions.packing import (
        tail_by_budget,
    )

    df = spark.createDataFrame([("a", 0, 5.0), ("a", 1, -1.0)],
                               "k string, o int, w double")
    with _pytest.raises((Py4JJavaError, Exception)) as e:
        tail_by_budget(df, ["k"], "o", F.col("w"), 10.0).collect()
    assert "negative weight" in str(e.value)


def test_count_tokens_pluggable_tokenizer_stage(spark):
    """count_tokens: one Arrow mapInPandas stage appending a tokenizer-
    faithful count; pack boundaries then follow the plugged tokenizer,
    and the PIL-pattern degrade raises fast when no tokenizer exists."""
    from mlcast_sourcedata_validator_spark.functions import text as tx
    from mlcast_sourcedata_validator_spark.functions.packing import (
        pack_sequences,
    )

    def stub_tokenizer_factory():
        # deterministic stand-in for a real BPE tokenizer (~4 chars/token);
        # defined in-closure so cloudpickle ships it by value (a module-
        # level test function pickles by reference, which workers can't
        # import)
        return lambda texts: [0 if not t else max(1, (len(t) + 3) // 4)
                              for t in texts]

    df = spark.createDataFrame(
        [(1, "a" * 40), (2, "b" * 100), (3, None), (4, "xy")],
        "doc_id long, text string",
    )
    out = tx.count_tokens(df, "text",
                          tokenizer_factory=stub_tokenizer_factory)
    assert out.columns == ["doc_id", "text", "n_tokens"]
    got = {r.doc_id: r.n_tokens for r in out.collect()}
    assert got == {1: 10, 2: 25, 3: 0, 4: 1}

    packed = {r.doc_id: r.pack_id for r in
              pack_sequences(out, "doc_id", "n_tokens", budget=16).collect()}
    # stream offsets 0,10,35,35 -> packs 0,0,2,2
    assert packed == {1: 0, 2: 0, 3: 2, 4: 2}

    # no tiktoken/transformers in this container: the default factory
    # degrades loudly, DRIVER-side (no job launched)
    assert not tx.tokenizer_available()
    with pytest.raises(NotImplementedError, match="tokenizer"):
        tx.count_tokens(df, "text")


def test_gopher_repetition_signals(spark):
    df = spark.createDataFrame(
        [(1, "aa bb. aa bb. cc"),   # one repeated line, dominant n-grams
         (2, "x y. z w"),           # no repetition
         (3, "one")],               # single word: no 2-grams -> drops out
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           tx.gopher_repetition(df, "doc_id", "text").collect()}
    # doc 3 has no word n-grams at any requested n -> inner-join drop
    assert set(got) == {1, 2}

    r1 = got[1]
    # lines: ['aa bb', 'aa bb', 'cc'] -> 1 of 3 occurrences is a repeat
    assert r1.dup_line_frac == pytest.approx(1 / 3, abs=1e-6)
    # repeated chars: 5 of (5*2 + 2) line chars
    assert r1.dup_line_char_frac == pytest.approx(5 / 12, abs=1e-6)
    # words: [aa, bb., aa, bb., cc]; top bigram 'aa bb.' covers 2*6 of 16
    # chars; top trigram 'bb. aa bb.' 10/16; top 4-gram 13/16
    assert r1.top2gram_char_frac == pytest.approx(12 / 16, abs=1e-6)
    assert r1.top3gram_char_frac == pytest.approx(10 / 16, abs=1e-6)
    assert r1.top4gram_char_frac == pytest.approx(13 / 16, abs=1e-6)

    r2 = got[2]
    assert r2.dup_line_frac == 0.0 and r2.dup_line_char_frac == 0.0
    # words: [x, y., z, w]; top bigram 'x y.' or 'y. z' covers 4/8 chars
    assert r2.top2gram_char_frac == pytest.approx(4 / 8, abs=1e-6)
    # only one 4-gram ('x y. z w', 8 chars) -> covers the whole doc
    assert r2.top4gram_char_frac == pytest.approx(1.0, abs=1e-6)


def test_vocab_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c"), (2, "d a b")], "doc_id long, text string"
    )
    # counts: a3 b3 d1 c1 -> k=3 cuts a tie at n=1: token asc keeps 'c'
    got = [(r.token, r.n) for r in tx.vocab_topk(df, "text", k=3).collect()]
    assert got == [("a", 3), ("b", 3), ("c", 1)]


def test_semantic_dedup_exact_and_clustered(spark):
    # 0<->1 and 2<->3 are near-dups (cos ~1); 4 is far from both pairs
    rows = [
        (0, [1.0, 0.0]), (1, [0.999, 0.01]),
        (2, [0.0, 1.0]), (3, [0.0, 0.5]),
        (4, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # n_lists=1 == global brute-force smaller-id-neighbor rule
    kept = {r.vec_id for r in
            sim.semantic_dedup(df, "vec_id", "embedding", threshold=0.95,
                               n_lists=1, dim=2).collect()}
    assert kept == {0, 2, 4}

    # explicit centroids split the two dup pairs into separate clusters:
    # within-cluster pruning finds the same neighbors -> same survivors
    kept2 = {r.vec_id for r in
             sim.semantic_dedup(df, "vec_id", "embedding", threshold=0.95,
                                centroids=[[1.0, 0.0], [0.0, 1.0]]).collect()}
    assert kept2 == {0, 2, 4}

    # splitting clusters can only REMOVE pairs: clustered survivors are
    # always a superset of the single-cluster (global) survivors
    import random

    rng = random.Random(7)
    big = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)]
    big += [(100 + i, list(big[i][1])) for i in range(10)]  # planted dups
    bdf = spark.createDataFrame(big, "vec_id long, embedding array<float>")
    s1 = {r.vec_id for r in
          sim.semantic_dedup(bdf, "vec_id", "embedding", threshold=0.99,
                             n_lists=1, dim=8).collect()}
    s4 = {r.vec_id for r in
          sim.semantic_dedup(bdf, "vec_id", "embedding", threshold=0.99,
                             n_lists=4, dim=8, seed=7).collect()}
    assert s1 <= s4
    # every planted exact dup has a smaller-id twin in ANY clustering
    # (identical vectors always share a cluster) -> never survives
    assert not ({100 + i for i in range(10)} & s4)


def test_quantize_embeddings_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in
           sim.quantize_embeddings(df, "vec_id", "embedding").collect()}
    r1 = got[1]
    assert r1.scale == pytest.approx(1.0)
    # -0.5 -> floor(-63.5 + 0.5) = -63; recon err |-63/127 + 0.5| ~ 0.003937
    assert list(r1.qvec) == [127, -63, 0]
    assert r1.max_abs_err == pytest.approx(0.003937, abs=1e-6)
    r2 = got[2]  # zero vector: guarded, all-zero code
    assert r2.scale == 0.0 and list(r2.qvec) == [0, 0, 0] \
        and r2.max_abs_err == 0.0


def test_deterministic_take_monotone_and_stable(spark):
    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    t5 = {r.doc_id for r in sp.deterministic_take(df, "doc_id", 5).collect()}
    t10 = {r.doc_id for r in sp.deterministic_take(df, "doc_id", 10).collect()}
    assert len(t5) == 5 and len(t10) == 10 and t5 <= t10
    # partitioning-independent: same selection after a repartition
    t10b = {r.doc_id for r in
            sp.deterministic_take(df.repartition(7), "doc_id", 10).collect()}
    assert t10 == t10b
    # different seed -> (almost surely) different selection
    t10c = {r.doc_id for r in
            sp.deterministic_take(df, "doc_id", 10, seed=1).collect()}
    assert t10 != t10c


def test_weighted_take_proportional_and_stable(spark):
    """Efraimidis–Spirakis exponential race: weight-proportional
    inclusion, exactly k rows, partitioning-independent, engine-mirror
    equality, and NULL/non-positive weights never race."""
    import duckdb

    from mlcast_sourcedata_validator_spark.functions import sampling as sp

    # 300 light rows (w=1) + 100 heavy rows (w=20): heavies should
    # dominate a k=100 sample (E[#heavy] ~ 87; a fair coin would give 25)
    rows = [(i, 1.0) for i in range(300)] + \
           [(i, 20.0) for i in range(300, 400)] + \
           [(400, None), (401, 0.0), (402, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sp.weighted_take(df, "doc_id", "w", 100).collect()
    assert len(got) == 100
    ids = {r.doc_id for r in got}
    assert not ids & {400, 401, 402}
    n_heavy = sum(1 for i in ids if 300 <= i < 400)
    assert n_heavy > 60, n_heavy
    # partitioning-independent
    ids_b = {r.doc_id for r in
             sp.weighted_take(df.repartition(7), "doc_id", "w", 100)
             .collect()}
    assert ids == ids_b
    # engine mirror: DuckDB runs the same arithmetic on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, w) for i, w in rows])
    sql = sp.weighted_take_sql("t", "doc_id", "w", 100)
    oids = {r[0] for r in con.execute(sql).fetchall()}
    assert ids == oids
    con.close()


def test_normalized_dedup_key(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  hello\tworld "),
         (4, "hello worlds")],
        "doc_id long, text string",
    )
    survivors = {r.doc_id for r in dd.exact_dedup(
        df.withColumn("_norm", tx.normalize_text(F.col("text"))),
        "doc_id", "_norm").collect()}
    # 1,2,3 normalize identically -> keep min id 1; 4 differs
    assert survivors == {1, 4}


class TestStreamFingerprint:
    """Commutative multiset stream fingerprint + re-ingest detection
    (functions/dedup.py stream_fingerprint / duplicate_streams)."""

    @pytest.fixture(scope="class")
    def streams(self, spark):
        # stream 1 == stream 2 (same rows, different key), stream 3 is a
        # reordered COPY of 1 with positions swapped in the signature
        # payload -> different multiset; stream 4 shares one row with 1
        rows = []
        for key, pairs in {
            "a": [(0, "x"), (1, "y"), (2, "z")],
            "b": [(0, "x"), (1, "y"), (2, "z")],
            "c": [(0, "y"), (1, "x"), (2, "z")],
            "d": [(0, "x")],
        }.items():
            rows += [(key, i, t) for i, t in pairs]
        return spark.createDataFrame(
            rows, "k string, idx int, txt string").localCheckpoint()

    @staticmethod
    def _sig():
        return F.concat_ws("\x1f", F.col("idx").cast("string"),
                           F.col("txt"))

    def test_identical_streams_collide_others_do_not(self, streams):
        fp = {r["k"]: (r["n_rows"], r["fp_xor"], r["fp_sum"])
              for r in dd.stream_fingerprint(streams, "k",
                                             self._sig()).collect()}
        assert fp["a"] == fp["b"]
        assert fp["a"] != fp["c"]  # order is part of the row signature
        assert fp["a"] != fp["d"]

    def test_fingerprint_is_partitioning_invariant(self, streams):
        fp1 = dd.stream_fingerprint(streams, "k", self._sig())
        fp2 = dd.stream_fingerprint(
            streams.repartition(7).sortWithinPartitions("txt"),
            "k", self._sig())
        assert sorted(map(tuple, fp1.collect())) == \
            sorted(map(tuple, fp2.collect()))

    def test_duplicate_streams_finds_exactly_the_clone_pair(self, streams):
        dup = dd.duplicate_streams(streams, "k", self._sig()).collect()
        assert len(dup) == 1
        assert dup[0]["keys"] == ["a", "b"]
        assert dup[0]["n_keys"] == 2

    def test_xor_cancellation_is_disambiguated_by_count_and_sum(self, spark):
        # {r, r, s} xor-cancels the duplicated row to look like {s};
        # n_rows and fp_sum must still separate the two streams
        df = spark.createDataFrame(
            [("p", 0, "r"), ("p", 0, "r"), ("p", 1, "s"), ("q", 1, "s")],
            "k string, idx int, txt string")
        fp = {r["k"]: r for r in dd.stream_fingerprint(
            df, "k", self._sig()).collect()}
        assert fp["p"]["fp_xor"] == fp["q"]["fp_xor"]  # the xor blind spot
        assert fp["p"]["n_rows"] != fp["q"]["n_rows"]
        assert dd.duplicate_streams(df, "k", self._sig()).count() == 0


def test_embedding_drift_detects_scale_and_direction_shift(spark):
    """Identical sets: cosine 1, zero gap/shift. Uniformly rescaled
    current: pure norm drift, direction unchanged. Rotated current:
    mean-cosine drops while norms stay put."""
    import math

    base = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
         for i in range(30)],
        "id long, emb array<float>",
    )
    same = sim.embedding_drift(base, base, "emb").first()
    assert same["mean_cosine"] == 1.0
    assert same["mean_l2_gap"] == 0.0
    assert same["norm_shift"] == 0.0
    assert same["n_cur"] == same["n_base"] == 30

    scaled = base.select(
        "id", F.transform("emb", lambda x: x * 2.0).alias("emb"))
    sc = sim.embedding_drift(scaled, base, "emb").first()
    assert sc["mean_cosine"] == 1.0  # direction unchanged
    assert abs(sc["norm_shift"] - 1.0) < 1e-6  # norms doubled

    # collapse every vector to the same axis: norms stay unit (zero
    # norm shift) but the mean direction moves from (1,1,1)/3 to
    # (1,0,0) -> cosine 1/sqrt(3), gap sqrt(2/3)
    collapsed = base.select(
        "id", F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
        .cast("array<float>").alias("emb"))
    col = sim.embedding_drift(collapsed, base, "emb").first()
    assert col["norm_shift"] == 0.0
    assert math.isclose(col["mean_cosine"], 1 / math.sqrt(3), abs_tol=1e-6)
    assert math.isclose(col["mean_l2_gap"], math.sqrt(2 / 3), abs_tol=1e-6)


def test_semantic_decontaminate_flags_eval_neighbors(spark):
    """Corpus rows cosine-close to any eval vector are flagged; far rows
    survive; every corpus row appears exactly once with its max."""
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(0, [0.999, 0.01]),   # ~eval 100
         (1, [0.01, 0.9]),     # ~eval 101
         (2, [1.0, -1.0]),     # cos ~0.7 to 100, negative to 101
         (3, [-1.0, -1.0])],   # negative to both
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["max_eval_cosine"], r["contaminated"])
           for r in sim.semantic_decontaminate(
               corpus, ev, "vec_id", "embedding",
               threshold=0.95, dim=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0][1] and out[1][1]
    assert not out[2][1] and not out[3][1]
    assert out[2][0] == pytest.approx(0.707107, abs=1e-6)
    # threshold monotonicity: lowering it can only add flags
    low = {r["vec_id"] for r in sim.semantic_decontaminate(
        corpus, ev, "vec_id", "embedding", threshold=0.5, dim=2)
        .where("contaminated").collect()}
    assert {0, 1, 2} == low


def test_lang_mix_detects_code_switching(spark):
    """Per-segment LID flags a doc whose doc-level vote looks
    monolingual: majority + share + distinct-language count."""
    rows = [
        # 2 en segments + 1 de segment -> mixed, majority en 2/3
        (1, "the cat is in the house. the dog is in the garden. "
            "der hund ist nicht ein zu das haus"),
        # monolingual
        (2, "the cat is in the house. the dog and the fox"),
        # no markers at all -> single 'und' segment
        (3, "zzz qqq. www rrr"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in tx.lang_mix(df, "doc_id", "text").collect()}
    assert out[1]["mixed"] and out[1]["majority_lang"] == "en"
    assert out[1]["n_segments"] == 3 and out[1]["n_langs"] == 2
    assert out[1]["majority_frac"] == pytest.approx(0.666667)
    assert not out[2]["mixed"] and out[2]["majority_lang"] == "en"
    assert out[3]["majority_lang"] == "und" and out[3]["n_langs"] == 1
    assert out[3]["n_segments"] == 2 and not out[3]["mixed"]
    assert 4 not in out and 5 not in out  # no non-blank segments


def test_oov_rate_against_reference_vocab(spark):
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("dog",)], "w string")
    df = spark.createDataFrame(
        [(1, "the cat saw the dog"),      # saw OOV -> 1/5
         (2, "unknown words only here"),  # 4/4
         (3, None), (4, "  ")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_words"], r["n_oov"], r["oov_rate"])
           for r in tx.oov_rate(df, "doc_id", "text", vocab).collect()}
    assert out[1] == (5, 1, pytest.approx(0.2))
    assert out[2] == (4, 4, pytest.approx(1.0))
    assert 3 not in out and 4 not in out
