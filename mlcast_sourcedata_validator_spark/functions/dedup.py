"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All hot paths are JVM Column expressions (shingling via
sequence/transform/substring, hashing via the portable arithmetic in
hashing.py) — no Python in the row path. Each operator is designed for the
10^12-row regime:

- exact:     one shuffle on the 128-bit content hash (md5); at scale the
             groupBy key is the hash, never the text.
- MinHash:   signatures are per-row map-side work; the only shuffle is the
             band-bucket explode+groupBy (LSH), whose fan-in is bounded by
             band collision rates, not O(n^2). Candidate pairs then verify
             with exact Jaccard — the standard shingle->minhash->band->
             bucket-join pipeline.
- SimHash:   per-row token-hash bit-vote fold (explode + groupBy doc), then
             pairs by Hamming distance; at scale pairs come from banding
             the simhash's bit-blocks rather than a self-join.
- n-gram Jaccard: exact set similarity via shingle explode + self-join on
             shingle; quadratic in bucket size — the *verification* path
             for LSH candidates, or a direct method at small scale.
- embedding: cosine near-dup pairs; brute-force at small scale, LSH/IVF in
             similarity.py for the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .hashing import (
    BAND_SIZE,
    MINHASH_COEFFS,
    N_BANDS,
    P,
    char_shingles,
    enc4,
    encw,
    uhash,
    word_shingles,
)


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer size estimate (driver-side, no job, no RDD
    translation) — file-size-sum for scans, propagated through
    projections/filters. None when the probe fails (unusual plan)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception:
        return None


def _ensure_parallelism(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Spread a low-partition input across the cluster before an
    explode-heavy per-row pipeline.

    A small or freshly-compacted table can arrive as a handful of file
    splits (locally: ONE), serializing the shingle/hash map work on one
    task — measured 2x wall on the LSH pipeline at sf0.1 and 4x at a
    16x single-file corpus (13.4s -> 3.3s). At real scale inputs have
    thousands of splits and this is a no-op; the guard only fires when
    the scan has fewer splits than half the cluster's cores. The
    repartition round-trip does not change any aggregate result.

    ``min_bytes``: skip the guard entirely (including the
    plan-to-RDD partition probe, which itself costs ~100ms) when the
    Catalyst size estimate is below this. Interleaved A/B at sf0.1
    (round 3): the explode+hash-agg shingle/LSH and |Q|-amplified
    embedding paths win from the repartition at EVERY tested input size
    (min_bytes=0 stays right for them), while cheap-per-row pipelines
    (simhash's token fold, multimodal's binary pass-through) lose
    0.5-1.2s on small inputs — those call sites pass a 16 MiB floor.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if min_bytes > 0:
        est = _estimated_bytes(df)
        if est is not None and est < min_bytes:
            return df
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


#: size floor for pipelines whose per-row work is too cheap to repay a
#: small-input repartition (measured: simhash 1.5x slower WITH the
#: repartition at a 5 MB corpus, multimodal 3.6x at sf0.1)
CHEAP_PATH_MIN_BYTES = 16 << 20


def _sorted_pairs(arr):
    """All forward pairs struct(a, b) from a sorted array Column — the
    intra-bucket pair expansion for banded LSH searches. Element order in
    ``arr`` must already give the desired a < b orientation."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, doc_ids)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative of each identical-text group.

    One shuffle on md5(text); ties broken deterministically by id so the
    result is stable under retries.
    """
    w_min = (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_min, on=id_col, how="left_semi")


def stream_fingerprint(df: DataFrame, key_col: str, row_sig) -> DataFrame:
    """Commutative multiset fingerprint of each key's row-stream:
    (key, n_rows, fp_xor, fp_sum).

    ``row_sig`` is a STRING Column canonically serializing one row.
    Include the ordering attribute (turn_idx / epoch micros) in it, so a
    re-ordered stream yields a different multiset.

    Per-row portable hash ``h = encw(md5(row_sig)[:12])`` in [0, P); per
    key: ``fp_xor = bit_xor(h)``, ``fp_sum = sum(h) % P``, plus the row
    count. xor alone cancels pairwise-duplicated rows; sum + count
    restore the distinction, so two streams collide on all three only
    with md5-collision probability.

    Scale shape: both combiners are algebraic, constant-size partials —
    the groupBy shuffle carries ONE partial row per (key, task), unlike
    the collect_list fingerprint (conv_text_equality_events, its
    order-sensitive oracle twin) which ships EVERY row to its key's
    reducer and holds the whole conversation in reducer memory.
    ``sum(h)`` stays < 2^31 x rows-per-key: overflow-free int64
    (ANSI-safe) up to ~4x10^9 rows per key — far above the suite's
    max_conv_turns bound.
    """
    h = encw(F.substring(F.md5(row_sig), 1, 12))
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(h).alias("fp_xor"),
        F.pmod(F.sum(h), F.lit(P).cast("long")).alias("fp_sum"),
    )


def duplicate_streams(df: DataFrame, key_col: str, row_sig) -> DataFrame:
    """Keys whose ENTIRE row-stream multiset equals another key's —
    re-ingested conversations under fresh conv_ids, which the
    (conv_id, turn_idx) uniqueness check cannot see (every re-ingested
    key is internally unique).

    Two aggregations: the fingerprint groupBy (one shuffle over
    constant-size partials), then a groupBy over ONE row per key.
    Output: (n_rows, fp_xor, fp_sum, n_keys, keys) for collision groups,
    keys sorted for determinism.
    """
    fp = stream_fingerprint(df, key_col, row_sig)
    return (
        fp.groupBy("n_rows", "fp_xor", "fp_sum")
        .agg(F.count(F.lit(1)).alias("n_keys"),
             F.sort_array(F.collect_list(key_col)).alias("keys"))
        .where(F.col("n_keys") > 1)
    )


def content_index_specs(id_col: str = "doc_id"):
    """Rollup specs for the incremental CONTENT-HASH DEDUP INDEX:
    ``keys=["text_hash"]`` (derive it with ``F.md5(text_col)`` via
    ``maintain_rollup(..., derive=...)``), one row per distinct content
    with its copy count and min-id representative — both algebraic.

    This is how exact dedup works at 10^12 rows: the index is maintained
    per new partition (one scan of the new data), each day's crawl is
    deduped against it (:func:`dedup_against_index`) without rescanning
    history, and ``n_copies > 1`` in the merged index IS the global
    cross-partition duplicate audit — duplicates that live in different
    date partitions and are invisible to any single-partition dedup
    pass. Delta fan-in is bounded by ``checkpoint.compact_rollup``.
    """
    return {
        "n_copies": (F.count(F.lit(1)), F.sum("n_copies")),
        "min_id": (F.min(id_col), F.min("min_id")),
    }


def dedup_against_index(
    df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    hash_col: str = "text_hash",
) -> DataFrame:
    """Dedup a NEW batch against the historical content index: rows whose
    content already exists in the index are dropped; among rows whose
    content is new, the min-id representative is kept.

    NULL text is ONE content group (matching ``exact_dedup``'s groupBy
    semantics, where NULL keys group together): a sentinel stands in for
    md5(NULL)=NULL on both sides, so NULL-text rows dedup among
    themselves and against a historical NULL-content entry instead of
    silently vanishing through non-null-safe joins.

    Plan: the batch is hashed map-side into an internal column (a
    caller's own ``hash_col`` column is untouched); one groupBy on the
    hash picks the batch representative; an anti-join against the index
    (broadcast if the planner can — the index side is prunable to the
    hash column) removes historically-seen content; a semi-join restores
    the full-width rows. No scan of historical RAW data ever happens —
    the index stands in for the entire corpus.

    ``hash_col`` names the INDEX's hash column (as produced by
    ``maintain_rollup(derive={'text_hash': F.md5(...)})``).
    """
    sentinel = F.lit("__null_content__")
    h = F.coalesce(F.md5(F.col(text_col)), sentinel)
    hashed = df.withColumn("__ci_hash", h)
    batch_min = hashed.groupBy("__ci_hash").agg(F.min(id_col).alias(id_col))
    idx = index.select(
        F.coalesce(F.col(hash_col), sentinel).alias("__ci_hash")
    )
    fresh = batch_min.join(idx, "__ci_hash", "left_anti")
    return hashed.join(fresh, ["__ci_hash", id_col], "left_semi") \
        .drop("__ci_hash")


def dedup_against_index_bloom(
    df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    hash_col: str = "text_hash",
    fpp: float = 0.01,
    n_index: int | None = None,
    bloom=None,
) -> DataFrame:
    """:func:`dedup_against_index` with a Bloom semi-join prefilter:
    batch contents the filter says are DEFINITELY not in the index skip
    the anti-join entirely; only probable hits (true duplicates + an
    fpp-bounded sliver of false positives) shuffle against the index.
    Result is row-identical to :func:`dedup_against_index` for every
    input and every fpp — the filter only reduces join traffic.

    Why this matters at 10^12 rows: on a fresh crawl almost every batch
    row is new content, so the daily index anti-join shuffles a batch
    whose overwhelming majority matches nothing. The prefiltered plan
    shuffles ~(dup_rate + fpp) of the batch instead of all of it, and
    the index side of the surviving join is the same prunable hash
    column it always was.

    ``bloom``: pass a prebuilt/persisted :class:`~.bloom.BloomFilter`
    over the INDEX's hash column to skip the build scan — the intended
    steady state, maintained incrementally next to the index with
    ``bloom_merge`` (each committed index delta ORs in a filter over its
    new hashes; NULL-content entries must be built over the same
    sentinel-coalesced hashes this function probes with).
    ``n_index``: index cardinality for sizing when building here (the
    rollup store knows it; None falls back to a count job).
    """
    from .bloom import bloom_build, with_bloom_flag

    sentinel = F.lit("__null_content__")
    h = F.coalesce(F.md5(F.col(text_col)), sentinel)
    hashed = df.withColumn("__ci_hash", h)
    batch_min = hashed.groupBy("__ci_hash").agg(F.min(id_col).alias(id_col))
    idx = index.select(
        F.coalesce(F.col(hash_col), sentinel).alias("__ci_hash")
    )
    if bloom is None:
        bloom = bloom_build(idx, "__ci_hash", n_items=n_index, fpp=fpp)
    flagged = with_bloom_flag(batch_min, "__ci_hash", bloom, "_maybe")
    certainly_fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.where(F.col("_maybe")).drop("_maybe")
    fresh = certainly_fresh.unionByName(maybe.join(idx, "__ci_hash", "left_anti"))
    return hashed.join(fresh, ["__ci_hash", id_col], "left_semi") \
        .drop("__ci_hash")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature over word-n-shingles: (id, h0..h15).

    Word shingles (not char-4-grams): on natural text char-4-grams are so
    common across documents that every signature's min lands on the same
    globally-frequent shingles — measured 250k candidate pairs from 5k
    docs (10% of all pairs) before the switch, ~0.1% after. Word shingles
    also align the candidate stage with the word-n-gram Jaccard verify
    stage.

    Implemented as shingle explode -> hash-aggregate of 16 mins rather
    than 16 ``array_min(transform(...))`` higher-order expressions: Catalyst
    duplicates the shingle-code subexpression into every h_j (16x
    recompute, interpreted lambda evaluation), measured ~20x slower. The
    explode feeds a partial-aggregating groupBy — map-side combine keeps
    the shuffle at one row per (doc, 16 mins) partial, so this scales to
    arbitrarily long documents. Docs with fewer than ``n`` tokens produce
    no shingles and drop out (same as the oracle's unnest of an empty
    list).
    """
    sh = word_shingles(F.col(text_col), n)
    exploded = (
        _ensure_parallelism(df)
        .select(F.col(id_col), F.explode(sh).alias("_s"))
        .select(F.col(id_col), encw(F.col("_s")).alias("_x"))
    )
    aggs = [
        F.min(uhash(F.col("_x"), j)).alias(f"h{j}")
        for j in range(len(MINHASH_COEFFS))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


#: default LSH hot-bucket guard: a bucket of 10k members would expand into
#: ~50M pairs *in one task* (collect_list materializes the bucket as one
#: row, _sorted_pairs builds the full O(k^2) pair array before explode) —
#: generous enough that genuine near-dup groups never hit it, small enough
#: that a degenerate boilerplate mega-bucket cannot OOM an executor.
DEFAULT_MAX_BUCKET = 10_000


def bands_for_threshold(
    threshold: float, n_hashes: int = len(MINHASH_COEFFS),
    min_recall: float = 0.98,
) -> tuple[int, int]:
    """(n_bands, band_size) for a Jaccard threshold: the LARGEST band
    size r (most selective buckets -> fewest candidates) whose banded
    collision probability for a pair AT the threshold,
    ``1 - (1 - t^r)^(n_hashes // r)``, still reaches ``min_recall``.

    The default 4x4 banding has its S-curve midpoint at J ~ 0.71 — a
    pair at J = 0.5 collides with only ~23% probability, so a 0.5
    threshold run needs wider banding (this is how the round-2 default
    missed 1 of 256 >=0.5 pairs at sf0.1). For t = 0.5 this picks
    r = 1 (16 single-hash bands, pair recall 1 - 0.5^16 ~ 0.99998);
    for t >= ~0.72 it keeps r = 4.
    """
    for r in range(n_hashes, 0, -1):
        b = n_hashes // r
        if 1 - (1 - threshold ** r) ** b >= min_recall:
            return b, r
    return n_hashes, 1


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    n_bands: int = N_BANDS, band_size: int = BAND_SIZE,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 full band signature.

    Scale path: explode each doc into ``n_bands`` (band, signature)
    rows, groupBy bucket, emit intra-bucket pairs. Shuffle volume is
    n_bands x n rows of small signatures; no O(n^2) join.

    ``max_bucket_size`` (default ``DEFAULT_MAX_BUCKET``): drop buckets
    larger than this instead of expanding them. A degenerate band
    signature (e.g. millions of boilerplate-identical docs) otherwise
    concentrates a quadratic pair blow-up in a single row/task (the
    bucket is collected to one array before pair expansion); such bands
    carry no discriminative signal — standard LSH hot-bucket practice.
    ``None`` expands every bucket exactly (the oracle-twin setting).

    ``n_bands`` x ``band_size`` must fit in the signature width; derive
    them from the target Jaccard threshold with
    :func:`bands_for_threshold` (the 4x4 default is tuned for J >~ 0.7).
    """
    if n_bands * band_size > len(MINHASH_COEFFS):
        raise ValueError(
            f"n_bands*band_size = {n_bands * band_size} exceeds the "
            f"{len(MINHASH_COEFFS)}-hash signature")
    sig = minhash_signatures(df, id_col, text_col, n)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "-",
                        *[F.col(f"h{b * band_size + r}").cast("string")
                          for r in range(band_size)],
                    ).alias("sig"),
                )
                for b in range(n_bands)
            ])
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    # groupBy-bucket pair emission, NOT a bands-self-join: a self-join
    # materializes the whole explode->agg signature pipeline TWICE (two
    # corpus scans); grouping computes it once and shuffles one row per
    # (band, sig) bucket. Buckets are near-dup groups, so arrays stay
    # small; a globally-degenerate signature (e.g. all-empty docs) is the
    # standard LSH hot-bucket hazard either way.
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("_ids") <= max_bucket_size)
    return (
        buckets.select(F.explode(_sorted_pairs(F.col("_ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def _verify_pairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame,
    n: int,
    threshold: float,
    use_words: bool = True,
) -> DataFrame:
    """Score candidate (id_a, id_b) pairs by exact distinct-shingle
    Jaccard via per-pair ``size(array_intersect)`` — O(|candidates| x
    shingle count), independent of shingle popularity."""
    mk = word_shingles if use_words else char_shingles
    sh = _ensure_parallelism(df).select(
        F.col(id_col),
        F.array_distinct(mk(F.col(text_col), n)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    use_words: bool = True,
    candidates: DataFrame | None = None,
    method: str = "auto",
    max_shingle_df: int | None = None,
    hot_shingle_action: str = "drop",
) -> DataFrame:
    """n-gram Jaccard similarity pairs >= threshold: (id_a, id_b, jaccard).

    Paths, most- to least-scalable:

    - ``candidates`` given (any (id_a, id_b) DataFrame): score exactly
      those pairs via per-pair ``array_intersect`` — the verify step,
      O(|candidates|), independent of shingle popularity.
    - ``method='auto'`` (default, word shingles only): derive candidates
      from :func:`minhash_lsh_candidates` first, then verify. This is the
      bounded default — the global self-join's fanout is quadratic in
      shingle document-frequency (one boilerplate shingle shared by 1e5
      docs emits 1e10 join rows), so it must never be the default at
      scale. Band parameters come from
      :func:`bands_for_threshold(threshold)`, so the S-curve is tuned to
      THIS threshold rather than the 4x4 default's ~0.7 midpoint
      (round 2's fixed banding missed a borderline 0.5-Jaccard pair;
      auto == global is pinned at every fixture SF).
    - ``method='global'``: the exact all-pairs shingle self-join — the
      oracle twin for small-scale verification. ``max_shingle_df`` caps a
      shingle's document frequency before the join (a safety valve:
      results are exact while no shingle exceeds the cap).
      ``hot_shingle_action`` decides what happens when one does:
      ``'drop'`` removes it from both intersection and union counts (a
      documented approximation); ``'fail'`` rides an ``assert_true`` on
      the join input so the query fails LOUDLY instead of silently
      diverging from the uncapped semantics — the right setting whenever
      the result is compared against an uncapped oracle.
    """
    if hot_shingle_action not in ("drop", "fail"):
        raise ValueError(f"hot_shingle_action must be 'drop' or 'fail', "
                         f"got {hot_shingle_action!r}")
    if candidates is None and method == "auto" and use_words:
        # spread the corpus ONCE; the nested candidate + verify calls
        # then see enough partitions and their guards no-op
        df = _ensure_parallelism(df)
        n_bands, band_size = bands_for_threshold(threshold)
        candidates = minhash_lsh_candidates(
            df, id_col, text_col, n, n_bands=n_bands, band_size=band_size)
    if candidates is not None:
        return _verify_pairs_jaccard(
            df, id_col, text_col, candidates, n, threshold, use_words
        )
    mk = word_shingles if use_words else char_shingles
    shingled = _ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.array_distinct(mk(F.col(text_col), n))).alias("s")
    )
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        hot = (
            shingled.groupBy("s").agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_shingle_df).select("s")
        )
        if hot_shingle_action == "fail":
            # assert in the row path: a shingle over the cap trips the
            # assertion on its first joined row — same shuffle as the
            # anti-join, but exactness is enforced instead of assumed
            marked = hot.withColumn("_hot", F.lit(True))
            shingled = (
                shingled.join(marked, "s", "left")
                .where(F.coalesce(
                    F.assert_true(
                        F.col("_hot").isNull(),
                        F.concat(F.lit("shingle document frequency exceeds "
                                       f"max_shingle_df={max_shingle_df}: "),
                                 F.col("s")),
                    ).cast("boolean"),
                    F.lit(True),
                ))
                .drop("_hot")
            )
        else:
            shingled = shingled.join(hot, "s", "left_anti")
        sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = (
        a.join(b, on="s")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_verified_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    n_bands: int = N_BANDS,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """The scalable near-dup pipeline: MinHash-LSH candidates verified by
    exact word-n-gram Jaccard via per-pair array intersection
    (:func:`_verify_pairs_jaccard`) — O(|candidates| x shingle count),
    independent of shingle popularity. (id_a, id_b, jaccard).

    ``max_bucket_size`` passes through to the candidate stage: the
    production default caps degenerate LSH buckets (an approximation once
    a band bucket exceeds it); ``None`` is the exact parameterization for
    oracle comparison — same contract as :func:`minhash_lsh_candidates`.
    ``n_bands``/``band_size`` pass through too (default 4x4 — the
    banding the oracle SQL mirrors); recall-vs-candidate-volume tuning
    for a given threshold is :func:`bands_for_threshold`'s job."""
    # spread once so the nested signature + verify guards no-op
    df = _ensure_parallelism(df)
    cand = minhash_lsh_candidates(df, id_col, text_col, n,
                                  max_bucket_size=max_bucket_size,
                                  n_bands=n_bands, band_size=band_size)
    return _verify_pairs_jaccard(df, id_col, text_col, cand, n, threshold)


SIMHASH_BITS = 24  # < 31 so the portable uhash supplies enough entropy


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc SimHash over whitespace tokens: (id, simhash int64).

    Token hash = portable uhash of the token's first 8 chars (two enc4
    blocks); each of SIMHASH_BITS bits votes +1/-1 per token; bit set iff
    the vote sum is positive. explode + groupBy(id) — one shuffle, partial
    aggregation map-side.
    """
    toks = _ensure_parallelism(df, min_bytes=CHEAP_PATH_MIN_BYTES).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    # two enc4 blocks over the first 8 chars; 8-char pad guarantees both
    # blocks are full 4-char strings (identical arithmetic in the oracle)
    padded = F.concat(F.col("tok"), F.lit("________"))
    code = F.pmod(
        enc4(padded) * F.lit(65599)
        + enc4(F.substring(padded, F.lit(5), F.lit(4))),
        F.lit(2_147_483_647),
    )
    h = uhash(code, 0)
    votes = [
        F.sum(
            F.when(F.floor(h / F.lit(2 ** j)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def _hamming_self_join(
    sig: DataFrame, id_col: str, sig_col: str, max_hamming: int,
    cast_int: bool = False,
) -> DataFrame:
    """O(n^2) Hamming self-join over a signature table — the equality
    reference / oracle twin for the banded searches; never the scale
    path. Shared by both SimHash widths so twin semantics cannot
    diverge."""
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}")))
    out = ham.cast("int") if cast_int else ham
    return (
        a.join(b, ham <= max_hamming)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            out.alias("hamming"),
        )
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Small-scale path: self-join of the (tiny) signature table. At 10^12
    rows the signature table is still only n rows of (id, int64) — band the
    bits into (max_hamming+1) blocks and bucket-join (pigeonhole: any pair
    within distance d shares at least one of d+1 blocks exactly).
    """
    sig = simhash(df, id_col, text_col)
    return _hamming_self_join(sig, id_col, "simhash", max_hamming)


def simhash_banded_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Scale path for :func:`simhash_pairs` — no O(n^2) join; identical
    output while no block bucket exceeds ``max_bucket_size``.

    Pigeonhole: a pair within Hamming distance d must agree EXACTLY on at
    least one of d+1 disjoint bit blocks. So: explode each signature into
    its d+1 (block_idx, block_value) keys, bucket-join on them (shuffle is
    (d+1) x n small rows), then verify true Hamming distance on the
    candidate pairs. Recall vs the self-join is exactly 1.0 with
    ``max_bucket_size=None`` (pinned by tests and by sharing the
    simhash_pairs oracle SQL).

    Scale caveat: 24-bit SimHash with d=3 gives 6-bit blocks — only 64
    values per block, so average bucket size is ~n/64 and the default cap
    starts dropping ORDINARY buckets (not just boilerplate clusters)
    beyond ~64 x cap documents. For corpora past that size use a wider
    fingerprint (e.g. 64-bit SimHash -> 16-bit blocks) or raise the cap
    deliberately; at 10^12 docs banding a 24-bit signature is too coarse
    regardless of capping.
    """
    sig = simhash(df, id_col, text_col)
    return _banded_hamming_pairs(sig, id_col, "simhash", SIMHASH_BITS,
                                 max_hamming, max_bucket_size)


def _banded_hamming_pairs(
    sig: DataFrame, id_col: str, sig_col: str, n_bits: int,
    max_hamming: int, max_bucket_size: int | None,
) -> DataFrame:
    """Pigeonhole banding over any integer signature column: explode each
    signature into its (max_hamming + 1) disjoint bit blocks, bucket-join
    on (block_idx, block_value), verify true Hamming on candidates.

    The signature rides INTO the bucket rows: pairs AND their Hamming
    distance come straight out of the bucket arrays — one signature
    computation, one bucket shuffle, no candidate-to-signature re-joins.
    """
    n_blocks = max_hamming + 1
    base, rem = divmod(n_bits, n_blocks)
    blocks, start = [], 0
    for bi in range(n_blocks):
        w = base + (1 if bi < rem else 0)
        blocks.append(
            F.struct(
                F.lit(bi).alias("blk"),
                F.shiftright(sig_col, start).bitwiseAND(
                    F.lit((1 << w) - 1) if w < 63 else F.lit(-1)
                ).alias("val"),
            )
        )
        start += w
    keyed = sig.select(
        F.struct(F.col(id_col).alias("id"), F.col(sig_col).alias("sh")).alias("e"),
        F.explode(F.array(*blocks)).alias("b"),
    ).select("e", "b.blk", "b.val")
    buckets = (
        keyed.groupBy("blk", "val")
        .agg(F.sort_array(F.collect_list("e")).alias("_es"))
        .where(F.size("_es") >= 2)
    )
    # hot-bucket guard (see minhash_lsh_candidates): a block value shared
    # by a huge boilerplate cluster would expand quadratically
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("_es") <= max_bucket_size)
    ham = F.bit_count(F.col("p.a.sh").bitwiseXOR(F.col("p.b.sh")))
    return (
        buckets.select(F.explode(_sorted_pairs(F.col("_es"))).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens: (id, simhash64).

    The corpus-scale fingerprint: token hash is JVM ``xxhash64`` (full
    64-bit entropy, whole-stage codegen) — NOT the portable 24-bit
    arithmetic of :func:`simhash` (which exists for DuckDB-oracle
    parity). With d=3 banding, 64 bits give 16-bit blocks (65,536
    values/block), so banded search stays exact up to ~65k x
    max_bucket_size documents vs the 24-bit variant's ~64 x cap.
    Correctness is pinned by the banded==self-join equality test instead
    of a SQL oracle.
    """
    toks = _ensure_parallelism(df, min_bytes=CHEAP_PATH_MIN_BYTES).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return agg.select(F.col(id_col), sig.alias("simhash64"))


def simhash64_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """O(n^2) self-join twin of :func:`simhash64_banded_pairs` — the
    equality reference for tests; never the scale path."""
    sig = simhash64(df, id_col, text_col)
    return _hamming_self_join(sig, id_col, "simhash64", max_hamming,
                              cast_int=True)


def simhash64_banded_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Scale path for 64-bit SimHash near-dup pairs — pigeonhole banding
    (see :func:`_banded_hamming_pairs`), exact vs the self-join with
    ``max_bucket_size=None`` (pinned in tests)."""
    sig = simhash64(df, id_col, text_col)
    return _banded_hamming_pairs(sig, id_col, "simhash64", 64,
                                 max_hamming, max_bucket_size)


def _fs_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on whatever Hadoop filesystem owns it
    (local, HDFS, s3a, ...) — the cluster-portable existence probe."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _fs_touch(spark, path: str) -> None:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.create(jpath, True).close()


def _fs_latest_round(spark, checkpoint_dir: str) -> int:
    """Highest ``round_NNNN`` under ``checkpoint_dir`` with a committed
    ``_SUCCESS`` marker (0 = none beyond the init labels). Listed from
    the filesystem rather than probed up to the caller's ``max_iter`` —
    a resume MUST see every round a prior run committed, even when that
    run used a larger ``max_iter`` than this one."""
    jvm = spark._jvm
    jdir = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
    fs = jdir.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jdir):
        return 0
    best = 0
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith("round_") and name[6:].isdigit():
            i = int(name[6:])
            if i > best and fs.exists(
                    jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
                best = i
    return best


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected (id_a, id_b) pair table:
    (node, cluster_id) where cluster_id = min node id in the component.

    Hash-min label propagation: every node starts labeled with itself;
    each round, a node's label becomes the min of its own and its
    neighbors' labels; converged when no label changes. Rounds needed =
    component diameter — near-dup clusters are dense (diameter ≤ a few),
    so this terminates in 2-4 rounds in practice; ``max_iter`` bounds
    pathological chains. Each round is one equi-join + one groupBy (both
    shuffle on node id — at scale, same-key partitioning is reused), and
    lineage is cut per round so the plan does not grow exponentially.
    Raises if not converged within ``max_iter``.

    Lineage-cut durability: the default ``localCheckpoint`` pins round
    state to executor storage — losing an executor mid-iteration kills
    the job (truncated lineage cannot recompute). For long chains pass
    ``checkpoint_dir`` (a job-private path on shared storage): edges and
    every round's labels are committed there as parquet (atomicity =
    parquet's ``_SUCCESS`` marker), a re-run with the same dir RESUMES
    from the latest committed round instead of restarting, and once
    converged a ``_CONVERGED`` marker makes re-runs return the final
    labels without any further jobs. The dir is keyed to one input —
    reuse across different pair tables is on the caller.
    """
    spark = pairs.sparkSession
    use_dir = checkpoint_dir is not None

    def cut(df: DataFrame, name: str) -> DataFrame:
        if not use_dir:
            return df.localCheckpoint()
        path = f"{checkpoint_dir}/{name}"
        if not _fs_exists(spark, path + "/_SUCCESS"):
            df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = cut(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        "edges",
    )
    start = 0
    labels = None
    if use_dir:
        # latest committed round from a directory listing, NOT probed up
        # to this call's max_iter: the _CONVERGED labels may live at a
        # round number beyond a smaller re-run's max_iter, and returning
        # any earlier round there would be silently pre-convergence
        start = _fs_latest_round(spark, checkpoint_dir)
        if start > 0:
            labels = spark.read.parquet(
                f"{checkpoint_dir}/round_{start:04d}")
        if labels is not None and _fs_exists(
                spark, f"{checkpoint_dir}/_CONVERGED"):
            return labels.select("node", F.col("label").alias("cluster_id"))
    if labels is None:
        labels = cut(
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node")),
            "round_0000",
        )
    for round_i in range(start + 1, max_iter + 1):
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = cut(
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            ),
            f"round_{round_i:04d}",
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            if use_dir:
                _fs_touch(spark, f"{checkpoint_dir}/_CONVERGED")
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    n_bands: int = N_BANDS,
    band_size: int = BAND_SIZE,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full near-dup clustering: LSH-verified pairs -> connected
    components -> (doc_id, cluster_id, cluster_size, is_representative).
    ``checkpoint_dir`` passes through to :func:`connected_components`
    for executor-loss-durable, resumable label propagation.

    The representative is the min-id member (stable under retries). Docs
    in no near-dup pair are singleton clusters of themselves and are NOT
    returned (at corpus scale almost every doc is a singleton — emitting
    them would dwarf the interesting rows; left-anti against this result
    recovers them when needed). ``max_bucket_size`` passes through to the
    LSH candidate stage (``None`` = exact, for oracle comparison).
    """
    pairs = lsh_verified_near_dups(df, id_col, text_col, n, threshold,
                                   max_bucket_size=max_bucket_size,
                                   n_bands=n_bands, band_size=band_size)
    cc = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    w_size = F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    return (
        cc.select(F.col("node").alias(id_col), "cluster_id")
        .withColumn("cluster_size", w_size.cast("long"))
        .withColumn("is_representative", F.col(id_col) == F.col("cluster_id"))
    )


def prioritized_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rank_col: str,
) -> DataFrame:
    """Cross-source dedup with a preference order: of all rows sharing
    identical content, keep the one with the LOWEST ``rank_col`` (ties
    broken by min id — stable under retries). The multi-corpus union
    primitive: "prefer the curated copy over the crawl copy of the same
    document".

    One window over ``md5(text)`` — a single shuffle on the content
    hash, exactly like :func:`exact_dedup`, with rank-then-id replacing
    plain min-id. Returns the surviving full-width rows.
    """
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
        F.col(rank_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def decontaminate_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark-decontamination flags: training docs that overlap an
    evaluation set, per the standard two-signal recipe — exact content
    match (md5) and shared word-``n``-gram (n=13 is the common
    eval-decontamination window; lower it for short documents).

    Returns (id, exact_hit boolean, ngram_hits int) for CONTAMINATED
    docs only (``ngram_hits >= min_hits`` or exact). Scale shape: the
    eval set is small by construction, so its distinct md5s and distinct
    shingle codes BROADCAST; the training corpus is scanned twice
    (hash probe + shingle explode), each probe a broadcast hash join —
    no all-pairs, no big-side shuffle except the per-doc hit count.
    Shingle codes are the portable ``encw`` arithmetic — a code
    collision can only ADD a hit (conservative: flags at worst a clean
    doc, never clears a contaminated one).
    """
    ev_hash = eval_df.select(
        F.md5(F.col(eval_text_col)).alias("_h")).distinct()
    ev_sh = (
        eval_df.select(F.explode(
            F.array_distinct(word_shingles(F.col(eval_text_col), n))
        ).alias("_s"))
        .select(encw(F.col("_s")).alias("_x")).distinct()
    )
    tr = _ensure_parallelism(df)
    tr_sh = (
        tr.select(F.col(id_col), F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("_s"))
        .select(id_col, encw(F.col("_s")).alias("_x"))
    )
    # broadcast-filter FIRST, dedupe the tiny survivor set after: a
    # distinct over all training shingle codes would shuffle the whole
    # exploded corpus; post-join, only codes shared with the eval set
    # remain (rare by construction). The distinct still matters — two
    # different per-doc shingles can encw-collide onto one code.
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "_x")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("ngram_hits"))
    )
    exact = (
        tr.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
        .join(F.broadcast(ev_hash), "_h")
        .select(F.col(id_col), F.lit(True).alias("exact_hit"))
        .distinct()
    )
    return (
        hits.join(exact, id_col, "full")
        .select(
            id_col,
            F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_hit"),
            F.coalesce(F.col("ngram_hits"), F.lit(0)).alias("ngram_hits"),
        )
        .where(F.col("exact_hit") | (F.col("ngram_hits") >= min_hits))
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated training docs (see :func:`decontaminate_flags`);
    returns the clean subset of ``df`` via a left-anti join on id."""
    flagged = decontaminate_flags(df, id_col, text_col, eval_df,
                                  eval_text_col, n, min_hits)
    return df.join(flagged.select(id_col), id_col, "left_anti")


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Pairs with cosine similarity >= threshold (brute-force verify path;
    the LSH-bucketed scale path lives in similarity.py)."""
    from .similarity import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 40,
    winnow: int | None = None,
) -> DataFrame:
    """Exact duplicate-substring detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every length-``min_len`` character window whose
    exact content occurs >= 2 times anywhere in the corpus, as
    (id, pos, n_occ) span rows — the span-level layer between the
    doc-level dedups and the line-level boilerplate pass (a verbatim
    quote inside otherwise-distinct documents is invisible to both).

    Exact mode (``winnow=None``): all n-L+1 windows per document,
    md5-keyed — the suffix-array result restricted to fixed window
    length, engine-portable (the DuckDB oracle reproduces it exactly).

    ``winnow=w`` is the scale path: per document, only WINNOWED
    fingerprint windows are emitted — the (leftmost-tie) minimum hash of
    every w consecutive window hashes (Schleimer et al. 2003). Selection
    is content-defined, so the two copies of a duplicated substring
    select the SAME relative positions regardless of their offsets:
    any duplicated substring of length >= min_len + w - 1 is GUARANTEED
    to share at least one emitted fingerprint (pinned in tests), and the
    emitted volume drops to ~2/(w+1) of exact. Winnowed spans are a
    subset of exact spans, with ``n_occ`` counted over fingerprints
    only.

    Scale shape: window generation and winnowing are map-side HOF
    expressions (one struct array per row, O(n*w) comparisons); the only
    shuffles are the count groupBy on the 128-bit md5 (map-side
    partials) and the match join back on the same key — the join ships
    hashes, never window text. This is the published approach's cost
    profile; at 10^12 rows run it winnowed, per partition, over the
    incremental delta."""
    text = F.col(text_col)
    n = F.greatest(F.length(text) - (min_len - 1), F.lit(0))
    hashes = F.when(n > 0, F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.md5(F.substring(text, i, F.lit(min_len))),
    )).otherwise(F.array().cast("array<string>"))

    if winnow is None:
        wins = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.md5(F.substring(text, i, F.lit(min_len))).alias("h"),
            ),
        )
        wins = F.when(n > 0, wins).otherwise(
            F.array().cast("array<struct<pos:int,h:string>>"))
        ex = df.select(F.col(id_col), F.explode(wins).alias("_w")) \
               .select(id_col, F.col("_w.pos").alias("pos"),
                       F.col("_w.h").alias("_h"))
    else:
        w = int(winnow)
        if w < 2:
            raise ValueError("winnow must be >= 2 (1 is exact mode)")
        # bind the hash array once per row; for every block of w
        # consecutive window hashes take the (leftmost) argmin — the
        # classic winnowing fingerprint selection. Blocks overlap, so
        # dedupe selected positions before exploding.
        arr = F.array(hashes)  # single-element wrapper binds the lambda var
        sel = F.transform(arr, lambda hs: F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(hs) - (w - 1), F.lit(1))),
            lambda t: (t - 1 + F.array_position(
                F.slice(hs, t, F.least(F.lit(w), F.size(hs) - t + 1)),
                F.array_min(F.slice(
                    hs, t, F.least(F.lit(w), F.size(hs) - t + 1))),
            )).cast("int"),
        )))[0]
        sel = F.when(n > 0, sel).otherwise(F.array().cast("array<int>"))
        ex = (
            df.select(F.col(id_col), F.array(hashes).alias("_hs"),
                      F.explode(sel).alias("pos"))
            .select(id_col, "pos",
                    F.element_at(F.col("_hs")[0], F.col("pos")).alias("_h"))
        )
    counts = (
        ex.groupBy("_h").agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= 2)
    )
    return ex.join(counts, "_h").select(id_col, "pos", "n_occ")


def duplicate_spans_sql(
    table: str, id_col: str, text_col: str, min_len: int = 40
) -> str:
    """DuckDB mirror of exact-mode :func:`duplicate_spans`."""
    return f"""
WITH w AS (
  SELECT {id_col}, i::INT AS pos,
         md5(substr({text_col}, i::INT, {int(min_len)})) AS h
  FROM (SELECT {id_col}, {text_col},
               unnest(range(1, greatest(len({text_col}) - {int(min_len)} + 2,
                                        1))) AS i
        FROM {table})),
c AS (SELECT h, count(*)::BIGINT AS n_occ FROM w
      GROUP BY h HAVING count(*) >= 2)
SELECT w.{id_col}, w.pos, c.n_occ FROM w JOIN c USING (h)"""


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 40,
    out_col: str | None = None,
) -> DataFrame:
    """Remove the duplicated substrings found by exact-mode
    :func:`duplicate_spans` — the Lee et al. 2021 excision step: overlap-
    merge each document's windows into maximal spans, cut them out, and
    reassemble the surviving segments in order (single-space joined).
    Documents with no spans pass through unchanged.

    Feed EXACT spans (winnowed fingerprints are sampled — excising only
    them leaves most of the duplicate in place). All per-document work is
    map-side HOF expressions after one groupBy(id) of the span rows:
    ``collect_set(pos)`` is bounded by the document's own window count,
    so per-row memory is O(doc length) — the same bound the text column
    itself already imposes on the row.

    Output: ``df`` with ``out_col`` (default: ``text_col`` replaced)
    holding the cleaned text, plus ``n_excised_chars``.
    """
    out_col = out_col or text_col
    L = int(min_len)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_set("pos")).alias("_pos"))
    j = df.join(per_doc, id_col, "left")
    text = F.col(text_col)

    # merge sorted window starts into maximal [start, end) intervals:
    # a window at p covers [p, p+L); consecutive starts <= L apart chain.
    # aggregate() folds into an array of closed interval structs.
    empty_ivs = F.array().cast("array<struct<s:int,e:int>>")
    ivs = F.aggregate(
        F.coalesce(F.col("_pos"), F.array().cast("array<int>")),
        empty_ivs,
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (p <= F.element_at(acc, -1)["e"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["s"].alias("s"),
                    F.greatest(F.element_at(acc, -1)["e"],
                               (p + L - 1).cast("int")).alias("e"),
                )),
            ),
        ).otherwise(F.concat(acc, F.array(F.struct(
            p.cast("int").alias("s"), (p + L - 1).cast("int").alias("e"))))),
    )
    j = j.withColumn("_ivs", ivs)
    # surviving segments: before the first interval, between intervals,
    # after the last — built by zipping interval ends with next starts
    n_iv = F.size(F.col("_ivs"))
    segs = F.concat(
        F.array(F.substring(text, 1,
                            F.coalesce(
                                F.try_element_at(F.col("_ivs"), F.lit(1))["s"],
                                F.length(text) + 1) - 1)),
        F.when(n_iv > 0, F.transform(
            F.sequence(F.lit(1), n_iv),
            lambda i: F.substring(
                text,
                F.element_at(F.col("_ivs"), i.cast("int"))["e"] + 1,
                F.coalesce(
                    F.try_element_at(F.col("_ivs"),
                                     (i + 1).cast("int"))["s"],
                    F.length(text) + 1,
                ) - F.element_at(F.col("_ivs"), i.cast("int"))["e"] - 1,
            ),
        )).otherwise(F.array().cast("array<string>")),
    )
    cleaned = F.concat_ws(
        " ", F.filter(segs, lambda s: (s.isNotNull()) & (s != "")))
    excised = F.aggregate(
        F.col("_ivs"), F.lit(0),
        lambda acc, iv: acc + (iv["e"] - iv["s"] + 1))
    out_cols = [c for c in df.columns if c != text_col]
    return (
        j.withColumn("n_excised_chars",
                     F.when(text.isNull(), F.lit(None).cast("int"))
                      .otherwise(excised.cast("int")))
        .withColumn(out_col, F.when(F.col("_pos").isNull(), text)
                              .otherwise(cleaned))
        .select(*out_cols,
                *([] if out_col in out_cols or out_col == text_col
                  else []),
                out_col, "n_excised_chars")
    )
