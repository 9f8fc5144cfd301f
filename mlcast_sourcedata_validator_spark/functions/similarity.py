"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline. Dot
  products are ``zip_with``+``aggregate`` Column expressions (JVM-side,
  whole-stage codegen); top-k is a single ``orderBy().limit()`` which Spark
  executes as per-partition TakeOrdered + driver merge (no full sort).
- ``rhp_signatures`` / ``ann_lsh_topk``: the scale path — random-hyperplane
  LSH. Hyperplane components are deterministic (xxhash64-derived, seeded),
  so signatures are reproducible across runs/executors without shipping a
  matrix. Buckets come from sign-bit prefixes; search probes the query's
  bucket (and optionally its 1-bit-flip neighbors), reducing the scan from
  O(n) to O(n / 2^bits) per probe.

- ``ivf_fit`` / ``ivf_assign`` / ``ivf_topk``: IVF (inverted-file) ANN —
  a KMeans coarse quantizer (distributed fit, centroids on the driver),
  map-side nearest-centroid assignment as Column expressions, and search
  that probes only the query's ``nprobe`` nearest lists. With
  ``nprobe == n_lists`` it equals brute force exactly (tested invariant).

At 10^12 rows the brute-force path is a full scan per query — only viable
batched (many queries x one scan); the LSH and IVF paths keep per-query
work sublinear, and their bucket/list tables are plain DataFrames that
prune via a partition column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (double math).

    Higher-order-function form for unknown dimensionality. NOTE:
    ``aggregate``/``zip_with`` lambdas evaluate INTERPRETED (no
    whole-stage codegen) — when the dimension is known, use
    :func:`dot_expanded`, which is bit-identical (same left-to-right
    fold order) but compiles: measured ~10x on a 2M-pair verify stage.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_expanded(a: Column, b: Column, dim: int) -> Column:
    """Codegen'd dot product for a KNOWN dimension: an explicit
    ``element_at`` product chain summed left-to-right — the exact fold
    order of :func:`dot` (``((0 + t0) + t1) + ...`` == ``(t0 + t1) +
    ...``), so results are bit-identical and oracle hashes are
    unaffected."""
    terms = [
        (F.element_at(a, i + 1).cast("double")
         * F.element_at(b, i + 1).cast("double"))
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_lit(vec: Column, query_vec: list[float]) -> Column:
    """Codegen'd dot of an array column against a LITERAL query vector —
    components inline as literals, no array construction at all."""
    terms = [
        F.element_at(vec, i + 1).cast("double") * F.lit(float(v))
        for i, v in enumerate(query_vec)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_expanded(a: Column, b: Column, dim: int) -> Column:
    """Codegen'd cosine for a known dimension (bit-identical to
    :func:`cosine`, see :func:`dot_expanded`)."""
    return dot_expanded(a, b, dim) / (
        F.sqrt(dot_expanded(a, a, dim)) * F.sqrt(dot_expanded(b, b, dim))
    )


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine to a literal query vector.

    (id, cosine) ordered desc. The query vector is a literal array — it
    ships inside the plan, no join needed.
    """
    return _cosine_topk_over(df, id_col, vec_col, query_vec, k)


def cosine_topk_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries_df: DataFrame,
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k for a whole query SET in one corpus scan.

    The query table broadcasts (it is small by construction); every
    (row, query) cosine is scored map-side, and per-query top-k is a
    window rank — the per-query-partition shuffle carries only
    (query_id, id, cosine). At 10^12 rows this is THE way to run exact
    search: one scan amortized over |Q| queries, vs |Q| scans for
    one-at-a-time :func:`cosine_topk`. Pass ``dim`` to score with the
    codegen'd expanded cosine instead of interpreted array lambdas.
    """
    from .dedup import _ensure_parallelism

    df = _ensure_parallelism(df)  # |Q| x dot products per corpus row
    if dim is not None:
        # norms per ROW / per QUERY, not per (row, query) combination:
        # O(n + |Q|) sqrts instead of O(n x |Q|), and the join stage's
        # expanded tree shrinks from 3 x dim to dim products (the full
        # 3x tree in a join doConsume trips janino method limits at
        # dim=64 — see embedding_lsh_near_dup_pairs). Bit-identical:
        # sqrt(dot_expanded(v, v)) is the same expression either side
        # of the join boundary.
        df = df.withColumn(
            "_nv", F.sqrt(dot_expanded(F.col(vec_col), F.col(vec_col), dim)))
        queries_df = queries_df.withColumn(
            "_nq", F.sqrt(dot_expanded(F.col(qvec_col), F.col(qvec_col), dim)))
        cos = (dot_expanded(F.col(vec_col), F.col(qvec_col), dim)
               / (F.col("_nv") * F.col("_nq")))
    else:
        cos = cosine(F.col(vec_col), F.col(qvec_col))
    scored = df.crossJoin(F.broadcast(queries_df)).select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cos, 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1]^dim (driver-side;
    same values every run — reproducible signatures without persisting a
    matrix)."""
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.sha256(f"{seed}:{plane}:{i}".encode()).digest()
        v = int.from_bytes(h[:8], "big") / float(2 ** 64)  # [0, 1)
        comps.append(2.0 * v - 1.0)
    return comps


def rhp_bucket_expr(
    vec_col: str, n_planes: int = 8, dim: int = 64, seed: int = 7
) -> Column:
    """The RHP sign-bucket as a pure Column expression — inline it on the
    corpus scan (filter or partition column); never join a signature
    table back to the corpus to recover what a map-side expression
    computes for free (same principle as :func:`ivf_assign_expr`)."""
    bucket = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p, seed)])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def rhp_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane sign signature (id, bucket int) — map-side only."""
    return df.select(
        F.col(id_col),
        rhp_bucket_expr(vec_col, n_planes, dim, seed).alias("bucket"),
    )


def rhp_multitable_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """(id, t, bucket): L independent RHP tables of k planes each — the
    standard recall amplifier (a pair of cosine s collides in >=1 table
    with prob 1-(1-(1-theta/pi)^k)^L).

    The L x k dot products are computed as ONE ``posexplode`` of the
    vector -> per-component products against literal hyperplane
    components (``element_at`` on a literal array — codegen'd) -> one
    ``groupBy(id)`` hash aggregate of L x k sums (map-side partials, one
    small shuffle row per doc). The earlier form — L x k
    ``aggregate(zip_with(...))`` higher-order expressions per row —
    evaluates INTERPRETED per element (the same trap the minhash
    signature hit, see dedup.minhash_signatures): measured 4x slower at
    sf0.1. Docs with empty vectors produce no exploded rows and drop out
    (they could never exact-verify anyway: cosine with a zero vector is
    NaN).
    """
    from .dedup import _ensure_parallelism

    df = _ensure_parallelism(df)
    total = n_tables * n_planes
    planes = [_hyperplane(dim, j, seed) for j in range(total)]
    plane_lits = [F.array(*[F.lit(c) for c in planes[j]]) for j in range(total)]
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("_p", "_v"),
    ).select(
        F.col(id_col),
        *[
            (F.col("_v").cast("double")
             * F.element_at(plane_lits[j], F.col("_p") + 1)).alias(f"_x{j}")
            for j in range(total)
        ],
    )
    dots = exploded.groupBy(id_col).agg(
        *[F.sum(f"_x{j}").alias(f"_d{j}") for j in range(total)]
    )
    entries = []
    for t in range(n_tables):
        bucket = None
        for p in range(n_planes):
            bit = F.when(F.col(f"_d{t * n_planes + p}") >= 0,
                         F.lit(2 ** p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        entries.append(
            F.struct(F.lit(t).alias("t"), bucket.cast("int").alias("bucket"))
        )
    return dots.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("e")
    ).select(id_col, "e.t", "e.bucket")


def embedding_lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 7,
    dim: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale path for ``dedup.embedding_near_dup_pairs`` (which is an
    O(n^2) crossJoin verify): candidates are pairs sharing a bucket in any
    RHP table, then exact cosine verifies >= threshold. Precision is 1.0
    (every emitted pair is exact-verified); recall is the multi-table LSH
    collision probability — tested against brute force on clustered
    fixtures. Shuffle volume: L x n small (id, t, bucket) rows.

    Candidate pairs come from groupBy-bucket emission, NOT a bucket-table
    self-join — the self-join materialized the whole L x k dot-product
    signature pipeline TWICE (two corpus scans; same lesson as
    dedup.minhash_lsh_candidates). ``max_bucket_size`` is the standard
    hot-bucket guard (a degenerate bucket — e.g. millions of zero-ish
    vectors on the same side of every plane — expands quadratically in
    one task); ``None`` (default) expands every bucket, matching the
    uncapped brute-force oracle.

    Pass ``dim`` (the embedding dimensionality) explicitly — array
    columns do not carry a length in the Spark schema, and the
    ``None`` fallback probes it with a ``.first()`` row, an avoidable
    extra driver job on a 10^12-row table.
    """
    from .dedup import _sorted_pairs

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    keyed = rhp_multitable_buckets(df, id_col, vec_col, n_tables, n_planes,
                                   dim, seed)
    buckets = (
        keyed.groupBy("t", "bucket")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .where(F.size("_ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("_ids") <= max_bucket_size)
    cand = (
        buckets.select(F.explode(_sorted_pairs(F.col("_ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    # norms are per-ROW quantities: compute them on the n-row side
    # projections, not per candidate PAIR — O(n) instead of O(#pairs)
    # sqrt(dot), and the join stage's expression tree shrinks from
    # 3 x dim to dim products (the full 3x tree inlined into the join's
    # whole-stage doConsume blew past janino's method limits at dim=64,
    # silently degrading the hot verify stage to interpreted eval).
    # sqrt(dot_expanded(v, v)) evaluates identically here or per-pair,
    # so cosine stays bit-identical to cosine_expanded / cosine.
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
                   F.sqrt(dot_expanded(F.col(vec_col), F.col(vec_col),
                                       dim)).alias("_na"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
                   F.sqrt(dot_expanded(F.col(vec_col), F.col(vec_col),
                                       dim)).alias("_nb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        # expanded (codegen'd) cross-dot: the verify stage scores every
        # candidate pair — the interpreted higher-order form dominated
        # the whole pipeline (measured ~10s of a 12s wall at sf0.1)
        .withColumn("cosine",
                    F.round(dot_expanded(F.col("_va"), F.col("_vb"), dim)
                            / (F.col("_na") * F.col("_nb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_fit(
    df: DataFrame,
    vec_col: str,
    n_lists: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    max_fit_rows: int | None = None,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Train the IVF coarse quantizer (KMeans) and return its centroids.

    Distributed fit (Spark ML KMeans); only the k x dim centroid matrix
    comes back to the driver. ``max_fit_rows`` / ``sample_fraction`` cap
    the fit input with a deterministic (seeded) ``df.sample`` — at 10^12
    rows the quantizer converges on a few-million-row sample long before
    full KMeans passes matter, and every later pass (assignment, search)
    stays exact regardless of which centroids the fit produced.
    ``sample_fraction`` is the zero-extra-jobs form; ``max_fit_rows``
    spends one count() job to derive the fraction. Default fits on the
    full input (fine at test scale).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    elif max_fit_rows is not None:
        n = df.count()
        if n > max_fit_rows:
            # slight over-sample then exact cap: sample() is fraction-
            # based and Bernoulli, so pad the fraction and limit()
            frac = min(1.0, 1.1 * max_fit_rows / n)
            df = df.sample(fraction=frac, seed=seed).limit(max_fit_rows)
    feat = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features")
    )
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter,
                   featuresCol="_features").fit(feat)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> list[Column]:
    """score_j = dot(v, c_j) - |c_j|^2/2 — argmax(score) == nearest centroid
    by euclidean distance, without computing |v|^2 per row."""
    scores = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        n2 = sum(x * x for x in c)
        scores.append(dot(vec, carr) - F.lit(n2 / 2.0))
    return scores


def ivf_assign_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Map-side nearest-centroid Column expression (no Python, no
    shuffle): an array of (score, j) structs reduced with array_max —
    struct comparison is lexicographic, so ties break deterministically
    toward the larger j. At scale this is the partition column of the
    IVF index table."""
    scored = F.array(*[
        F.struct(s.alias("s"), F.lit(j).alias("j"))
        for j, s in enumerate(_centroid_scores(F.col(vec_col), centroids))
    ])
    return F.array_max(scored)["j"]


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Assign each vector to its nearest centroid: (id, list_id)."""
    return df.select(
        F.col(id_col), ivf_assign_expr(vec_col, centroids).alias("list_id")
    )


def _probe_lists(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The query's ``nprobe`` nearest lists (same euclidean decomposition
    as :func:`_centroid_scores`) — shared by the in-memory and persisted
    search paths so probe selection cannot diverge."""
    qscores = [
        sum(a * b for a, b in zip(query_vec, c)) - sum(x * x for x in c) / 2.0
        for c in centroids
    ]
    return sorted(range(len(centroids)), key=lambda j: -qscores[j])[:nprobe]


def _cosine_topk_over(
    cand: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int
) -> DataFrame:
    """Exact cosine top-k of ``cand`` against a literal query vector.

    Deliberately the higher-order-function cosine, not the expanded
    form: a top-k query's candidate set is pruned/sublinear by design
    (bucket filter, partition-pruned IVF lists), so execution is cheap
    either way, while the expanded form's ~2000-node literal tree costs
    ~0.8s of driver-side Catalyst analysis PER QUERY (measured) — the
    wrong trade for a low-latency search path. The expanded form wins
    where a single plan scores millions of rows (see
    ``embedding_lsh_near_dup_pairs``' verify stage).
    Top-k is ``orderBy().limit()`` = per-partition TakeOrdered + driver
    merge.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF search: score only vectors whose list is among the query's
    ``nprobe`` nearest centroids — O(n * nprobe / n_lists) per query.

    With ``nprobe == len(centroids)`` this probes every list and equals
    brute-force :func:`cosine_topk` exactly (the correctness invariant the
    tests pin). Assignment is a map-side expression on the scan — no
    self-join, no extra pass.
    """
    probe = _probe_lists(query_vec, centroids, nprobe)
    cand = df.where(
        ivf_assign_expr(vec_col, centroids).isin(probe)
    )
    return _cosine_topk_over(cand, id_col, vec_col, query_vec, k)


def ivf_build_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    n_lists: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    max_fit_rows: int | None = None,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Materialize the IVF index: vectors written hive-partitioned by
    ``list_id``, centroids in a JSON sidecar next to them.

    This is the 100-TB shape of IVF: the index is a TABLE, built once,
    and a query's ``nprobe`` lists map to PARTITION PRUNING on the read —
    Spark's file index skips every unprobed ``list_id=`` directory, so a
    16-list/1-probe search reads ~1/16th of the data with zero custom
    machinery (cf. the in-memory :func:`ivf_topk`, which filters after a
    full scan of the input DataFrame).
    """
    import json

    from ..sources import fs

    cents = ivf_fit(df, vec_col, n_lists=n_lists, seed=seed,
                    max_iter=max_iter, max_fit_rows=max_fit_rows,
                    sample_fraction=sample_fraction)
    # list_id is a map-side expression on the same scan — a join back to
    # ivf_assign() would scan df twice and shuffle the whole corpus
    df.withColumn("list_id", ivf_assign_expr(vec_col, cents)) \
        .write.mode("overwrite").partitionBy("list_id").parquet(index_path)
    fs.write_text(fs.join(index_path, "_ivf_centroids.json"),
                  json.dumps(cents))
    return cents


def ivf_topk_indexed(
    spark,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Search a persisted IVF index: read ONLY the query's ``nprobe``
    nearest lists via hive partition pruning on ``list_id``, then exact
    cosine top-k over the candidates. With ``nprobe == n_lists`` equals
    brute force (same invariant as :func:`ivf_topk`)."""
    import json

    from ..sources import fs

    cents = json.loads(fs.read_text(fs.join(index_path,
                                            "_ivf_centroids.json")))
    probe = _probe_lists(query_vec, cents, nprobe)
    cand = spark.read.parquet(index_path).where(F.col("list_id").isin(probe))
    return _cosine_topk_over(cand, id_col, vec_col, query_vec, k)


def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/ANN-transport
    compression step of an embedding pipeline (4x smaller than float32):

        scale = max_i |x_i|
        q_i   = floor(x_i / scale * 127 + 0.5)   in [-127, 127]

    plus ``max_abs_err``, the worst per-component reconstruction error of
    ``q_i * scale / 127``. Pure array expressions over doubles (IEEE
    arithmetic is engine-identical, so the DuckDB oracle compares
    exactly); map-side only — no shuffle, no Python. Zero vectors get
    scale 0 and an all-zero code (the division guard)."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(
        F.col(id_col), v.alias("_v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("_scale"),
    )
    qvec = F.when(
        F.col("_scale") > 0,
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x / F.col("_scale") * 127.0 + 0.5).cast("int"),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0)))
    recon = F.when(
        F.col("_scale") > 0,
        F.round(
            F.array_max(F.zip_with(
                F.col("qvec"), F.col("_v"),
                lambda a, b: F.abs(a * F.col("_scale") / 127.0 - b),
            )),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        base.withColumn("qvec", qvec)
        .select(
            F.col(id_col), F.round("_scale", 6).alias("scale"),
            F.col("qvec"), recon.alias("max_abs_err"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_lists: int = 16,
    centroids: list[list[float]] | None = None,
    seed: int = 7,
    dim: int | None = None,
    max_fit_rows: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 — public
    paper): partition the corpus into ``n_lists`` KMeans clusters (the
    IVF coarse quantizer), find within-cluster pairs with
    ``round(cosine, 6) >= threshold``, and DROP every row that has a
    smaller-id near-neighbor in its cluster. Returns the surviving rows
    with all original columns.

    The keep rule is deterministic and engine-independent (keep a row
    iff no smaller-id within-cluster neighbor clears the threshold), so
    with ``n_lists=1`` the output equals the global brute-force rule —
    that parameterization is the exact SQL oracle; splitting into more
    clusters can only REMOVE pairs, so survivors at ``n_lists>1`` are
    always a superset (pinned in tests).

    Shape at scale: the pair search is an equi-join on ``list_id`` —
    per-cluster cost is O(c^2) bounded by cluster size, so ``n_lists``
    is sized to the corpus (SemDeDup uses ~100k clusters for billions of
    embeddings); the fit runs on a deterministic sample
    (``max_fit_rows``/``sample_fraction``), assignment is a map-side
    literal-centroid expression (no shuffle), norms are computed per ROW
    before the join (not per pair), and the drop-set join back is a
    ``left_anti`` on ids (the drop set is the duplicate mass — the
    exception, not the corpus).

    Pass ``dim`` explicitly to use the codegen'd expanded dot product
    and skip the ``.first()`` dimensionality probe.
    """
    if centroids is None:
        if n_lists == 1:
            centroids = []  # single implicit cluster; no fit needed
        else:
            centroids = ivf_fit(df, vec_col, n_lists=n_lists, seed=seed,
                                max_fit_rows=max_fit_rows,
                                sample_fraction=sample_fraction)
    if dim is None and len(centroids) > 0:
        dim = len(centroids[0])

    if len(centroids) <= 1:
        list_expr = F.lit(0)
    else:
        list_expr = ivf_assign_expr(vec_col, centroids)

    if dim is not None:
        _norm = lambda c: F.sqrt(dot_expanded(c, c, dim))  # noqa: E731
        _dot = lambda a, b: dot_expanded(a, b, dim)  # noqa: E731
    else:
        _norm = norm
        _dot = dot

    vcol = F.col(vec_col)
    slim_a = df.select(
        F.col(id_col).alias("id_a"), list_expr.alias("_list"),
        vcol.alias("_va"), _norm(vcol).alias("_na"),
    )
    slim_b = df.select(
        F.col(id_col).alias("id_b"), list_expr.alias("_list"),
        vcol.alias("_vb"), _norm(vcol).alias("_nb"),
    )
    dropped = (
        slim_a.join(slim_b, "_list")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(_dot(F.col("_va"), F.col("_vb"))
                    / (F.col("_na") * F.col("_nb")), 6) >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    multiprobe: int = 1,
    probe_all: bool = False,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus ``multiprobe`` 1-bit-flip neighbor buckets).

    ``probe_all=True`` probes every bucket — the search runs through the
    full signature/bucket machinery but scores the whole corpus, so the
    result equals brute-force :func:`cosine_topk` exactly (the
    correctness invariant the driver oracle pins; same trick as
    ``ivf_topk(nprobe=n_lists)``).

    The bucket is computed as an inline :func:`rhp_bucket_expr` Column on
    the corpus scan and filtered map-side — ONE scan, ZERO shuffles
    before the final TakeOrdered (a join back to an (id, bucket)
    signature table would scan the corpus twice and hash-exchange it on
    id just to recover a value the scan can compute in place).
    """
    dim = len(query_vec)
    qbits = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qbits |= 1 << p
    if probe_all:
        probe_buckets = list(range(2 ** n_planes))
    else:
        # probe the home bucket, plus every 1-bit-flip neighbor when
        # multiprobe
        probe_buckets = [qbits] + (
            [qbits ^ (1 << i) for i in range(n_planes)]
            if multiprobe >= 1 else []
        )

    cand = df.where(
        rhp_bucket_expr(vec_col, n_planes, dim, seed).isin(probe_buckets)
    )
    return _cosine_topk_over(cand, id_col, vec_col, query_vec, k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed codes + asymmetric-distance search
# ---------------------------------------------------------------------------

def pq_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    max_fit_rows: int | None = None,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split each vector into ``n_subspaces``
    contiguous subvectors and KMeans each subspace independently
    (``n_codes`` centroids per subspace). Returns
    ``codebooks[j][c] = centroid c of subspace j``.

    This is the memory story for ANN at 10^12 vectors: a dim-64 float
    embedding (256 B) encodes to ``n_subspaces`` small codes (8 B at
    16 codes/subspace) — a ~32x smaller table that a scan can rank
    without touching raw vectors. Fit is Spark ML KMeans per subspace
    with the same deterministic sampling contract as :func:`ivf_fit`
    (``max_fit_rows`` / ``sample_fraction``); only n_subspaces x n_codes
    x dim/n_subspaces floats return to the driver.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % n_subspaces != 0:
        raise ValueError(
            f"dim {dim} not divisible into {n_subspaces} subspaces")
    dsub = dim // n_subspaces
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    elif max_fit_rows is not None:
        n = df.count()
        if n > max_fit_rows:
            frac = min(1.0, 1.1 * max_fit_rows / n)
            df = df.sample(fraction=frac, seed=seed).limit(max_fit_rows)
    # one cached projection feeds all n_subspaces fits (each fit scans
    # the sample, not the input)
    sliced = df.select(*[
        array_to_vector(
            F.slice(F.col(vec_col), j * dsub + 1, dsub).cast("array<double>")
        ).alias(f"_sub_{j}")
        for j in range(n_subspaces)
    ])
    sliced.persist()
    try:
        books = []
        for j in range(n_subspaces):
            model = KMeans(
                k=n_codes, seed=seed + j, maxIter=max_iter,
                featuresCol=f"_sub_{j}",
            ).fit(sliced)
            books.append([[float(x) for x in c] for c in model.clusterCenters()])
    finally:
        sliced.unpersist()
    return books


def pq_encode_expr(
    vec_col: str | Column, codebooks: list[list[list[float]]]
) -> Column:
    """Map-side PQ encoding as ONE Column: array of per-subspace
    nearest-centroid codes (same argmax-of-(score, j)-structs device as
    :func:`ivf_assign_expr`, applied to each subvector slice). No
    Python, no shuffle — at scale this rides the ingest scan and the
    codes table is what persists. Accepts a Column so composed encoders
    (e.g. the IVF-PQ residual) can feed it directly."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n_subspaces = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j in range(n_subspaces):
        sub = F.slice(vec, j * dsub + 1, dsub)
        scored = F.array(*[
            F.struct(s.alias("s"), F.lit(c).alias("c"))
            for c, s in enumerate(_centroid_scores(sub, codebooks[j]))
        ])
        codes.append(F.array_max(scored)["c"])
    return F.array(*codes)


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, codes) — the compressed ANN table."""
    return df.select(
        F.col(id_col), pq_encode_expr(vec_col, codebooks).alias("codes")
    )


def adc_score_expr(
    codes_col: str, codebooks: list[list[list[float]]],
    query_vec: list[float],
) -> Column:
    """Asymmetric distance computation: approximate ``dot(query, v)`` as
    ``sum_j dot(query_j, centroid(codes[j]))`` — the per-subspace
    lookup tables inline as array literals, so scoring one code is
    ``n_subspaces`` element_at lookups + adds, fully codegen'd over the
    compact codes table (the raw vectors are never read)."""
    n_subspaces = len(codebooks)
    dsub = len(codebooks[0][0])
    score = None
    for j in range(n_subspaces):
        qj = query_vec[j * dsub:(j + 1) * dsub]
        table = [
            sum(a * b for a, b in zip(qj, cent)) for cent in codebooks[j]
        ]
        lut = F.array(*[F.lit(float(t)) for t in table])
        term = F.element_at(lut, F.element_at(F.col(codes_col), j + 1) + 1)
        score = term if score is None else score + term
    return score


def pq_topk(
    encoded: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    rerank_factor: int | None = 4,
) -> DataFrame:
    """PQ search: rank the COMPRESSED codes table by ADC score, keep the
    top ``k * rerank_factor`` candidate ids, then exact-cosine re-rank
    those few against the raw vectors. The raw-vector table is touched
    only for the candidate join — the scan that does the ranking reads
    ~32x fewer bytes than a brute-force pass.

    ``rerank_factor=None`` disables the truncation: every id flows from
    the ADC stage into the exact re-rank, so the result equals
    brute-force :func:`cosine_topk` EXACTLY regardless of codebook
    quality — the driver-gate exact mode (same invariant trick as
    ``ivf_topk(nprobe=n_lists)`` / ``ann_lsh_topk(probe_all=True)``)
    while still executing the real encode -> ADC -> rerank plan.
    """
    scored = encoded.select(
        F.col(id_col),
        adc_score_expr("codes", codebooks, query_vec).alias("_adc"),
    )
    if rerank_factor is not None:
        scored = (
            scored.orderBy(F.desc("_adc"), F.col(id_col))
            .limit(k * rerank_factor)
        )
    cand = vectors.join(scored.select(id_col), id_col, "left_semi")
    return _cosine_topk_over(cand, id_col, vec_col, query_vec, k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse partition pruning + compressed residual codes — the
# composed 10^12-vector index (FAISS IVFADC shape, Spark-native)
# ---------------------------------------------------------------------------

def _centroid_lut(centroids: list[list[float]]) -> Column:
    """Array-of-array literal of the coarse centroids, indexed 1-based by
    ``element_at(lut, list_id + 1)``."""
    return F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])


def _residual_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """``v - centroid[list_id(v)]`` as one map-side expression: the
    coarse assignment and the subtraction both inline on the scan."""
    lid = ivf_assign_expr(vec_col, centroids)
    cent = F.element_at(_centroid_lut(centroids), lid + 1)
    return F.zip_with(F.col(vec_col).cast("array<double>"), cent,
                      lambda a, b: a - b)


def ivfpq_build_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    dim: int,
    n_lists: int = 8,
    n_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    max_fit_rows: int | None = None,
    sample_fraction: float | None = None,
) -> dict:
    """Materialize the composed IVF-PQ index: each vector is coarse-
    assigned to its nearest of ``n_lists`` centroids (the partition
    key), and its RESIDUAL ``v - centroid`` is PQ-encoded
    (:func:`pq_fit` on the residual distribution — the classic IVFADC
    decomposition: residuals are tighter than raw vectors, so the same
    code budget quantizes them better). The table lands hive-partitioned
    by ``list_id`` with columns ``(id, vec, codes)``; centroids +
    codebooks go in a JSON sidecar.

    Why this is THE 10^12-vector shape: a search prunes to ``nprobe``
    list directories (partition pruning — unprobed lists are never
    listed, let alone read) and ranks them by ADC over the ``codes``
    column only (parquet column pruning — the ~32x-larger raw ``vec``
    column is read just for the few re-rank candidates). Both prunings
    are free Catalyst behavior because the index is a plain hive-
    partitioned table — no custom file index, no external service.

    Fit cost is bounded by the same deterministic-sampling contract as
    :func:`ivf_fit` / :func:`pq_fit` (``max_fit_rows`` /
    ``sample_fraction``); the encode pass is a single map-side
    projection riding the write scan.
    """
    import json

    from ..sources import fs

    cents = ivf_fit(df, vec_col, n_lists=n_lists, seed=seed,
                    max_iter=max_iter, max_fit_rows=max_fit_rows,
                    sample_fraction=sample_fraction)
    res = _residual_expr(vec_col, cents)
    books = pq_fit(
        df.select(res.alias("_res")), "_res", dim,
        n_subspaces=n_subspaces, n_codes=n_codes, seed=seed,
        max_iter=max_iter, max_fit_rows=max_fit_rows,
        sample_fraction=sample_fraction,
    )
    # assignment, residual and codes all inline on ONE write scan — a
    # join back to a separate assignment pass would scan df twice and
    # shuffle the corpus
    df.select(
        F.col(id_col), F.col(vec_col),
        pq_encode_expr(res, books).alias("codes"),
        ivf_assign_expr(vec_col, cents).alias("list_id"),
    ).write.mode("overwrite").partitionBy("list_id").parquet(index_path)
    meta = {"centroids": cents, "codebooks": books}
    fs.write_text(fs.join(index_path, "_ivfpq_meta.json"), json.dumps(meta))
    return meta


def ivfpq_topk(
    spark,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank_factor: int | None = 4,
) -> DataFrame:
    """Search a persisted IVF-PQ index: partition-prune to the query's
    ``nprobe`` nearest lists, rank their COMPRESSED codes by ADC
    (``dot(q, v) ~ dot(q, centroid_list) + sum_j dot(q_j,
    codebook_j[code_j])`` — the per-list constant is one array-literal
    lookup, the residual part is :func:`adc_score_expr`), keep the top
    ``k * rerank_factor`` ids, and exact-cosine re-rank those few
    against the raw vectors.

    The ADC stage selects only ``(id, codes, list_id)`` so parquet
    column pruning never touches the raw ``vec`` bytes; the re-rank
    reads ``vec`` for candidates only (a broadcast-sized semi-join).

    ``nprobe == n_lists`` + ``rerank_factor=None`` routes every vector
    through the exact re-rank — equals brute-force :func:`cosine_topk`
    EXACTLY regardless of centroid/codebook quality (the same driver-
    gate invariant as the IVF / LSH / PQ exact modes) while executing
    the real prune -> ADC -> re-rank plan.
    """
    import json

    from ..sources import fs

    meta = json.loads(fs.read_text(fs.join(index_path, "_ivfpq_meta.json")))
    cents, books = meta["centroids"], meta["codebooks"]
    probe = _probe_lists(query_vec, cents, nprobe)
    idx = spark.read.parquet(index_path).where(F.col("list_id").isin(probe))
    # per-list constant dot(q, centroid) as a literal lookup table
    qc = F.array(*[
        F.lit(float(sum(a * b for a, b in zip(query_vec, c))))
        for c in cents
    ])
    scored = idx.select(
        F.col(id_col),
        (F.element_at(qc, F.col("list_id").cast("int") + 1)
         + adc_score_expr("codes", books, query_vec)).alias("_adc"),
    )
    if rerank_factor is not None:
        scored = (
            scored.orderBy(F.desc("_adc"), F.col(id_col))
            .limit(k * rerank_factor)
        )
    cand = (
        idx.select(id_col, vec_col)
        .join(scored.select(id_col), id_col, "left_semi")
    )
    return _cosine_topk_over(cand, id_col, vec_col, query_vec, k)


def embedding_drift(cur: DataFrame, base: DataFrame,
                    vec_col: str = "embedding") -> DataFrame:
    """One-row drift profile between two embedding sets: has the corpus
    MOVED in embedding space since the baseline snapshot?

    Numeric/categorical drift (operators/drift.py) is blind to the
    embedding column; this is its vector complement — the check a
    training-data pipeline runs when the upstream encoder is re-deployed
    or a new source shifts the topic mixture. Columns:

    - ``mean_cosine``: cosine between the two corpora's MEAN vectors
      (1.0 = same direction; re-encoded or re-centered corpora drop it),
    - ``mean_l2_gap``: L2 distance between the mean vectors,
    - ``avg_norm_cur`` / ``avg_norm_base`` and ``norm_shift``
      (relative): scale drift — e.g. an encoder that stopped
      L2-normalizing,
    - ``n_cur`` / ``n_base``: row volumes.

    Scale shape: ONE pass per side — a single select computes the row
    norm (codegen'd ``aggregate`` fold) and ``posexplode``s the vector,
    so the per-dim sums AND the norm sum ride one hash aggregate whose
    map-side partials bound the shuffle to d rows per task (d = vector
    dim, not corpus size). The d-row join + final fold are trivial.
    The per-pos ``sum(norm)``/``count`` are constant across pos (every
    row contributes to every pos), so the final ``max`` re-agg reads
    them without a second corpus scan.
    """
    def _side(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(vec_col)
        norm = F.sqrt(F.aggregate(
            v, F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double")))
        e = df.select(norm.alias("_norm"),
                      F.posexplode(v).alias("pos", "val"))
        return e.groupBy("pos").agg(
            F.sum(F.col("val").cast("double")).alias(f"s_{tag}"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("_norm").alias(f"ns_{tag}"),
        )

    j = _side(cur, "c").join(_side(base, "b"), "pos")
    mc = (F.col("s_c") / F.col("n_c"))
    mb = (F.col("s_b") / F.col("n_b"))
    folded = j.select(
        (mc * mb).alias("_dot"), (mc * mc).alias("_cc"),
        (mb * mb).alias("_bb"),
        ((mc - mb) * (mc - mb)).alias("_gap2"),
        "n_c", "ns_c", "n_b", "ns_b",
    ).agg(
        F.sum("_dot").alias("_dot"), F.sum("_cc").alias("_cc"),
        F.sum("_bb").alias("_bb"), F.sum("_gap2").alias("_gap2"),
        F.max("n_c").alias("n_cur"), F.max("ns_c").alias("_nsc"),
        F.max("n_b").alias("n_base"), F.max("ns_b").alias("_nsb"),
    )
    anc = F.col("_nsc") / F.col("n_cur")
    anb = F.col("_nsb") / F.col("n_base")
    return folded.select(
        F.round(F.col("_dot")
                / (F.sqrt("_cc") * F.sqrt("_bb")), 6).alias("mean_cosine"),
        F.round(F.sqrt("_gap2"), 6).alias("mean_l2_gap"),
        F.round(anc, 6).alias("avg_norm_cur"),
        F.round(anb, 6).alias("avg_norm_base"),
        F.round((anc - anb) / anb, 6).alias("norm_shift"),
        "n_cur", "n_base",
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus row
    whose max cosine to ANY eval-set vector clears ``threshold`` — the
    fuzzy complement of the exact/shingle text decontamination in
    dedup.decontaminate (paraphrased or reformatted eval items share no
    shingles but stay cosine-close). Returns
    ``(id, max_eval_cosine, contaminated)`` for every corpus row;
    filter ``~contaminated`` for the clean set.

    Scale shape: the eval set is bounded by construction (a benchmark
    suite) -> ``broadcast()`` join, cosines scored map-side (codegen'd
    expanded dot when ``dim`` is given), then ONE groupBy on the corpus
    id whose shuffle carries a single (id, cosine) row per corpus row —
    no corpus self-join, one scan. The cosine is quantized to an exact
    INTEGER (``floor(cos * 1e6 + 0.5)``, half-up at 6dp) before the max
    and the threshold compare, and the reported ``max_eval_cosine`` is
    that integer divided back by 1e6 — so the aggregate, the verdict
    and the output are all derived from integer arithmetic and
    bit-portable across engines (the lm/nb/dsir quantization contract;
    a 6dp-rounded DOUBLE could still flip on a last-ulp engine
    difference landing on a rounding boundary).
    """
    cos = (cosine_expanded(F.col("_v"), F.col("_ev"), dim)
           if dim is not None else cosine(F.col("_v"), F.col("_ev")))
    thr_q = int(round(threshold * 1_000_000))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_v"))
    e = eval_df.select(F.col(vec_col).alias("_ev"))
    q = F.max("_cq")
    return (
        c.join(F.broadcast(e))
        .select(F.col(id_col),
                F.floor(cos * 1_000_000 + F.lit(0.5))
                .cast("bigint").alias("_cq"))
        .groupBy(id_col)
        .agg((q / 1_000_000).alias("max_eval_cosine"),
             (q >= F.lit(thr_q)).alias("contaminated"))
    )
