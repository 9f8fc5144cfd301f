"""Deterministic, engine-portable sampling for training-data mixes.

``df.sample()`` is reproducible only per-partitioning: a retry, a
different split plan, or AQE re-coalescing changes which rows land where
and therefore which rows survive. At 10^12 rows a training mix must be
a PURE FUNCTION of the row — so these operators derive a uniform in
[0, 1) from the row's id alone:

    u(id) = uhash(encw(substr(md5(id), 1, 12)), seed) / P

md5 whitens the id (sequential ids stay uncorrelated), the portable
``encw``/``uhash`` arithmetic (hashing.py) reduces it identically in
Spark and DuckDB, so every sample here is oracle-checkable and stable
across retries, partitionings, and engines. All filters are map-side
Column expressions (codegen'd, pushed into the scan where possible);
only :func:`stratified_cap` shuffles (one window on the stratum key).

Reference scope note: the reference validator samples too —
``_prepare_sample_slice`` bounds its interop checks
(/root/reference/mlcast_dataset_validator/checks/tool_compatibility/cartopy.py:21-38);
these operators are the corpus-scale generalization of that idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import MINHASH_COEFFS, P, encw, encw_sql, uhash, uhash_sql


def hash_uniform(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from an id column (any type —
    cast to its canonical string form first)."""
    j = seed % len(MINHASH_COEFFS)
    code = encw(F.substring(F.md5(id_col.cast("string")), 1, 12))
    return uhash(code, j) / F.lit(float(P))


def hash_uniform_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB mirror of :func:`hash_uniform` (same integer arithmetic,
    same final double division)."""
    j = seed % len(MINHASH_COEFFS)
    code = encw_sql(f"substr(md5(({id_expr})::VARCHAR), 1, 12)")
    return f"({uhash_sql(code, j)}::DOUBLE / {P})"


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep each row iff u(id) < fraction — retry-stable, partitioning-
    independent, and identical on any engine that reproduces the
    arithmetic. A map-side filter: no shuffle, no RNG state."""
    return df.where(hash_uniform(F.col(id_col), seed) < fraction)


def deterministic_take(
    df: DataFrame, id_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Exact-k deterministic global sample: the k rows with the smallest
    (u(id), id). Selection is a pure function of the ids — retry-,
    partitioning- and engine-stable — and monotone in k
    (take(k) ⊆ take(k+1)), unlike ``df.limit(k)`` whose rows depend on
    task scheduling. Spark executes orderBy+limit as
    TakeOrderedAndProject: per-partition size-k heaps and a driver merge
    of k x n_partitions candidates — no global sort, no full shuffle."""
    u = hash_uniform(F.col(id_col), seed)
    return df.orderBy(u.asc(), F.col(id_col).asc()).limit(k)


def weighted_take(
    df: DataFrame, id_col: str, weight_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement, inclusion
    probability proportional to ``weight_col`` — Efraimidis–Spirakis in
    its exponential-race form: arrival time ``-ln(u(id)) / w`` is
    Exp(w)-distributed, and the k earliest arrivals are exactly a
    weight-proportional sample without replacement. The noise is the
    deterministic id-derived uniform, so selection is retry-,
    partitioning- and engine-stable (same recipe as
    :func:`dsir_resample`'s Gumbel-top-k: u in (0, 1] keeps ln finite,
    keys round to 9dp before ordering so the selected SET matches in any
    engine reproducing the arithmetic, ties break on the id).

    Rows with NULL or non-positive weight never race (weight 0 must
    have inclusion probability 0; Exp(w<=0) is undefined) — they are
    filtered, documented behavior. Spark executes orderBy+limit as
    TakeOrderedAndProject (per-partition size-k heaps + driver merge),
    so at 10^12 rows this is one scan, no global sort, no shuffle.
    Output: input columns + ``race_key``, the k winners.
    """
    j = (seed + 1) % len(MINHASH_COEFFS)
    code = encw(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12))
    u = (uhash(code, j) + F.lit(1)).cast("double") / F.lit(float(P + 1))
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("race_key", key)
        .orderBy(F.col("race_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_take_sql(
    table: str, id_expr: str, weight_expr: str, k: int, seed: int = 0
) -> str:
    """DuckDB mirror of :func:`weighted_take` built from the same hash
    fragments (single source of truth for the arithmetic)."""
    j = (seed + 1) % len(MINHASH_COEFFS)
    code = encw_sql(f"substr(md5(({id_expr})::VARCHAR), 1, 12)")
    u = f"(({uhash_sql(code, j)} + 1)::DOUBLE / {float(P + 1)!r})"
    return f"""
        SELECT *, round(-ln({u}) / ({weight_expr})::DOUBLE, 9) AS race_key
        FROM {table}
        WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0
        ORDER BY race_key ASC, {id_expr} ASC LIMIT {k}"""


def sample_by_mixture(
    df: DataFrame,
    id_col: str,
    key_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-key sampling rates — the training-mix reweighting primitive
    ("keep 100% of books, 10% of web, 1% of logs"). One map-side CASE
    over the key; unlisted keys get ``default``."""
    rate = None
    for k, f_ in fractions.items():
        cond = F.col(key_col) == k
        rate = (F.when(cond, F.lit(float(f_))) if rate is None
                else rate.when(cond, F.lit(float(f_))))
    rate = rate.otherwise(F.lit(float(default))) if rate is not None \
        else F.lit(float(default))
    return df.where(hash_uniform(F.col(id_col), seed) < rate)


def solve_mixture(
    available: dict[str, float],
    targets: dict[str, float],
    budget: float | None = None,
) -> tuple[dict[str, float], float]:
    """Compute per-group downsampling rates that realize a target
    mixture. ``available[g]`` is the group's total weight (rows or
    tokens); ``targets[g]`` its desired share of the output (normalized
    internally). Returns ``(rates, realized_budget)``.

    With no ``budget``, the realized budget is the LARGEST output for
    which the exact mixture is achievable by downsampling alone:
    ``min_g available[g] / p_g`` — the scarcest group relative to its
    target share binds the whole mix (you cannot downsample your way to
    more of something). With an explicit ``budget`` larger than that,
    rates cap at 1.0 and the realized mixture deviates — the binding
    groups ship whole, the detail reports what was actually achievable
    (use :func:`upsample_mixture` on the capped groups if repetition is
    acceptable).

    Driver-side arithmetic over one row PER GROUP (the caller feeds it
    a groupBy aggregate — aggregate-sized at any corpus volume); apply
    the rates with :func:`sample_by_mixture`, which is a map-side CASE
    filter. Rates are exact in expectation; realized counts fluctuate
    by the binomial — at training-corpus group sizes the relative error
    is O(1/sqrt(n_g)).
    """
    if not targets:
        raise ValueError("solve_mixture needs at least one target share")
    missing = {g for g in targets if g not in available}
    if missing:
        raise ValueError(f"target groups absent from input: "
                         f"{sorted(missing)}")
    bad = {g: p for g, p in targets.items() if p <= 0}
    if bad:
        raise ValueError(f"target shares must be positive: {bad}")
    tot = float(sum(targets.values()))
    p = {g: t / tot for g, t in targets.items()}
    max_budget = min(available[g] / p[g] for g in p)
    realized = max_budget if budget is None else float(budget)
    rates = {g: min(1.0, realized * p[g] / available[g]) for g in p}
    return rates, realized


def mixture_plan(
    df: DataFrame,
    key_col: str,
    targets: dict[str, float],
    weight_col: str | None = None,
    budget: float | None = None,
) -> tuple[dict[str, float], float]:
    """DataFrame front-end of :func:`solve_mixture`: one aggregate job
    computes per-group availability (row counts, or ``sum(weight_col)``
    for token budgets), then the driver solves the rates. Feed the
    result to :func:`sample_by_mixture` (same ``key_col``)."""
    w = F.count(F.lit(1)).cast("double") if weight_col is None \
        else F.sum(F.col(weight_col).cast("double"))
    rows = (df.where(F.col(key_col).isin(list(targets)))
            .groupBy(key_col).agg(w.alias("_avail")).collect())
    available = {r[key_col]: float(r["_avail"]) for r in rows}
    for g in targets:
        available.setdefault(g, 0.0)
    empty = [g for g, a in available.items() if g in targets and a <= 0]
    if empty:
        raise ValueError(f"target groups have no weight in the input: "
                         f"{sorted(empty)}")
    return solve_mixture(available, targets, budget)


def upsample_mixture(
    df: DataFrame,
    id_col: str,
    key_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    seed: int = 0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Full mixture weighting — weights may EXCEED 1 ("books x2.5"):
    every row is emitted ``floor(w)`` times plus one more with
    probability ``frac(w)`` via the deterministic uniform, each copy
    tagged with ``copy_col`` (0-based) so downstream shuffles/dedup can
    distinguish epochs. ``w <= 1`` degrades to plain
    :func:`sample_by_mixture` semantics (0 or 1 copies). Map-side
    ``explode`` of a per-row integer range — no shuffle, retry-stable.
    """
    w = None
    for k, wt in weights.items():
        cond = F.col(key_col) == k
        w = (F.when(cond, F.lit(float(wt))) if w is None
             else w.when(cond, F.lit(float(wt))))
    w = w.otherwise(F.lit(float(default))) if w is not None \
        else F.lit(float(default))
    base = F.floor(w).cast("int")
    extra = F.when(hash_uniform(F.col(id_col), seed) < (w - F.floor(w)),
                   F.lit(1)).otherwise(F.lit(0))
    n_copies = base + extra
    # guard the empty case explicitly: Spark's sequence(0, -1) produces a
    # DESCENDING [0, -1], not an empty array — explode of the empty array
    # is what drops zero-copy rows
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def shuffle_into_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard_id",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE for training-data ordering: assign
    every row a pseudo-random shard in [0, n_shards) and a contiguous
    1-based position within that shard. Writing the result partitioned
    by ``shard_col`` and sorted by ``pos_col`` yields a globally
    shuffled corpus whose order is a pure function of the ids — stable
    across retries, partitionings, and engines (the exact failure mode
    of ``df.orderBy(rand())``, whose RNG is seeded per-partition).

    Arithmetic is integer-only (no float portability caveats): the
    md5-whitened id code is universal-hashed twice with independent
    coefficients — ``h1 mod n_shards`` picks the shard, ``h2`` (ties by
    id) orders rows inside it. One shuffle: the window on ``shard_col``.
    At 10^12 rows pick ``n_shards`` so a shard is ~10^6 rows (file-sized);
    the per-shard sorts then parallelize across the cluster and each
    shard maps 1:1 to an output file.
    """
    j1 = seed % len(MINHASH_COEFFS)
    j2 = (seed + 1) % len(MINHASH_COEFFS)
    code = encw(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12))
    out = (
        df.withColumn(shard_col,
                      F.pmod(uhash(code, j1), F.lit(n_shards)).cast("int"))
        .withColumn("_okey", uhash(code, j2))
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_okey").asc(), F.col(id_col).asc())
    return out.withColumn(pos_col, F.row_number().over(w).cast("long")) \
              .drop("_okey")


def shuffle_into_shards_sql(
    id_expr: str, n_shards: int, seed: int = 0,
    shard_col: str = "shard_id", pos_col: str = "shard_pos",
) -> tuple[str, str, str]:
    """DuckDB mirror of :func:`shuffle_into_shards`: returns the
    (shard expression, order-key expression, row_number-over clause)
    fragments sharing its exact integer arithmetic."""
    j1 = seed % len(MINHASH_COEFFS)
    j2 = (seed + 1) % len(MINHASH_COEFFS)
    code = encw_sql(f"substr(md5(({id_expr})::VARCHAR), 1, 12)")
    shard = f"({uhash_sql(code, j1)} % {n_shards})::INT"
    okey = uhash_sql(code, j2)
    rn = (f"row_number() OVER (PARTITION BY {shard_col} "
          f"ORDER BY _okey ASC, {id_expr} ASC)::BIGINT")
    return shard, okey, rn


def stratified_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
    hot_threshold: int | None = None,
    oversample: float = 8.0,
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen deterministically: rank by
    (u(id), id) within each key and keep rank <= k.

    Default form: one shuffle on the stratum key. A heavily skewed
    stratum concentrates its sort in one task — pass ``hot_threshold``
    (rows) to enable the exact two-step for strata above it:

    1. one cheap ``groupBy(key).count()`` (map-side partial agg; output
       is one row per stratum, tiny),
    2. strata with ``n_s > hot_threshold`` get a broadcast per-stratum
       pre-filter ``u(id) < t_s`` with ``t_s = min(1, oversample*k/n_s)``
       — a MAP-SIDE filter that bounds the windowed volume to ~
       ``oversample*k`` rows per hot stratum before the shuffle,
    3. the same (u, id) window over the pre-filtered rows.

    Exactness: the k smallest (u, id) rows of a stratum all satisfy
    ``u < t_s`` iff at least ``min(k, n_s)`` rows do, so survivors per
    hot stratum are counted with one SORT-FREE aggregate over the
    pre-filtered hot rows (map-side partial agg; the windowed rank is
    never executed twice) and any stratum that fell short — probability
    ~exp(-k*oversample/4) per stratum, negligible at oversample=8 —
    is recomputed with the plain window and unioned back. NULL keys form
    their own stratum and always take the plain-window path (a broadcast
    join cannot match NULL), including when short strata are excluded.
    Output is therefore IDENTICAL to the single-window form for every
    input, and the recompute branch is driver-observable (one tiny
    collect of the short keys, expected empty)."""
    u = hash_uniform(F.col(id_col), seed)
    w = Window.partitionBy(key_col).orderBy(u.asc(), F.col(id_col).asc())
    out_cols = df.columns

    def plain(d: DataFrame) -> DataFrame:
        return (
            d.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .select(*out_cols)
        )

    if hot_threshold is None:
        return plain(df)

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n_s"))
    hot = counts.where(F.col("_n_s") > F.lit(int(hot_threshold))).select(
        key_col,
        F.col("_n_s"),
        F.least(
            F.lit(1.0),
            F.lit(float(oversample) * k) / F.col("_n_s").cast("double"),
        ).alias("_t_s"),
    )
    joined = df.join(F.broadcast(hot), on=key_col, how="left")
    pre = joined.where(F.col("_t_s").isNull() | (u < F.col("_t_s")))
    # short stratum = pre-filter applied AND fewer survivors than the
    # exact answer needs; expected empty, detected with one SORT-FREE
    # map-side-partial aggregate over just the pre-filtered hot rows
    # (the windowed rank job itself runs only once, on the caller's
    # action — detection must not pay the sort twice)
    short_keys = [
        r[0]
        for r in pre.where(F.col("_t_s").isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_m_s"), F.first("_n_s").alias("_n"))
        .where(F.col("_m_s") < F.least(F.lit(k), F.col("_n")))
        .select(key_col)
        .collect()
    ]
    capped = (
        pre.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(*out_cols)
    )
    if not short_keys:
        return capped
    # NULL keys form their own stratum (never hot: the broadcast join
    # can't match NULL, so they always take the plain-window path) —
    # keep them when excluding the short strata: NOT IN is NULL for NULL
    keep = F.col(key_col).isNull() | ~F.col(key_col).isin(short_keys)
    redo = plain(df.where(F.col(key_col).isin(short_keys)))
    return capped.where(keep).unionByName(redo)


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling", arXiv:2302.03169): select
# corpus documents whose hashed bag-of-words distribution looks like a
# TARGET slice, by importance weights between two bucketed unigram models.
# ---------------------------------------------------------------------------

#: plan-size guard: the per-bucket log-ratio table is embedded as an array
#: literal in the scoring expression (broadcast with the plan). B is a MODEL
#: hyperparameter (DSIR uses ~10^4), not a function of data size, so the
#: literal stays bounded at any corpus scale.
DSIR_MAX_BUCKETS = 65_536

#: log-ratio quantization: weights are CAST(FLOOR(lr * 1e6 + 0.5) AS BIGINT)
#: so per-document summation is integer — order-independent and bit-identical
#: across engines (double summation order differs between Spark and DuckDB).
DSIR_QUANT = 1_000_000


def dsir_tokens(text: Column) -> Column:
    """Whitespace word tokens, empties dropped, NULL text -> []."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), " "),
                    lambda t: t != "")


def dsir_tokens_sql(text_expr: str) -> str:
    return (f"list_filter(string_split(coalesce({text_expr}, ''), ' '), "
            f"t -> t <> '')")


def dsir_bucket(tok: Column, n_buckets: int, seed: int = 0) -> Column:
    """Hash a token into [0, n_buckets) with the engine-portable
    encw/uhash arithmetic (hashing.py) — the oracle reproduces it
    exactly, unlike Spark-private xxhash64."""
    j = seed % len(MINHASH_COEFFS)
    return F.pmod(uhash(encw(tok), j), F.lit(int(n_buckets)))


def dsir_bucket_sql(tok_expr: str, n_buckets: int, seed: int = 0) -> str:
    j = seed % len(MINHASH_COEFFS)
    return f"({uhash_sql(encw_sql(tok_expr), j)} % {int(n_buckets)})"


def dsir_log_ratios(
    df: DataFrame,
    text_col: str,
    target_cond: Column,
    n_buckets: int = 1024,
    seed: int = 0,
) -> list[int]:
    """Per-bucket quantized log importance ratios
    ``floor(1e6 * ln(p_target(b) / p_raw(b)) + 0.5)`` under add-one
    smoothing, as a dense length-``n_buckets`` list.

    One distributed pass: explode tokens -> groupBy bucket (map-side
    partial agg; output is <= n_buckets rows) -> bounded driver collect.
    The ln itself runs driver-side in CPython, which shares libm with
    the DuckDB oracle; quantization makes the per-document sums exact
    integers thereafter.
    """
    if n_buckets > DSIR_MAX_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} exceeds DSIR_MAX_BUCKETS="
            f"{DSIR_MAX_BUCKETS}; the log-ratio table is a plan literal")
    import math

    ex = df.select(
        F.explode(dsir_tokens(F.col(text_col))).alias("_t"),
        F.coalesce(target_cond.cast("long"), F.lit(0)).alias("_is_t"),
    )
    rows = (
        ex.groupBy(dsir_bucket(F.col("_t"), n_buckets, seed).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n_raw"), F.sum("_is_t").alias("_n_tgt"))
        .collect()
    )
    n_raw = [0] * n_buckets
    n_tgt = [0] * n_buckets
    for r in rows:
        n_raw[r["_b"]] = r["_n_raw"]
        n_tgt[r["_b"]] = r["_n_tgt"]
    tot_raw, tot_tgt = sum(n_raw), sum(n_tgt)
    out = []
    for b in range(n_buckets):
        p_t = (n_tgt[b] + 1.0) / (tot_tgt + n_buckets)
        p_r = (n_raw[b] + 1.0) / (tot_raw + n_buckets)
        out.append(int(math.floor(math.log(p_t / p_r) * DSIR_QUANT + 0.5)))
    return out


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_cond: Column,
    n_buckets: int = 1024,
    seed: int = 0,
    log_ratios: list[int] | None = None,
    weight_col: str = "weight_q",
) -> DataFrame:
    """Quantized per-document DSIR importance weight: the sum of the
    bucket log-ratios of the document's tokens (an exact BIGINT).

    Scoring is a ZERO-SHUFFLE map-side expression — ``aggregate`` over
    the token array with the log-ratio table as an array literal
    (plan-broadcast, bounded by DSIR_MAX_BUCKETS) — so at 10^12 rows the
    only distributed cost beyond the scan is the one bounded
    bucket-distribution agg inside :func:`dsir_log_ratios` (skippable by
    passing a precomputed/persisted ``log_ratios``).
    """
    if log_ratios is None:
        log_ratios = dsir_log_ratios(df, text_col, target_cond,
                                     n_buckets, seed)
    if len(log_ratios) != n_buckets:
        raise ValueError("log_ratios length must equal n_buckets")
    lr = F.lit(log_ratios)
    w = F.aggregate(
        dsir_tokens(F.col(text_col)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(
            lr, (dsir_bucket(t, n_buckets, seed) + 1).cast("int")),
    )
    return df.withColumn(weight_col, w)


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_cond: Column,
    k: int,
    n_buckets: int = 1024,
    temperature: float = 1.0,
    seed: int = 0,
    log_ratios: list[int] | None = None,
) -> DataFrame:
    """DSIR's sampling-without-replacement step: the Gumbel-top-k trick
    — key = weight/temperature + Gumbel(u(id)) with the deterministic
    id-derived uniform, take the k largest keys. Equivalent to sampling
    k documents without replacement with probability proportional to
    ``exp(weight/temperature)``, but retry-/partitioning-/engine-stable
    because the noise is a pure function of the id.

    Keys are rounded to 6dp before ordering (ties then break on the id)
    so the selected SET is identical in any engine reproducing the
    arithmetic; Spark executes orderBy+limit as TakeOrderedAndProject —
    per-partition size-k heaps + a driver merge, no global sort.
    Output: input columns + ``weight_q`` + ``dsir_key``, the k winners.
    """
    scored = dsir_weights(df, id_col, text_col, target_cond,
                          n_buckets, seed, log_ratios)
    j = (seed + 1) % len(MINHASH_COEFFS)
    code = encw(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12))
    # u in (0, 1]: +1 keeps ln(u) finite at the low end; u == 1 gives
    # gumbel = +inf consistently in both engines
    u = (uhash(code, j) + F.lit(1)).cast("double") / F.lit(float(P + 1))
    gumbel = -F.log(-F.log(u))
    key = F.round(
        F.col("weight_q").cast("double") / F.lit(float(DSIR_QUANT))
        / F.lit(float(temperature)) + gumbel, 6)
    return (
        scored.withColumn("dsir_key", key)
        .orderBy(F.col("dsir_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    target_sql: str,
    n_buckets: int = 1024,
    temperature: float = 1.0,
    seed: int = 0,
    k: int | None = None,
) -> str:
    """DuckDB mirror of :func:`dsir_weights` / :func:`dsir_resample`
    built from the same hash fragments (single source of truth): the
    full WITH-chain recomputes the bucket distributions, smoothed
    quantized log-ratios, integer per-document weights, and — when ``k``
    is given — the rounded Gumbel-top-k selection."""
    toks = dsir_tokens_sql(text_expr)
    b = dsir_bucket_sql("_t", n_buckets, seed)
    j = (seed + 1) % len(MINHASH_COEFFS)
    base = f"""
WITH tok AS (
  SELECT {id_expr} AS _id, unnest({toks}) AS _t,
         CASE WHEN {target_sql} THEN 1 ELSE 0 END AS _is_t
  FROM {table}),
bt AS (SELECT _id, {b} AS _b, _is_t FROM tok),
dist AS (SELECT _b, count(*)::BIGINT AS n_raw, sum(_is_t)::BIGINT AS n_tgt
         FROM bt GROUP BY _b),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM dist),
lr AS (SELECT _b,
              CAST(FLOOR(ln(((n_tgt + 1.0) / (t_tgt + {n_buckets})) /
                            ((n_raw + 1.0) / (t_raw + {n_buckets})))
                         * {DSIR_QUANT} + 0.5) AS BIGINT) AS _lr
       FROM dist, tot),
sums AS (SELECT bt._id, SUM(lr._lr)::BIGINT AS weight_q
         FROM bt JOIN lr USING (_b) GROUP BY bt._id),
w AS (SELECT {id_expr} AS doc_id, COALESCE(s.weight_q, 0) AS weight_q
      FROM {table} d LEFT JOIN sums s ON s._id = {id_expr})"""
    if k is None:
        return base + "\nSELECT doc_id, weight_q FROM w"
    # the Gumbel uniform depends only on the id, which w carries as doc_id
    code_w = encw_sql("substr(md5((doc_id)::VARCHAR), 1, 12)")
    u_w = f"(({uhash_sql(code_w, j)} + 1)::DOUBLE / {P + 1})"
    key = (f"ROUND(weight_q::DOUBLE / {DSIR_QUANT} / {float(temperature)}"
           f" + -ln(-ln({u_w})), 6)")
    return base + f"""
SELECT doc_id, weight_q, {key} AS dsir_key FROM w
ORDER BY dsir_key DESC, doc_id ASC LIMIT {k}"""
