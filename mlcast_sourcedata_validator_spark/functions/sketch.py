"""Misra-Gries heavy hitters: bounded-state frequent-item discovery with
an exact verify stage.

:func:`vocab_topk` (text.py) and :func:`skew_profile` (skew.py) both find
frequent keys through ONE full hash aggregation over every distinct key.
That is the right plan while the distinct-key space fits executor hash
tables; at 10^12 turns with 10^9+ distinct tokens / conv_ids the phase-1
hash table itself becomes the cost (build + spill per partition). This
module is the bounded-state alternative — the same relationship
``cardinality_sketch`` (HLL) has to ``COUNT(DISTINCT)``:

  pass 1  per-partition Misra-Gries summaries over Arrow batches
          (``mapInPandas``, state hard-capped at ``capacity`` counters
          per partition, never a key-space-sized hash table);
  pass 2  EXACT recount restricted to the candidate union via a
          broadcast join, then top-k by orderBy+limit =
          TakeOrderedAndProject (per-partition heaps, no global sort).

Guarantee (mergeable-summaries form: Agarwal et al., "Mergeable
Summaries", PODS'12; Misra & Gries 1982): a Misra-Gries summary with
``capacity`` counters under-counts any item by at most
``N_p/(capacity+1)``, and the bound survives the per-batch merge used
here, so every key with global count > N/(capacity+1) survives in at
least one partition summary (pigeonhole over partitions: if
freq_p <= N_p/(capacity+1) for every p then freq <= N/(capacity+1)).
The candidate union is therefore a SUPERSET of all such keys, the
recount is exact on it, and the returned top-k is provably the true
top-k whenever the k-th recounted frequency exceeds N/(capacity+1) —
which :func:`heavy_hitters` checks from its own driver-tiny outputs and
refuses to silently pass when the data defeated the sketch: the
loud-failure convention of ``DEFAULT_MAX_BUCKET`` /
``hot_shingle_action='fail'`` (dedup.py).

Reference analog: the reference has no sketch machinery — its closest
behavior is full-pass frequency inspection inside
``analyze_dataset_timesteps`` (/root/reference/mlcast_dataset_validator/
checks/dataset_content/timesteps.py), which holds the whole value-counts
mapping at once; this module is what that becomes when the key space no
longer fits anywhere.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_shrink(counts: Counter, capacity: int) -> None:
    """In-place Misra-Gries decrement: keep at most ``capacity``
    counters by subtracting the (capacity+1)-th largest count from all
    and dropping the non-positive ones. (Under ties this can drop below
    ``capacity`` — legal, the bound only tightens.)"""
    if len(counts) <= capacity:
        return
    dec = sorted(counts.values(), reverse=True)[capacity]
    for key in [k for k, v in counts.items() if v <= dec]:
        del counts[key]
    for key in counts:
        counts[key] -= dec


def mg_candidates(
    keys: DataFrame,
    key_col: str = "key",
    capacity: int = 4096,
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``keys[key_col]`` (string).

    Output (``key_col``, est, shrunk): at most ``capacity`` candidate
    rows per input partition — ``est`` is the residual MG counter, a
    lower bound on the partition-local frequency, useful only for
    pruning — plus ONE sentinel row per non-empty partition
    (``key_col`` NULL, ``est`` = the partition's row count, ``shrunk`` =
    whether any decrement step ran there). The sentinels let a caller
    recover N and the did-the-sketch-saturate bit from the same single
    scan; :func:`heavy_hitters` consumes them.

    State per task is O(capacity) regardless of the distinct-key count;
    each Arrow batch is counted vectorized (pandas ``value_counts``) and
    merged with one decrement step, so per-batch Python cost is a dict
    update over the batch's distinct keys, not its rows.
    """
    out_schema = f"{key_col} string, est long, shrunk boolean"

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n_rows = 0
        shrunk = False
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf[key_col].value_counts()
            counts.update(dict(zip(vc.index, vc.to_numpy())))
            if len(counts) > capacity:
                shrunk = True
                _mg_shrink(counts, capacity)
        if n_rows:
            ks = list(counts.keys())
            yield pd.DataFrame(
                {key_col: ks + [None],
                 "est": [int(v) for v in counts.values()] + [n_rows],
                 "shrunk": [shrunk] * (len(ks) + 1)}
            )

    # NULL keys are excluded here AND by pass 2's inner join (null join
    # keys never match), so N and the recount agree; callers wanting
    # null-frequency use a plain agg — nulls are never "hitters"
    return (
        keys.select(key_col)
        .where(F.col(key_col).isNotNull())
        .mapInPandas(_summarize, schema=out_schema)
    )


def heavy_hitters(
    keys: DataFrame,
    key_col: str = "key",
    k: int = 20,
    capacity: int = 4096,
    on_inconclusive: str = "fail",
) -> DataFrame:
    """Exact global top-``k`` most frequent keys, computed without ever
    building a distinct-key-sized hash table: exactly TWO scans of
    ``keys``, O(partitions x capacity) intermediate state.

    Job 1 is :func:`mg_candidates` (persisted — it is bounded, not
    data-sized); job 2 recounts ONLY the candidates via a broadcast
    inner join on a fresh scan, then takes the top-k ordered
    (n DESC, key ASC) so the result set is deterministic under ties.

    Exactness: every returned count is exact (it came from the recount);
    the returned SET is the true top-k when either (a) no partition's
    sketch ever saturated — then the candidates are ALL distinct keys —
    or (b) the k-th recounted frequency > N/(capacity+1), so no
    non-candidate key can reach it. Both bits come from driver-tiny data
    (k rows + one aggregate over the sentinels).
    ``on_inconclusive='fail'`` (default) raises with a sufficient
    capacity; ``'warn_column'`` returns the rows with a boolean
    ``guaranteed`` column instead so pipelines can quarantine.

    When the guarantee holds the result is identical to the one-pass
    ``GROUP BY / ORDER BY n DESC, key / LIMIT k`` — which is exactly the
    DuckDB oracle (:func:`heavy_hitters_sql`).
    """
    if on_inconclusive not in ("fail", "warn_column"):
        raise ValueError(f"on_inconclusive={on_inconclusive!r}")
    spark = keys.sparkSession
    summ = mg_candidates(keys, key_col, capacity).persist()
    try:
        meta = (
            summ.where(F.col(key_col).isNull())
            .agg(F.sum("est").alias("n_total"),
                 F.max("shrunk").alias("any_shrunk"))
            .first()
        )
        n_total = int(meta["n_total"] or 0)
        any_shrunk = bool(meta["any_shrunk"])
        cand = (
            summ.where(F.col(key_col).isNotNull())
            .select(key_col).distinct()
        )
        top = (
            keys.join(F.broadcast(cand), key_col, "inner")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(key_col))
            .limit(k)
        )
        rows = top.collect()
    finally:
        summ.unpersist()
    kth = rows[-1]["n"] if len(rows) >= k else 0
    threshold = n_total / (capacity + 1)
    guaranteed = (not any_shrunk) or (len(rows) >= k and kth > threshold)
    if not guaranteed and on_inconclusive == "fail":
        needed = int(n_total // max(kth, 1)) + 1
        raise ValueError(
            f"heavy_hitters inconclusive: k-th frequency {kth} <= "
            f"N/(capacity+1) = {threshold:.1f} with saturated sketches; "
            f"a non-candidate key could tie into the top-{k}. Re-run "
            f"with capacity >= {needed}."
        )
    out = spark.createDataFrame(rows, schema=top.schema)
    if on_inconclusive == "warn_column":
        out = out.withColumn("guaranteed", F.lit(bool(guaranteed)))
    return out


def token_keys(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens of ``text_col`` as a one-column (key) frame —
    the :func:`heavy_hitters` input for corpus vocabulary, matching
    ``vocab_topk``'s tokenization exactly (split on single spaces,
    empty tokens dropped)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("key"))
        .where(F.length("key") > 0)
    )


def heavy_hitters_sql(table: str, key_sql: str, k: int = 20,
                      where: str = "") -> str:
    """DuckDB oracle: the exact one-pass top-k that ``heavy_hitters``
    equals whenever its guarantee holds (which its default mode
    enforces). ``where`` filters the inner key stream, e.g.
    ``"WHERE length(key) > 0"``."""
    return f"""
        SELECT key, count(*)::BIGINT AS n
        FROM (SELECT {key_sql} AS key FROM {table}) keys
        {where}
        GROUP BY key ORDER BY n DESC, key ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable point-frequency estimates.
# ---------------------------------------------------------------------------
#
# Misra-Gries (above) answers "which keys are frequent"; Count-Min
# (Cormode & Muthukrishnan 2005, "An improved data stream summary: the
# count-min sketch and its applications", J. Algorithms 55) answers
# "how frequent is THIS key" for arbitrary probe keys from O(depth x
# width) state: cell[r][h_r(key)] += 1 per row, estimate = min over
# rows. Guarantees: est >= true always (counters only over-count), and
# est <= true + (e/width) * N with probability >= 1 - (1/e)^depth.
# Cell-wise addition makes two sketches of disjoint data merge exactly
# (the mergeable-summaries property the rollup store relies on), so the
# sketch can be maintained incrementally per partition and summed.
#
# Hashes are the repo's portable kernels (hashing.py: md5 prefix ->
# encw -> uhash_j mod width), so the DuckDB mirror computes the
# IDENTICAL sketch and the oracle compare is exact — counts are integer
# sums, no float anywhere.


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-Min sketch of ``df[key_col]`` as a (row, col, cnt) cell
    table — at most ``depth x width`` rows whatever the input size.

    One explode(depth) + groupBy(row, col): map-side partial
    aggregation caps every partition's shuffle output at depth x width
    cells, so network is O(partitions x depth x width), independent of
    both row count and distinct-key count. NULL keys are skipped (the
    null-rate check's business, as with MG)."""
    from .hashing import MINHASH_COEFFS, uhash

    if not (1 <= depth <= len(MINHASH_COEFFS)):
        raise ValueError(f"depth must be in [1, {len(MINHASH_COEFFS)}], "
                         f"got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    code = encw_cm(F.col(key_col))
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(uhash(code, r), F.lit(width)).cast("int").alias("col"),
        )
        for r in range(depth)
    ])
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(cells).alias("_rc"))
        .groupBy(F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def encw_cm(key: Column) -> Column:
    """Portable int64 code of an arbitrary key: md5 prefix through
    ``encw`` — the exact kernel :func:`sampling.hash_uniform` uses, so
    one audited cross-engine hash family serves every sketch."""
    from .hashing import encw

    return encw(F.substring(F.md5(key.cast("string")), 1, 12))


def encw_cm_sql(key_expr: str) -> str:
    from .hashing import encw_sql

    return encw_sql(f"substr(md5(({key_expr})::VARCHAR), 1, 12)")


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the SAME depth/width —
    exactly the sketch of the concatenated inputs (counter addition
    commutes with the shared hash functions)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the
    ``depth`` cells each probe hashes to. Returns (``key_col``, est).

    The sketch is depth x width rows — broadcast, so probing is
    shuffle-free on the probe side except the final per-key min agg
    (bounded by the probe count). A missing cell means no key ever
    hashed there: COALESCE to 0, which keeps est >= true intact."""
    from .hashing import MINHASH_COEFFS, uhash

    code = encw_cm(F.col(key_col))
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(uhash(code, r), F.lit(width)).cast("int").alias("col"),
        )
        for r in range(depth)
    ])
    pairs = probes.select(F.col(key_col), F.explode(cells).alias("_rc")) \
        .select(key_col, F.col("_rc.row").alias("row"),
                F.col("_rc.col").alias("col"))
    j = pairs.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        j.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cm_sketch_sql(
    table: str, key_sql: str, depth: int = 4, width: int = 2048
) -> str:
    """DuckDB mirror of :func:`cm_sketch` over ``key_sql`` drawn from
    ``table`` — identical hash arithmetic, identical cells."""
    from .hashing import uhash_sql

    arms = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, ({uhash_sql('code', r)}) % {width} AS col "
        f"FROM codes"
        for r in range(depth)
    )
    return f"""
        WITH codes AS (
          SELECT {encw_cm_sql(key_sql)} AS code
          FROM {table} WHERE ({key_sql}) IS NOT NULL),
        cells AS ({arms})
        SELECT row, col, count(*)::BIGINT AS cnt
        FROM cells GROUP BY row, col"""


def cm_freq_sql(
    table: str, key_sql: str, depth: int = 4, width: int = 2048
) -> str:
    """DuckDB mirror of the full sketch-then-probe-every-key pipeline
    (the oracle for ``cm_freq_events``): build the sketch, estimate
    every distinct key, join the exact counts. Returns
    (key, n_exact, n_est, overcount); Count-Min guarantees
    overcount >= 0, and the compare is exact because the sketch is."""
    from .hashing import uhash_sql

    probe_arms = "\nUNION ALL\n".join(
        f"SELECT key, {r} AS row, ({uhash_sql('code', r)}) % {width} AS col "
        f"FROM pcodes"
        for r in range(depth)
    )
    return f"""
        WITH sketch AS ({cm_sketch_sql(table, key_sql, depth, width)}),
        pcodes AS (
          SELECT key, {encw_cm_sql('key')} AS code
          FROM (SELECT DISTINCT {key_sql} AS key FROM {table}
                WHERE ({key_sql}) IS NOT NULL)),
        pcells AS ({probe_arms}),
        est AS (
          SELECT p.key, MIN(COALESCE(s.cnt, 0))::BIGINT AS n_est
          FROM pcells p LEFT JOIN sketch s USING (row, col)
          GROUP BY p.key),
        exact AS (
          SELECT {key_sql} AS key, count(*)::BIGINT AS n_exact
          FROM {table} WHERE ({key_sql}) IS NOT NULL GROUP BY 1)
        SELECT est.key, exact.n_exact, est.n_est,
               (est.n_est - exact.n_exact)::BIGINT AS overcount
        FROM est JOIN exact USING (key)"""
