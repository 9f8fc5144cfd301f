"""Distributed BPE vocabulary induction (Sennrich et al. 2016,
arXiv:1508.07909 — public paper): learn byte-pair-encoding merges from a
corpus and segment documents with the learned vocabulary — the
tokenizer-*training* half of the pipeline that ``text.bpe_ish_token_count``
(a fixed heuristic) and ``packing.count_tokens`` (a pluggable external
tokenizer) do not cover.

Algorithm (the classic word-frequency formulation):

1. **Word-frequency table** — one shuffle: explode whitespace words,
   ``groupBy(word).count()``. Everything after operates on this table,
   which is bounded by the VOCABULARY (Heaps' law: ~10^6-10^7 distinct
   words at 100 TB), not the corpus — the published trick that makes
   BPE training tractable, and here the thing that makes it
   cluster-friendly: per-merge cost is O(vocab), independent of corpus
   size.
2. **Merge loop** — per round, one bounded aggregation job: explode
   adjacent symbol pairs weighted by word frequency, ``groupBy(pair)``
   (map-side partials; output <= distinct pairs), take the top pairs
   under the deterministic tie-break (count DESC, left ASC, right ASC),
   then rewrite every word's symbol sequence MAP-SIDE with the classic
   leftmost-first non-overlapping pair merge (``'a a a a a'`` with merge
   ``(a,a)`` -> ``aa aa a``). The rewrite is a codegen'd string fold
   (``F.aggregate`` over the symbol string with a
   ``chr(1)``-accumulator). To cut driver-loop latency, each round
   selects a BATCH of merges — the maximal rank-prefix of the pair
   ranking that is pairwise symbol-disjoint and strictly above the
   first excluded pair's count — which is provably identical to running
   the merges one at a time (see :func:`bpe_learn`), so one aggregation
   job buys up to ``batch`` merges.
3. **Segmentation** — two shapes:
   - :func:`bpe_tokenize`: segment the TRAINING corpus via a broadcast
     lookup join against the final word->symbols table the merge loop
     already produced (zero re-derivation — the standard trick);
   - :func:`bpe_segment_expr`: segment NEW text with the learned merge
     list as plan literals (one fold per merge — bounded by
     ``BPE_MAX_EXPR_MERGES`` to keep the expression tree sane; plug a
     real tokenizer via packing.count_tokens beyond that).

Exactness: symbols are strings, counts are integers, and the tie-break
is total, so every stage is bit-portable; :func:`bpe_learn_sql` /
:func:`bpe_tokenize_sql` mechanically generate the same computation as
``n_merges`` chained DuckDB CTE stages (``list_reduce`` mirrors the
Spark fold — parity pinned by a three-way hypothesis property test:
Spark == pure-Python == DuckDB), giving the full learning loop an exact
cross-engine oracle.

Cross-engine text semantics (pinned EXPLICITLY because the engines'
regex defaults differ — Java's ``\\s`` includes vertical tab, RE2's
does not; Java's ``.`` skips the line terminators U+0085/U+2028/U+2029,
RE2's skips only ``\\n`` — divergences a fuzzed corpus WILL hit):

- **words** are maximal runs not containing the six ASCII whitespace
  chars ``[ \\t\\n\\x0B\\f\\r]`` (:data:`WORD_SEP_RE`, the same literal
  class compiled by both engines); empty tokens are filtered, so
  leading/trailing separators and un-trimmed exotic whitespace cannot
  manufacture empty words. Unicode whitespace (NBSP, U+2028, ...) is
  word-internal BY CONTRACT — it becomes ordinary symbols.
- **initial symbols** are single code points, split with an explicit
  DOTALL ``(?s)(.)`` so EVERY code point (including line separators)
  splits identically in Java, RE2, and Python ``list(word)``.
- ``chr(1)`` is reserved as the symbol separator and scrubbed from
  input on both sides.

Durability: pass ``checkpoint_dir`` (job-private shared storage) and the
word table + merge list are committed as parquet every
``checkpoint_every`` merges — the same commit/resume pattern as
``dedup.connected_components`` — so an executor loss mid-learn recomputes
at most one commit window and a re-run with the same dir RESUMES.
Without it, ``localCheckpoint`` keeps lineage bounded (executor-pinned —
fine locally, not the 100-TB posture).

Reference analog: the reference has no trainable operators — its
closest is the fixed-vocabulary membership rule family
(/root/reference/mlcast_dataset_validator/checks/data_vars/naming.py:45-158);
vocabulary induction is the corpus-scale training-data primitive the
pipeline brief calls for.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import Column, DataFrame, functions as F

#: symbol separator inside the fold accumulator / vocab table (scrubbed
#: from input text)
SYM_SEP = "\x01"

#: the word-separator class — an EXPLICIT ASCII whitespace set written
#: as escapes so Java regex, RE2 (DuckDB) and Python ``re`` all compile
#: the identical class (their ``\\s`` defaults differ: Java includes
#: ``\\x0B``, RE2 does not)
WORD_SEP_RE = "[ \\t\\n\\x0B\\f\\r]+"

#: cap on merges applied as literal fold expressions by
#: :func:`bpe_segment_expr` — beyond this the expression tree (one HOF
#: fold per merge) stops being a reasonable plan
BPE_MAX_EXPR_MERGES = 64

#: default max merges selected per aggregation round — the exact
#: disjoint-prefix batching bound (see :func:`bpe_learn`)
BPE_DEFAULT_BATCH = 8


class BpeModel(NamedTuple):
    """A learned BPE merge list, in rank order."""

    merges: list[tuple[str, str, int]]  #: (left, right, pair_count)


def _words(text: Column) -> Column:
    """Words under the pinned contract: scrub :data:`SYM_SEP`, split on
    :data:`WORD_SEP_RE`, drop empties. [] for NULL/blank."""
    t = F.translate(F.coalesce(text, F.lit("")), SYM_SEP, "")
    return F.filter(F.split(t, WORD_SEP_RE), lambda x: F.length(x) > 0)


def _words_sql(text_expr: str) -> str:
    return (f"list_filter(regexp_split_to_array(replace(COALESCE("
            f"{text_expr}, ''), chr(1), ''), '{WORD_SEP_RE}'), "
            f"x -> length(x) > 0)")


def _char_syms(word: Column) -> Column:
    """word -> its code points joined by :data:`SYM_SEP`. DOTALL so line
    terminators split like any other char (Java parity with RE2)."""
    padded = F.regexp_replace(word, "(?s)(.)", "$1" + SYM_SEP)
    return F.substring(padded, 1, F.length(padded) - 1)


def _char_syms_sql(word_expr: str) -> str:
    p = f"regexp_replace({word_expr}, '(?s)(.)', '\\1' || chr(1), 'g')"
    return f"substring({p}, 1, length({p}) - 1)"


def _merge_fold(a: str, b: str) -> Callable[[Column, Column], Column]:
    """The leftmost-first non-overlapping pair-merge step for
    ``F.aggregate`` over a symbol array, accumulating into a
    SYM_SEP-joined string (parity with the DuckDB ``list_reduce``
    mirror pinned in tests)."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        last = F.substring_index(acc, SYM_SEP, -1)
        keep_len = F.length(acc) - F.length(last)
        return (
            F.when(acc == "", x)
            .when((last == F.lit(a)) & (x == F.lit(b)),
                  F.concat(F.substring(acc, F.lit(1), keep_len),
                           F.lit(merged)))
            .otherwise(F.concat(acc, F.lit(SYM_SEP), x))
        )

    return step


def _apply_merge(syms_str: Column, a: str, b: str) -> Column:
    toks = F.split(syms_str, SYM_SEP)
    return F.aggregate(toks, F.lit(""), _merge_fold(a, b))


_MERGE_FOLD_SQL = """list_reduce(['']::VARCHAR[] || string_split({s}, chr(1)),
  (acc, x) -> CASE WHEN acc = '' THEN x
    WHEN string_split(acc, chr(1))[-1] = {a} AND x = {b}
      THEN substring(acc, 1,
                     length(acc) - length(string_split(acc, chr(1))[-1]))
           || {m}
    ELSE acc || chr(1) || x END)"""


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: one bounded
    aggregation (map-side partials, output <= distinct pairs)."""
    toks = F.split(F.col("s"), SYM_SEP)
    # guard: F.sequence(1, 0) counts DOWN, so single-symbol words need an
    # explicit empty-pairs branch
    idx = F.when(F.size(toks) > 1, F.sequence(F.lit(1), F.size(toks) - 1)) \
           .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(F.element_at(toks, i).alias("a"),
                           F.element_at(toks, i + 1).alias("b")),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("_p"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _disjoint_prefix(
    ranked: list[tuple[str, str, int]], limit: int
) -> list[tuple[str, str, int]]:
    """The maximal rank-prefix of ``ranked`` (already in (cnt DESC, a,
    b) order) that can be merged as ONE batch with results identical to
    merging sequentially. Conditions (each makes the next sequential
    argmax provably the next prefix element):

    - pairwise symbol-DISJOINT — so applying earlier prefix merges
      changes neither the counts nor the instances of later ones;
    - every element's count is STRICTLY greater than the first
      excluded pair's count (the *cut*) — merges can only create new
      pairs involving a just-made symbol, and a created pair's count is
      bounded by the count of an old pair overlapping the merged one;
      all such pairs rank at/after the cut, so created pairs can never
      reach the cut count, let alone out-rank a prefix element (a tie
      would make the string tie-break decide and break exactness —
      hence STRICT).

    ``ranked`` must extend at least one past the intended batch, so the
    cut count is known; a short final page is handled by the caller.
    """
    picked: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for i, (a, b, cnt) in enumerate(ranked):
        if len(picked) >= limit:
            break
        if a in used or b in used:
            break  # prefix ends at the FIRST interacting pair
        cut = ranked[i + 1][2] if i + 1 < len(ranked) else None
        if cut is not None and cnt <= cut:
            # a count tie with the next pair: safe only as a
            # single-element batch head (the classic sequential pick)
            if not picked:
                picked.append((a, b, cnt))
            break
        picked.append((a, b, cnt))
        used.add(a)
        used.add(b)
        used.add(a + b)
    return picked or ranked[:1]


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 8,
    checkpoint_dir: str | None = None,
    batch: int = BPE_DEFAULT_BATCH,
) -> tuple[BpeModel, DataFrame]:
    """Learn ``n_merges`` BPE merges from ``df[text_col]``. Returns the
    model AND the final word->symbols vocabulary DataFrame
    ``(w, freq, s)`` (``s`` = SYM_SEP-joined symbols) so corpus
    segmentation is a lookup join, not a re-derivation. Stops early
    when the best pair's count drops below ``min_count`` —
    :func:`bpe_learn_sql` mirrors the same floor, so the oracle agrees
    on corpora that exhaust before ``n_merges``.

    ``batch`` bounds how many merges one aggregation round may select
    via the exact disjoint-prefix rule (:func:`_disjoint_prefix`) —
    identical results to ``batch=1`` (pinned by the three-way property
    test), fewer driver-loop jobs.

    Durability: with ``checkpoint_dir`` set, the word table and merge
    list are parquet-committed every ``checkpoint_every`` merges and on
    completion; a re-run with the same dir resumes from the last commit
    (same pattern as ``dedup.connected_components``). Without it,
    ``localCheckpoint`` bounds lineage (executor-pinned)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    from .dedup import _fs_exists, _fs_latest_round  # shared fs probes

    spark = df.sparkSession
    use_dir = checkpoint_dir is not None

    def commit(words: DataFrame, merges: list, n_done: int) -> DataFrame:
        """Cut lineage; with a dir, durably commit state for resume."""
        if not use_dir:
            return words.localCheckpoint()
        path = f"{checkpoint_dir}/round_{n_done:04d}"
        if not _fs_exists(spark, path + "/_SUCCESS"):
            words.write.mode("overwrite").parquet(path)
            spark.createDataFrame(
                [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
                "rank int, left string, right string, pair_count bigint",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{checkpoint_dir}/merges_{n_done:04d}")
        return spark.read.parquet(path)

    merges: list[tuple[str, str, int]] = []
    words: DataFrame | None = None
    if use_dir:
        start = _fs_latest_round(spark, checkpoint_dir)
        if start > 0 and _fs_exists(
                spark, f"{checkpoint_dir}/merges_{start:04d}/_SUCCESS"):
            words = spark.read.parquet(f"{checkpoint_dir}/round_{start:04d}")
            merges = [
                (r["left"], r["right"], int(r["pair_count"]))
                for r in spark.read.parquet(
                    f"{checkpoint_dir}/merges_{start:04d}"
                ).orderBy("rank").collect()
            ]
    if words is None:
        words = commit(
            df.select(F.explode(_words(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
            .select("w", "freq", _char_syms(F.col("w")).alias("s")),
            merges, 0)

    since_commit = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # one past the page so the prefix rule can see the cut count
        page = [
            (r["a"], r["b"], int(r["cnt"]))
            for r in _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(want + 1).collect()
        ]
        page = [(a, b, c) for a, b, c in page if c >= min_count]
        if not page:
            break
        picked = _disjoint_prefix(page, want)
        merges.extend(picked)
        col = F.col("s")
        for a, b, _ in picked:
            col = _apply_merge(col, a, b)
        words = words.withColumn("s", col)
        since_commit += len(picked)
        done = len(merges) >= n_merges
        if since_commit >= checkpoint_every or done:
            words = commit(words, merges, len(merges))
            since_commit = 0
    if since_commit:
        words = commit(words, merges, len(merges))
    return BpeModel(merges=merges), words


def bpe_merge_table(spark, model: BpeModel) -> DataFrame:
    """The learned merges as a DataFrame (rank, left, right,
    pair_count) — the persistable model artifact."""
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(model.merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count bigint")


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
) -> DataFrame:
    """Segment the corpus with the learned vocabulary via a broadcast
    lookup join: posexplode words -> join ``vocab (w, s)`` -> per-doc
    ordered reassembly. Returns ``(id, n_bpe_tokens, tokens_fp)`` with
    ``tokens_fp`` = md5 of the SYM_SEP-joined token stream (a string,
    so the compare is exact). Docs with no words drop out (inner join;
    mirrored by the oracle).

    Scale: the vocab is Heaps-bounded -> ``broadcast()`` keeps the join
    shuffle-free on the corpus side; the per-doc groupBy is the only
    exchange, keyed by the id."""
    dw = df.select(
        F.col(id_col),
        F.posexplode(_words(F.col(text_col))).alias("pos", "w"),
    )
    j = dw.join(F.broadcast(vocab.select("w", "s")), "w")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"])
    return (
        j.groupBy(id_col)
        .agg(
            F.sum(F.size(F.split(F.col("s"), SYM_SEP)))
            .cast("int").alias("n_bpe_tokens"),
            F.md5(F.array_join(ordered, SYM_SEP)).alias("tokens_fp"),
        )
    )


def bpe_segment_expr(
    text: Column, model: BpeModel
) -> Column:
    """Segment NEW text with the merge list as plan literals: the char
    symbols of each word folded through every merge in rank order —
    ``len(merges)`` chained HOF folds, zero shuffle. Returns
    ``array<string>`` of tokens for the whole text (words concatenated
    in order). Bounded by :data:`BPE_MAX_EXPR_MERGES`."""
    if len(model.merges) > BPE_MAX_EXPR_MERGES:
        raise ValueError(
            f"{len(model.merges)} merges exceeds BPE_MAX_EXPR_MERGES="
            f"{BPE_MAX_EXPR_MERGES}; use the vocab-join path "
            f"(bpe_tokenize) or an external tokenizer")

    def seg_word(w: Column) -> Column:
        s = _char_syms(w)
        for a, b, _ in model.merges:
            s = _apply_merge(s, a, b)
        return F.split(s, SYM_SEP)

    return F.flatten(F.transform(_words(text), seg_word))


def _learn_stages_sql(
    table: str, text_expr: str, n_merges: int, min_count: int
) -> str:
    """The shared CTE chain: w0 (word freqs + char symbols) then
    ``n_merges`` x (pair counts -> best pair -> fold rewrite). The best
    stage applies the ``min_count`` floor and the fold stage is a LEFT
    JOIN with a passthrough, so a corpus that exhausts early yields
    empty best stages and unchanged word tables — exactly the engine's
    early-stop (once a round's best is empty, every later round's pair
    table is identical and also floors out)."""
    words = _words_sql(text_expr)
    stages = [
        f"w0 AS MATERIALIZED (SELECT w, count(*)::BIGINT AS freq, "
        f"{_char_syms_sql('w')} AS s\n"
        f"  FROM (SELECT unnest({words}) AS w FROM {table}) GROUP BY w)"
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        fold = _MERGE_FOLD_SQL.format(
            s="s", a=f"be{r}.a", b=f"be{r}.b", m=f"be{r}.m")
        stages.append(
            f"p{r} AS MATERIALIZED (SELECT t[i] AS a, t[i + 1] AS b, SUM(freq) AS cnt\n"
            f"  FROM (SELECT unnest(generate_series(1, len(t) - 1)) AS i,"
            f" t, freq\n"
            f"        FROM (SELECT string_split(s, chr(1)) AS t, freq"
            f" FROM {prev}))\n"
            f"  GROUP BY 1, 2)")
        stages.append(
            f"best{r} AS MATERIALIZED (SELECT a, b, a || b AS m, cnt FROM p{r}\n"
            f"  WHERE cnt >= {min_count}\n"
            f"  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        stages.append(
            f"w{r} AS MATERIALIZED (SELECT w, freq,\n"
            f"  CASE WHEN be{r}.a IS NULL THEN s ELSE {fold} END AS s\n"
            f"  FROM {prev} LEFT JOIN best{r} be{r} ON TRUE)")
    return "WITH " + ",\n".join(stages)


def bpe_learn_sql(
    table: str, text_expr: str, n_merges: int, min_count: int = 2
) -> str:
    """DuckDB mirror of :func:`bpe_learn`'s merge list: the full
    learning loop as ``n_merges`` chained CTE stages with the same
    ``min_count`` early-stop floor. Returns ``(rank, left, right,
    pair_count)`` — fewer than ``n_merges`` rows when the corpus
    exhausts early, matching the engine."""
    chain = _learn_stages_sql(table, text_expr, n_merges, min_count)
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS left, b AS right, cnt AS pair_count "
        f"FROM best{r}"
        for r in range(1, n_merges + 1))
    return f"{chain}\n{sel}"


def bpe_tokenize_sql(
    table: str, id_expr: str, text_expr: str, n_merges: int,
    min_count: int = 2,
) -> str:
    """DuckDB mirror of :func:`bpe_learn` + :func:`bpe_tokenize` on the
    same corpus: learn, then segment via the final word table."""
    chain = _learn_stages_sql(table, text_expr, n_merges, min_count)
    words = _words_sql(text_expr)
    return f"""{chain},
dw AS (SELECT doc_id, i AS pos, wl[i] AS w
       FROM (SELECT unnest(generate_series(1, len(wl))) AS i, doc_id, wl
             FROM (SELECT {id_expr} AS doc_id, {words} AS wl
                   FROM {table}))),
j AS (SELECT dw.doc_id, dw.pos, v.s FROM dw JOIN w{n_merges} v USING (w))
SELECT doc_id,
       SUM(len(string_split(s, chr(1))))::INT AS n_bpe_tokens,
       md5(string_agg(s, chr(1) ORDER BY pos)) AS tokens_fp
FROM j GROUP BY doc_id"""
