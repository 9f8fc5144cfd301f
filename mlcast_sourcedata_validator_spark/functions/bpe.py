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
   (map-side partials; output <= distinct pairs), take the argmax with
   the deterministic tie-break (count DESC, left ASC, right ASC), then
   rewrite every word's symbol sequence MAP-SIDE with the classic
   leftmost-first non-overlapping pair merge (``'a a a a a'`` with merge
   ``(a,a)`` -> ``aa aa a``). The rewrite is a codegen'd string fold
   (``F.aggregate`` over the symbol string with a
   ``chr(1)``-accumulator); ``localCheckpoint`` every few rounds keeps
   the lineage bounded.
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
Spark fold — parity pinned in tests), giving the full learning loop an
exact cross-engine oracle.

Caveats (documented, not silent): words are whitespace-delimited and
symbols are Java-regex ``.`` code units (BMP text; the synthetic corpus
is ASCII); ``chr(1)`` is reserved as the symbol separator and scrubbed
from input.

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

#: cap on merges applied as literal fold expressions by
#: :func:`bpe_segment_expr` — beyond this the expression tree (one HOF
#: fold per merge) stops being a reasonable plan
BPE_MAX_EXPR_MERGES = 64


class BpeModel(NamedTuple):
    """A learned BPE merge list, in rank order."""

    merges: list[tuple[str, str, int]]  #: (left, right, pair_count)


def _words(text: Column) -> Column:
    """Whitespace words with the separator scrubbed; [] for NULL/blank."""
    t = F.trim(F.translate(F.coalesce(text, F.lit("")), SYM_SEP, ""))
    return F.when(F.length(t) > 0, F.split(t, r"\s+")) \
            .otherwise(F.array().cast("array<string>"))


def _words_sql(text_expr: str) -> str:
    return (f"CASE WHEN length(trim(replace(COALESCE({text_expr}, ''), "
            f"chr(1), ''))) = 0 THEN []::VARCHAR[] "
            f"ELSE regexp_split_to_array(trim(replace(COALESCE({text_expr}, "
            f"''), chr(1), '')), '\\s+') END")


def _char_syms(word: Column) -> Column:
    """word -> its characters joined by :data:`SYM_SEP`."""
    padded = F.regexp_replace(word, "(.)", "$1" + SYM_SEP)
    return F.substring(padded, 1, F.length(padded) - 1)


def _char_syms_sql(word_expr: str) -> str:
    p = f"regexp_replace({word_expr}, '(.)', '\\1' || chr(1), 'g')"
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


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> tuple[BpeModel, DataFrame]:
    """Learn ``n_merges`` BPE merges from ``df[text_col]``. Returns the
    model AND the final word->symbols vocabulary DataFrame
    ``(w, freq, s)`` (``s`` = SYM_SEP-joined symbols) so corpus
    segmentation is a lookup join, not a re-derivation. Stops early
    when the best pair's count drops below ``min_count`` (the SQL
    oracle is a fixed ``n_merges``-stage chain, so oracle-checked call
    sites pick ``n_merges`` small enough that early-stop never fires —
    :func:`bpe_learn_sql` documents the contract)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
        .select("w", "freq", _char_syms(F.col("w")).alias("s"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1).collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        words = words.withColumn("s", _apply_merge(F.col("s"), a, b))
        if (r + 1) % checkpoint_every == 0 or r == n_merges - 1:
            words = words.localCheckpoint()
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


def _learn_stages_sql(table: str, text_expr: str, n_merges: int) -> str:
    """The shared CTE chain: w0 (word freqs + char symbols) then
    ``n_merges`` x (pair counts -> best pair -> fold rewrite)."""
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
            f"  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)")
        stages.append(
            f"w{r} AS MATERIALIZED (SELECT w, freq, {fold} AS s\n"
            f"  FROM {prev} CROSS JOIN best{r} be{r})")
    return "WITH " + ",\n".join(stages)


def bpe_learn_sql(table: str, text_expr: str, n_merges: int) -> str:
    """DuckDB mirror of :func:`bpe_learn`'s merge list: the full
    learning loop as ``n_merges`` chained CTE stages. Returns
    ``(rank, left, right, pair_count)``. Contract: fixed ``n_merges``
    stages — the caller guarantees the corpus supports that many
    merges (no early stop), which oracle-checked call sites do by
    picking a small ``n_merges``."""
    chain = _learn_stages_sql(table, text_expr, n_merges)
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS left, b AS right, cnt AS pair_count "
        f"FROM best{r}"
        for r in range(1, n_merges + 1))
    return f"{chain}\n{sel}"


def bpe_tokenize_sql(
    table: str, id_expr: str, text_expr: str, n_merges: int
) -> str:
    """DuckDB mirror of :func:`bpe_learn` + :func:`bpe_tokenize` on the
    same corpus: learn, then segment via the final word table."""
    chain = _learn_stages_sql(table, text_expr, n_merges)
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
