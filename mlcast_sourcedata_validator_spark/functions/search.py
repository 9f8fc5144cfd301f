"""Keyword relevance search: BM25 scoring + top-k over a document corpus.

The training-data-pipeline use: given a handful of query terms (an
incident probe, a contamination phrase, a topicality filter), rank a
100-TB corpus and pull the k most relevant documents WITHOUT building a
serving index first.

Shape at scale (Spark-first, zero Python rows):

1. **Stats pass** (:func:`bm25_stats`): one column-pruned scan
   aggregating corpus size N, average document length avgdl, and the
   per-term document frequencies — all as codegen'd aggregates over the
   token array (``size(filter(tokens, ...))``), map-side partials, one
   tiny driver row. On a standing corpus these stats belong in the
   incremental rollup store (counts and length-sums are algebraic;
   merge deltas instead of rescanning — see functions/rollup.py);
   :func:`bm25_topk` therefore accepts precomputed stats.
2. **Score + top-k pass**: per-document term frequencies and the BM25
   sum are pure Column expressions evaluated MAP-SIDE in the scan
   stage; the global top-k is ``orderBy(score).limit(k)``, which Spark
   executes as TakeOrderedAndProject — per-partition size-k heaps and a
   k x n_partitions driver merge, never a full sort or shuffle.

Query terms are a driver-side list (a search is a few words), so the
whole plan is literal-parameterized: no join, no broadcast, nothing to
skew. Scoring uses the standard Robertson/Sparck-Jones BM25 with the
non-negative idf form: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

Tokenization is the engine-portable lowercase whitespace split (the
same family as functions/sampling.py dsir_tokens), so an external
engine reproduces scores exactly — the DuckDB oracle in
``__spark_entry__.py`` does.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


def search_tokens(text: Column) -> Column:
    """Lowercase whitespace tokens, empties dropped, NULL text -> []."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), " "),
        lambda t: t != "",
    )


def search_tokens_sql(text_expr: str) -> str:
    """DuckDB mirror of :func:`search_tokens`."""
    return (f"list_filter(string_split(lower(coalesce({text_expr}, ''))"
            f", ' '), t -> t <> '')")


def term_freq(tokens: Column, term: str) -> Column:
    """Occurrences of ``term`` in the token array — a codegen'd
    size(filter(...)), no explode, no shuffle."""
    return F.size(F.filter(tokens, lambda t: t == F.lit(term)))


@dataclass
class Bm25Stats:
    """Corpus statistics BM25 needs — algebraic, so maintainable
    incrementally (n/len_sum/df are sums; avgdl derives)."""

    n_docs: int
    avgdl: float
    df: dict[str, int]  # per-term document frequency

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))


def bm25_stats(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> Bm25Stats:
    """One aggregate job over the corpus: N, avgdl, df per term."""
    if not terms:
        raise ValueError("need at least one query term")
    toks = search_tokens(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(toks)).alias("__avgdl"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.sum((term_freq(toks, t) > 0).cast("long")).alias(f"__df_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    return Bm25Stats(
        n_docs=int(row["__n"] or 0),
        avgdl=float(row["__avgdl"] or 0.0),
        df={t: int(row[f"__df_{i}"] or 0) for i, t in enumerate(terms)},
    )


def bm25_score_expr(
    text: Column,
    terms: list[str],
    stats: Bm25Stats,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    """The BM25 score as one map-side Column expression. Stats enter as
    plan literals — no join against a stats table, nothing to shuffle."""
    if stats.n_docs <= 0 or stats.avgdl <= 0:
        return F.lit(0.0)
    toks = search_tokens(text)
    dl = F.size(toks).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(stats.avgdl))
    score = F.lit(0.0)
    for t in terms:
        tf = term_freq(toks, t).cast("double")
        score = score + F.lit(stats.idf(t)) * tf * F.lit(k1 + 1.0) / (tf + norm)
    return score


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: Bm25Stats | None = None,
) -> DataFrame:
    """Top-k documents by BM25 relevance to ``terms``.

    Returns (id_col, score) with score > 0 (at least one term present),
    deterministically ordered/tied-broken by (score DESC, id ASC).
    Pass ``stats`` (e.g. maintained incrementally in the rollup store)
    to skip the stats scan and make this a single-pass operator.
    """
    st = stats if stats is not None else bm25_stats(df, terms, text_col)
    score = bm25_score_expr(F.col(text_col), terms, st, k1=k1, b=b)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
