"""Corpus-level boilerplate detection and removal.

The web-pipeline pass the dedup family doesn't cover: content that is not
a *duplicate document* but a *ubiquitous fragment* — navigation chrome,
cookie banners, license headers — repeated across a large fraction of
otherwise-distinct documents (the line-dedup step of CCNet/RefinedWeb-style
pipelines). Two operators:

- :func:`frequent_spans` — the profiler: word n-grams ranked by document
  frequency. Read it before choosing a removal threshold.
- :func:`remove_frequent_lines` — the filter: drop every line whose exact
  content appears in ``>= min_df`` distinct documents, preserving the
  order of surviving lines.

Scale shape (10^12 rows): both are explode -> hash-keyed aggregations with
map-side partials — fan-in is bounded by the *distinct* span/line count,
never O(rows^2). The removal join keys on ``md5(line)`` so the shuffle
carries a 128-bit hash, not line text; the frequent-line set (boilerplate
is by definition a small distinct set) broadcasts by default.

No reference analog (the reference validates geodata arrays, not text);
this is §2C training-data-pipeline surface alongside functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import word_shingles, word_shingles_sql


def frequent_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Word n-gram spans appearing in ``>= min_df`` distinct documents:
    (span, df_count), df_count descending.

    One aggregation: explode the per-row shingle array (deduplicated
    WITHIN the row first by ``array_distinct`` — map-side, so a span
    repeated 1000x inside one spammy document contributes one shuffle
    row, and document frequency needs no ``count_distinct`` expand)
    then ``groupBy(span).count()`` with map-side partial aggregation.
    Span strings are bounded at n words, so the shuffle key stays small
    without hashing; the HAVING filter cannot push below the agg but the
    projection prunes every other column off the scan.
    """
    spans = F.array_distinct(word_shingles(F.col(text_col), n))
    return (
        df.select(F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") >= min_df)
    )


def frequent_spans_sql(
    table: str, id_col: str, text_col: str, n: int = 3, min_df: int = 2
) -> str:
    """DuckDB mirror of :func:`frequent_spans` (same tokenization)."""
    shingles = word_shingles_sql("toks", n)
    return f"""
        WITH t AS (SELECT string_split({text_col}, ' ') AS toks FROM {table}),
        s AS (SELECT unnest(list_distinct({shingles})) AS span FROM t)
        SELECT span, count(*)::BIGINT AS df_count FROM s
        GROUP BY span HAVING count(*) >= {int(min_df)}"""


def remove_frequent_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    delimiter: str = "\n",
    broadcast_freq: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Strip every ``delimiter``-separated line occurring in ``>= min_df``
    distinct documents; surviving lines rejoin in their original order.

    Returns ``df`` with ``text_col`` (or ``out_col``) replaced by the
    cleaned text — a document ALL of whose lines were boilerplate comes
    back with ``''`` (downstream length/quality filters then drop it,
    the pipeline's job, not this operator's).

    Plan: (1) explode lines with position, (2) build the frequent-line
    set as ``groupBy(md5(line))`` over per-document-distinct line hashes
    — map-side ``array_distinct`` again means document frequency is a
    plain count, (3) anti-join the exploded lines against that set on
    the 128-bit hash (broadcast by default: the ``min_df`` filter keeps
    only boilerplate, a small set by construction; pass
    ``broadcast_freq=False`` for pathological thresholds like
    ``min_df=1``), (4) reassemble per document via
    ``sort_array(collect_list(struct(pos, line)))`` — per-document line
    counts are bounded, so the collected array is too.
    """
    out_col = out_col or text_col
    # \Q..\E: the delimiter is a LITERAL (DuckDB string_split semantics),
    # not a regex — Spark's split() would otherwise interpret '.' etc.
    split = F.split(F.col(text_col), "\\Q" + delimiter + "\\E", -1)
    lines = df.select(
        F.col(id_col),
        F.posexplode(split).alias("_pos", "_line"),
    )
    hashed_lines = df.select(
        F.explode(F.array_distinct(F.transform(split, F.md5))).alias("_lh")
    )
    freq = (
        hashed_lines.groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("_lh")
    )
    if broadcast_freq:
        freq = F.broadcast(freq)
    kept = lines.join(freq, F.md5(lines["_line"]) == freq["_lh"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            delimiter,
        ).alias("_clean")
    )
    clean = F.coalesce(F.col("_clean"), F.lit(""))
    cols = [clean.alias(c) if c == out_col else F.col(c) for c in df.columns]
    if out_col not in df.columns:
        cols.append(clean.alias(out_col))
    return df.join(rebuilt, id_col, "left").select(*cols)


def remove_frequent_lines_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_df: int | str = 2,
    delimiter: str = "\n",
    out_col: str | None = None,
    extra_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror of :func:`remove_frequent_lines` (exact: same split,
    same per-document-distinct document-frequency count, order-preserving
    ``string_agg``). ``min_df`` may be a SQL fragment (e.g. a scalar
    subquery deriving the threshold from the corpus size)."""
    out_col = out_col or text_col
    d = delimiter.replace("'", "''")
    extras = "".join(f", {c}" for c in extra_cols)
    min_df = int(min_df) if isinstance(min_df, int) else f"({min_df})"
    return f"""
        WITH lines AS (
          SELECT {id_col},
                 unnest(range(len(string_split({text_col}, '{d}'))))::INT AS pos,
                 unnest(string_split({text_col}, '{d}')) AS line
          FROM {table}),
        freq AS (
          SELECT line FROM (SELECT DISTINCT {id_col}, line FROM lines)
          GROUP BY line HAVING count(*) >= {min_df}),
        kept AS (
          SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq)),
        rebuilt AS (
          SELECT {id_col},
                 string_agg(line, '{d}' ORDER BY pos) AS _clean
          FROM kept GROUP BY {id_col})
        SELECT t.{id_col}{extras}, coalesce(r._clean, '') AS {out_col}
        FROM {table} t LEFT JOIN rebuilt r USING ({id_col})"""
