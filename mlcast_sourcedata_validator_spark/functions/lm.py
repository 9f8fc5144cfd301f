"""Hashed bigram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks web documents by the
perplexity of a language model trained on a high-quality corpus; docs in
the worst tail are dropped or down-weighted. This module is that scorer
re-expressed for Spark at 10^12-row scale:

- **Model** = a *hashed* bigram LM: contexts hash into ``n_ctx`` buckets
  and (context, token) pairs into ``n_pair`` buckets (engine-portable
  encw/uhash arithmetic from hashing.py — the DuckDB oracle reproduces
  every bucket exactly, unlike Spark-private ``xxhash64``). Bucketing
  bounds the model size by a HYPERPARAMETER, not the vocabulary, so the
  count tables stay plan-literal at any corpus scale (same argument as
  ``sampling.DSIR_MAX_BUCKETS``).
- **Training** = one bounded aggregation over the training slice:
  posexplode bigrams -> two groupBys (pair bucket, context bucket), each
  with map-side partial aggregation and output <= n_pair / n_ctx rows.
- **Scoring** = ZERO-SHUFFLE map-side expressions: the quantized
  log-count tables ride the plan as array literals and each document's
  log-probability is an integer ``aggregate`` over its token array. At
  10^12 rows the only distributed cost beyond the scan is the one-time
  fit (skippable by passing persisted tables).

Exactness: per-bigram log-prob is
``ln((C_pair[pb] + 1) / (C_ctx[cb] + n_pair))`` (add-one smoothing over
the pair-bucket space). Both ln terms are quantized driver-side to
``floor(x * 1e6 + 0.5)`` integers (CPython libm == DuckDB libm, the same
contract :func:`sampling.dsir_log_ratios` relies on), so per-document
sums are exact BIGINTs — order-independent and bit-identical across
engines.

Reference analog: the reference scores payload quality with tri-state
domain checks (``/root/reference/mlcast_dataset_validator/checks/
data_vars/naming.py:45-158``); a trained statistical quality score is
the corpus-scale generalization the pipeline brief calls for.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MINHASH_COEFFS, P, encw, encw_sql, uhash, uhash_sql
from .sampling import dsir_tokens, dsir_tokens_sql

#: plan-size guard: both count tables are array literals in the scoring
#: expression (see module docstring).
LM_MAX_BUCKETS = 65_536

#: quantization scale for the driver-side ln(): integer log-probs.
LM_QUANT = 1_000_000

#: beginning-of-document context sentinel (the first token's bigram
#: context). A plain string on purpose: it flows through the same
#: encw/uhash arithmetic as real tokens in both engines.
LM_BOS = "<s>"


def _ctx_bucket(ctx: Column, n_ctx: int, seed: int) -> Column:
    j = seed % len(MINHASH_COEFFS)
    return F.pmod(uhash(encw(ctx), j), F.lit(int(n_ctx)))


def _ctx_bucket_sql(ctx: str, n_ctx: int, seed: int) -> str:
    j = seed % len(MINHASH_COEFFS)
    return f"({uhash_sql(encw_sql(ctx), j)} % {int(n_ctx)})"


def _pair_bucket(ctx: Column, tok: Column, n_pair: int, seed: int) -> Column:
    """Bucket of the (context, token) bigram: the two word hashes are
    rolling-combined mod P (65599 multiplier, same scheme encw itself
    uses for its chunks) before the universal hash, so the pair bucket
    depends on BOTH words in full — hashing the concatenated string
    would only see its first 12 chars (encw's window)."""
    j = (seed + 1) % len(MINHASH_COEFFS)
    combined = F.pmod(encw(ctx) * F.lit(65599) + encw(tok), F.lit(P))
    return F.pmod(uhash(combined, j), F.lit(int(n_pair)))


def _pair_bucket_sql(ctx: str, tok: str, n_pair: int, seed: int) -> str:
    j = (seed + 1) % len(MINHASH_COEFFS)
    combined = f"(({encw_sql(ctx)} * 65599 + {encw_sql(tok)}) % {P})"
    return f"({uhash_sql(combined, j)} % {int(n_pair)})"


def _quant_log(x: float) -> int:
    return int(math.floor(math.log(x) * LM_QUANT + 0.5))


def lm_fit(
    df: DataFrame,
    text_col: str,
    train_cond: Column | None = None,
    n_ctx: int = 1024,
    n_pair: int = 16_384,
    seed: int = 0,
) -> tuple[list[int], list[int]]:
    """Fit the hashed bigram LM on the rows matching ``train_cond``
    (None = whole input). Returns the two quantized log-count tables:

    - ``lp_pair[pb] = floor(1e6 * ln(C_pair[pb] + 1) + 0.5)``
    - ``lp_ctx[cb]  = floor(1e6 * ln(C_ctx[cb] + n_pair) + 0.5)``

    so a bigram's quantized log-prob is ``lp_pair[pb] - lp_ctx[cb]``.

    Two bounded aggregation jobs over the (typically small) training
    slice — outputs are <= n_pair and <= n_ctx rows; the ln runs
    driver-side. Persist the returned lists to re-score later corpora
    without refitting.
    """
    for name, n in (("n_ctx", n_ctx), ("n_pair", n_pair)):
        if n > LM_MAX_BUCKETS:
            raise ValueError(
                f"{name}={n} exceeds LM_MAX_BUCKETS={LM_MAX_BUCKETS}; "
                f"the count tables are plan literals")
    train = df.where(train_cond) if train_cond is not None else df
    base = train.select(dsir_tokens(F.col(text_col)).alias("_toks"))
    ex = base.select(
        "_toks", F.posexplode("_toks").alias("_i", "_tok")
    ).select(
        F.when(F.col("_i") == 0, F.lit(LM_BOS))
        .otherwise(F.element_at("_toks", F.col("_i"))).alias("_ctx"),
        F.col("_tok"),
    )
    pair_rows = (
        ex.groupBy(_pair_bucket(F.col("_ctx"), F.col("_tok"),
                                n_pair, seed).alias("_pb"))
        .agg(F.count(F.lit(1)).alias("_c")).collect()
    )
    ctx_rows = (
        ex.groupBy(_ctx_bucket(F.col("_ctx"), n_ctx, seed).alias("_cb"))
        .agg(F.count(F.lit(1)).alias("_c")).collect()
    )
    c_pair = [0] * n_pair
    for r in pair_rows:
        c_pair[r["_pb"]] = r["_c"]
    c_ctx = [0] * n_ctx
    for r in ctx_rows:
        c_ctx[r["_cb"]] = r["_c"]
    lp_pair = [_quant_log(c + 1.0) for c in c_pair]
    lp_ctx = [_quant_log(c + float(n_pair)) for c in c_ctx]
    return lp_pair, lp_ctx


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_cond: Column | None = None,
    n_ctx: int = 1024,
    n_pair: int = 16_384,
    seed: int = 0,
    tables: tuple[list[int], list[int]] | None = None,
) -> DataFrame:
    """Score every row with the hashed bigram LM: appends

    - ``logprob_q``: BIGINT, sum over the document's bigrams of the
      quantized log-prob (exact integer; more negative = less like the
      training slice);
    - ``n_bigrams``: INT, the token count (each token contributes one
      bigram, the first against the BOS sentinel);
    - ``ppl``: DOUBLE, ``round(exp(-logprob_q / 1e6 / n_bigrams), 6)``
      — the human-facing perplexity; NULL for empty documents.

    Scoring is one map-side expression per row — ``zip_with`` the
    context/token arrays into quantized log-probs (two literal-table
    lookups each) and ``aggregate``-sum them. Zero shuffles, zero extra
    jobs when ``tables`` is supplied.
    """
    if tables is None:
        tables = lm_fit(df, text_col, train_cond, n_ctx, n_pair, seed)
    lp_pair, lp_ctx = tables
    if len(lp_pair) != n_pair or len(lp_ctx) != n_ctx:
        raise ValueError("tables must be (len n_pair, len n_ctx) lists")
    pair_lit = F.lit(lp_pair)
    ctx_lit = F.lit(lp_ctx)

    def _lp(ctx: Column, tok: Column) -> Column:
        pb = _pair_bucket(ctx, tok, n_pair, seed)
        cb = _ctx_bucket(ctx, n_ctx, seed)
        return (F.element_at(pair_lit, (pb + 1).cast("int"))
                - F.element_at(ctx_lit, (cb + 1).cast("int"))).cast("long")

    toks = dsir_tokens(F.col(text_col))
    n = F.size(toks)
    ctxs = F.concat(F.array(F.lit(LM_BOS)),
                    F.slice(toks, 1, F.greatest(n - 1, F.lit(0))))
    lps = F.when(n > 0, F.zip_with(ctxs, toks, _lp)) \
        .otherwise(F.array().cast("array<long>"))
    total = F.aggregate(lps, F.lit(0).cast("long"), lambda acc, x: acc + x)
    out = df.withColumn("logprob_q", total).withColumn("n_bigrams", n)
    ppl = F.round(
        F.exp(-F.col("logprob_q").cast("double") / F.lit(float(LM_QUANT))
              / F.col("n_bigrams").cast("double")), 6)
    return out.withColumn(
        "ppl", F.when(F.col("n_bigrams") > 0, ppl))


def lm_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    train_sql: str | None = None,
    n_ctx: int = 1024,
    n_pair: int = 16_384,
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`lm_fit` + :func:`lm_score`, built from the
    same hash fragments (single source of truth): recomputes the bucket
    counts over the training slice, the quantized log tables, and the
    per-document integer log-prob sums. Returns
    ``(doc_id, logprob_q, n_bigrams)`` — the exact-integer columns."""
    toks = dsir_tokens_sql(text_expr)
    where = f"WHERE {train_sql}" if train_sql is not None else ""
    ctx_list = (f"[CASE WHEN i = 1 THEN '{LM_BOS}' ELSE _toks[i-1] END "
                f"for i in generate_series(1, len(_toks))]")
    pb = _pair_bucket_sql("_ctx", "_tok", n_pair, seed)
    cb = _ctx_bucket_sql("_ctx", n_ctx, seed)
    return f"""
WITH tr AS (SELECT {toks} AS _toks FROM {table} {where}),
trbig AS (SELECT unnest({ctx_list}) AS _ctx, unnest(_toks) AS _tok FROM tr),
pc AS (SELECT {pb} AS _pb, count(*)::BIGINT AS c FROM trbig GROUP BY 1),
cc AS (SELECT {cb} AS _cb, count(*)::BIGINT AS c FROM trbig GROUP BY 1),
doc AS (SELECT {id_expr} AS doc_id, {toks} AS _toks FROM {table}),
big AS (SELECT doc_id, unnest({ctx_list}) AS _ctx, unnest(_toks) AS _tok
        FROM doc),
bb AS (SELECT doc_id, {pb} AS _pb, {cb} AS _cb FROM big),
lp AS (SELECT bb.doc_id,
              CAST(FLOOR(ln(COALESCE(pc.c, 0) + 1.0) * {LM_QUANT} + 0.5)
                   AS BIGINT)
            - CAST(FLOOR(ln(COALESCE(cc.c, 0) + {n_pair}.0) * {LM_QUANT}
                         + 0.5) AS BIGINT) AS _lp
       FROM bb LEFT JOIN pc ON pc._pb = bb._pb
               LEFT JOIN cc ON cc._cb = bb._cb),
sums AS (SELECT doc_id, SUM(_lp)::BIGINT AS logprob_q FROM lp
         GROUP BY doc_id)
SELECT d.doc_id, COALESCE(s.logprob_q, 0) AS logprob_q,
       len(d._toks)::INT AS n_bigrams
FROM doc d LEFT JOIN sums s USING (doc_id)"""
