"""Hashed Naive-Bayes text classification (fastText-filter analog).

The standard LLM-corpus quality gate (GPT-3 appendix A; CCNet,
arXiv:1911.00359) is a linear text classifier trained on a
high-quality positive slice vs the raw crawl: fastText / logistic
regression over bag-of-words features. The inference shape of those
models is identical — a per-token weight-table lookup summed per
document — and multinomial Naive Bayes has the SAME shape with a
closed-form fit (count ratios), so the whole classifier becomes two
bounded Spark aggregations + a zero-shuffle scoring expression:

- **Features** = tokens hashed into ``n_feat`` buckets (the
  engine-portable encw/uhash arithmetic from hashing.py, shared with
  DSIR — the DuckDB oracle reproduces every bucket exactly). The
  weight table is bounded by a HYPERPARAMETER, not the vocabulary,
  so it stays a plan literal at any corpus scale.
- **Fit** = one token-level aggregation (explode -> groupBy bucket,
  map-side partial agg, output <= n_feat rows) + one scalar doc-count
  aggregation for the class prior. Laplace add-one smoothing.
- **Score** = ZERO-SHUFFLE map-side expressions: the quantized
  log-likelihood-ratio table rides the plan as an array literal and
  each document's score is an integer ``aggregate`` over its token
  array, seeded with the prior. At 10^12 rows the only distributed
  cost beyond the scan is the one-time fit (skippable by passing a
  persisted model).

Exactness: every ln is quantized driver-side to
``floor(x * 1e6 + 0.5)`` integers (CPython libm == DuckDB libm, the
same contract lm.py and sampling.dsir_log_ratios rely on), so
per-document sums are exact BIGINTs — order-independent and
bit-identical across engines.

Reference analog: the reference's quality verdicts are rule-based
tri-states (``/root/reference/mlcast_dataset_validator/checks/
data_vars/naming.py:45-158``); a *trained* filter is the corpus-scale
generalization the pipeline brief calls for, complementing the
unsupervised perplexity ranker in lm.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import dsir_bucket, dsir_bucket_sql, dsir_tokens, dsir_tokens_sql

#: plan-size guard: the weight table is an array literal in the scoring
#: expression (see module docstring).
NB_MAX_BUCKETS = 65_536

#: quantization scale for the driver-side ln(): integer weights.
NB_QUANT = 1_000_000


def _qln(x: float) -> int:
    return int(math.floor(math.log(x) * NB_QUANT + 0.5))


_QLN_SQL = f"CAST(FLOOR(ln({{x}}) * {NB_QUANT} + 0.5) AS BIGINT)"


class NbModel(NamedTuple):
    """A fitted hashed-NB classifier: persist and reuse across corpora."""

    llr: list[int]  #: per-bucket quantized log-likelihood ratio
    prior_q: int    #: quantized log prior ratio ln((D_pos+1)/(D_neg+1))
    n_feat: int
    seed: int


def nb_fit(
    df: DataFrame,
    text_col: str,
    pos_cond: Column,
    n_feat: int = 4096,
    seed: int = 0,
) -> NbModel:
    """Fit the hashed Naive-Bayes classifier: rows matching ``pos_cond``
    are the positive class, everything else the negative class.

    Per-bucket weight (add-one smoothing over the bucket space):

    ``llr[b] = qln(C_pos[b]+1) - qln(T_pos+n_feat)
             - qln(C_neg[b]+1) + qln(T_neg+n_feat)``

    where ``C_c[b]`` counts class-``c`` tokens in bucket ``b`` and
    ``T_c`` the class token total; ``qln(x) = floor(1e6*ln(x)+0.5)``.
    Prior: ``prior_q = qln(D_pos+1) - qln(D_neg+1)`` over doc counts.

    Two bounded jobs: a token aggregation with <= n_feat output rows
    and a scalar doc-count aggregation.
    """
    if n_feat > NB_MAX_BUCKETS:
        raise ValueError(
            f"n_feat={n_feat} exceeds NB_MAX_BUCKETS={NB_MAX_BUCKETS}; "
            f"the weight table is a plan literal")
    is_pos = F.coalesce(pos_cond.cast("long"), F.lit(0))
    ex = df.select(
        F.explode(dsir_tokens(F.col(text_col))).alias("_t"),
        is_pos.alias("_is_pos"),
    )
    rows = (
        ex.groupBy(dsir_bucket(F.col("_t"), n_feat, seed).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n_raw"),
             F.sum("_is_pos").alias("_n_pos"))
        .collect()
    )
    c_pos = [0] * n_feat
    c_neg = [0] * n_feat
    for r in rows:
        c_pos[r["_b"]] = r["_n_pos"]
        c_neg[r["_b"]] = r["_n_raw"] - r["_n_pos"]
    t_pos, t_neg = sum(c_pos), sum(c_neg)
    llr = [
        _qln(c_pos[b] + 1.0) - _qln(t_pos + float(n_feat))
        - _qln(c_neg[b] + 1.0) + _qln(t_neg + float(n_feat))
        for b in range(n_feat)
    ]
    d = df.agg(F.count(F.lit(1)).alias("_d"),
               F.sum(is_pos).alias("_d_pos")).collect()[0]
    d_pos = int(d["_d_pos"] or 0)
    d_neg = int(d["_d"]) - d_pos
    prior_q = _qln(d_pos + 1.0) - _qln(d_neg + 1.0)
    return NbModel(llr=llr, prior_q=prior_q, n_feat=n_feat, seed=seed)


def nb_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pos_cond: Column | None = None,
    n_feat: int = 4096,
    seed: int = 0,
    model: NbModel | None = None,
) -> DataFrame:
    """Score every row with the hashed-NB classifier: appends

    - ``score_q``: BIGINT, ``prior_q + sum(llr[bucket(tok)])`` — the
      exact quantized log-odds of the positive class;
    - ``n_tokens``: INT, the feature count;
    - ``pred``: BOOLEAN, ``score_q > 0`` (empty docs fall back to the
      prior's sign).

    Scoring is one map-side expression per row — ``transform`` the
    token array through the literal weight table and ``aggregate``-sum
    seeded with the prior. Zero shuffles, zero extra jobs when
    ``model`` is supplied.
    """
    if model is None:
        if pos_cond is None:
            raise ValueError("either pos_cond (to fit) or model required")
        model = nb_fit(df, text_col, pos_cond, n_feat, seed)
    if len(model.llr) != model.n_feat:
        raise ValueError("model.llr must have length model.n_feat")
    tab = F.lit(model.llr)
    toks = dsir_tokens(F.col(text_col))
    lrs = F.transform(
        toks,
        lambda t: F.element_at(
            tab, (dsir_bucket(t, model.n_feat, model.seed) + 1).cast("int")
        ).cast("long"),
    )
    score = F.aggregate(lrs, F.lit(int(model.prior_q)).cast("long"),
                        lambda acc, x: acc + x)
    return (df.withColumn("score_q", score)
              .withColumn("n_tokens", F.size(toks))
              .withColumn("pred", F.col("score_q") > 0))


def nb_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    pos_sql: str,
    n_feat: int = 4096,
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`nb_fit` + :func:`nb_score`, built from
    the same hash fragments (single source of truth): recomputes the
    per-bucket class counts, the quantized weights, the prior, and the
    per-document integer scores. Returns
    ``(doc_id, score_q, n_tokens, pred)``."""
    toks = dsir_tokens_sql(text_expr)
    b_tok = dsir_bucket_sql("_t", n_feat, seed)
    qln = _QLN_SQL.format
    return f"""
WITH d AS (SELECT {id_expr} AS doc_id, {toks} AS _toks,
                  CASE WHEN COALESCE(({pos_sql}), FALSE) THEN 1 ELSE 0 END
                      AS _is_pos
           FROM {table}),
tok AS (SELECT unnest(_toks) AS _t, _is_pos FROM d),
bc AS (SELECT {b_tok} AS _b, count(*)::BIGINT AS n_raw,
              SUM(_is_pos)::BIGINT AS n_pos
       FROM tok GROUP BY 1),
tot AS (SELECT COALESCE(SUM(n_pos), 0) AS t_pos,
               COALESCE(SUM(n_raw - n_pos), 0) AS t_neg
        FROM bc),
dc AS (SELECT SUM(_is_pos)::BIGINT AS d_pos,
              (count(*) - SUM(_is_pos))::BIGINT AS d_neg
       FROM d),
prior AS (SELECT {qln(x='d_pos + 1.0')} - {qln(x='d_neg + 1.0')} AS prior_q
          FROM dc),
doctok AS (SELECT doc_id, unnest(_toks) AS _t FROM d),
w AS (SELECT doc_id,
             {qln(x='COALESCE(bc.n_pos, 0) + 1.0')}
           - (SELECT {qln(x='t_pos + ' + str(float(n_feat)))} FROM tot)
           - {qln(x='COALESCE(bc.n_raw - bc.n_pos, 0) + 1.0')}
           + (SELECT {qln(x='t_neg + ' + str(float(n_feat)))} FROM tot)
               AS _w
      FROM doctok LEFT JOIN bc ON bc._b = {dsir_bucket_sql('doctok._t',
                                                           n_feat, seed)}),
sums AS (SELECT doc_id, SUM(_w)::BIGINT AS s FROM w GROUP BY doc_id)
SELECT d.doc_id,
       (SELECT prior_q FROM prior) + COALESCE(s.s, 0) AS score_q,
       len(d._toks)::INT AS n_tokens,
       ((SELECT prior_q FROM prior) + COALESCE(s.s, 0)) > 0 AS pred
FROM d LEFT JOIN sums s USING (doc_id)"""
