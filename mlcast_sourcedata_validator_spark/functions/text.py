"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Everything is built from ``pyspark.sql.functions`` string/regex primitives
(JVM-side, codegen'd); the same formulas are mirrored 1:1 in the DuckDB
oracle SQL of __spark_entry__.py, so each operator is held to the
engine-vs-oracle correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import char_shingles, enc4, uhash

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por"],
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (empty/NULL-safe)."""
    t = F.trim(text)
    return F.when(
        t.isNull() | (F.length(t) == 0), F.lit(0)
    ).otherwise(F.size(F.split(t, "\\s+"))).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (word pieces / numbers / symbols)."""
    return F.coalesce(
        F.regexp_count(text, F.lit(BPE_ISH_PATTERN)), F.lit(0)
    ).cast("int")


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    return F.when(n > 0, F.round(punct / n, 6)).otherwise(F.lit(0.0))


def stopword_count(text: Column, words: list[str]) -> Column:
    pat = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    words = words or LANG_MARKERS["en"]
    toks = ws_token_count(text)
    return F.when(
        toks > 0, F.round(stopword_count(text, words) / toks, 6)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable mean token length. Deterministic arithmetic only (mirrors
    the oracle SQL exactly)."""
    n = F.length(text)
    toks = ws_token_count(text)
    mean_tok = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 20) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_tok >= 2.5) & (mean_tok <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + tok_ok) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, words) for lang, words in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Argmax language over marker-word hit counts; 'und' when all zero.

    First-match-wins CASE chain: a language is picked when its score is > 0
    and >= every *later* language's score — ties break by the fixed order
    (en, de, fr, es), replicated verbatim in the oracle SQL.
    """
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    expr = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for other in langs[i + 1:]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(text: Column, k: int = 4) -> Column:
    """Deterministic document fingerprint: min universal-hash over the
    k-char shingle codes (rolling-hash winnowing's min-hash special case).
    Identical arithmetic in the oracle SQL via hashing.enc4_sql/uhash_sql.
    """
    codes = F.transform(char_shingles(text, k), enc4)
    return F.when(
        F.size(codes) > 0,
        F.array_min(F.transform(codes, lambda x: uhash(x, 0))),
    ).otherwise(F.lit(None).cast("long"))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document text profile (the documents-table analog of the
    transcripts suite's payload stats)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        ws_token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )


#: PII detection patterns — deliberately restricted to syntax valid in
#: BOTH java.util.regex (Spark) and RE2 (DuckDB oracle): no lookaround.
#: Keys double as redaction-token names. Ordered: email first (an email
#: contains dot-runs an ipv4 pattern could nibble at), then the numeric
#: shapes (ssn's 3-2-4 grouping cannot match phone's 3-3-4 and vice
#: versa).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts: (id, n_email, n_ipv4, n_ssn,
    n_phone, has_pii). Pure ``regexp_count`` Column expressions
    (JVM-side, codegen'd) — the detection face of :func:`redact_pii`,
    and the screen a training pipeline runs BEFORE deciding what to
    redact or drop."""
    t = F.col(text_col)
    counts = [
        F.coalesce(F.regexp_count(t, F.lit(p)), F.lit(0)).cast("int")
        .alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col), *counts)
    any_hit = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    return out.withColumn("has_pii", any_hit)


def redact_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with a typed token (``[EMAIL]``,
    ``[IPV4]``, ...): a chain of ``regexp_replace`` expressions fused
    into one projection — map-side only, no Python. Pattern order is
    PII_PATTERNS' (email before the numeric shapes)."""
    out_col = out_col or text_col
    expr = F.col(text_col)
    for name, p in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, p, f"[{name.upper()}]")
    return df.withColumn(out_col, expr)


def text_repetition(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition signals for LLM-data quality filtering:
    (id, n_sentences, dup_sentence_ratio, top_token_ratio).

    - ``dup_sentence_ratio``: fraction of '. '-separated sentences that
      are repeats of an earlier one — pure array expressions
      (``array_distinct``), zero shuffle.
    - ``top_token_ratio``: most-frequent-token share of all whitespace
      tokens (a high value flags degenerate/repeated text). Computed as
      explode -> (id, token) count -> per-id max/sum: two hash
      aggregations on the id key (map-side partials; the second reuses
      the first's partitioning), NOT a higher-order array fold — array
      lambdas evaluate interpreted and quadratically for mode-finding.

    Documents whose text has no non-empty tokens drop out (same as the
    oracle's inner join).
    """
    sents = F.split(F.col(text_col), "\\. ")
    base = df.select(
        F.col(id_col),
        F.size(sents).cast("int").alias("n_sentences"),
        F.round(
            1 - F.size(F.array_distinct(sents)).cast("double") / F.size(sents), 6
        ).alias("dup_sentence_ratio"),
    )
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_t"))
        .where(F.length("_t") > 0)
        .groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.round(F.max("_c") / F.sum("_c"), 6).alias("top_token_ratio"))
    )
    return base.join(toks, id_col)


def normalize_text(text: Column) -> Column:
    """Near-exact-dedup normalization (the C4/Dolma-style key): lowercase,
    collapse whitespace runs to a single space, trim. Dedup over
    ``md5(normalize_text(text))`` catches case/whitespace variants that
    byte-exact dedup misses, without the cost of fuzzy matching. The
    ``\\s`` class matches the same characters in java.util.regex and
    RE2/DuckDB, so the oracle runs the identical expression."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def gopher_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = "\\. ",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1
    — public paper): per document

    - ``dup_line_frac``: fraction of line occurrences that repeat an
      earlier identical line (lines = ``line_sep``-separated segments;
      the synthetic corpus uses sentence separators as line breaks).
    - ``dup_line_char_frac``: fraction of line characters contained in
      repeated occurrences — sum(len*(cnt-1)) / sum(len*cnt).
    - ``top{n}gram_char_frac`` for each n in ``ngram_ns``: the largest
      character coverage of any single word n-gram, i.e.
      max over n-grams of (count * gram_char_len) / doc_char_len.
      (Deterministic without a tie-break rule: the max is over numbers,
      not over grams.) 0.0 when the document is shorter than n words.

    Shape at scale: one explode of lines and ONE explode of the
    concatenated gram arrays for all requested n — each followed by two
    id-keyed hash aggregations (map-side partials; the second reuses the
    first's partitioning), exactly the `text_repetition` top-token
    pattern. The gram's n is recovered as its own token count (grams are
    space-joined space-free tokens, so this is exact) rather than by a
    struct-tagging ``transform`` wrapped around ``word_shingles`` —
    nesting a lambda over that already-nested higher-order expression
    miscompiles (lambda-variable capture collision, observed on Spark
    4.1: the outer lambda rebinds the shingle index). No interpreted
    array folds, no window, no collect. Documents with NULL/empty text
    drop out (no gram rows survive the explode), matching the oracle's
    inner joins.
    """
    lines = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), line_sep)).alias("_l"))
        .groupBy(id_col, "_l").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.round(
                (F.sum("_c") - F.count(F.lit(1))) / F.sum("_c"), 6
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.sum(F.length("_l") * F.col("_c")) > 0,
                    F.sum(F.length("_l") * (F.col("_c") - 1))
                    / F.sum(F.length("_l") * F.col("_c")),
                ),
                6,
            ).alias("dup_line_char_frac"),
        )
    )
    from .hashing import word_shingles

    allgrams = F.concat(*[word_shingles(F.col(text_col), n) for n in ngram_ns])
    grams = (
        df.select(
            F.col(id_col),
            F.length(text_col).alias("_nc"),
            F.explode(allgrams).alias("_g"),
        )
        .withColumn("_n", F.size(F.split(F.col("_g"), " ")))
        .groupBy(id_col, "_nc", "_n", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(*[
            F.round(
                F.coalesce(
                    F.max(
                        F.when(F.col("_n") == n, F.col("_c") * F.length("_g"))
                    ) / F.max("_nc"),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"top{n}gram_char_frac")
            for n in ngram_ns
        ])
    )
    return lines.join(grams, id_col)


def vocab_topk(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Corpus-level vocabulary statistics: the ``k`` most frequent
    whitespace tokens as (token, n). Deterministic under ties: ordered by
    (n DESC, token ASC), so the returned SET is engine-independent.

    Shape at scale: explode -> one hash aggregation on the token key
    (map-side partials) -> global top-k via orderBy+limit, which Spark
    executes as TakeOrderedAndProject (per-partition heaps of size k,
    never a full sort/materialization)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# tokenizer-faithful token counts (optional Arrow stage)
# ---------------------------------------------------------------------------

def default_tokenizer_factory():
    """Build a batch token counter from whatever real tokenizer the
    environment offers — tried in order: ``tiktoken`` (cl100k_base),
    ``transformers``' GPT-2 ``AutoTokenizer``. Raises
    ``NotImplementedError`` when neither is importable, exactly like the
    media-decode degrade (multimodal.py ``decode_image``; reference
    analog: the GDAL-absence pattern,
    /root/reference/mlcast_dataset_validator/checks/tool_compatibility/gdal.py:21-36).

    Returned interface: ``counter(list[str]) -> list[int]`` — batch
    form, so per-call tokenizer overhead amortizes over an Arrow batch.
    """
    try:
        import tiktoken  # type: ignore

        # get_encoding may FETCH the BPE table on first use — any
        # failure (offline container, no cache) must surface here, not
        # as a mid-job executor crash, so catch broadly and fall through
        enc = tiktoken.get_encoding("cl100k_base")
        return lambda texts: [len(ids) for ids in
                              enc.encode_ordinary_batch(list(texts))]
    except Exception:
        pass
    try:
        from transformers import AutoTokenizer  # type: ignore

        # from_pretrained resolves from network/disk cache — same deal
        tok = AutoTokenizer.from_pretrained("gpt2")
        return lambda texts: [len(ids) for ids in
                              tok(list(texts))["input_ids"]]
    except Exception as exc:
        raise NotImplementedError(
            "tokenizer-faithful counting requires a constructible "
            "tiktoken or transformers tokenizer (importable AND its "
            "vocab resolvable from cache/network); neither is — use "
            "the heuristic bpe_ish_token_count / ws_token_count "
            "columns instead"
        ) from exc


def tokenizer_available() -> bool:
    """Driver-side probe: can :func:`default_tokenizer_factory` build a
    WORKING tokenizer here? Constructs one and counts a probe string —
    an import-only check would pass on a container where the vocab
    download then fails inside every executor task (the exact mid-job
    crash this gate exists to prevent). Result cached per process."""
    global _TOKENIZER_PROBE
    if _TOKENIZER_PROBE is None:
        try:
            counter = default_tokenizer_factory()
            _TOKENIZER_PROBE = counter(["probe"])[0] >= 0
        except Exception:
            _TOKENIZER_PROBE = False
    return _TOKENIZER_PROBE


_TOKENIZER_PROBE: bool | None = None


def count_tokens(
    df: DataFrame,
    text_col: str,
    out_col: str = "n_tokens",
    tokenizer_factory=None,
) -> DataFrame:
    """Append a TOKENIZER-FAITHFUL token count column via one Arrow
    ``mapInPandas`` stage — the optional replacement for the heuristic
    :func:`bpe_ish_token_count` when pack boundaries must match training
    reality (sequence packing and context budgets consume ``out_col``).

    ``tokenizer_factory`` is a zero-arg callable returning a batch
    counter ``list[str] -> list[int]``; it is resolved ONCE PER TASK on
    the executor (tokenizers are not picklable; the factory is). Default
    = :func:`default_tokenizer_factory`, whose availability is probed
    DRIVER-SIDE first so an absent tokenizer fails fast with
    ``NotImplementedError`` instead of a mid-job executor crash.

    Scale: Arrow-batched (no per-row Python), schema = input + one int
    column, no shuffle — the stage pipelines with the scan. NULL text
    counts 0 tokens.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    if tokenizer_factory is None:
        if not tokenizer_available():
            # raise the factory's own error, driver-side
            default_tokenizer_factory()
        tokenizer_factory = default_tokenizer_factory

    # StructType.add mutates in place — never call it on df.schema (the
    # session caches that object); build a fresh copy instead
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )

    def _count(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        counter = tokenizer_factory()
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            counts = counter(texts)
            out = pdf.copy()
            out[out_col] = pd.Series(counts, index=pdf.index,
                                     dtype="int32")
            yield out

    return df.mapInPandas(_count, schema=out_schema)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
    min_tail: int = 1,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the context-window preparation step (size = model context in chars,
    ``stride < size`` overlaps consecutive chunks so no boundary context
    is lost). Output: ``(id_col, chunk_no, chunk_text)``; ``chunk_no``
    is 0-based, chunk k covers ``[k*stride, k*stride + size)``.

    A document yields ``ceil(max(len - size, 0) / stride) + 1`` chunks;
    trailing chunks shorter than ``min_tail`` are dropped (a tail that
    is pure overlap of the previous chunk adds no new text). NULL/empty
    text yields no chunks.

    Scale shape: pure map-side ``sequence`` + ``explode`` +
    ``substring`` — zero shuffle, codegen'd, pipelines with the scan;
    output row count is input chars / stride, the same fan-out any
    engine must pay. Chunking on chars (not tokens) keeps the operator
    exact and engine-portable; compose with :func:`count_tokens` when
    chunk budgets must be tokenizer-faithful.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    stride = size if stride is None else stride
    if not 1 <= stride <= size:
        raise ValueError(f"stride must be in [1, size], got {stride}")
    n = F.length(F.col(text_col))
    # last chunk index: ceil(max(n - size, 0) / stride)
    last = F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(stride))
    chunks = F.when(
        n > 0, F.sequence(F.lit(0), last.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    out = (
        df.select(id_col, F.col(text_col).alias("_txt"),
                  F.explode(chunks).alias("chunk_no"))
        .select(
            id_col, "chunk_no",
            F.substring(F.col("_txt"),
                        F.col("chunk_no") * stride + 1,
                        size).alias("chunk_text"))
    )
    if min_tail > 1:
        out = out.where(F.length("chunk_text") >= min_tail)
    return out


# ---------------------------------------------------------------------------
# Gopher/MassiveText quality-rule filter (Rae et al. 2021, appendix A1.1)

#: the Gopher stop-word presence set (rule 7: a document must contain at
#: least 2 of these words)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: rule thresholds (words, mean-word-length band, symbol/bullet/ellipsis/
#: alpha-word fractions) — the published MassiveText values
GOPHER_RULES = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3, max_mean_word_len=10,
    max_symbol_ratio_pct=10,      # symbols ("#", "...") per word <= 10%
    max_bullet_line_pct=90,       # lines starting with a bullet <= 90%
    max_ellipsis_line_pct=30,     # lines ending with "..." <= 30%
    min_alpha_word_pct=80,        # words containing a-z >= 80%
    min_stopwords=2,
)

_GOPHER_BULLET_PAT = r"^\s*[-*•‣▪●◦]"
_GOPHER_ELLIPSIS_PAT = r"(\.\.\.|…)\s*$"


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The Gopher / MassiveText document quality filter (Rae et al.
    2021, arXiv:2112.11446, appendix A1.1 — public paper): the seven
    published rules as one map-side row filter. Appends the raw counts,
    one boolean per rule, and the conjunction ``gopher_pass``.

    Every rule threshold is evaluated in INTEGER cross-multiplication
    (e.g. mean word length in [3,10] <=> ``3*n_words <= n_word_chars <=
    10*n_words``; >=80% alpha words <=> ``5*n_alpha_words >=
    4*n_words``), so verdicts are exact and engine-portable — no float
    crosses a comparison boundary. Counts:

    - ``n_words``: whitespace tokens; ``n_word_chars``: non-whitespace
      characters (so mean word length = n_word_chars / n_words).
    - ``n_symbols``: non-overlapping occurrences of ``#`` or ``...``.
    - ``n_lines`` / ``n_bullet_lines`` / ``n_ellipsis_lines``: newline-
      separated lines, bullet-start and ellipsis-end per the published
      rule.
    - ``n_alpha_words``: words containing at least one ASCII letter.
    - ``n_stopwords``: how many DISTINCT Gopher stop words appear.

    Scale shape: pure codegen'd string/regex expressions — zero
    shuffle, zero explode, pipelines with the scan (the published
    filter's per-document independence is exactly Spark's map side).
    NULL text yields zero counts and fails rule 1, keeping the operator
    total. Reference analog: the reference's tri-state payload checks
    (``/root/reference/mlcast_dataset_validator/checks/data_vars/
    naming.py:45-158``) are membership rules on names; this is the
    corpus-scale content analog the pipeline brief calls for.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts, rules = gopher_exprs(t)
    out = df.select(
        F.col(id_col),
        *[c.alias(k) for k, c in counts.items()],
        *[c.alias(k) for k, c in rules.items()],
    )
    passed = None
    for k in rules:
        passed = F.col(k) if passed is None else passed & F.col(k)
    return out.withColumn("gopher_pass", passed)


def gopher_exprs(
    t: Column,
    rules: dict[str, int] | None = None,
) -> tuple[dict[str, Column], dict[str, Column]]:
    """The Gopher counts and rule booleans as reusable Column
    expressions over an (already NULL-coalesced) text column — single
    source of truth for :func:`gopher_quality` and the ``gopher_rules``
    check kind (operators/text_quality.py), which rides them on the
    fused scan's Observation. ``rules`` overrides individual
    :data:`GOPHER_RULES` thresholds (corpora legitimately deviate from
    the web-page defaults — e.g. chat turns are shorter than 50 words);
    unknown keys raise."""
    r = dict(GOPHER_RULES)
    if rules:
        bad = set(rules) - set(r)
        if bad:
            raise ValueError(f"unknown Gopher rule overrides: {sorted(bad)}")
        r.update(rules)
    n_words = ws_token_count(t)
    n_word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    # '…' counts like '...': the MassiveText symbol rule treats the
    # ellipsis generically, and the ellipsis-LINE rule below already
    # accepts both spellings
    n_symbols = (F.coalesce(F.regexp_count(t, F.lit("#")), F.lit(0))
                 + F.coalesce(F.regexp_count(t, F.lit(r"\.\.\.")), F.lit(0))
                 + F.coalesce(F.regexp_count(t, F.lit("…")), F.lit(0)))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(_GOPHER_BULLET_PAT)))
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike(_GOPHER_ELLIPSIS_PAT)))
    words = F.when(F.length(F.trim(t)) > 0, F.split(F.trim(t), r"\s+")) \
             .otherwise(F.array().cast("array<string>"))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = sum(
        (stopword_count(t, [w]) > 0).cast("int") for w in GOPHER_STOPWORDS)

    rules = {
        "r_word_count": (n_words >= r["min_words"])
        & (n_words <= r["max_words"]),
        "r_mean_word_len": (n_word_chars >= r["min_mean_word_len"] * n_words)
        & (n_word_chars <= r["max_mean_word_len"] * n_words),
        "r_symbol_ratio":
            n_symbols * 100 <= r["max_symbol_ratio_pct"] * n_words,
        "r_bullet_lines":
            n_bullet * 100 <= r["max_bullet_line_pct"] * n_lines,
        "r_ellipsis_lines":
            n_ellipsis * 100 <= r["max_ellipsis_line_pct"] * n_lines,
        "r_alpha_words":
            n_alpha * 100 >= r["min_alpha_word_pct"] * n_words,
        "r_stopwords": n_stop >= r["min_stopwords"],
    }
    counts = {
        "n_words": n_words,
        "n_word_chars": n_word_chars.cast("int"),
        "n_symbols": n_symbols.cast("int"),
        "n_lines": n_lines.cast("int"),
        "n_bullet_lines": n_bullet.cast("int"),
        "n_ellipsis_lines": n_ellipsis.cast("int"),
        "n_alpha_words": n_alpha.cast("int"),
        "n_stopwords": n_stop.cast("int"),
    }
    return counts, rules


def gopher_pass_expr(t: Column) -> Column:
    """The 7-rule conjunction as ONE boolean Column (for aggregate
    checks that only need the verdict)."""
    _, rules = gopher_exprs(t)
    passed = None
    for c in rules.values():
        passed = c if passed is None else passed & c
    return passed


def gopher_quality_sql(table: str, id_expr: str, text_expr: str) -> str:
    """DuckDB mirror of :func:`gopher_quality` — same counts, same
    integer cross-multiplied rule arithmetic, same column names."""
    r = GOPHER_RULES
    stop_sum = " + ".join(
        f"CASE WHEN regexp_matches(_t, '(?i)\\b({w})\\b') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS)
    return f"""
WITH d AS (SELECT {id_expr} AS doc_id, COALESCE({text_expr}, '') AS _t
           FROM {table}),
c AS (SELECT doc_id, _t,
        CASE WHEN length(trim(_t)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(_t), '\\s+')) END
            ::INT AS n_words,
        length(regexp_replace(_t, '\\s', '', 'g'))::INT AS n_word_chars,
        (len(regexp_extract_all(_t, '#'))
         + len(regexp_extract_all(_t, '\\.\\.\\.'))
         + len(regexp_extract_all(_t, '…')))::INT AS n_symbols,
        len(string_split(_t, chr(10)))::INT AS n_lines,
        len(list_filter(string_split(_t, chr(10)),
            l -> regexp_matches(l, '^\\s*[-*•‣▪●◦]')))
            ::INT AS n_bullet_lines,
        len(list_filter(string_split(_t, chr(10)),
            l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
            ::INT AS n_ellipsis_lines,
        CASE WHEN length(trim(_t)) = 0 THEN 0
             ELSE len(list_filter(regexp_split_to_array(trim(_t), '\\s+'),
                      w -> regexp_matches(w, '[A-Za-z]'))) END
            ::INT AS n_alpha_words,
        ({stop_sum})::INT AS n_stopwords
      FROM d)
SELECT doc_id, n_words, n_word_chars, n_symbols, n_lines, n_bullet_lines,
       n_ellipsis_lines, n_alpha_words, n_stopwords,
       (n_words >= {r['min_words']} AND n_words <= {r['max_words']})
           AS r_word_count,
       (n_word_chars >= {r['min_mean_word_len']} * n_words
        AND n_word_chars <= {r['max_mean_word_len']} * n_words)
           AS r_mean_word_len,
       (n_symbols * 100 <= {r['max_symbol_ratio_pct']} * n_words)
           AS r_symbol_ratio,
       (n_bullet_lines * 100 <= {r['max_bullet_line_pct']} * n_lines)
           AS r_bullet_lines,
       (n_ellipsis_lines * 100 <= {r['max_ellipsis_line_pct']} * n_lines)
           AS r_ellipsis_lines,
       (n_alpha_words * 100 >= {r['min_alpha_word_pct']} * n_words)
           AS r_alpha_words,
       (n_stopwords >= {r['min_stopwords']}) AS r_stopwords,
       (n_words >= {r['min_words']} AND n_words <= {r['max_words']}
        AND n_word_chars >= {r['min_mean_word_len']} * n_words
        AND n_word_chars <= {r['max_mean_word_len']} * n_words
        AND n_symbols * 100 <= {r['max_symbol_ratio_pct']} * n_words
        AND n_bullet_lines * 100 <= {r['max_bullet_line_pct']} * n_lines
        AND n_ellipsis_lines * 100 <= {r['max_ellipsis_line_pct']} * n_lines
        AND n_alpha_words * 100 >= {r['min_alpha_word_pct']} * n_words
        AND n_stopwords >= {r['min_stopwords']}) AS gopher_pass
FROM c"""


def lang_mix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = "\\. ",
) -> DataFrame:
    """CCNet-style per-segment language profile (CCNet, arXiv:1911.00359
    — public paper — runs language ID per PARAGRAPH, not per document:
    code-switched and template-mixed documents look monolingual to a
    doc-level vote). Splits the document into segments, language-IDs
    each with the shared :func:`lang_id` marker vote, and returns per
    document:

    - ``n_segments``: non-blank segments;
    - ``n_langs``: distinct segment languages ('und' counts — a marker
      drought is itself signal);
    - ``majority_lang`` / ``majority_frac``: the plurality language and
      its share (ties break lang-ascending — total, engine-portable);
    - ``mixed``: more than one distinct segment language.

    Scale shape: explode + two id-keyed hash aggregations (the second
    reuses the first's partitioning; rows after stage one are bounded
    by ids x |LANG_MARKERS|+1) and a bounded per-doc window — the
    text_repetition cost profile. Documents with no non-blank segments
    drop out (inner semantics, mirrored by the oracle).
    """
    from pyspark.sql import Window

    seg = (
        df.select(F.col(id_col),
                  F.explode(F.split(F.col(text_col), line_sep)).alias("_l"))
        .where(F.length(F.trim(F.col("_l"))) > 0)
        .select(id_col, lang_id(F.col("_l")).alias("_lang"))
        .groupBy(id_col, "_lang").agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_c"), F.asc("_lang"))
    ranked = seg.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.sum("_c").cast("int").alias("n_segments"),
            F.count(F.lit(1)).cast("int").alias("n_langs"),
            F.max(F.when(F.col("_rn") == 1, F.col("_lang")))
             .alias("majority_lang"),
            F.round(
                F.max(F.when(F.col("_rn") == 1, F.col("_c"))) / F.sum("_c"),
                6).alias("majority_frac"),
        )
        .withColumn("mixed", F.col("n_langs") > 1)
    )


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_df: DataFrame,
    vocab_col: str = "w",
) -> DataFrame:
    """Out-of-vocabulary profiling against a reference word vocabulary
    (the release-over-release check: vocabulary induced from release N,
    coverage measured on release N+1 — OOV rate jumps when a new crawl
    source or template enters the mix, BEFORE length/quality stats
    move). Returns ``(id, n_words, n_oov, oov_rate)`` per document;
    docs with no words drop out.

    Scale shape: the vocabulary is Heaps-bounded -> ``broadcast()``
    left-anti-style membership via a broadcast LEFT join + null test,
    one corpus scan, one id-keyed aggregation. Compose with
    :func:`~mlcast_sourcedata_validator_spark.functions.bpe.bpe_learn`'s
    word table or ``vocab_topk`` for a frequency-capped vocabulary.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.when(F.length(F.trim(F.coalesce(F.col(text_col),
                                              F.lit("")))) > 0,
                   F.split(F.trim(F.col(text_col)), r"\s+"))
            .otherwise(F.array().cast("array<string>"))
        ).alias("_w"),
    )
    vocab = vocab_df.select(F.col(vocab_col).alias("_w")).distinct() \
                    .withColumn("_in", F.lit(1))
    return (
        words.join(F.broadcast(vocab), "_w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
             .cast("int").alias("n_oov"),
        )
        .withColumn("oov_rate",
                    F.round(F.col("n_oov") / F.col("n_words"), 6))
    )
