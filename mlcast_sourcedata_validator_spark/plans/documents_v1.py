"""documents_v1 — CheckSuite for LLM training-document corpora.

Second spec module, discovered by the package walk in suite.py exactly
like the reference discovers ``specs/<stage>/<product>`` modules
(/root/reference/mlcast_dataset_validator/specs/cli.py:18-44). It
validates the driver's ``documents`` table shape
(doc_id:long, text:string, lang:string, source:string, n_chars:long)
and folds the §2C dedup surface into the validation engine via the
``dup_rate`` check.

Column bindings: the violations table schema is fixed at
(check_id, conv_id, turn_idx, detail) — for documents both id slots are
bound to ``doc_id``, so a violation row identifies the offending
document twice (harmless, and keeps one results/violations store shape
across suites). No window checks are declared, so the suite compiles to
a single scan with ZERO shuffles (agg checks ride the Observation, row
checks explode into violations map-side).
"""

from __future__ import annotations

from ..suite import CheckSpec, CheckSuite, register_suite

LANGS = ["en", "de", "fr", "es", "zh"]


@register_suite("documents_v1")
def suite() -> CheckSuite:
    checks = [
        CheckSpec(
            "schema_columns", "required_columns", "3.1 schema",
            "The table MUST have columns (doc_id:bigint, text:string, "
            "lang:string, source:string, n_chars:bigint).",
            {
                "required": {
                    "doc_id": "bigint", "text": "string", "lang": "string",
                    "source": "string", "n_chars": "bigint",
                },
                "expected_order": ["doc_id", "text", "lang", "source",
                                   "n_chars"],
            },
        ),
        CheckSpec(
            "schema_drift", "schema_drift", "3.1 schema",
            "The live schema SHOULD match the signature recorded at table "
            "creation (schema-evolution drift: added/removed/retyped "
            "columns FAIL; no recorded baseline is a WARNING).",
            {"property_key": "schema_signature"},
        ),
        CheckSpec(
            "unique_doc_id", "unique_column", "3.2 keys",
            "doc_id MUST be unique and non-null.",
            {"column": "doc_id"},
        ),
        CheckSpec(
            "text_null_rate", "null_rate", "4.1 nulls",
            "text MUST be non-null in at least 99.9% of documents; doc_id "
            "MUST never be null.",
            {"columns": {"text": 0.001, "doc_id": 0.0}},
        ),
        CheckSpec(
            "lang_domain", "domain", "4.2 domains",
            "lang MUST be one of en|de|fr|es|zh (compared lower/trimmed; "
            "non-canonical spelling is a WARNING).",
            {"column": "lang", "allowed": LANGS, "nullable": False},
        ),
        CheckSpec(
            "n_chars_consistency", "sql_predicate", "4.3 consistency",
            "n_chars MUST equal length(text) on every row.",
            {"violation_when": "n_chars IS DISTINCT FROM length(text)",
             "detail": "concat('n_chars=', n_chars, ' != length(text)=', "
                       "length(text))"},
        ),
        CheckSpec(
            "n_chars_bounds", "numeric_bounds", "4.4 payload stats",
            "document length SHOULD lie within sane bounds.",
            {"expr": "n_chars", "lo": 0, "hi": 10_000_000,
             "warn_hi": 1_000_000},
        ),
        CheckSpec(
            "doc_cardinality", "cardinality", "4.5 cardinality",
            "The corpus MUST contain at least 2 distinct documents "
            "(HyperLogLog estimate).",
            {"column": "doc_id", "min_distinct": 2},
        ),
        CheckSpec(
            "min_rows", "min_rows", "4.6 size",
            "The batch MUST contain at least 1 row.",
            {"min_rows": 1},
        ),
        CheckSpec(
            "dup_rate", "dup_rate", "4.7 dedup",
            "The exact-duplicate content rate SHOULD be below 5% and MUST "
            "be below 20% (md5 distinct sketch over the fused scan).",
            {"column": "text", "warn_frac": 0.05, "max_frac": 0.2},
        ),
        CheckSpec(
            "text_quality_band", "text_quality", "4.8 quality",
            "Documents SHOULD score above the composite quality floor "
            "(length band + punctuation + mean token length); more than "
            "1% sub-floor documents is a FAIL.",
            {"column": "text", "floor": 0.3, "max_low_frac": 0.01,
             "warn_low_frac": 0.001, "min_avg": 0.5},
        ),
        CheckSpec(
            "text_repetition", "text_repetition", "4.9 repetition",
            "Documents SHOULD NOT be dominated by repeated sentences "
            "(dup-sentence ratio <= 0.5); more than 2% repetitive "
            "documents is a FAIL.",
            {"column": "text", "max_dup_sentence_ratio": 0.5,
             "max_frac": 0.02, "warn_frac": 0.005},
        ),
        CheckSpec(
            "gopher_rules", "gopher_rules", "4.12 quality",
            "Documents SHOULD clear the Gopher/MassiveText rule set "
            "(word-count band, mean word length, symbol ratio, bullet/"
            "ellipsis line fractions, alpha-word fraction; stop-word "
            "floor relaxed for this synthetic vocabulary); more than "
            "10% failing documents is a FAIL.",
            {"column": "text", "max_fail_frac": 0.1,
             "warn_fail_frac": 0.02,
             "rules": {"min_words": 10, "min_stopwords": 0}},
        ),
        CheckSpec(
            "pii_screen", "pii", "4.11 pii",
            "Documents MUST NOT contain PII patterns (email/ipv4/ssn/"
            "phone); offending documents are listed for redaction.",
            {"column": "text", "max_frac": 0.0, "warn_frac": 0.0},
        ),
        CheckSpec(
            "drift_doc_len", "drift", "4.10 drift",
            "The document-length distribution SHOULD NOT drift from the "
            "baseline snapshot (KS<=0.15 WARN, <=0.30 FAIL; PSI<=0.2 "
            "WARN, <=0.5 FAIL).",
            {"metric": "doc_len_chars", "expr": "length(text)",
             "scale": "log", "lo": 1.0, "hi": 100000.0, "n_bins": 32,
             "warn_ks": 0.15, "max_ks": 0.30, "warn_psi": 0.2,
             "max_psi": 0.5},
        ),
        CheckSpec(
            "drift_lang_dist", "categorical_drift", "4.10 drift",
            "The language mix SHOULD NOT drift from the baseline "
            "snapshot (TVD<=0.10 WARN, <=0.25 FAIL; PSI<=0.2 WARN, "
            "<=0.5 FAIL) — a crawl-source change shifts this first.",
            {"metric": "lang_dist", "expr": "lang", "categories": LANGS,
             "warn_tvd": 0.10, "max_tvd": 0.25,
             "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "license", "license", "5.1 licensing",
            "The table MUST declare a 'license' property; it SHOULD be a "
            "valid SPDX expression from the recommended list; NC/ND "
            "licenses trigger a WARNING.",
            {"require_spdx": True, "warn_on_restricted": True,
             "recommended": ["CC0-1.0", "CC-BY-4.0", "CC-BY-SA-4.0",
                             "MIT", "Apache-2.0"]},
        ),
        CheckSpec(
            "roundtrip", "roundtrip", "5.2 interop",
            "A sample of the batch MUST survive a parquet write/read "
            "roundtrip exactly.",
            {"sample_rows": 100},
        ),
        CheckSpec(
            "text_decode", "sampled_decode", "5.3 interop",
            "Text values MUST survive a utf-8 encode/decode roundtrip.",
            # full mode rides the fused Observation the quality checks
            # already pay for — total coverage, zero extra jobs
            {"column": "text", "mode": "full"},
        ),
        CheckSpec(
            "storage_codec", "storage_codec", "6.1 compression",
            "Files MUST be compressed; zstd is RECOMMENDED.",
            {"require_compression": True, "recommended": "zstd"},
        ),
    ]
    return CheckSuite(suite_id="documents_v1", checks=checks,
                      conv_col="doc_id", turn_col="doc_id", ts_col="doc_id")
