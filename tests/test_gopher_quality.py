"""Gopher/MassiveText quality-rule filter (functions/text.py
gopher_quality): per-rule behavior on crafted documents plus the exact
Spark-vs-DuckDB mirror on the parquet fixture corpus (the driver-style
compare also runs in test_extra_oracles.py once wired).

Reference scope note: the reference's payload checks are rule-based
tri-states on names/attrs
(/root/reference/mlcast_dataset_validator/checks/data_vars/naming.py:45-158);
the published MassiveText rule set (Rae et al. 2021, arXiv:2112.11446,
appendix A1.1) is the corpus-scale content analog.
"""

from __future__ import annotations

import duckdb
import pytest

from mlcast_sourcedata_validator_spark.functions.text import (
    gopher_quality,
    gopher_quality_sql,
)

GOOD = ("The quick brown fox jumps over the lazy dog and runs off to "
        "the river bank with a bag of apples that have been washed. "
        "It then naps in the shade of an old oak tree near the water "
        "for most of the warm afternoon, waking only to drink a bit "
        "of water.")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows):
    out = gopher_quality(_df(spark, rows), "doc_id", "text")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_good_document_passes(spark):
    r = _run(spark, [(1, GOOD)])[1]
    assert r["gopher_pass"] is True
    assert r["n_words"] == 53  # >= the 50-word minimum
    assert r["n_stopwords"] >= 2


def test_each_rule_fires(spark):
    rows = [
        (1, "too few words"),                              # r_word_count
        (2, " ".join(["a"] * 60) + " the of"),             # mean word len < 3
        (3, GOOD + " " + "#" * 30),                        # symbol ratio
        (4, "\n".join(["- item of the day to be had"] * 10)),  # bullets
        (5, "\n".join(["we trailed off and then..."] * 10)),   # ellipsis
        (6, GOOD + " " + " ".join(["123456"] * 40)),       # alpha words
        (7, " ".join(["word"] * 60)),                      # no stopwords
    ]
    out = _run(spark, rows)
    assert not out[1]["r_word_count"] and not out[1]["gopher_pass"]
    assert not out[2]["r_mean_word_len"]
    assert not out[3]["r_symbol_ratio"]
    assert not out[4]["r_bullet_lines"]
    assert not out[5]["r_ellipsis_lines"]
    assert not out[6]["r_alpha_words"]
    assert not out[7]["r_stopwords"] and not out[7]["gopher_pass"]


def test_null_and_empty_text_fail_totally(spark):
    out = _run(spark, [(1, None), (2, ""), (3, "   ")])
    for k in out:
        assert out[k]["n_words"] == 0
        assert out[k]["gopher_pass"] is False


def test_mirror_exact_on_fixture_corpus(spark, sf_dir):
    """Every count and verdict is integer/boolean, so the DuckDB mirror
    must agree bit-exactly on the real fixture corpus."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r) for r in gopher_quality(df, "doc_id", "text").collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'")
    want = sorted(
        tuple(r) for r in
        con.execute(gopher_quality_sql("documents", "doc_id", "text"))
        .fetchall())
    assert got == want


def test_boundary_is_integer_exact(spark):
    """Exactly-80% alpha words passes; one word below fails — the
    cross-multiplied integer comparison puts the boundary precisely at
    the published threshold."""
    # 50 words total (passes word count), stopwords present
    alpha40 = ["the", "of", "and", "that"] * 10          # 40 alpha words
    digits10 = ["12345"] * 10                            # 10 non-alpha
    doc_pass = " ".join(alpha40 + digits10)              # 40/50 = 80%
    doc_fail = " ".join(alpha40[:-1] + ["99999"] + digits10)  # 39/50
    out = _run(spark, [(1, doc_pass), (2, doc_fail)])
    assert out[1]["r_alpha_words"] is True
    assert out[2]["r_alpha_words"] is False


def test_gopher_rules_check_kind(spark):
    """The gopher_rules check FAILs a corpus where >10% of docs break
    the (overridden) rule set, and the violation rows name the broken
    rules."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    good = "the fox and the dog ran off to the river " * 3
    rows = [(i, good) for i in range(8)]
    rows += [(100, "short text"), (101, "#### " * 20)]   # 2/10 fail
    df = spark.createDataFrame(rows, "doc_id long, text string")
    suite = CheckSuite("g", [CheckSpec(
        "gq", "gopher_rules", "q", "gopher",
        {"column": "text", "max_fail_frac": 0.1,
         "rules": {"min_words": 10}})],
        conv_col="doc_id", turn_col="doc_id", ts_col="doc_id")
    res = run_suite(RunContext(spark=spark, df=df, suite=suite, run_id="g"))
    assert res.report.has_fails()
    viol = {r["detail"] for r in res.violations.collect()}
    assert any("r_word_count" in v for v in viol)
    assert any("r_symbol_ratio" in v for v in viol)

    # under the tolerance: 2/30 fail -> PASS band, rows still emitted
    many = [(200 + i, good) for i in range(20)]
    df2 = spark.createDataFrame(rows + many, "doc_id long, text string")
    res2 = run_suite(RunContext(spark=spark, df=df2, suite=suite,
                                run_id="g2"))
    assert not res2.report.has_fails()
    assert res2.violations.count() == 2


def test_unicode_ellipsis_counts_as_symbol(spark):
    """'…' counts toward the symbol ratio exactly like '...' — the
    MassiveText rule treats the ellipsis symbol generically, and the
    ellipsis-LINE rule already accepted both spellings (round-5 ADVICE
    fidelity fix)."""
    out = _run(spark, [
        (1, GOOD + " " + "…" * 30),      # unicode ellipses only
        (2, GOOD + " " + "..." * 30),    # ASCII ellipses
    ])
    assert out[1]["n_symbols"] == 30
    assert not out[1]["r_symbol_ratio"] and not out[1]["gopher_pass"]
    assert out[2]["n_symbols"] == 30
    assert not out[2]["r_symbol_ratio"]
