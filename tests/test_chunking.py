"""chunk_documents: fixed-size overlapping character chunks
(functions/text.py) — the context-window preparation step."""

import pytest
from pyspark.sql import Row

from mlcast_sourcedata_validator_spark.functions.text import chunk_documents


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_chunk_coverage_and_overlap(spark):
    """Chunk k covers [k*stride, k*stride+size); consecutive chunks
    overlap by size-stride chars; every char appears in some chunk."""
    text = "abcdefghij"  # 10 chars
    out = {r["chunk_no"]: r["chunk_text"]
           for r in chunk_documents(_df(spark, [text]), "doc_id", "text",
                                    size=4, stride=3).collect()}
    assert out == {0: "abcd", 1: "defg", 2: "ghij"}
    # stride == size: exact partition, reconstruction by concatenation
    parts = chunk_documents(_df(spark, [text]), "doc_id", "text",
                            size=4, stride=4) \
        .orderBy("chunk_no").collect()
    assert "".join(r["chunk_text"] for r in parts) == text
    assert [r["chunk_no"] for r in parts] == [0, 1, 2]


def test_chunk_edges(spark):
    """Short docs yield one whole chunk; empty/NULL yield none;
    min_tail drops stub tails; parameter validation."""
    df = spark.createDataFrame(
        [Row(doc_id=0, text="ab"), Row(doc_id=1, text=""),
         Row(doc_id=2, text=None), Row(doc_id=3, text="abcdefg")])
    got = chunk_documents(df, "doc_id", "text", size=5, stride=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert by_doc[0] == ["ab"]
    assert 1 not in by_doc and 2 not in by_doc
    # doc 3 (7 chars): chunks at 0 ("abcde") and ceil(2/2)=1 -> "cdefg"
    assert sorted(by_doc[3]) == ["abcde", "cdefg"]

    trimmed = chunk_documents(df, "doc_id", "text", size=5, stride=5,
                              min_tail=3).collect()
    texts3 = [r["chunk_text"] for r in trimmed if r["doc_id"] == 3]
    assert texts3 == ["abcde"]  # the 2-char tail "fg" dropped

    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, "doc_id", "text", size=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, "doc_id", "text", size=4, stride=5)


def test_chunk_plan_is_map_side(spark, sf_dir):
    """Zero Exchange: sequence+explode+substring pipelines with the scan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = chunk_documents(d, "doc_id", "text", size=500, stride=400) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
