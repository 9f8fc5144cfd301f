"""Golden end-to-end composition: the full training-data pipeline built
ONLY from this engine's public operators, over a JSONL shard dump —
ingest -> validate+quarantine -> exact dedup -> eval-set decontamination
-> PII redaction -> deterministic mixture sampling -> write. Each stage
is lazy; the whole pipeline is a handful of Spark jobs, no driver-side
row loops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.compiler import quarantine
from mlcast_sourcedata_validator_spark.functions import dedup as dd
from mlcast_sourcedata_validator_spark.functions import sampling as sp
from mlcast_sourcedata_validator_spark.functions import text as tx
from mlcast_sourcedata_validator_spark.sources.tables import read_table
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite


def test_golden_pipeline_jsonl_to_training_shard(spark, sf_dir, tmp_path):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = base.schema
    dirty = base.unionByName(spark.createDataFrame(
        [
            # bad lang -> quarantined by the suite
            (8_000_001, "some text in an unknown language", "xx", "web", 32),
            # PII -> quarantined (pii_screen), then redactable
            (8_000_002, "email bob@x.io please", "en", "web", 21),
            # exact duplicate of itself twice -> dedup keeps one (long
            # enough to clear documents_v1's gopher_rules word floor, so
            # only the dedup stage may drop it)
            (8_000_003, "an exactly duplicated document body that repeats "
                        "verbatim across the web dump", "en", "web", 77),
            (8_000_004, "an exactly duplicated document body that repeats "
                        "verbatim across the web dump", "en", "web", 77),
        ],
        schema,
    ))
    src = str(tmp_path / "shards_jsonl")
    dirty.write.mode("overwrite").json(src)

    # 1. ingest: JSONL with the explicit schema (scale path, no inference)
    docs = read_table(spark, src, fmt="json", schema=schema)
    assert docs.schema == schema

    # 2. validate + quarantine: clean rows flow on
    ctx = RunContext(spark=spark, df=docs, suite=get_suite("documents_v1"),
                     run_id="golden")
    clean, flagged = quarantine(ctx)
    flagged_ids = {r.doc_id for r in flagged.select("doc_id").collect()}
    assert {8_000_001, 8_000_002} <= flagged_ids

    # 3. exact dedup (min-id representative)
    deduped = dd.exact_dedup(clean, "doc_id", "text")
    kept = {r.doc_id for r in deduped.select("doc_id").collect()}
    assert 8_000_003 in kept and 8_000_004 not in kept

    # 4. decontaminate against an eval split (every 100th doc)
    ev = base.where(F.col("doc_id") % 100 == 0)
    train = deduped.where(F.col("doc_id") % 100 != 0)
    decon = dd.decontaminate(train, "doc_id", "text", ev, "text",
                             n=3, min_hits=3)

    # 5. redact (belt-and-braces even after quarantine) + 6. sample
    redacted = tx.redact_pii(decon, "text")
    shard = sp.sample_by_mixture(redacted, "doc_id", "lang",
                                 {"en": 1.0, "de": 0.5}, default=0.1, seed=3)
    out = str(tmp_path / "training_shard")
    shard.write.mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n = back.count()
    assert 0 < n < dirty.count()
    # determinism: rebuilding the whole pipeline yields the same shard
    shard2 = sp.sample_by_mixture(
        tx.redact_pii(
            dd.decontaminate(
                dd.exact_dedup(
                    quarantine(RunContext(spark=spark, df=docs,
                                          suite=get_suite("documents_v1"),
                                          run_id="golden2"))[0],
                    "doc_id", "text"),
                "doc_id", "text", ev, "text", n=3, min_hits=3),
            "text"),
        "doc_id", "lang", {"en": 1.0, "de": 0.5}, default=0.1, seed=3)
    assert ({r.doc_id for r in back.collect()}
            == {r.doc_id for r in shard2.select("doc_id").collect()})
    # no quarantined doc survived into the shard
    assert not (flagged_ids & {r.doc_id for r in back.collect()})
