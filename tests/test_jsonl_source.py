"""JSONL ingestion: clean/quarantine split and catalog loading."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.sources.jsonl import ingest_jsonl, read_jsonl_corpus

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": 3, "text": "truncated...',          # malformed JSON
    'not json at all',                               # garbage line
    '{"doc_id": 4, "text": "ok", "lang": "en"}',
]


def _write(tmp_path, lines, name="corpus.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_splits_clean_and_quarantine(spark, tmp_path):
    path = _write(tmp_path, LINES)
    batch = read_jsonl_corpus(spark, path, DOC_SCHEMA)
    clean, bad = batch.clean, batch.quarantine
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 4]
    assert clean.columns == ["doc_id", "text", "lang"]
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert bad_lines == sorted([LINES[2], LINES[3]])
    batch.unpersist()
    with pytest.raises(ValueError, match="collides"):
        read_jsonl_corpus(
            spark, path,
            T.StructType([T.StructField("_corrupt_record", T.StringType())]),
        )


def test_ingest_jsonl_into_catalog(spark, tmp_path):
    path = _write(tmp_path, LINES)
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("docs", DOC_SCHEMA, None, ["doc_id"])
    cat.create(
        "quarantine",
        T.StructType([T.StructField("raw_line", T.StringType())]),
        None, None,
    )
    stats = ingest_jsonl(cat, "docs", path, quarantine_table="quarantine")
    assert stats == {"loaded": 3, "quarantined": 2}
    assert cat.table("docs").count() == 3
    assert cat.table("quarantine").count() == 2
    # schema drift lands in quarantine too (wrong type for doc_id);
    # written to the SAME path: the released batch cache must not
    # serve the previous content
    drift = _write(tmp_path, ['{"doc_id": "not-a-number and unclosed'])
    stats2 = ingest_jsonl(cat, "docs", drift, quarantine_table="quarantine")
    assert stats2 == {"loaded": 0, "quarantined": 1}
