"""Multimodal plumbing query: binary payload metadata extraction.

The decode stage is stubbed (codecs absent — see
operators/multimodal.py); the *metadata* stage is real engine work
and oracle-checkable: payload byte length + content digest over the
binary column, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.operators.multimodal import documents_as_media
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "m_media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    """,
    doc="Multimodal metadata stage: opaque binary payload -> (size, digest); "
    "the shape every image/audio ingest runs before decode.",
)
def m_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return documents_as_media(docs, "doc_id", "text").select(
        "media_id", "media_type", "n_bytes", "sha"
    )
