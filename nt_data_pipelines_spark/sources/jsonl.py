"""JSONL corpus ingestion with corrupt-record quarantine.

Web-scale text corpora ship as compressed JSON-lines (one document
object per line); a multi-TB crawl ALWAYS contains malformed lines —
truncated records, stray bytes, schema drift. Dropping them silently
(DROPMALFORMED) destroys the audit trail; failing the job (FAILFAST)
wastes a cluster on one bad byte. The production answer is PERMISSIVE
parsing with a corrupt-record column, split into a clean stream and a
quarantine stream that is persisted for inspection.

Scale shape: the JSON reader is Spark's native line source — splittable
for uncompressed/bzip2 inputs, one task per gzip file otherwise (the
note a 100 TB ingest plans around: prefer many medium gzip shards).
Both output frames come from ONE cached parse of the input; the cache
is batch-scoped (a 100 TB crawl ingests as many sharded loads) and
owned by the returned handle — release it when the batch is committed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass
class JsonlBatch:
    """One parsed JSONL load: clean rows, quarantined raw lines, and
    the cached parse both derive from (release with :meth:`unpersist`)."""

    clean: DataFrame
    quarantine: DataFrame
    _raw: DataFrame

    def unpersist(self) -> None:
        """Drop the parse cache. Precise — only this batch's blocks —
        unlike ``spark.catalog.clearCache()``. Call after the batch is
        written: leaking the cache pins executor memory and, because
        Spark keys caches on the logical plan, would serve STALE rows
        to a later re-read of the same path with changed content."""
        self._raw.unpersist()


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> JsonlBatch:
    """Parse a JSONL path into a :class:`JsonlBatch`.

    ``clean`` carries exactly ``schema``'s columns for rows that parsed;
    ``quarantine`` carries the raw offending line. An explicit schema is
    required: schema inference triggers an extra full pass over the
    input and silently widens drifting types instead of quarantining
    them. The parse is cached because Spark disallows queries referring
    only to the corrupt column on a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the cache
    is the documented materialization barrier.
    """
    if corrupt_col in {f.name for f in schema.fields}:
        raise ValueError(f"{corrupt_col!r} collides with a schema field")
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    ).cache()
    clean = raw.filter(F.col(corrupt_col).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return JsonlBatch(clean=clean, quarantine=quarantine, _raw=raw)


def ingest_jsonl(
    catalog,
    table: str,
    path: str,
    quarantine_table: str | None = None,
) -> dict:
    """Load a JSONL drop into a catalog table, quarantining bad lines.

    The table must exist (its declared schema drives the parse). Returns
    ``{"loaded": n, "quarantined": m}``. When ``quarantine_table`` is
    given the bad lines are appended there (schema: raw_line string);
    otherwise they are only counted. The batch cache is released on
    exit, success or failure.
    """
    meta = catalog._meta(table)
    batch = read_jsonl_corpus(catalog.spark, path, meta.struct)
    try:
        n_bad = batch.quarantine.count()
        n_clean = batch.clean.count()
        catalog.insert(table, batch.clean)
        if quarantine_table is not None and n_bad:
            catalog.insert(quarantine_table, batch.quarantine)
    finally:
        batch.unpersist()
    return {"loaded": n_clean, "quarantined": n_bad}
