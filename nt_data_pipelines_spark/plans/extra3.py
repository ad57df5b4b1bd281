"""Training-pipeline coverage batch 3: repetition filtering,
deterministic stratified sampling, sequence packing, and PII scrub —
each oracle-paired on the shared testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import (
    PII_EMAIL_REGEX,
    PII_LONG_DIGITS_REGEX,
    deterministic_stratified_sample,
    pack_sequences,
    repetition_stats,
    scrub_pii,
)
from nt_data_pipelines_spark.plans.registry import register, TOKEN_SQL, BUCKET_SQL
from nt_data_pipelines_spark.sources.testdata import load_table

# md5-derived 0..9999 bucket — identical expression family on both
# engines (Spark conv(hex,16,10) == DuckDB CAST('0x'||hex AS INT))

@register(
    "t_repetition_stats",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(ws) AS word FROM w)
      GROUP BY doc_id, word
    ),
    top AS (SELECT doc_id, MAX(c) AS top_word_count FROM wc GROUP BY doc_id),
    base AS (
      SELECT doc_id, len(ws) AS n_words,
             len(list_distinct(ws)) AS dw,
             len(ws) - 1 AS tb,
             len(list_distinct(
               list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
             )) AS db
      FROM w
    )
    SELECT b.doc_id, n_words,
           -- int/int rationals: integer half-up round-6 (registry rule 3)
           CAST((2 * (n_words - dw) * 1000000 + n_words)
                // (2 * n_words) AS DOUBLE) / 1000000.0 + 0.0 AS dup_word_ratio,
           CAST((2 * top_word_count * 1000000 + n_words)
                // (2 * n_words) AS DOUBLE) / 1000000.0 + 0.0 AS top_word_ratio,
           CASE WHEN tb > 0
                THEN CAST((2 * (tb - db) * 1000000 + tb)
                          // (2 * tb) AS DOUBLE) / 1000000.0 + 0.0
           END AS dup_bigram_ratio
    FROM base b JOIN top USING (doc_id)
    """,
    doc="Gopher-style repetition filters: duplicate-word, top-word and "
    "duplicate-bigram ratios per document (quality filtering tier).",
)
def t_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id")


@register(
    "p_stratified_sample",
    oracle=f"""
    SELECT event_id, event_type
    FROM events
    WHERE {BUCKET_SQL.format(id="event_id")} <
          CASE event_type WHEN 'view' THEN 1000 WHEN 'click' THEN 2500
                          WHEN 'purchase' THEN 10000 ELSE 0 END
    """,
    doc="Deterministic per-stratum sampling via content hashing: "
    "reproducible across engines, retries and repartitioning "
    "(unlike RNG-seeded sampleBy).",
)
def p_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sampled = deterministic_stratified_sample(
        ev, "event_type", "event_id",
        {"view": 0.10, "click": 0.25, "purchase": 1.0},
    )
    return sampled.select("event_id", "event_type")


@register(
    "t_sequence_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 64 AS BIGINT) AS shard,
             CAST(len(regexp_extract_all(text, '{TOKEN_SQL}')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           CAST(FLOOR(
             (SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0
           ) AS BIGINT) AS bin_id
    FROM toks
    """,
    doc="Greedy contiguous sequence packing into 512-token training "
    "bins, sharded by hash so the cumsum window never needs a global "
    "order.",
)
def t_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", capacity=512, num_shards=64)


@register(
    "t_scrub_pii",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(text, '{PII_EMAIL_REGEX}', '[EMAIL]', 'g'),
                 '{PII_LONG_DIGITS_REGEX}', '[NUMBER]', 'g')) AS scrubbed_md5,
           CAST(LENGTH(regexp_replace(
                 regexp_replace(text, '{PII_EMAIL_REGEX}', '[EMAIL]', 'g'),
                 '{PII_LONG_DIGITS_REGEX}', '[NUMBER]', 'g')) AS BIGINT) AS scrubbed_len
    FROM documents
    """,
    doc="PII scrub (emails, long digit runs) — digest-compared so the "
    "oracle verifies the full transformed text byte-for-byte.",
)
def t_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = scrub_pii(docs, "text", out_col="__scrubbed")
    return scrubbed.select(
        "doc_id",
        F.md5(F.col("__scrubbed")).alias("scrubbed_md5"),
        F.length("__scrubbed").cast("long").alias("scrubbed_len"),
    )


@register(
    "t_contamination",
    oracle="""
    WITH corpus AS (SELECT * FROM documents WHERE source <> 'src0'),
    bench AS (SELECT * FROM documents WHERE source = 'src0'),
    cg AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, len(string_split(text,' ')) - 1),
          i -> string_split(text,' ')[i] || ' ' ||
               string_split(text,' ')[i+1] || ' ' ||
               string_split(text,' ')[i+2])
      )) AS gram FROM corpus
    ),
    bg AS (
      SELECT DISTINCT UNNEST(
        list_transform(range(1, len(string_split(text,' ')) - 1),
          i -> string_split(text,' ')[i] || ' ' ||
               string_split(text,' ')[i+1] || ' ' ||
               string_split(text,' ')[i+2])
      ) AS gram FROM bench
    ),
    totals AS (
      SELECT doc_id, CAST(len(list_distinct(
        list_transform(range(1, len(string_split(text,' ')) - 1),
          i -> string_split(text,' ')[i] || ' ' ||
               string_split(text,' ')[i+1] || ' ' ||
               string_split(text,' ')[i+2])
      )) AS BIGINT) AS n_grams FROM corpus
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT t.doc_id, n_grams,
           CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN n_grams > 0
                THEN CAST((2 * COALESCE(n_contaminated, 0) * 1000000 + n_grams)
                          // (2 * n_grams) AS DOUBLE) / 1000000.0 END + 0.0
             AS overlap_ratio
    FROM totals t LEFT JOIN hits USING (doc_id)
    """,
    doc="Eval-set decontamination: word-3-gram overlap of each training "
    "doc against a benchmark slice (source='src0'); gram-bucketed "
    "shuffle, benchmark side broadcast.",
)
def t_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import benchmark_contamination

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    return benchmark_contamination(corpus, bench, "doc_id", n=3)
