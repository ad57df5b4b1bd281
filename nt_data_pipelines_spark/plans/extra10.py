"""Round-9 additions: per-source distribution drift + content-defined
chunking (chunk-level dedup primitive)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

# word hashed to the shared 60-bit gram key (operators/text.gram_key)
_WKEY = "CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)"


@register(
    "t_source_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    t AS (SELECT source, w FROM toks WHERE w <> ''),
    sw AS (SELECT source, w, COUNT(*) AS csw FROM t GROUP BY 1, 2),
    cw AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY 1),
    ns AS (SELECT source, SUM(csw) AS ns FROM sw GROUP BY 1),
    tot AS (SELECT SUM(cw) AS N FROM cw),
    terms AS (
      SELECT sw.source, ns.ns,
             ROUND(sw.csw * log2((CAST(sw.csw AS DOUBLE) * tot.N)
                                 / (CAST(ns.ns AS DOUBLE) * cw.cw)), 6) AS trm
      FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN tot
    )
    SELECT source, CAST(ns AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(trm AS DECIMAL(28,6))) AS DOUBLE) / ns, 6)
             AS kl_bits
    FROM terms GROUP BY source, ns
    """,
    doc="Per-source KL divergence (bits/token) of the source's unigram "
    "distribution from the corpus pool — the mixture-audit drift "
    "signal DoReMi-style reweighting monitors. Linear shuffles on "
    "(word, source) and word; corpus total broadcast.",
)
def t_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import source_unigram_divergence

    docs = load_table(spark, sf_dir, "documents")
    return source_unigram_divergence(docs, "source", "text")


_CDC_MOD = 8


@register(
    "t_cdc_chunks",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (
      SELECT doc_id, p, ws[p+1] AS w
      FROM d, UNNEST(generate_series(0, len(ws)-1)) AS t(p)
      WHERE ws[p+1] <> ''
    ),
    marked AS (
      SELECT doc_id, p, w,
             CASE WHEN {_WKEY} % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ),
    chunked AS (
      SELECT doc_id, p, w,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM marked
    ),
    chunks AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             string_agg(w, ' ' ORDER BY p) AS chunk_text
      FROM chunked GROUP BY 1, 2
    )
    SELECT doc_id, chunk_id, n_words, chunk_text,
           md5(chunk_text) AS chunk_hash,
           CAST(COUNT(*) OVER (PARTITION BY md5(chunk_text)) AS BIGINT)
             AS n_occurrences
    FROM chunks
    """,
    doc="Content-defined chunking (Gear/FastCDC rationale at word "
    "level): a word whose 60-bit hash is 0 mod 8 closes its chunk, so "
    "boundaries move locally under edits and chunk-hash dedup is "
    "stable across crawl snapshots. n_occurrences counts identical "
    "chunks corpus-wide. One per-doc window + one chunk-hash shuffle.",
)
def t_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, "doc_id", "text", boundary_mod=_CDC_MOD)
