"""Training-pipeline coverage batch 5: boilerplate line removal,
temperature-based source mixing, deterministic split assignment, and
the per-slice corpus report card — each oracle-paired on the shared
testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import (
    assign_splits,
    corpus_stats,
    remove_boilerplate_lines,
    temperature_mix_weights,
)
from nt_data_pipelines_spark.plans.registry import register, TOKEN_SQL, BUCKET_SQL, sql_dsum
from nt_data_pipelines_spark.sources.testdata import load_table

# The synthetic documents are single-line; derive a deterministic
# multi-line corpus in BOTH engines by breaking on the word "batch"
# (common in the vocabulary), then plant a footer line on every even
# doc_id — 50% document frequency, comfortably over the 30% threshold,
# so the check actually asserts line REMOVAL at every scale factor
# (no natural line repeats across >30% of the synthetic docs).
_FOOTER = "all rights reserved cookie notice"
_LINED = (
    "replace(text, ' batch ', chr(10)) || "
    f"CASE WHEN doc_id % 2 = 0 THEN chr(10) || '{_FOOTER}' ELSE '' END"
)


@register(
    "t_boilerplate_lines",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, str_split({_LINED}, chr(10)) AS ls FROM documents
    ),
    lines AS (
      SELECT doc_id, UNNEST(ls) AS line, generate_subscripts(ls, 1) AS ord
      FROM base
    ),
    docfreq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS d FROM lines GROUP BY line
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    kept AS (
      SELECT l.doc_id, l.line, l.ord
      FROM lines l JOIN docfreq USING (line), n
      WHERE NOT (d >= 2 AND d > 0.3 * n_docs)
    )
    SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean_text
    FROM kept GROUP BY doc_id
    """,
    doc="CCNet-style boilerplate removal: lines repeating across >30% of "
    "docs are dropped from every document (nav menus / cookie banners in "
    "a real crawl). Line df via one shuffle; no pairwise comparison.",
)
def t_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace("text", " batch ", "\n"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("\n" + _FOOTER)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_boilerplate_lines(docs, "doc_id", max_doc_frac=0.3, min_docs=2)


@register(
    "p_temperature_mix",
    oracle=f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST({sql_dsum(f"len(regexp_extract_all(text, '{TOKEN_SQL}'))", 0)} AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    p AS (SELECT *, POWER(CAST(n_tokens AS DOUBLE), 0.5) AS pw FROM per_src)
    SELECT source, n_docs, n_tokens,
           ROUND(pw / SUM(pw) OVER (), 6) + 0.0 AS weight
    FROM p
    """,
    doc="Temperature-based source mixing (alpha=0.5): sampling weight per "
    "source proportional to token-share^alpha — the standard up-weighting "
    "of low-resource sources for LM training mixes.",
)
def p_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix_weights(docs, "source", "text", alpha=0.5)


@register(
    "p_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {BUCKET_SQL.format(id="doc_id")} < 100 THEN 'test'
                WHEN {BUCKET_SQL.format(id="doc_id")} < 9900 THEN 'train'
                ELSE 'val' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test assignment by content hash: "
    "assignments survive retries, repartitioning and incremental appends "
    "(boundaries are cumulative weights in sorted split-name order).",
)
def p_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return assign_splits(
        docs, "doc_id", {"train": 0.98, "val": 0.01, "test": 0.01}
    ).select("doc_id", "split")


@register(
    "a_corpus_report",
    oracle=f"""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{TOKEN_SQL}'))) AS BIGINT)
             AS n_tokens,
           -- int/int rationals: integer half-up round-6 (registry rule 3);
           -- micro numerators ride as HUGEINT (DuckDB's SUM(BIGINT)
           -- default) mirroring the Spark side's decimal(38,0) — a
           -- BIGINT cast here would error past ~4.6e12 group tokens
           CAST((2 * SUM(len(regexp_extract_all(text, '{TOKEN_SQL}')))
                 * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 + 0.0 AS mean_tokens,
           CAST((2 * SUM(CASE WHEN len(str_split(text, ' ')) < 50 THEN 1 ELSE 0 END)
                 * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 + 0.0 AS short_doc_frac
    FROM documents
    GROUP BY source, lang
    """,
    doc="Per-(source, lang) corpus report card: doc count, exact token "
    "totals (decimal sums), mean doc length, short-doc fraction — the "
    "sanity sheet reviewed before a training run.",
)
def a_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus_stats(docs, ["source", "lang"], "text", short_doc_words=50)


@register(
    "t_dedup_paragraphs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, str_split({_LINED}, chr(10)) AS ls FROM documents
    ),
    paras AS (
      SELECT doc_id, UNNEST(ls) AS para, generate_subscripts(ls, 1) AS ord
      FROM base
    ),
    ranked AS (
      SELECT doc_id, para, ord,
             ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, ord) AS rn
      FROM paras
    )
    SELECT doc_id, string_agg(para, chr(10) ORDER BY ord) AS clean_text
    FROM ranked WHERE rn = 1 GROUP BY doc_id
    """,
    doc="Global paragraph-level exact dedup keeping the first occurrence "
    "corpus-wide (by doc id, then position) — the middle tier between "
    "full-document hashing and shingle fuzziness. Linear shuffles only.",
)
def t_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import dedup_paragraphs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace("text", " batch ", "\n"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("\n" + _FOOTER)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup_paragraphs(docs, "doc_id")


@register(
    "t_vocab_topk",
    oracle="""
    SELECT w AS token, COUNT(*) AS count
    FROM (SELECT UNNEST(str_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY count DESC, token ASC
    LIMIT 25
    """,
    doc="Corpus vocabulary profile: exact top-25 tokens via Misra-Gries "
    "candidates + exact recount — two linear passes, only per-partition "
    "summaries and candidate matches ever shuffle (the BPE-prep / "
    "domain-frequency profiler shape for 100 TB).",
)
def t_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    # capacity far above the synthetic vocab (31 distinct) => MG keeps
    # every counter, so the top-k is exact by construction at any SF
    return heavy_hitters(toks, "token", k=25, candidate_capacity=4096).select(
        "token", F.col("count").cast("long").alias("count")
    )


@register(
    "s_quantize_embeddings",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    s AS (
      SELECT vec_id, vec,
             list_aggregate(list_transform(vec, x -> ABS(x)), 'max') / 127.0 AS q_scale
      FROM v
    )
    SELECT vec_id, q_scale + 0.0 AS q_scale,
           generate_subscripts(vec, 1) - 1 AS idx,
           CASE WHEN q_scale = 0 THEN 0
                ELSE CAST(FLOOR(UNNEST(vec) / q_scale + 0.5) AS INT)
           END AS q
    FROM s
    """,
    doc="Per-vector symmetric int8 quantization: one scale + int array per "
    "embedding (4x storage shrink before a corpus ships to disk). Rounding "
    "spelled floor(x/s + 0.5) in both engines — ROUND() is half-up in Spark "
    "but half-even in DuckDB. The check flattens the int array to "
    "(vec_id, idx, q) rows: the value-hash protocol compares scalars.",
)
def s_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "vec_id", "embedding", bits=8)
    return q.select(
        "vec_id", "q_scale", F.posexplode("q_vec").alias("idx", "q")
    ).select("vec_id", "q_scale", F.col("idx").cast("long").alias("idx"), "q")


@register(
    "p_quantile_transform",
    oracle="""
    SELECT event_id, event_type,
           -- percent_rank = (rank-1)/(n-1), an int/int rational:
           -- integer half-up round-6 (registry rule 3); n=1 -> 0.0
           CASE WHEN n > 1
                THEN CAST((2 * (rnk - 1) * 1000000 + (n - 1))
                          // (2 * (n - 1)) AS DOUBLE) / 1000000.0
                ELSE 0.0 END + 0.0 AS q
    FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    """,
    doc="Per-group quantile (percent-rank) feature transform — maps any "
    "distribution onto [0,1] for ML feature prep; deterministic event_id "
    "tie-break.",
)
def p_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    rnk = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    # percent_rank = (rank-1)/(n-1): integer half-up round-6 (rule 3)
    q = F.when(
        n > 1,
        F.call_function(
            "div", 2 * (rnk - 1).cast("long") * 1000000 + (n - 1), 2 * (n - 1)
        ).cast("double")
        / 1000000.0,
    ).otherwise(F.lit(0.0))
    return ev.select("event_id", "event_type", (q + 0.0).alias("q"))


@register(
    "a_null_profile",
    oracle="""
    SELECT 'value' AS col, COUNT(*) AS n,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT value) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*),
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT event_type)
    FROM events
    UNION ALL
    SELECT 'props', COUNT(*),
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT props)
    FROM events
    """,
    doc="Column data-quality profile (row count, nulls, exact distinct) for "
    "a selected column set — the schema sanity sheet before a pipeline "
    "onboards a new table.",
)
def a_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE aggregation pass over the table for every profiled column
    # (a per-column agg unioned would scan the table N times — Catalyst
    # cannot fuse across the union), then unpivot to the same 3-row
    # shape the oracle's UNION ALL produces.
    ev = load_table(spark, sf_dir, "events")
    cols = ("value", "event_type", "props")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = ev.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("n").alias("n"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))
