"""Round-8 additions: Gopher rule filter + hybrid RRF retrieval."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.plans.similarity import _SQL_COS, _dbl
from nt_data_pipelines_spark.sources.testdata import load_table

# thresholds for the registry query: word-count band chosen to split
# the synthetic corpus (~54 words/doc mean); the rest are the paper's
_G_MIN_WORDS, _G_MAX_WORDS = 30, 90

_STOP_SQL = " + ".join(
    f"CAST(list_contains(ws, '{w}') AS INT)"
    for w in ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"]
)


@register(
    "t_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, string_split(text, ' ') AS ws,
             string_split(text, chr(10)) AS ls
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_words,
        -- int/int rationals: integer half-up round-6 (registry rule 3)
        CAST((2 * list_sum(list_transform(ws, w -> len(w))) * 1000000 + len(ws))
             // (2 * len(ws)) AS DOUBLE) / 1000000.0 + 0.0 AS mean_word_len,
        CAST((2 * (3 * (len(text) - len(replace(text, '#', '')))
                   + (len(text) - len(replace(text, '...', '')))) * 1000000
              + 3 * len(ws))
             // (2 * 3 * len(ws)) AS DOUBLE) / 1000000.0 + 0.0
          AS symbol_word_ratio,
        CAST((2 * len(list_filter(ls, x -> regexp_matches(x, '^[-*•]'))) * 1000000
              + len(ls))
             // (2 * len(ls)) AS DOUBLE) / 1000000.0 + 0.0 AS bullet_line_frac,
        CAST((2 * len(list_filter(ls, x -> regexp_matches(x, '\\.\\.\\.$'))) * 1000000
              + len(ls))
             // (2 * len(ls)) AS DOUBLE) / 1000000.0 + 0.0 AS ellipsis_line_frac,
        CAST((2 * len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) * 1000000
              + len(ws))
             // (2 * len(ws)) AS DOUBLE) / 1000000.0 + 0.0 AS alpha_word_frac,
        CAST({_STOP_SQL} AS BIGINT) AS stop_hits
      FROM d
    )
    SELECT *,
      CAST(n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
           AND mean_word_len BETWEEN 3.0 AND 10.0
           AND symbol_word_ratio <= 0.1
           AND bullet_line_frac <= 0.9
           AND ellipsis_line_frac <= 0.3
           AND alpha_word_frac >= 0.8
           AND stop_hits >= 2 AS INT) AS keep
    FROM sig
    """,
    doc="Gopher-style quality rules (Rae et al. 2021 A1.1): structural "
    "signals + composite keep flag, all codegen, ratios rounded before "
    "the threshold compares so the flag is bit-stable across engines.",
)
def t_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(
        docs, "doc_id", "text", min_words=_G_MIN_WORDS, max_words=_G_MAX_WORDS
    )


_RRF_K = 60
_FUSE_TOPN = 20  # candidates taken from each retriever before fusion
_RRF_TERMS = ["hash", "join", "filter"]


@register(
    "s_hybrid_rrf",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS S FROM dl),
    w AS (SELECT doc_id, UNNEST(ws) AS word FROM d),
    tf AS (
      SELECT w.doc_id, dl.dl, word, COUNT(*) AS tf
      FROM w JOIN dl ON w.doc_id = dl.doc_id
      WHERE word IN ('hash', 'join', 'filter')
      GROUP BY w.doc_id, dl.dl, word
    ),
    dft AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS dft FROM tf GROUP BY word),
    s AS (
      SELECT tf.doc_id,
             ROUND(ln((N - dft + 0.5) / (dft + 0.5) + 1)
                   * tf * 2.2
                   / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / (CAST(S AS DOUBLE) / N))),
                   6) AS sc
      FROM tf JOIN dft USING (word) CROSS JOIN g
    ),
    bm AS (
      SELECT doc_id, CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM s GROUP BY doc_id
    ),
    bm_rank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM bm QUALIFY rank <= {_FUSE_TOPN}
    ),
    q AS (
      SELECT {_dbl('embedding')} AS q_vec FROM embeddings WHERE vec_id = 0
    ),
    c AS (SELECT vec_id AS doc_id, {_dbl('embedding')} AS c_vec
          FROM embeddings WHERE vec_id != 0),
    cos_rank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY {_SQL_COS.format(a='q_vec', b='c_vec')} DESC, doc_id
             ) AS rank
      FROM c CROSS JOIN q QUALIFY rank <= {_FUSE_TOPN}
    ),
    tagged AS (
      SELECT doc_id, 1.0 / ({_RRF_K} + rank) AS rr FROM bm_rank
      UNION ALL
      SELECT doc_id, 1.0 / ({_RRF_K} + rank) AS rr FROM cos_rank
    )
    SELECT doc_id,
           -- 12-decimal rational sum: integer half-up round-6 (rule 3)
           CAST((2 * CAST(SUM(CAST(rr AS DECIMAL(38,12)) * 1000000000000)
                          AS HUGEINT) + 1000000)
                // 2000000 AS DOUBLE) / 1000000.0 + 0.0 AS rrf_score
    FROM tagged GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval: BM25 top-20 and embedding-cosine top-20 "
    "fused by reciprocal-rank fusion (k=60). Only ranks enter the "
    "fusion, so no cross-retriever score calibration; fusion itself is "
    "a union+groupBy over at most 2*20 rows.",
)
def s_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.similarity import (
        brute_force_topk,
        reciprocal_rank_fusion,
    )
    from nt_data_pipelines_spark.operators.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical list: distributed TakeOrdered bounds the candidate set to
    # _FUSE_TOPN before the (tiny) single-partition rank window
    bm = (
        bm25_scores(docs, "doc_id", _RRF_TERMS)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_FUSE_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
        )
        .select("doc_id", "rank")
    )
    # embedding list: vec_id keys the same corpus (vec_id == doc_id)
    cos = (
        brute_force_topk(
            emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=_FUSE_TOPN
        )
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return reciprocal_rank_fusion([bm, cos], "doc_id", "rank", k=_RRF_K).limit(10)


_EN = ", ".join(
    f"'{w}'"
    for w in ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"]
)
_QL_Z = (
    "ROUND(-2.0"
    " + 2.5 * (LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
    "          / CAST(LENGTH(text) AS DOUBLE))"
    f" + 5.0 * (LEN(list_filter(list_distinct(ws), x -> x IN ({_EN})))"
    "          / CAST(LEN(ws) AS DOUBLE))"
    " + (-3.0) * (LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))"
    "          / CAST(LENGTH(text) AS DOUBLE))"
    " + 0.25 * ln(1 + CAST(LEN(ws) AS DOUBLE))"
    " + (-0.05) * (LENGTH(text) / CAST(LEN(ws) AS DOUBLE)), 6) + 0.0"
)


@register(
    "t_quality_logit",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
    z AS (SELECT doc_id, {_QL_Z} AS z FROM d),
    s AS (SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 6) + 0.0 AS quality_score FROM z)
    SELECT doc_id, quality_score,
           CAST(quality_score >= 0.5 AS INT) AS keep
    FROM s
    """,
    doc="Model-based quality filter: fixed-weight logistic over the "
    "quality features (the CCNet/FineWeb classifier tier with "
    "documented stand-in coefficients). Linear term and score rounded "
    "to 6 decimals so exp/ln ulp differences cannot flip the hash.",
)
def t_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import quality_logit_score

    docs = load_table(spark, sf_dir, "documents")
    return quality_logit_score(docs, "doc_id", "text")


_SPAN_N = 8


@register(
    "t_remove_dup_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    sh AS (
      -- gram hashed to a 60-bit BIGINT key, mirroring operators/text.gram_key
      SELECT doc_id, p,
             CAST(concat('0x', substr(md5(
                 array_to_string(ws[p+1:p+{_SPAN_N}], ' ')
             ), 1, 15)) AS BIGINT) AS g
      FROM d, UNNEST(generate_series(0, len(ws)-{_SPAN_N})) AS t(p)
      WHERE len(ws) >= {_SPAN_N}
    ),
    rep AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) >= 2),
    cov AS (
      SELECT DISTINCT doc_id, p + i AS q
      FROM sh JOIN rep USING (g), UNNEST(generate_series(0, {_SPAN_N}-1)) AS t(i)
    ),
    wpos AS (
      SELECT doc_id, q, ws[q+1] AS w
      FROM d, UNNEST(generate_series(0, len(ws)-1)) AS t(q)
    ),
    kept AS (
      SELECT w.doc_id, w.q, w.w FROM wpos w
      ANTI JOIN cov c ON w.doc_id = c.doc_id AND w.q = c.q
    ),
    reb AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY q) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS kept_n
      FROM kept GROUP BY doc_id
    )
    SELECT d2.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
           CAST(len(d2.ws) - COALESCE(reb.kept_n, 0) AS BIGINT) AS n_removed_words
    FROM d d2 LEFT JOIN reb USING (doc_id)
    """,
    doc="Exact-substring dedup (Lee et al. 2021 ExactSubstr at word "
    "granularity): every word 8-gram occurring >=2 times corpus-wide "
    "marks its positions for removal in ALL occurrences; pigeonhole "
    "covers every repeated span of >=8 words. Linear shuffles only — "
    "no suffix array, no pairwise work.",
)
def t_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, "doc_id", "text", n=_SPAN_N)
