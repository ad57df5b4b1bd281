"""Coverage batch 4: sessionization, OHLC resampling, TF-IDF,
inverted index, exact grouped quantiles — oracle-paired."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.sessions import resample_ohlc, session_stats
from nt_data_pipelines_spark.operators.text import inverted_index, tfidf_top_terms
from nt_data_pipelines_spark.plans.registry import register, TOKEN_SQL
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "w_sessionize",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, value, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    t AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM s
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM t GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30-min inactivity) with per-session "
    "count/duration/value aggregates; one shuffle on the user key "
    "shared by the window and the groupBy.",
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, "user_id", "ts", "event_id", "value", gap_seconds=1800)


@register(
    "w_ohlc_resample",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bucket,
             ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM b GROUP BY event_type, bucket
    """,
    doc="OHLC bar resampling per (event_type, day): open/close via "
    "tie-broken row_number (deterministic under duplicate ts), "
    "decimal-exact volume.",
)
def w_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bars = resample_ohlc(ev, ["event_type"], "ts", "value", "event_id", freq="day")
    return bars.withColumn("bucket", F.to_date("bucket"))


@register(
    "t_tfidf_top_terms",
    oracle="""
    WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
    wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
    dl AS (SELECT doc_id, SUM(c) AS n_words FROM wc GROUP BY doc_id),
    dfr AS (SELECT word, COUNT(*) AS df FROM wc GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    r AS (
      SELECT wc.doc_id, wc.word, c, dfr.df,
             ROUND(c / CAST(dl.n_words AS DOUBLE)
                   * ln(n.n_docs / CAST(dfr.df AS DOUBLE)), 6) + 0.0 AS tfidf
      FROM wc JOIN dfr USING (word) JOIN dl USING (doc_id), n
    ),
    rr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word ASC) AS rank
      FROM r
    )
    SELECT doc_id, word, CAST(rank AS BIGINT) AS rank,
           CAST(c AS BIGINT) AS term_count, CAST(df AS BIGINT) AS doc_freq, tfidf
    FROM rr WHERE rank <= 5
    """,
    doc="Top-5 characteristic terms per document by TF-IDF, ranked on "
    "the round-6 score (word tie-break) — an integer (count, df) proxy "
    "is not monotone in tf-idf across terms (stopwords with df = N "
    "score exactly 0 yet have the highest counts).",
)
def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", k=5)


@register(
    "t_inverted_index",
    oracle="""
    WITH w AS (
      SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS word
      FROM documents
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(DISTINCT doc_id))[1:20], ',') AS postings
    FROM w GROUP BY word
    """,
    doc="Inverted index summary: word -> document frequency + capped "
    "sorted posting list; one shuffle on the word key.",
)
def t_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    idx = inverted_index(docs, "doc_id", posting_cap=20)
    # string-join the posting array so the cross-engine schema compare
    # sees one canonical type (same convention as a_collect_list)
    return idx.withColumn("postings", F.array_join("postings", ","))


@register(
    "a_exact_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) + 0.0 AS p25,
           ROUND(quantile_cont(value, 0.50), 6) + 0.0 AS p50,
           ROUND(quantile_cont(value, 0.75), 6) + 0.0 AS p75
    FROM events GROUP BY event_type
    """,
    doc="Exact linear-interpolation quartiles per group (Spark "
    "percentile == DuckDB quantile_cont); the scale path swaps in "
    "approx_percentile at a documented error bound.",
)
def a_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("__p25"),
        F.percentile("value", F.lit(0.50)).alias("__p50"),
        F.percentile("value", F.lit(0.75)).alias("__p75"),
    )
    return q.select(
        "event_type",
        (F.round("__p25", 6) + 0.0).alias("p25"),
        (F.round("__p50", 6) + 0.0).alias("p50"),
        (F.round("__p75", 6) + 0.0).alias("p75"),
    )




@register(
    "t_chunk_documents",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    s AS (SELECT doc_id, ws,
                 UNNEST(range(0, GREATEST(len(ws) - 16, 1), 48)) AS st FROM w)
    SELECT doc_id, CAST(st AS BIGINT) AS chunk_start,
           CAST(len(ws[st + 1 : st + 64]) AS BIGINT) AS n_chunk_words,
           md5(array_to_string(ws[st + 1 : st + 64], ' ')) AS chunk_md5
    FROM s
    """,
    doc="Overlapping 64-word / 16-overlap training chunks per doc; "
    "chunk_start is the stable in-doc key, chunk text digest-verified. "
    "No shuffle — per-row array exprs + one explode.",
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", chunk_size=64, overlap=16)
    return chunks.select(
        "doc_id", "chunk_start", "n_chunk_words",
        F.md5("chunk_text").alias("chunk_md5"),
    )


@register(
    "p_mix_sources",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '{TOKEN_SQL}')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (SELECT source, SUM(n_tokens) AS total FROM toks GROUP BY source)
    SELECT doc_id, source, n_tokens
    FROM toks JOIN tot USING (source)
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < FLOOR(LEAST(1.0, 1300 / CAST(total AS DOUBLE)) * 10000)
    """,
    doc="Data mixing: down-sample each source to a ~1300-token budget "
    "via content-hash buckets (deterministic across engines/retries); "
    "per-source totals broadcast back, corpus never shuffles.",
)
def p_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import mix_sources_to_budget

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_sources_to_budget(docs, "source", "doc_id", 1300)
    return mixed.select("doc_id", "source", "n_tokens")


@register(
    "t_bm25_scores",
    oracle="""
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
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched_terms,
           CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
    FROM s GROUP BY doc_id
    """,
    doc="Okapi BM25 document scoring for a fixed query (hash, join, "
    "filter): Lucene idf, per-term scores rounded then decimal-summed "
    "so the doc total is exact regardless of shuffle order.",
)
def t_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", ["hash", "join", "filter"])


@register(
    "a_value_histogram",
    oracle="""
    WITH g AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    b AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20)) AS BIGINT), 19)
             END AS bin
      FROM events CROSS JOIN g
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bin
    """,
    doc="Fixed-width 20-bin histogram of event values: global min/max "
    "scalars broadcast back, bin arithmetic identical double ops on "
    "both engines (explicit FLOOR + clamp for the max edge; a "
    "degenerate hi=lo range pins bin 0 — DuckDB's /0 NULL vs Spark's "
    "NaN would otherwise land in different bins).",
)
def a_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    step = (F.col("hi") - F.col("lo")) / 20
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / step).cast("long"),
            F.lit(19).cast("long"),
        )
    )
    return (
        ev.crossJoin(F.broadcast(g))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "t_bm25_topk",
    oracle="""
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
    tot AS (
      SELECT doc_id, CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, bm25 FROM tot
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
    doc="Top-10 retrieval by BM25: safe cross-engine because scores "
    "are rounded-then-decimal-summed (bit-identical doubles) and the "
    "order is total (doc_id tiebreak).",
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    scores = bm25_scores(docs, "doc_id", ["hash", "join", "filter"])
    return (
        scores.select("doc_id", "bm25")
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(10)
    )
