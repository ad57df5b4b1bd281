"""Round-10 additions, fifth batch: vocabulary coverage curve,
diurnal event profile, inter-arrival quantiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

_COVERAGE_KS = (10, 100, 1000)


@register(
    "a_vocab_coverage",
    oracle="""
    WITH w0 AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w0 WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM wc),
    rk AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r FROM wc
    ),
    ks AS (SELECT UNNEST([10, 100, 1000]) AS k)
    SELECT k,
           CAST(COALESCE(SUM(CASE WHEN r <= k THEN c END), 0) AS BIGINT)
             AS covered_tokens,
           total_tokens,
           CAST((2 * COALESCE(SUM(CASE WHEN r <= k THEN CAST(c AS HUGEINT) END), 0)
                 * 1000000 + total_tokens)
                // (2 * CAST(total_tokens AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS coverage
    FROM rk CROSS JOIN ks CROSS JOIN tot
    GROUP BY k, total_tokens
    """,
    doc="Vocabulary coverage curve: the fraction of corpus token mass "
    "the top-{10,100,1000} words cover — the first number a tokenizer "
    "or stop-list design needs. The Spark rank is two-phase (local "
    "top-k per partition before the global rank, the zipf_slope "
    "pattern) so no task sorts the whole vocab; coverage is a rule-3 "
    "integer micro ratio with HUGEINT/decimal(38,0) mass.",
)
def a_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.selectExpr("explode(split(text, ' ')) AS w").filter("w <> ''")
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    kmax = max(_COVERAGE_KS)
    # two-phase global top-kmax: local rank per partition, then global
    wl = Window.partitionBy("__pid").orderBy(F.desc("__c"), F.asc("w"))
    pruned = (
        wc.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(wl))
        .filter(F.col("__lr") <= kmax)
        .drop("__lr", "__pid")
    )
    rk = pruned.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.desc("__c"), F.asc("w")))
    ).filter(F.col("__r") <= kmax)
    total = wc.agg(
        F.sum(F.col("__c").cast("decimal(38,0)")).alias("__t")
    )
    covered = rk.crossJoin(F.broadcast(total)).select(
        F.explode(F.array(*[F.lit(k) for k in _COVERAGE_KS])).alias("k"),
        "__r",
        "__c",
        "__t",
    ).filter(F.col("__r") <= F.col("k")).groupBy("k", "__t").agg(
        F.sum(F.col("__c").cast("decimal(38,0)")).alias("__cov")
    )
    return covered.select(
        "k",
        F.col("__cov").cast("long").alias("covered_tokens"),
        F.col("__t").cast("long").alias("total_tokens"),
        (
            F.expr("CAST((2 * __cov * 1000000 + CAST(__t AS DECIMAL(38,0)))"
                   " DIV (2 * __t) AS DOUBLE)")
            / 1000000.0
        ).alias("coverage"),
    )


@register(
    "a_diurnal_profile",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, hour(ts)
    ),
    t AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS n FROM c GROUP BY event_type)
    SELECT c.event_type, hour_of_day, n_events,
           CAST((2 * CAST(n_events AS HUGEINT) * 1000000 + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1000000.0 AS share
    FROM c JOIN t ON c.event_type = t.event_type
    """,
    doc="Diurnal (hour-of-day) event profile per type: count and "
    "within-type share — the seasonality audit that catches batchy "
    "upstreams and timezone bugs. Integer micro shares (rule 3); two "
    "linear map-side-partial aggregations over at most types x 24 "
    "cells.",
)
def a_diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    t = c.groupBy("event_type").agg(F.sum("n_events").cast("long").alias("__n"))
    return c.join(t, "event_type").select(
        "event_type",
        "hour_of_day",
        "n_events",
        (
            F.expr(
                "CAST((2 * CAST(n_events AS DECIMAL(38,0)) * 1000000 + __n)"
                " DIV (2 * CAST(__n AS DECIMAL(38,0))) AS DOUBLE)"
            )
            / 1000000.0
        ).alias("share"),
    )


@register(
    "a_interarrival_quantiles",
    oracle="""
    WITH d AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id
             ) AS dt
      FROM events
    ),
    c AS (
      SELECT event_type, dt AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM d WHERE dt IS NOT NULL GROUP BY event_type, dt
    ),
    tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY event_type),
    cum AS (
      SELECT event_type, v,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c
    ),
    q AS (SELECT UNNEST([50, 90, 99]) AS pct)
    SELECT cum.event_type, pct, MIN(v) AS dt_us
    FROM cum JOIN tot USING (event_type) CROSS JOIN q
    WHERE 100 * cum >= pct * n
    GROUP BY cum.event_type, pct
    """,
    doc="Per-type inter-arrival latency quantiles (p50/p90/p99 of the "
    "exact integer-microsecond gap between a user's consecutive "
    "events of that type) — the stream-health distribution. Discrete "
    "quantiles via the integer rank identity over the VALUE domain; "
    "the lag runs per (type, user) partition, never a global sort.",
)
def a_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    d = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("__dt")
    ).filter(F.col("__dt").isNotNull())
    c = d.groupBy("event_type", F.col("__dt").alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = c.groupBy("event_type").agg(F.sum("__c").cast("long").alias("__n"))
    cum = c.select("event_type", "__v", F.sum("__c").over(wv).alias("__cum"))
    pcts = F.explode(F.array(*[F.lit(p) for p in (50, 90, 99)])).alias("pct")
    return (
        cum.join(tot, "event_type")
        .select("event_type", "__v", "__cum", "__n", pcts)
        .filter(F.col("__cum") * 100 >= F.col("pct") * F.col("__n"))
        .groupBy("event_type", "pct")
        .agg(F.min("__v").alias("dt_us"))
    )


# 4*ln(2) pre-folded into one double literal (the extra12 HLL-numerator
# convention) so both engines divide by the identical operand.
_PARKINSON_DEN = 2.772588722239781
assert abs(_PARKINSON_DEN - 4 * 0.6931471805599453) < 1e-15


@register(
    "w_parkinson_vol",
    oracle=f"""
    WITH b AS (
      SELECT event_type, date_trunc('day', ts) AS bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a
      FROM events
    ),
    bars AS (
      SELECT event_type, bucket,
             MAX(value) AS high, MIN(value) AS low
      FROM b GROUP BY event_type, bucket
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_bars,
             CAST(SUM(CAST(ln(high / low) * ln(high / low)
                           AS DECIMAL(38,18))) AS DOUBLE) AS ssq
      FROM bars WHERE low > 0 GROUP BY event_type
    )
    SELECT event_type, n_bars,
           ROUND(sqrt(ssq / ({_PARKINSON_DEN!r} * n_bars)), 6) + 0.0
             AS parkinson_vol
    FROM s
    """,
    doc="Parkinson range volatility per event type over daily bars: "
    "sqrt(sum(ln(H/L)^2) / (4 ln2 n)) — the high-low estimator that "
    "is ~5x more efficient than close-to-close variance. Per-bar "
    "terms are IEEE-deterministic; their sum rides decimal(38,18) "
    "(rule 1), the 4 ln2 constant is ONE pre-folded double literal "
    "so both engines divide identical operands, and sqrt makes the "
    "round-6 midpoint measure-zero (rule 2).",
)
def w_parkinson_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.sessions import resample_ohlc

    ev = load_table(spark, sf_dir, "events")
    bars = resample_ohlc(ev, ["event_type"], "ts", "value", "event_id", freq="day")
    term = F.log(F.col("high") / F.col("low")) * F.log(F.col("high") / F.col("low"))
    s = (
        bars.filter(F.col("low") > 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bars"),
            F.sum(term.cast("decimal(38,18)")).cast("double").alias("__ssq"),
        )
    )
    return s.select(
        "event_type",
        "n_bars",
        (
            F.round(
                F.sqrt(F.col("__ssq") / (F.lit(_PARKINSON_DEN) * F.col("n_bars"))), 6
            )
            + 0.0
        ).alias("parkinson_vol"),
    )


# shared stopword lexicon — ONE copy (plans/textdedup._LEX_VALUES) so a
# lexicon change cannot diverge the confusion matrix from t_language_id
from nt_data_pipelines_spark.plans.textdedup import _LEX_VALUES


@register(
    "a_lang_confusion",
    oracle=f"""
    WITH lexicon(lang, word) AS (VALUES {_LEX_VALUES}),
    exploded AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    scores AS (
      SELECT e.doc_id, l.lang, COUNT(*) AS hits
      FROM exploded e JOIN lexicon l ON e.word = l.word
      GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang) AS rk
      FROM scores
    ),
    pred AS (
      SELECT d.doc_id, d.lang AS true_lang,
             COALESCE(b.lang, 'und') AS pred_lang
      FROM documents d
      LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.doc_id
    ),
    cm AS (
      SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY true_lang, pred_lang
    ),
    tot AS (SELECT true_lang, CAST(SUM(n_docs) AS BIGINT) AS n FROM cm GROUP BY true_lang)
    SELECT cm.true_lang, pred_lang, n_docs,
           CAST((2 * CAST(n_docs AS HUGEINT) * 1000000 + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1000000.0
             AS row_share
    FROM cm JOIN tot ON cm.true_lang = tot.true_lang
    """,
    doc="Language-ID confusion matrix against the labeled lang column "
    "— the model-evaluation primitive (per-class recall sits on the "
    "diagonal's row_share). Shares ONE lexicon constant with "
    "t_language_id so the classifier under test cannot diverge from "
    "its own parity query; counts are integers, row shares are rule-3 "
    "micro ratios.",
)
def a_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    pred = TX.language_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    joined = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    )
    cm = joined.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = cm.groupBy("true_lang").agg(F.sum("n_docs").cast("long").alias("__n"))
    return cm.join(tot, "true_lang").select(
        "true_lang",
        "pred_lang",
        "n_docs",
        (
            F.expr(
                "CAST((2 * CAST(n_docs AS DECIMAL(38,0)) * 1000000 + __n)"
                " DIV (2 * CAST(__n AS DECIMAL(38,0))) AS DOUBLE)"
            )
            / 1000000.0
        ).alias("row_share"),
    )


# ---- ANN evaluation: recall@k of the LSH path vs brute force ----
# Shares every constant and SQL fragment with plans/similarity.py so
# the system under test cannot diverge from its own parity queries.
from nt_data_pipelines_spark.plans.similarity import (
    _BUCKET_SQL,
    _SQL_COS,
    _dbl,
    DIM,
    N_PLANES,
    N_QUERIES,
    TOP_K,
)


@register(
    "s_recall_at_k",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_dbl('embedding')} AS q_vec FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    c AS (SELECT vec_id AS neighbor_id, {_dbl('embedding')} AS c_vec FROM embeddings),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY {_SQL_COS.format(a='q_vec', b='c_vec')} DESC,
                          neighbor_id) AS rank
        FROM q JOIN c ON query_id != neighbor_id)
      WHERE rank <= {TOP_K}
    ),
    v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM embeddings),
    sigs AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM v),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT sq.vec_id AS query_id, sc.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY sq.vec_id
                 ORDER BY {_SQL_COS.format(a='qv.vec', b='cv.vec')} DESC,
                          sc.vec_id) AS rank
        FROM sigs sq
        JOIN sigs sc ON sq.bucket = sc.bucket AND sq.vec_id != sc.vec_id
        JOIN v qv ON qv.vec_id = sq.vec_id
        JOIN v cv ON cv.vec_id = sc.vec_id
        WHERE sq.vec_id < {N_QUERIES})
      WHERE rank <= {TOP_K}
    )
    SELECT b.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS hits,
           CAST(COUNT(l.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM brute b
    LEFT JOIN lsh l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
    doc="ANN evaluation: per-query recall@k of the LSH-bucketed path "
    "against exact brute-force cosine — the similarity tier's quality "
    "gate as a driver-verified QUERY, not just a test bound. Every "
    "constant (hyperplanes, k, query set) and cosine/bucket fragment "
    "is shared with s_brute_topk / s_lsh_ann_topk, so the evaluated "
    "system is exactly the registered one. On THIS fixture the "
    "measurement is ~0 BY CONSTRUCTION and that is the point: the "
    "synthetic embeddings are near-orthogonal noise (within-label "
    "cosine ~0.013), so the exact top-k is itself noise and no "
    "bucketed index can recall it — the same instrument on clusterable "
    "data reports real recall (the crafted-cluster recall tests in "
    "tests/test_dedup_text_sim.py and tests/test_pq.py pin 75-100% "
    "depending on tier). recall = int/int row arithmetic "
    "(IEEE-deterministic, no rounding machinery).",
)
def s_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    brute = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=TOP_K).select(
        "query_id", "neighbor_id"
    )
    lsh = S.lsh_ann_topk(
        emb, queries, "vec_id", "embedding", k=TOP_K, num_planes=N_PLANES, dim=DIM
    ).select(F.col("query_id").alias("__lq"), F.col("neighbor_id").alias("__ln"))
    joined = brute.join(
        lsh,
        (F.col("query_id") == F.col("__lq")) & (F.col("neighbor_id") == F.col("__ln")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("__ln").cast("long").alias("hits"),
        (F.count("__ln").cast("double") / TOP_K).alias("recall_at_k"),
    )


# ---- dup-cluster representative selection (keep-best policy) ----
from nt_data_pipelines_spark.plans.textdedup import MINHASH_BANDS_CTE


@register(
    "d_keep_best_representative",
    oracle="WITH RECURSIVE " + MINHASH_BANDS_CTE.split("WITH ", 1)[1] + """,
    sized AS (
      SELECT doc_id, band, band_hash,
             COUNT(*) OVER (PARTITION BY band, band_hash) AS bsize,
             MIN(doc_id) OVER (PARTITION BY band, band_hash) AS hub
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE a.bsize <= 64
        UNION ALL
        SELECT hub, doc_id FROM sized WHERE bsize > 64 AND doc_id <> hub
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.word = sa.word
      GROUP BY 1, 2
    ),
    e AS (
      SELECT v.id_a, v.id_b FROM verified v
      JOIN sizes za ON za.doc_id = v.id_a
      JOIN sizes zb ON zb.doc_id = v.id_b
      WHERE v.n_common
            / CAST(za.set_size + zb.set_size - v.n_common AS DOUBLE) >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM e
      UNION SELECT id_b, id_a FROM e
      UNION SELECT id_a, id_a FROM e
      UNION SELECT id_b, id_b FROM e
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, g.dst FROM reach r JOIN edges g ON r.dst = g.src
    ),
    members AS (SELECT src AS doc_id, MIN(dst) AS canonical_id FROM reach GROUP BY src),
    ranked AS (
      SELECT m.canonical_id, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY m.canonical_id
                                ORDER BY d.n_chars DESC, d.doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY m.canonical_id) AS sz
      FROM members m JOIN documents d ON d.doc_id = m.doc_id
    )
    SELECT canonical_id, doc_id AS keep_id, n_chars AS keep_chars,
           CAST(sz AS BIGINT) AS cluster_size
    FROM ranked WHERE rk = 1
    """,
    doc="Duplicate-cluster representative selection with the KEEP-BEST "
    "policy: connected components over the verified near-dup edges "
    "(same bounded-LSH construction and threshold as "
    "d_verified_dup_edges — one shared bands CTE), then each cluster "
    "keeps its highest-quality member (longest doc, id tie-break) "
    "instead of the arbitrary min id — the curation decision that "
    "keeps the canonical article and drops its truncated mirrors. "
    "Scale: the rank window partitions per cluster over member rows "
    "only; edges and CC reuse the tier's bounded machinery.",
)
def d_keep_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    edges = D.minhash_verified_dup_edges(
        docs, "doc_id", "text", threshold=0.7, bucket_cap=D.DEFAULT_BUCKET_CAP
    ).select("id_a", "id_b")
    members = D.resolve_dup_groups_distributed(edges, "id_a", "id_b")
    ranked = members.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        ranked.withColumn("__rk", F.row_number().over(w))
        .withColumn("__sz", F.count(F.lit(1)).over(Window.partitionBy("canonical_id")))
        .filter(F.col("__rk") == 1)
        .select(
            "canonical_id",
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            F.col("__sz").cast("long").alias("cluster_size"),
        )
    )


@register(
    "a_composition_turnover",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT d FROM c),
    types AS (SELECT DISTINCT event_type FROM c),
    grid AS (
      SELECT days.d, types.event_type, COALESCE(c.n, 0) AS n
      FROM days CROSS JOIN types
      LEFT JOIN c ON c.d = days.d AND c.event_type = types.event_type
    ),
    tot AS (SELECT d, CAST(SUM(n) AS BIGINT) AS nd FROM grid GROUP BY d),
    lagged AS (
      SELECT g.d, g.event_type, g.n,
             lag(g.n) OVER (PARTITION BY g.event_type ORDER BY g.d) AS pn,
             lag(g.d) OVER (PARTITION BY g.event_type ORDER BY g.d) AS pd
      FROM grid g
    ),
    terms AS (
      SELECT l.d, t1.nd, t0.nd AS pnd,
             -- |n_t/N_d - pn_t/N_{d-1}| on the common denominator:
             -- exact integer numerators, one shared denominator per day
             abs(CAST(l.n AS HUGEINT) * t0.nd
                 - CAST(l.pn AS HUGEINT) * t1.nd) AS num
      FROM lagged l
      JOIN tot t1 ON t1.d = l.d
      JOIN tot t0 ON t0.d = l.pd
      WHERE l.pn IS NOT NULL AND t1.nd > 0 AND t0.nd > 0
    )
    SELECT d AS day,
           CAST((2 * SUM(num) * 1000000 + 2 * CAST(nd AS HUGEINT) * pnd)
                // (2 * 2 * CAST(nd AS HUGEINT) * pnd) AS DOUBLE)
             / 1000000.0 AS turnover
    FROM terms GROUP BY d, nd, pnd
    """,
    doc="Daily composition turnover: half the L1 distance between "
    "consecutive days' event-type share distributions — the TEMPORAL "
    "drift series complementing the static KS statistic (0 = stable "
    "mix, 1 = complete swap; catches a feed going dark or a new "
    "upstream flooding in). Shares compare on the exact common "
    "denominator N_d * N_{d-1} (integer numerators, HUGEINT/"
    "decimal(38,0)); one rule-3 micro division per day. The type-"
    "keyed lag window orders DAYS per type — never corpus rows.",
)
def a_composition_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    days = c.select("d").distinct()
    types = c.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(c, ["d", "event_type"], "left")
        .select("d", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tot = grid.groupBy("d").agg(F.sum("n").cast("long").alias("nd"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = grid.select(
        "d",
        "event_type",
        "n",
        F.lag("n").over(w).alias("pn"),
        F.lag("d").over(w).alias("pd"),
    ).filter(F.col("pn").isNotNull())
    t1 = tot.select(F.col("d"), F.col("nd"))
    t0 = tot.select(F.col("d").alias("pd"), F.col("nd").alias("pnd"))
    terms = (
        lagged.join(t1, "d")
        .join(t0, "pd")
        .filter((F.col("nd") > 0) & (F.col("pnd") > 0))
        .select(
            "d",
            "nd",
            "pnd",
            F.abs(
                F.col("n").cast("decimal(38,0)") * F.col("pnd")
                - F.col("pn").cast("decimal(38,0)") * F.col("nd")
            ).alias("__num"),
        )
    )
    return terms.groupBy(F.col("d").alias("day"), "nd", "pnd").agg(
        F.sum("__num").alias("__s")
    ).select(
        "day",
        (
            F.expr(
                "CAST((2 * __s * 1000000 + 2 * CAST(nd AS DECIMAL(38,0)) * pnd)"
                " DIV (2 * 2 * CAST(nd AS DECIMAL(38,0)) * pnd) AS DOUBLE)"
            )
            / 1000000.0
        ).alias("turnover"),
    )


@register(
    "a_join_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS mult
      FROM lineitem GROUP BY l_orderkey
    ),
    c AS (SELECT mult AS v, CAST(COUNT(*) AS BIGINT) AS c FROM k GROUP BY mult),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_keys,
             CAST(SUM(v * c) AS BIGINT) AS n_rows,
             CAST(MAX(v) AS BIGINT) AS max_mult
      FROM c
    ),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c
    ),
    q AS (SELECT UNNEST([50, 90, 99]) AS pct),
    cuts AS (
      SELECT pct, MIN(v) AS v FROM cum CROSS JOIN q CROSS JOIN tot
      WHERE 100 * cum >= pct * n_keys GROUP BY pct
    )
    SELECT n_keys, n_rows, max_mult,
           MAX(CASE WHEN pct = 50 THEN v END) AS p50_mult,
           MAX(CASE WHEN pct = 90 THEN v END) AS p90_mult,
           MAX(CASE WHEN pct = 99 THEN v END) AS p99_mult,
           -- hottest key's share of all rows, micro (rule 3)
           CAST((2 * CAST(max_mult AS HUGEINT) * 1000000 + n_rows)
                // (2 * CAST(n_rows AS HUGEINT)) AS DOUBLE) / 1000000.0
             AS max_key_share
    FROM cuts CROSS JOIN tot
    GROUP BY n_keys, n_rows, max_mult
    """,
    doc="Join-key skew audit for lineitem.l_orderkey: key multiplicity "
    "quantiles (value-domain integer rank identity — the multiplicity "
    "DOMAIN is tiny even when keys are billions), the hottest key's "
    "absolute multiplicity, and its micro-exact share of all rows — "
    "the diagnostic that decides between a plain shuffle join, AQE "
    "skew splitting, and the salting tier (operators/skew.py) BEFORE "
    "the join runs. Two linear map-side-partial aggregations plus a "
    "domain-sized window; no corpus sort.",
)
def a_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey")).agg(F.count(F.lit(1)).cast("long").alias("__m"))
    c = k.groupBy(F.col("__m").alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tot = c.agg(
        F.sum("__c").cast("long").alias("n_keys"),
        F.sum(F.col("__v") * F.col("__c")).cast("long").alias("n_rows"),
        F.max("__v").cast("long").alias("max_mult"),
    )
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = c.select("__v", F.sum("__c").over(wv).alias("__cum"))
    pcts = F.explode(F.array(*[F.lit(p) for p in (50, 90, 99)])).alias("pct")
    cuts = (
        cum.crossJoin(F.broadcast(tot.select("n_keys")))
        .select("__v", "__cum", "n_keys", pcts)
        .filter(F.col("__cum") * 100 >= F.col("pct") * F.col("n_keys"))
        .groupBy("pct")
        .agg(F.min("__v").alias("v"))
    )
    wide = cuts.groupBy().pivot("pct", [50, 90, 99]).agg(F.first("v"))
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(
            "n_keys",
            "n_rows",
            "max_mult",
            F.col("50").cast("long").alias("p50_mult"),
            F.col("90").cast("long").alias("p90_mult"),
            F.col("99").cast("long").alias("p99_mult"),
            (
                F.expr(
                    "CAST((2 * CAST(max_mult AS DECIMAL(38,0)) * 1000000 + n_rows)"
                    " DIV (2 * CAST(n_rows AS DECIMAL(38,0))) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("max_key_share"),
        )
    )
