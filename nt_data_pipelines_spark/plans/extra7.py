"""Event-analytics and graph queries: funnel, cohort retention,
transition matrix, PageRank over the k-NN graph."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.operators.events import (
    cohort_retention,
    event_transitions,
    funnel_conversion,
)
from nt_data_pipelines_spark.plans.extra6 import _KNN_BUCKET_SQL, _KNN_COS
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

_FUNNEL = ["view", "click", "purchase"]


@register(
    "a_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
      UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
    )
    SELECT step, event_type, n_users,
           -- int/int rational: integer half-up round-6 (registry rule 3)
           CASE WHEN f > 0
                THEN CAST((2 * n_users * 1000000 + f) // (2 * f) AS DOUBLE)
                     / 1000000.0
           END AS conversion
    FROM (SELECT *, FIRST_VALUE(n_users) OVER (ORDER BY step) AS f FROM c)
    """,
    doc="Strictly-ordered funnel view -> click -> purchase: step-i "
    "reach time is the earliest step-i event AFTER the step-(i-1) "
    "reach, computed as chained min-aggregates on the user key — one "
    "linear shuffle per step, no per-user sequence materialization.",
)
def a_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(ev, _FUNNEL)


@register(
    "a_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    )
    SELECT cohort,
           CAST(FLOOR((epoch(p) - epoch(cohort)) / 604800) AS BIGINT) AS age,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active JOIN first USING (user_id)
    GROUP BY cohort, age
    """,
    doc="Weekly cohort retention: users cohorted by the week of their "
    "first event; per (cohort, age-in-weeks) distinct active users. "
    "Two linear shuffles (first-seen per user, cohort-age count).",
)
def a_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, period="week")


@register(
    "a_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="Markov transition table of consecutive event types per user "
    "(event-id tie-break for engine-stable ordering): one window sort "
    "on the user key plus one pair-count aggregate.",
)
def a_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev)


@register(
    "w_user_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS g
      FROM days
    ),
    runs AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id, MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
    doc="Longest run of consecutive active days per user — the "
    "gaps-and-islands idiom: date minus per-user row_number is "
    "constant within a run, so one window sort + two aggregates "
    "(all shuffling on the user key) replace any iterative scan.",
)
def w_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id", "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("g"),
    )
    runs = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "t_lexical_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word != ''
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS c FROM toks GROUP BY doc_id, word
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM wc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_tokens, 0) AS n_tokens,
           COALESCE(n_types, 0) AS n_types,
           -- int/int rationals: integer half-up round-6 (registry rule 3)
           CAST((2 * n_types * 1000000 + n_tokens)
                // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS ttr,
           CAST((2 * n_hapax * 1000000 + n_types)
                // (2 * n_types) AS DOUBLE) / 1000000.0 AS hapax_frac
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    doc="Per-doc lexical diversity: type-token ratio and hapax "
    "fraction — the vocabulary-richness quality signals (template spam "
    "scores low TTR, gibberish scores hapax ~1). One (doc, word) "
    "count shuffle plus the per-doc roll-up.",
)
def t_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("word")).filter(
        F.col("word") != ""
    )
    wc = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0).cast("long")).alias("n_types"),
            (
                F.expr(
                    "CAST((2 * n_types * 1000000 + n_tokens) "
                    "DIV (2 * n_tokens) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("ttr"),
            (
                F.expr(
                    "CAST((2 * n_hapax * 1000000 + n_types) "
                    "DIV (2 * n_types) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("hapax_frac"),
        )
    )


@register(
    "t_bigram_logprob",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS gram, ws[i] AS prefix
      FROM d CROSS JOIN UNNEST(range(1, len(ws))) AS t(i)
    ),
    cg AS (SELECT gram, COUNT(*) AS c FROM g GROUP BY gram),
    cp AS (SELECT prefix, COUNT(*) AS cp FROM g GROUP BY prefix),
    per_doc AS (
      -- integer-exact half-up mean (midpoint-safe; operators/lm.py)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             SUM(CAST(CAST(ROUND(-log2(CAST(c AS DOUBLE) / cp), 6)
                           AS DECIMAL(28,6)) * 1000000 AS BIGINT)) AS micro
      FROM g JOIN cg USING (gram) JOIN cp USING (prefix)
      GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
           CAST((2 * micro + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
             / 1000000.0 AS bigram_bits_per_token
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    doc="Context-sensitive quality score: mean bigram surprisal under "
    "the corpus bigram MLE (conditional on the prefix count). Word "
    "salad of common words fools a unigram model; rare TRANSITIONS do "
    "not hide. Three linear shuffles (gram counts, prefix counts, "
    "per-doc roll-up), rounded-then-decimal-summed for parity.",
)
def t_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.lm import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "doc_id", "text")


@register(
    "a_last_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
    ),
    matched AS (
      SELECT purchase_id,
             (SELECT c.click_id FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts
                AND CAST(epoch_us(p.ts) AS DOUBLE) / 1000000.0
                    - CAST(epoch_us(c.ts) AS DOUBLE) / 1000000.0 <= 3600.0
              ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS click_id
      FROM p
    )
    SELECT n_purchases, n_attributed,
           CAST((2 * n_attributed * 1000000 + n_purchases)
                // (2 * n_purchases) AS DOUBLE) / 1000000.0 AS attribution_rate
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
                 CAST(COUNT(click_id) AS BIGINT) AS n_attributed
          FROM matched)
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
    "recent click within a 60-minute lookback, via the as-of join "
    "(union + struct-carry — one window sort per user, no range "
    "cross-join). The oracle's correlated subquery spells the same "
    "most-recent-within-tolerance semantics.",
)
def a_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    # NULL user pin: the window partition would group NULL users while
    # SQL equality rejects NULL=NULL — filter both sides so the engines
    # agree even if the data ever grows NULL ids
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(F.col("event_id").alias("purchase_id"), "user_id", "ts")
    clicks = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(F.col("event_id").alias("click_id"), "user_id", "ts")
    m = asof_join(
        purchases, clicks, on="ts", by="user_id",
        tolerance_seconds=3600, direction="backward",
    )
    # int/int rational: integer half-up round-6 (registry rule 3)
    return m.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("right_click_id").alias("n_attributed"),
    ).select(
        "n_purchases",
        "n_attributed",
        (
            F.expr(
                "CAST((2 * n_attributed * 1000000 + n_purchases) "
                "DIV (2 * n_purchases) AS DOUBLE)"
            )
            / 1000000.0
        ).alias("attribution_rate"),
    )


_PR_ITERS = 3


def _pagerank_oracle(iters: int) -> str:
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)",
        f"sigs AS (SELECT vec_id, {_KNN_BUCKET_SQL} AS bucket FROM v)",
        """cand AS (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
      FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
    )""",
        f"""scored AS (
      SELECT src_id, dst_id, {_KNN_COS} AS cosine
      FROM cand
      JOIN (SELECT vec_id, vec AS va FROM v) x ON x.vec_id = cand.src_id
      JOIN (SELECT vec_id, vec AS vb FROM v) y ON y.vec_id = cand.dst_id
    )""",
        """knn AS (
      SELECT src_id, dst_id FROM (
        SELECT src_id, dst_id,
               ROW_NUMBER() OVER (PARTITION BY src_id
                                  ORDER BY cosine DESC, dst_id) AS rk
        FROM scored)
      WHERE rk <= 3
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src_id AS node FROM knn UNION ALL SELECT dst_id FROM knn)
    )""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM nodes)",
        "outdeg AS (SELECT src_id AS node, CAST(COUNT(*) AS BIGINT) AS outd FROM knn GROUP BY src_id)",
        # integer micro-rank recurrence (registry rule 3): rank state is
        # rank*1e6 as BIGINT; the only floating step is the per-edge
        # IEEE share, floored to pico units — parenthesized exactly as
        # operators/graph.py spells it so both engines round identically.
        "r0 AS (SELECT node, (2 * 1000000 + N) // (2 * N) AS rank_micro"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i-1}"
        ctes.append(f"""c{i} AS (
      SELECT k.dst_id AS node,
             SUM(CAST(FLOOR(
               (CAST(r.rank_micro AS DOUBLE) * 1000000.0)
               * (1.0 / CAST(o.outd AS DOUBLE))) AS BIGINT)) AS in_pico
      FROM knn k JOIN {p} r ON k.src_id = r.node
      JOIN outdeg o ON o.node = k.src_id
      GROUP BY k.dst_id)""")
        ctes.append(f"""d{i} AS (
      SELECT COALESCE(SUM(r.rank_micro), CAST(0 AS BIGINT)) AS dang_micro
      FROM {p} r LEFT JOIN outdeg o ON r.node = o.node WHERE o.node IS NULL)""")
        ctes.append(f"""r{i} AS (
      SELECT n.node,
             (2 * (
                (CAST(150000000000 AS BIGINT) // N)
                + (CAST(850000 AS BIGINT) * (COALESCE(c.in_pico, CAST(0 AS BIGINT))
                     + (d.dang_micro * 1000000) // N)) // 1000000
              ) + 1000000) // (2 * 1000000) AS rank_micro
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
      CROSS JOIN nn CROSS JOIN d{i} d)""")
    return (
        f"WITH {','.join(ctes)}\n    SELECT node,"
        f" CAST(rank_micro AS DOUBLE) / 1000000.0 AS rank FROM r{iters}"
    )


@register(
    "g_pagerank_knn",
    oracle=_pagerank_oracle(_PR_ITERS),
    doc="Damped PageRank (3 iterations) over the LSH-blocked k-NN "
    "graph — ranking cluster members by link structure (canonical-doc "
    "selection). Each iteration is one contribution shuffle on the dst "
    "key + a scalar dangling-mass broadcast; ranks are integer "
    "micro-ranks (BIGINT, registry rule 3) with only the per-edge IEEE "
    "share floating, so the unrolled SQL oracle reproduces them "
    "bit-exactly with no reachable rounding midpoint.",
)
def g_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.graph import pagerank
    from nt_data_pipelines_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    # bucket_cap=None: the oracle's edge CTE replicates the uncapped
    # bucket join (same reasoning as s_knn_graph)
    edges = knn_graph(
        emb, "vec_id", "embedding", k=3, num_planes=6, dim=64, bucket_cap=None
    )
    return pagerank(edges.select("src_id", "dst_id"), "src_id", "dst_id", iterations=_PR_ITERS)
