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
           ROUND(CAST(n_users AS DOUBLE) /
                 NULLIF(FIRST_VALUE(n_users) OVER (ORDER BY step), 0), 6)
             AS conversion
    FROM c
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
        "r0 AS (SELECT node, ROUND(1.0 / N, 6) AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i-1}"
        ctes.append(f"""c{i} AS (
      SELECT k.dst_id AS node,
             CAST(SUM(CAST(r.rank / o.outd AS DECIMAL(38,12))) AS DOUBLE) AS cin
      FROM knn k JOIN {p} r ON k.src_id = r.node
      JOIN outdeg o ON o.node = k.src_id
      GROUP BY k.dst_id)""")
        ctes.append(f"""d{i} AS (
      SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(38,12))) AS DOUBLE), 0.0) AS dang
      FROM {p} r LEFT JOIN outdeg o ON r.node = o.node WHERE o.node IS NULL)""")
        ctes.append(f"""r{i} AS (
      SELECT n.node,
             ROUND(0.15 / N + 0.85 * (COALESCE(c.cin, 0.0) + d.dang / N), 6) AS rank
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
      CROSS JOIN nn CROSS JOIN d{i} d)""")
    return f"WITH {','.join(ctes)}\n    SELECT node, rank FROM r{iters}"


@register(
    "g_pagerank_knn",
    oracle=_pagerank_oracle(_PR_ITERS),
    doc="Damped PageRank (3 iterations) over the LSH-blocked k-NN "
    "graph — ranking cluster members by link structure (canonical-doc "
    "selection). Each iteration is one contribution shuffle on the dst "
    "key + a scalar dangling-mass broadcast; ranks are round-6 and all "
    "sums DECIMAL, so the unrolled SQL oracle reproduces them exactly.",
)
def g_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.graph import pagerank
    from nt_data_pipelines_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, "vec_id", "embedding", k=3, num_planes=6, dim=64)
    return pagerank(edges.select("src_id", "dst_id"), "src_id", "dst_id", iterations=_PR_ITERS)
