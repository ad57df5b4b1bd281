"""Similarity-search queries over the embeddings table.

The LSH hyperplanes are deterministic ±1 vectors derived from md5 in
*Python* at plan-build time and inlined as literals into BOTH the
Spark plan and the DuckDB oracle — no engine RNG, perfectly
reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import similarity as S
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

DIM = 64
N_PLANES = 8
N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 5

_SQL_COS = (
    "(ROUND(list_dot_product({a}, {b}) / "
    "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b}))), 6) + 0.0)"
)


def _dbl(col: str) -> str:
    return f"CAST({col} AS DOUBLE[])"


@register(
    "s_brute_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_dbl('embedding')} AS q_vec FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    c AS (SELECT vec_id AS neighbor_id, {_dbl('embedding')} AS c_vec FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {_SQL_COS.format(a='q_vec', b='c_vec')} AS cosine
      FROM q JOIN c ON query_id != neighbor_id
    )
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {TOP_K}
    """,
    doc="Exact cosine top-k: broadcast queries x corpus scan, rank window.",
)
def s_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(emb, queries, "vec_id", "embedding", k=TOP_K)


@register(
    "s_near_dup_pairs",
    oracle=f"""
    WITH u AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 3
    ),
    v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM u)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_SQL_COS.format(a='a.vec', b='b.vec')} AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_SQL_COS.format(a='a.vec', b='b.vec')} >= 0.8
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.8). Three exact "
    "clones (vec_id+1e6) are planted in BOTH engines so the expected result "
    "is non-empty at every scale factor — random sf embeddings never reach "
    "cosine 0.8, which made the original check vacuous.",
)
def s_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    return S.near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.8)


def _plane_sql(p: int) -> str:
    comps = S._hyperplane(p, DIM)
    lits = ", ".join(str(x) for x in comps)
    return f"CAST([{lits}] AS DOUBLE[])"


_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_dot_product(vec, {_plane_sql(p)}) >= 0 THEN '1' ELSE '0' END)"
    for p in range(N_PLANES)
)


@register(
    "s_lsh_ann_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM embeddings),
    sigs AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM v),
    cand AS (
      SELECT sq.vec_id AS query_id, sc.vec_id AS neighbor_id,
             {_SQL_COS.format(a='q.vec', b='c.vec')} AS cosine
      FROM sigs sq
      JOIN sigs sc ON sq.bucket = sc.bucket AND sq.vec_id != sc.vec_id
      JOIN v q ON q.vec_id = sq.vec_id
      JOIN v c ON c.vec_id = sc.vec_id
      WHERE sq.vec_id < {N_QUERIES}
    )
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cand)
    WHERE rank <= {TOP_K}
    """,
    doc="ANN top-k: random-hyperplane LSH buckets + exact re-rank inside bucket. "
    "Hyperplanes are md5-derived literals shared by Spark and the oracle.",
)
def s_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_ann_topk(emb, queries, "vec_id", "embedding", k=TOP_K, num_planes=N_PLANES, dim=DIM)


DEDUP_THRESHOLD = 0.3  # synthetic embeddings are near-orthogonal; 0.3 keeps real pairs


@register(
    "s_lsh_dedup_groups",
    oracle=f"""
    WITH RECURSIVE v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM embeddings),
    sigs AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM v),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    verified AS (
      SELECT id_a, id_b FROM cand
      JOIN v x ON x.vec_id = cand.id_a
      JOIN v y ON y.vec_id = cand.id_b
      WHERE {_SQL_COS.format(a='x.vec', b='y.vec')} >= {DEDUP_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION SELECT id_b, id_a FROM verified
      UNION SELECT id_a, id_a FROM verified
      UNION SELECT id_b, id_b FROM verified
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, MIN(dst) AS canonical_id FROM reach GROUP BY src
    """,
    doc="The composed embedding-dedup SCALE path: LSH bucket candidates -> "
    "exact cosine verify -> distributed min-label-propagation connected "
    "components. The oracle recomputes the same pipeline with a recursive "
    "transitive closure for the component step.",
)
def s_lsh_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.dedup import resolve_dup_groups_distributed

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.lsh_near_dup_pairs(
        emb, "vec_id", "embedding",
        threshold=DEDUP_THRESHOLD, num_planes=N_PLANES, dim=DIM,
    )
    return resolve_dup_groups_distributed(pairs, "id_a", "id_b")


N_CELLS = 8
KMEANS_ITERS = 3
N_PROBE = 2


def _ivf_oracle(
    n_cells: int = N_CELLS,
    iterations: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
    k: int = TOP_K,
    dim: int = DIM,
    n_queries: int = N_QUERIES,
) -> str:
    """Unroll the ENTIRE IVF pipeline — Lloyd's training included — in SQL.

    The Spark side (operators/ivf.py) is engine-stable by construction:
    round-6 cosine argmins with lowest-cell tiebreaks, exact
    DECIMAL(38,9) centroid sums divided in double. That makes each
    Lloyd's iteration a deterministic function of the data, so a fixed
    number of iterations unrolls into chained CTEs and DuckDB
    reproduces the identical codebook, index, and search result.
    """

    def cos(a: str, b: str) -> str:
        return _SQL_COS.format(a=a, b=b)

    def assign_sql(cent: str, out_cols: str = "vec_id, vec, cell") -> str:
        return f"""(
      SELECT {out_cols} FROM (
        SELECT v.vec_id, v.vec, c.cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cos('v.vec', 'c.centroid')} DESC, c.cell) AS rk
        FROM v CROSS JOIN {cent} c)
      WHERE rk = 1)"""

    ctes = [
        f"v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM embeddings)",
        f"""cent0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, vec AS centroid
      FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {n_cells}))""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"assign{i} AS {assign_sql(f'cent{i-1}')}")
        ctes.append(f"""means{i} AS (
      SELECT cell, g.dim AS dim,
             CAST(SUM(CAST(vec[g.dim + 1] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS m
      FROM assign{i} CROSS JOIN (SELECT UNNEST(range({dim})) AS dim) g
      GROUP BY cell, g.dim)""")
        ctes.append(f"""cent{i} AS (
      SELECT p.cell, COALESCE(n.centroid, p.centroid) AS centroid
      FROM cent{i-1} p
      LEFT JOIN (SELECT cell, list(m ORDER BY dim) AS centroid
                 FROM means{i} GROUP BY cell) n ON p.cell = n.cell)""")
    final = f"cent{iterations}"
    ctes.append(f"idx AS {assign_sql(final)}")
    ctes.append(f"""qc AS (
      SELECT query_id, q_vec, cell FROM (
        SELECT q.vec_id AS query_id, q.vec AS q_vec, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos('q.vec', 'c.centroid')} DESC, c.cell) AS rk
        FROM v q CROSS JOIN {final} c WHERE q.vec_id < {n_queries})
      WHERE rk <= {n_probe})""")
    ctes.append(f"""cand AS (
      SELECT qc.query_id, i.vec_id AS neighbor_id,
             {cos('qc.q_vec', 'i.vec')} AS cosine
      FROM qc JOIN idx i ON qc.cell = i.cell AND qc.query_id != i.vec_id)""")
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cand)
    WHERE rank <= {k}
    """


@register(
    "s_ivf_search_topk",
    oracle=_ivf_oracle(),
    doc="IVF ANN tier: deterministic Lloyd's k-means coarse quantizer "
    "(8 cells, 3 iterations), then probe the 2 nearest cells per query "
    "and re-rank exactly — the shuffle key is the cell, never the corpus. "
    "The oracle unrolls the identical training iterations in SQL (the "
    "operator is engine-stable: round-6 argmins + exact decimal means).",
)
def s_ivf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.ivf import ivf_search, kmeans_train

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_train(emb, n_cells=N_CELLS, iterations=KMEANS_ITERS)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_search(emb, queries, centroids, k=TOP_K, n_probe=N_PROBE)


@register(
    "s_centroid_per_label",
    oracle=f"""
    WITH exploded AS (
      SELECT label, g.dim AS dim, CAST(embedding[g.dim + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN (SELECT UNNEST(range({DIM})) AS dim) g
    )
    SELECT label, dim,
           -- signed 9-decimal-sum / count: integer half-away round-6
           -- (registry rule 3)
           CAST(SIGN(nano) * ((2 * ABS(nano) + 1000 * n) // (2000 * n))
                AS DOUBLE) / 1000000.0 + 0.0 AS centroid,
           n
    FROM (
      SELECT label, dim,
             CAST(SUM(CAST(val AS DECIMAL(38,9)) * 1000000000) AS HUGEINT)
               AS nano,
             COUNT(*) AS n
      FROM exploded GROUP BY label, dim
    )
    """,
    doc="Per-label centroids (the reduce step an IVF coarse quantizer needs).",
)
def s_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(S.as_double_array("embedding")).alias("dim", "val")
    ).withColumn("dim", F.col("dim").cast("long"))
    # signed 9-decimal-sum / count: integer half-away round-6 (rule 3)
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.sum(
                (F.col("val").cast("decimal(38,9)") * 1000000000).cast(
                    "decimal(38,0)"
                )
            ).alias("__nano"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "dim",
            (
                F.expr(
                    "CAST(SIGN(__nano) * ((2 * ABS(__nano) + 1000 * n) "
                    "DIV (2000 * n)) AS DOUBLE)"
                )
                / 1000000.0
                + 0.0
            ).alias("centroid"),
            "n",
        )
    )
