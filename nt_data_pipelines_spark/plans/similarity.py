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
    WITH v AS (SELECT vec_id, {_dbl('embedding')} AS vec FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_SQL_COS.format(a='a.vec', b='b.vec')} AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_SQL_COS.format(a='a.vec', b='b.vec')} >= 0.8
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.8).",
)
def s_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.near_dup_pairs(emb, "vec_id", "embedding", threshold=0.8)


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


@register(
    "s_ivf_search_topk",
    oracle=None,  # iterative k-means is not SQL-expressible; rows-only check
    doc="IVF ANN tier: deterministic Lloyd's k-means coarse quantizer "
    "(8 cells, 3 iterations), then probe the 2 nearest cells per query "
    "and re-rank exactly — the shuffle key is the cell, never the corpus.",
)
def s_ivf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.ivf import ivf_search, kmeans_train

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_train(emb, n_cells=8, iterations=3)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_search(emb, queries, centroids, k=TOP_K, n_probe=2)


@register(
    "s_centroid_per_label",
    oracle=f"""
    WITH exploded AS (
      SELECT label, g.dim AS dim, CAST(embedding[g.dim + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN (SELECT UNNEST(range({DIM})) AS dim) g
    )
    SELECT label, dim,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS centroid,
           COUNT(*) AS n
    FROM exploded GROUP BY label, dim
    """,
    doc="Per-label centroids (the reduce step an IVF coarse quantizer needs).",
)
def s_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(S.as_double_array("embedding")).alias("dim", "val")
    ).withColumn("dim", F.col("dim").cast("long"))
    return exploded.groupBy("label", "dim").agg(
        (F.round(
            F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count(F.lit(1)), 6
        ) + 0.0).alias("centroid"),
        F.count(F.lit(1)).alias("n"),
    )
