"""Additional coverage queries: grouping sets, deterministic sorts,
composed dedup (LSH candidates -> exact verify), IVF-style ANN.

These extend beyond the reference's inventory (it has no cube/rollup)
to round out the engine's relational surface, and demonstrate the
*composed* scale paths for dedup and similarity: cheap candidate
generation first, exact verification on the candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import dedup as D
from nt_data_pipelines_spark.operators import similarity as S
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.plans.textdedup import MINHASH_BANDS_CTE
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "a_cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (beyond the reference; Catalyst expands to one agg).",
)
def a_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@register(
    "a_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (each single dimension + grand total) — "
    "the general form CUBE/ROLLUP specialize; Catalyst expands all "
    "sets into one aggregate pass.",
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@register(
    "o1_multisort_limit",
    oracle="""
    SELECT user_id, ts, event_id, event_type, value
    FROM events
    ORDER BY user_id, ts, event_id
    LIMIT 100
    """,
    doc="O1 deterministic multi-key sort + limit (unique key triple).",
)
def o1_multisort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id", "ts", "event_id")
        .limit(100)
    )


@register(
    "a_median_exact",
    oracle="""
    SELECT event_type,
           ROUND(median(value), 6) + 0.0 AS med,
           ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated quantiles (median/p90) — both engines use the "
    "same continuous-quantile definition; approx sketches would not match.",
)
def a_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.round(F.median("value"), 6) + 0.0).alias("med"),
        (F.round(F.percentile("value", F.lit(0.9)), 6) + 0.0).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "d_lsh_verified_dedup",
    oracle=MINHASH_BANDS_CTE + """,
    candidates AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM candidates c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.word = sa.word
      GROUP BY c.id_a, c.id_b
    )
    SELECT v.id_a, v.id_b,
           CAST((2 * v.n_common * 1000000 + (za.set_size + zb.set_size - v.n_common))
                // (2 * (za.set_size + zb.set_size - v.n_common)) AS DOUBLE)
             / 1000000.0 AS jaccard
    FROM verified v
    JOIN sizes za ON za.doc_id = v.id_a
    JOIN sizes zb ON zb.doc_id = v.id_b
    WHERE v.n_common / CAST(za.set_size + zb.set_size - v.n_common AS DOUBLE) >= 0.7
    """,
    doc="The composed dedup scale path: MinHash-LSH candidate pairs, then "
    "exact Jaccard verification restricted to candidates (threshold 0.7).",
)
def d_lsh_verified_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    candidates = D.minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=16, bands=4)
    # exact verify via per-row word arrays (round-13 optimization, same
    # rewrite as operators/dedup.minhash_verified_dup_edges): each
    # candidate edge moves two word arrays once; |A∩B| and the sizes
    # are codegen array ops — no shingle fan-out join, no per-pair
    # groupBy, two fewer aggregation exchanges. Output unchanged: a
    # zero-overlap candidate had no `common` row before and jaccard 0
    # now; both fall to the >= 0.7 filter.
    wsets = D.word_arrays(docs, "doc_id", "text")
    wa = wsets.select(F.col("doc_id").alias("id_a"), F.col("__ws").alias("__wa"))
    wb = wsets.select(F.col("doc_id").alias("id_b"), F.col("__ws").alias("__wb"))
    jac = (
        candidates.join(wa, "id_a")
        .join(wb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__wa", "__wb")).cast("long").alias("n_common"),
            F.size("__wa").cast("long").alias("size_a"),
            F.size("__wb").cast("long").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
    )
    j6 = F.expr(
        "CAST((2 * n_common * 1000000 + (size_a + size_b - n_common)) "
        "DIV (2 * (size_a + size_b - n_common)) AS DOUBLE)"
    ) / 1000000.0  # integer half-up round-6 (registry rule 3)
    return jac.filter(F.col("jaccard") >= 0.7).select(
        "id_a", "id_b", j6.alias("jaccard")
    )


@register(
    "s_ivf_assign",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    centroids AS (
      SELECT label AS c_label, g.dim AS dim,
             CAST(SUM(CAST(CAST(embedding[g.dim + 1] AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
               / COUNT(*) AS c_val
      FROM embeddings CROSS JOIN (SELECT UNNEST(range(64)) AS dim) g
      GROUP BY label, g.dim
    ),
    cvec AS (
      SELECT c_label, list(c_val ORDER BY dim) AS cv FROM centroids GROUP BY c_label
    ),
    scored AS (
      SELECT v.vec_id, v.label, c.c_label,
             ROUND(list_dot_product(v.vec, c.cv) /
                   (SQRT(list_dot_product(v.vec, v.vec)) * SQRT(list_dot_product(c.cv, c.cv))), 6) + 0.0 AS cos
      FROM v CROSS JOIN cvec c
    )
    SELECT vec_id, label, c_label AS assigned_label, cos FROM (
      SELECT vec_id, label, c_label, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rk
      FROM scored)
    WHERE rk = 1
    """,
    doc="IVF coarse quantizer step: per-label centroids (the 'codebook'), "
    "every vector assigned to its nearest centroid by cosine — the cell "
    "assignment an IVF index partitions by at scale.",
)
def s_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(S.as_double_array("embedding")).alias("dim", "val")
    )
    centroids = (
        exploded.groupBy(F.col("label").alias("c_label"), "dim")
        .agg(
            (F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count(F.lit(1))).alias("c_val")
        )
        .groupBy("c_label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c_val"))).alias("pairs"))
        .select("c_label", F.expr("transform(pairs, p -> p.c_val)").alias("cv"))
    )
    v = emb.select("vec_id", "label", S.as_double_array("embedding").alias("vec"))
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "cos", F.round(S.cosine(F.col("vec"), F.col("cv")), 6) + 0.0
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("c_label"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("c_label").alias("assigned_label"), F.col("cos"))
    )
