"""IVF (inverted-file) approximate nearest-neighbor search.

The production ANN tier for embedding corpora too large for
brute-force and too dense for hash-bucket LSH:

1. **train**: distributed Lloyd's k-means learns ``n_cells`` coarse
   centroids. Each iteration is one Spark job — assign (broadcast
   centroids, fused JVM cosine argmin) + re-estimate (posexplode ->
   per (cell, dim) mean). The driver loop only ferries k x dim floats.
2. **index**: every vector is assigned to its nearest centroid cell —
   at rest this is just a ``cell`` column to partition/cluster by.
3. **search**: a query probes the ``n_probe`` nearest cells and
   re-ranks exactly within them. The corpus-side shuffle key is the
   cell, so the per-query candidate set is corpus/n_cells * n_probe
   instead of the whole corpus.

Deterministic: initial centroids are the first ``n_cells`` vectors by
id (no RNG), iteration count is fixed, and ties break on cell id —
same inputs give byte-identical indexes on any cluster size.

Engine-stable, too: assignment argmins compare cosines ROUNDED to 6
decimals (ties to the lowest cell id), and centroid means are exact
DECIMAL(38,9) sums divided in double — so a different engine (the
DuckDB oracle unrolls these exact iterations in SQL) reproduces the
identical codebook and index bit-for-bit. Unrounded float argmins
would let a 1-ulp summation difference flip an assignment and cascade
through the remaining iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.similarity import as_double_array, cosine


def _centroid_df(corpus: DataFrame, id_col: str, vec_col: str, n_cells: int) -> DataFrame:
    """Deterministic seed: the n_cells lowest-id vectors."""
    return (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cell"),
            as_double_array(vec_col).alias("centroid"),
        )
    )


def assign_cells(corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell): nearest centroid by cosine, ties to lowest cell."""
    v = corpus.select(F.col(id_col), as_double_array(vec_col).alias("vec"))
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", F.round(cosine(F.col("vec"), F.col("centroid")), 6) + 0.0
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, "vec", "cell")
    )


def kmeans_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iterations: int = 5,
) -> DataFrame:
    """Lloyd's iterations on the cluster; centroids collected per step.

    Centroid state is k x dim doubles — broadcast-sized by
    construction. Empty cells keep their previous centroid.
    """
    centroids = _centroid_df(corpus, id_col, vec_col, n_cells)
    for _ in range(iterations):
        assigned = assign_cells(corpus, centroids, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cell", "dim")
            # exact decimal sum, double divide: order-independent AND
            # bit-reproducible by the SQL oracle (see module docstring)
            .agg((F.sum(F.col("val").cast("decimal(38,9)")).cast("double") / F.count(F.lit(1))).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
            .select("cell", F.expr("transform(pairs, p -> p.m)").alias("centroid"))
        )
        # keep previous centroid for cells that lost all members
        refreshed = (
            centroids.alias("old")
            .join(means.alias("new"), "cell", "left")
            .select(
                "cell",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias("centroid"),
            )
        )
        # materialize: the next iteration must not re-derive this plan
        centroids = centroids.sparkSession.createDataFrame(refreshed.collect(), refreshed.schema)
    return centroids


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
    indexed: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Probe the n_probe nearest cells per query; exact re-rank inside.

    Returns (query_id, rank, neighbor_id, cosine) like the other ANN
    tiers. Pass ``indexed`` (the persisted output of
    :func:`assign_cells`) for repeated searches — otherwise every call
    re-pays the full corpus assignment, which is only acceptable for
    one-shot queries. With a precomputed index the candidate join is
    an equi-join on cell: the shuffle moves candidate cells, never the
    full corpus per query.
    """
    if indexed is None:
        indexed = assign_cells(corpus, centroids, id_col, vec_col)
    indexed = indexed.withColumnsRenamed({id_col: "neighbor_id", "vec": "c_vec"})
    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("q_vec"))
    q_cells = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("centroid")), 6) + 0.0)
        .withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))),
        )
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )
    cand = q_cells.join(indexed, "cell")
    if exclude_self:
        # corpus-self semantics; pass False for externally-keyed query
        # frames (id equality is coincidence there — the filter would
        # silently drop a true neighbor)
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = cand.withColumn(
        "cosine", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6) + 0.0
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
