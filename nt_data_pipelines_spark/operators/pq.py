"""Product quantization (PQ) — the compressed ANN storage tier.

IVF narrows WHERE to look (operators/ivf.py); PQ shrinks WHAT is
stored: each D-dim vector is split into ``m`` sub-blocks and every
block is replaced by the id of its nearest per-block centroid — D
floats become m small ints (64 floats -> 4 bytes at m=4, k<=256). A
query is answered with asymmetric distance computation (ADC): one
tiny (m x k) lookup table of exact query-to-centroid distances is
broadcast, and each corpus row's approximate distance is m table
lookups summed — the scan never touches raw vectors, which is what
makes exhaustive re-rank affordable over a 100 TB corpus (IVF+PQ
composes: PQ-scan the probed cells only).

Determinism mirrors the IVF kernel: seeds are the lowest-id vectors,
assignment argmins compare ROUND-6 distances with ties to the lowest
code, and centroid means are exact DECIMAL sums divided in double —
so the DuckDB oracle reproduces codebooks, codes, and search results
bit-for-bit, and a different cluster size changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.similarity import as_double_array


def _sub_blocks(vec_col, m: int, dim: int):
    """List of (block_id, slice expression) splitting a dim-vector
    into m equal consecutive blocks (F.slice is 1-based)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} blocks")
    w = dim // m
    v = as_double_array(vec_col)
    return [(b, F.slice(v, b * w + 1, w)) for b in range(m)]


def dist2(a, b):
    """Squared L2 distance, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _blocked(corpus: DataFrame, id_col: str, vec_col: str, m: int, dim: int) -> DataFrame:
    """(id, block, sub): one row per vector per block."""
    pairs = _sub_blocks(vec_col, m, dim)
    arr = F.array(*[F.struct(F.lit(b).alias("block"), s.alias("sub")) for b, s in pairs])
    return corpus.select(F.col(id_col), F.inline(arr))


def pq_seed_codebook(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    m: int = 4, k: int = 8, dim: int = 64,
) -> DataFrame:
    """Deterministic initial codebook: for every block, the sub-vectors
    of the k lowest-id corpus vectors. Returns (block, code, centroid).

    The partitionless row_number window below is BOUNDED: it runs on
    the post-``limit(k)`` frame (k codebook rows, never the corpus) —
    whitelisted in the plan-shape sweep (tests/test_plan_shape2.py)."""
    seeds = corpus.orderBy(id_col).limit(k).select(
        (F.row_number().over(Window.orderBy(id_col)) - 1).alias("code"),
        F.col(vec_col).alias("__v"),
    )
    return _blocked(seeds, "code", "__v", m, dim).select(
        "block", "code", F.col("sub").alias("centroid")
    )


def pq_train(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    m: int = 4, k: int = 8, dim: int = 64, iterations: int = 3,
) -> DataFrame:
    """Per-block Lloyd's k-means over sub-vectors (all m blocks train
    in the SAME Spark jobs — block is just another grouping key, so
    the iteration count, not the block count, drives job count).
    Codebook state is m*k*(dim/m) = k*dim doubles — broadcast-sized."""
    spark = corpus.sparkSession
    blocked = _blocked(corpus, id_col, vec_col, m, dim)
    codebook = pq_seed_codebook(corpus, id_col, vec_col, m, k, dim)
    for _ in range(iterations):
        assigned = _assign_codes(blocked, codebook, id_col)
        means = (
            assigned.select("block", "code", F.posexplode("sub").alias("dim", "val"))
            .groupBy("block", "code", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .groupBy("block", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
            .select("block", "code", F.expr("transform(pairs, p -> p.c)").alias("centroid"))
        )
        refreshed = (
            codebook.alias("old")
            .join(means.alias("new"), ["block", "code"], "left")
            .select(
                "block", "code",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias("centroid"),
            )
        )
        codebook = spark.createDataFrame(refreshed.collect(), refreshed.schema)
    return codebook


def _assign_codes(blocked: DataFrame, codebook: DataFrame, id_col: str) -> DataFrame:
    scored = blocked.join(F.broadcast(codebook), "block").withColumn(
        "d", F.round(dist2(F.col("sub"), F.col("centroid")), 6) + 0.0
    )
    w = Window.partitionBy(id_col, "block").orderBy(F.asc("d"), F.asc("code"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, "block", "code", "sub")
    )


def pq_encode(
    corpus: DataFrame, codebook: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    m: int = 4, dim: int = 64,
) -> DataFrame:
    """(id, codes): each vector as its m per-block centroid ids —
    the at-rest representation (store this, drop the floats)."""
    blocked = _blocked(corpus, id_col, vec_col, m, dim)
    assigned = _assign_codes(blocked, codebook, id_col)
    return (
        assigned.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("block", "code"))).alias("pairs"))
        .select(
            id_col,
            F.expr("transform(pairs, p -> cast(p.code as bigint))").alias("codes"),
        )
    )


def ivfpq_search(
    indexed_codes: DataFrame, queries: DataFrame,
    centroids: DataFrame, codebook: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_probe: int = 2, m: int = 4, dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF + PQ composed: probe the coarse cells, ADC-rank inside them.

    ``indexed_codes`` is the at-rest index: (id, cell, codes) — the
    join of :func:`~nt_data_pipelines_spark.operators.ivf.assign_cells`
    with :func:`pq_encode`, persisted once. A query touches
    corpus/n_cells * n_probe rows of 4-byte codes instead of the whole
    corpus of raw floats — the two reductions multiply, which is the
    standard billion-vector serving layout (IVF-PQ). Candidate scoring
    is the same broadcast-LUT decimal sum as :func:`pq_search`.
    """
    from nt_data_pipelines_spark.operators.similarity import cosine

    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("q_vec"))
    q_cells = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("centroid")), 6) + 0.0)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", "cell")
    )
    q_blocked = _blocked(
        queries.select(F.col(id_col).alias("query_id"), vec_col), "query_id", vec_col, m, dim
    )
    lut = q_blocked.join(F.broadcast(codebook), "block").select(
        "query_id", "block", "code",
        (F.round(dist2(F.col("sub"), F.col("centroid")), 6) + 0.0).alias("d"),
    )
    cand = q_cells.join(
        indexed_codes.withColumnRenamed(id_col, "neighbor_id"), "cell"
    )
    if exclude_self:
        # corpus-self search semantics; pass False when query ids come
        # from a DIFFERENT keyspace than the index (id equality is
        # coincidence there, and the filter would silently drop a true
        # neighbor)
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    cand = (
        cand
        .select("query_id", "neighbor_id", F.posexplode("codes").alias("block", "code"))
        .join(F.broadcast(lut), ["query_id", "block", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("d").cast("decimal(28,6)")).cast("double").alias("approx_dist2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist2"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_dist2")
    )


def pq_search(
    codes: DataFrame, queries: DataFrame, codebook: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, m: int = 4, dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: exact (query x codebook) distance LUT, broadcast;
    per-row approximate distance = m lookups, decimal-summed (block
    partials are rounded, so the total is shuffle-order-independent).
    Returns (query_id, rank, neighbor_id, approx_dist2) ranked
    ascending with neighbor-id tie-break."""
    q_blocked = _blocked(
        queries.select(F.col(id_col).alias("query_id"), vec_col), "query_id", vec_col, m, dim
    )
    lut = q_blocked.join(F.broadcast(codebook), "block").select(
        "query_id", "block", "code",
        (F.round(dist2(F.col("sub"), F.col("centroid")), 6) + 0.0).alias("d"),
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("block", "code")
    )
    paired = exploded.join(F.broadcast(lut), ["block", "code"])
    if exclude_self:
        # corpus-self semantics (see ivfpq_search for the trap)
        paired = paired.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        paired
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("d").cast("decimal(28,6)")).cast("double").alias("approx_dist2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "approx_dist2")
    )
