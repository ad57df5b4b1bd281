"""Round-5 additions: corpus LM scoring, k-NN graph, z-order layout,
equi-depth histograms.

Engine-parity notes follow the registry rules: decimal sums for
order-independence, round-6 on algorithmic stats, explicit FLOOR for
double->int, and md5-derived hyperplanes inlined as literals on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import similarity as S
from nt_data_pipelines_spark.operators.layout import (
    add_zorder_key,
    interleave_bits_sql,
)
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "t_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word != ''
    ),
    counts AS (SELECT word, COUNT(*) AS cw FROM toks GROUP BY word),
    total AS (SELECT SUM(cw) AS T FROM counts),
    per_doc AS (
      -- integer-exact half-up mean: rounding the double mean hits
      -- engine-divergent midpoints (micro_sum == n/2 mod n); see
      -- operators/lm.py
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(CAST(CAST(ROUND(-log2(CAST(cw AS DOUBLE) / T), 6)
                           AS DECIMAL(28,6)) * 1000000 AS BIGINT)) AS micro
      FROM toks JOIN counts USING (word) CROSS JOIN total
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_tokens, 0) AS n_tokens,
           CAST((2 * micro + n_tokens) // (2 * n_tokens) AS DOUBLE)
             / 1000000.0 AS bits_per_token
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    doc="CCNet-style perplexity proxy: per-doc mean unigram surprisal "
    "(bits/token) under the corpus's own unigram distribution. Word "
    "counts shuffle once on the word key; the global total is a scalar "
    "broadcast; per-token surprisal is rounded then decimal-summed so "
    "the doc mean is shuffle-order-independent.",
)
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.lm import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs, "doc_id", "text")


_KNN_PLANES = 6
_KNN_DIM = 64
_KNN_K = 3

_KNN_BUCKET_SQL = " || ".join(
    "(CASE WHEN list_dot_product(vec, CAST([{lits}] AS DOUBLE[])) >= 0 "
    "THEN '1' ELSE '0' END)".format(
        lits=", ".join(str(x) for x in S._hyperplane(p, _KNN_DIM))
    )
    for p in range(_KNN_PLANES)
)

_KNN_COS = (
    "(ROUND(list_dot_product(va, vb) / "
    "(SQRT(list_dot_product(va, va)) * SQRT(list_dot_product(vb, vb))), 6) + 0.0)"
)


@register(
    "s_knn_graph",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    sigs AS (SELECT vec_id, {_KNN_BUCKET_SQL} AS bucket FROM v),
    cand AS (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
      FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
    ),
    scored AS (
      SELECT src_id, dst_id, {_KNN_COS} AS cosine
      FROM cand
      JOIN (SELECT vec_id, vec AS va FROM v) x ON x.vec_id = cand.src_id
      JOIN (SELECT vec_id, vec AS vb FROM v) y ON y.vec_id = cand.dst_id
    )
    SELECT src_id, rank, dst_id, cosine FROM (
      SELECT src_id, dst_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY src_id
                                ORDER BY cosine DESC, dst_id) AS rank
      FROM scored)
    WHERE rank <= {_KNN_K}
    """,
    doc="Approximate k-NN graph over the WHOLE corpus: every vector's "
    "top-3 cosine neighbors among its LSH-bucket cohabitants (6 md5 "
    "hyperplanes -> 64 buckets). The bucket equi-join is the only "
    "scale-viable shape for an all-rows graph — no broadcast side "
    "exists and the N^2 cross product never materializes.",
)
def s_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket_cap=None: the SQL oracle replicates the UNCAPPED bucket
    # self-join, and a bucket crossing the default cap at a larger sf
    # would silently diverge from it. The capped (salt-split) tier is
    # pinned separately by tests/test_dedup_text_sim.py.
    return S.knn_graph(
        emb, "vec_id", "embedding", k=_KNN_K, num_planes=_KNN_PLANES, dim=_KNN_DIM,
        bucket_cap=None,
    )


_PQ_M = 4
_PQ_K = 8
_PQ_DIM = 64
_PQ_W = _PQ_DIM // _PQ_M

# Squared L2 via three dot products (algebraically the fold Spark
# computes; round-6 absorbs the summation-order ulps, same accepted
# trade as every cosine oracle).
_PQ_D2 = (
    "(ROUND(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}), 6) + 0.0)"
)

_PQ_COMMON = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    blocks AS (SELECT UNNEST(range({_PQ_M})) AS block),
    blocked AS (
      SELECT vec_id, block,
             vec[block * {_PQ_W} + 1 : block * {_PQ_W} + {_PQ_W}] AS sub
      FROM v CROSS JOIN blocks
    ),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, vec
      FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {_PQ_K})
    ),
    codebook AS (
      SELECT block, code,
             vec[block * {_PQ_W} + 1 : block * {_PQ_W} + {_PQ_W}] AS centroid
      FROM seeds CROSS JOIN blocks
    ),
    assigned AS (
      SELECT vec_id, block, code FROM (
        SELECT b.vec_id, b.block, cb.code,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id, b.block
                 ORDER BY {_PQ_D2.format(a='b.sub', b='cb.centroid')} ASC, cb.code ASC
               ) AS rk
        FROM blocked b JOIN codebook cb ON b.block = cb.block)
      WHERE rk = 1
    )"""


@register(
    "s_pq_encode",
    oracle=f"""
    WITH {_PQ_COMMON}
    SELECT vec_id, STRING_AGG(code, ',' ORDER BY block) AS codes
    FROM assigned GROUP BY vec_id
    """,
    doc="Product-quantization encoding: each 64-dim vector becomes 4 "
    "per-block nearest-centroid codes (seed codebook = the 8 lowest-id "
    "vectors' sub-blocks; trained codebooks are covered by goldens in "
    "test_pq.py). Round-6 distance argmins with lowest-code ties make "
    "the codes engine-stable; at rest 64 floats shrink to 4 small ints.",
)
def s_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.pq import pq_encode, pq_seed_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_seed_codebook(emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)
    encoded = pq_encode(emb, cb, "vec_id", "embedding", m=_PQ_M, dim=_PQ_DIM)
    # the comparison harness has no canonical array dtype — serialize
    # the code list for the oracle compare (the operator's contract
    # stays array<bigint>)
    return encoded.select("vec_id", F.array_join("codes", ",").alias("codes"))


@register(
    "s_pq_search_topk",
    oracle=f"""
    WITH {_PQ_COMMON},
    q AS (
      SELECT vec_id AS query_id, block,
             vec[block * {_PQ_W} + 1 : block * {_PQ_W} + {_PQ_W}] AS sub
      FROM v CROSS JOIN blocks WHERE vec_id < 10
    ),
    lut AS (
      SELECT query_id, cb.block, cb.code,
             {_PQ_D2.format(a='q.sub', b='cb.centroid')} AS d
      FROM q JOIN codebook cb ON q.block = cb.block
    ),
    scored AS (
      SELECT lut.query_id, a.vec_id AS neighbor_id,
             CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS approx_dist2
      FROM assigned a JOIN lut ON a.block = lut.block AND a.code = lut.code
      WHERE lut.query_id != a.vec_id
      GROUP BY lut.query_id, a.vec_id
    )
    SELECT query_id, rank, neighbor_id, approx_dist2 FROM (
      SELECT query_id, neighbor_id, approx_dist2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY approx_dist2 ASC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="PQ asymmetric-distance search: exact (query x codebook) "
    "distance LUT broadcast, per-row approximate distance = 4 lookups "
    "decimal-summed, top-5 ascending. The corpus scan touches codes "
    "only — never raw vectors — which is what makes exhaustive ADC "
    "affordable at 100 TB (and composes with IVF cell probing).",
)
def s_pq_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.pq import (
        pq_encode,
        pq_search,
        pq_seed_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_seed_codebook(emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)
    codes = pq_encode(emb, cb, "vec_id", "embedding", m=_PQ_M, dim=_PQ_DIM)
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_search(codes, queries, cb, "vec_id", "embedding", k=5, m=_PQ_M, dim=_PQ_DIM)


_Z_BITS = 8


@register(
    "p_zorder_key",
    oracle=f"""
    WITH b AS (
      SELECT MIN(CAST(value AS DOUBLE)) AS lo_v, MAX(CAST(value AS DOUBLE)) AS hi_v,
             MIN(CAST(user_id AS DOUBLE)) AS lo_u, MAX(CAST(user_id AS DOUBLE)) AS hi_u
      FROM events
    ),
    q AS (
      SELECT event_id,
             CASE WHEN hi_v = lo_v THEN 0 ELSE LEAST(CAST(FLOOR(
               (CAST(value AS DOUBLE) - lo_v) / ((hi_v - lo_v) / {1 << _Z_BITS})
             ) AS BIGINT), {(1 << _Z_BITS) - 1}) END AS qv,
             CASE WHEN hi_u = lo_u THEN 0 ELSE LEAST(CAST(FLOOR(
               (CAST(user_id AS DOUBLE) - lo_u) / ((hi_u - lo_u) / {1 << _Z_BITS})
             ) AS BIGINT), {(1 << _Z_BITS) - 1}) END AS qu
      FROM events CROSS JOIN b
    )
    SELECT event_id, CAST({interleave_bits_sql(['qv', 'qu'], _Z_BITS)} AS BIGINT) AS zkey
    FROM q
    """,
    doc="Z-order (Morton) layout key over (value, user_id): global "
    "min/max bounds broadcast back, 8-bit quantization per dimension, "
    "bit interleave in pure integer codegen. Writing clustered on this "
    "key gives every file a disjoint key range, so predicates on "
    "EITHER column prune files (Delta OPTIMIZE ZORDER BY semantics); "
    "test_layout.py pins the disjoint-file-interval property.",
)
def p_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = add_zorder_key(ev, ["value", "user_id"], bits=_Z_BITS, key_col="zkey")
    return keyed.select("event_id", "zkey")


_HIST_BUCKETS = 16


@register(
    "a_equidepth_hist",
    oracle=f"""
    WITH ranked AS (
      SELECT value, NTILE({_HIST_BUCKETS}) OVER (ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM ranked GROUP BY bucket
    """,
    doc="Equi-depth 16-bucket histogram of event values (exact NTILE "
    "with event_id tie-break so bucket membership is engine-stable). "
    "The global-order window is the EXACT tier for small/medium "
    "aggregates; at 100 TB the bounds come from the GK quantile sketch "
    "(operators/sketches.py) and buckets become a broadcast bin join.",
)
def a_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DELIBERATE partitionless window — the exact tier, bounded to
    # small/medium aggregates per the doc above; whitelisted by name
    # in the plan-shape sweep (tests/test_plan_shape2.py).
    w = Window.orderBy("value", "event_id")
    ranked = ev.select("value", F.ntile(_HIST_BUCKETS).over(w).alias("bucket"))
    return ranked.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
