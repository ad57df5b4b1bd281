"""Product quantization: training goldens vs a numpy reference, and
ADC search recall against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nt_data_pipelines_spark.operators.pq import (
    pq_encode,
    pq_search,
    pq_seed_codebook,
    pq_train,
)

DIM, M, K = 8, 4, 2
W = DIM // M

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _vectors(n=40, dim=DIM, seed=7):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim)).round(3)  # coarse values: no ulp traps


def _np_train(X, m, k, iterations):
    """Reference per-block Lloyd's with the operator's exact tie rules:
    round-6 distances, lowest code wins ties, empty cells keep their
    previous centroid, seeds = lowest-id rows' blocks."""
    w = X.shape[1] // m
    books = []
    for b in range(m):
        sub = X[:, b * w : (b + 1) * w]
        cent = sub[:k].copy()
        for _ in range(iterations):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).round(6)
            assign = d.argmin(axis=1)  # argmin takes the first (lowest) index
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.sum(axis=0) / len(members)
        books.append(cent)
    return books


def test_pq_train_matches_numpy_reference(spark):
    X = _vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)], SCHEMA
    )
    got = pq_train(df, m=M, k=K, dim=DIM, iterations=2).collect()
    ref = _np_train(X, M, K, iterations=2)
    assert len(got) == M * K
    for r in got:
        np.testing.assert_allclose(
            np.array(r["centroid"]), ref[r["block"]][r["code"]], atol=1e-9,
            err_msg=f"block={r['block']} code={r['code']}",
        )


def test_pq_encode_shape_and_determinism(spark):
    X = _vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)], SCHEMA
    )
    cb = pq_train(df, m=M, k=K, dim=DIM, iterations=1)
    codes1 = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb, m=M, dim=DIM).collect()}
    codes2 = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb, m=M, dim=DIM).collect()}
    assert codes1 == codes2
    assert all(len(c) == M and all(0 <= x < K for x in c) for c in codes1.values())


def test_pq_search_recall_against_brute_force(spark):
    """With k=8 codes per block on clustered data, ADC top-5 should
    overlap heavily with the exact L2 top-5."""
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=4.0, size=(4, 16))
    X = np.vstack([c + rng.normal(scale=0.3, size=(25, 16)) for c in centers]).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)], SCHEMA
    )
    cb = pq_train(df, m=4, k=8, dim=16, iterations=3)
    codes = pq_encode(df, cb, m=4, dim=16)
    queries = df.filter(F.col("vec_id") < 5)
    approx = pq_search(codes, queries, cb, k=5, m=4, dim=16).collect()
    hits = 0
    for q in range(5):
        d = ((X - X[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        exact5 = set(np.argsort(d, kind="stable")[:5])
        got5 = {r["neighbor_id"] for r in approx if r["query_id"] == q}
        assert len(got5) == 5
        hits += len(exact5 & got5)
    assert hits >= 15, f"recall {hits}/25 too low for clustered data"


def test_ivfpq_composes_with_full_probe_equal_to_pq(spark):
    """Probing every cell must reproduce the plain PQ full scan; a
    narrow probe keeps most of the recall on clustered data."""
    from nt_data_pipelines_spark.operators.ivf import assign_cells, kmeans_train
    from nt_data_pipelines_spark.operators.pq import ivfpq_search

    rng = np.random.default_rng(11)
    centers = rng.normal(scale=4.0, size=(4, 16))
    # interleave cluster membership (row i -> cluster i % 4) so the
    # deterministic lowest-id k-means seeds span all clusters
    X = np.stack(
        [centers[i % 4] + rng.normal(scale=0.3, size=16) for i in range(100)]
    ).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)], SCHEMA
    )
    cents = kmeans_train(df, n_cells=4, iterations=2)
    cells = assign_cells(df, cents, "vec_id", "embedding").select("vec_id", "cell")
    cb = pq_train(df, m=4, k=8, dim=16, iterations=2)
    codes = pq_encode(df, cb, m=4, dim=16)
    indexed = codes.join(cells, "vec_id")
    queries = df.filter(F.col("vec_id") < 5)

    full = pq_search(codes, queries, cb, k=5, m=4, dim=16).collect()
    composed = ivfpq_search(
        indexed, queries, cents, cb, k=5, n_probe=4, m=4, dim=16
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["approx_dist2"])
    assert sorted(map(key, composed)) == sorted(map(key, full))

    narrow = ivfpq_search(indexed, queries, cents, cb, k=5, n_probe=1, m=4, dim=16).collect()
    overlap = len({key(r) for r in narrow} & {key(r) for r in full})
    assert overlap >= 20, f"1-probe recall {overlap}/25 too low on clustered data"


def test_pq_guards(spark):
    df = spark.createDataFrame([(0, [1.0] * 8)], SCHEMA)
    with pytest.raises(ValueError, match="not divisible"):
        pq_seed_codebook(df, m=3, k=1, dim=8)
