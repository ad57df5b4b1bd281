"""Dedup group resolution + text normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.dedup import resolve_dup_groups
from nt_data_pipelines_spark.operators.text import normalize_text


def test_resolve_dup_groups_components(spark):
    # two components: {1,2,3} (chained) and {10,11}; 99 untouched (no edges)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {r["doc_id"]: r["canonical_id"] for r in resolve_dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_resolve_dup_groups_transitive_min(spark):
    # component discovered out of order still roots at the global min id
    pairs = spark.createDataFrame([(7, 5), (5, 9), (9, 2)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["canonical_id"] for r in resolve_dup_groups(pairs).collect()}
    assert set(got.values()) == {2}


def test_distributed_components_match_union_find(spark):
    import numpy as np

    from nt_data_pipelines_spark.operators.dedup import resolve_dup_groups_distributed

    rng = np.random.RandomState(3)
    # random chains across 40 nodes in 6 clusters + a long path (deep diameter)
    edges = []
    for c in range(6):
        members = list(range(c * 100, c * 100 + rng.randint(2, 8)))
        for a, b in zip(members, members[1:]):
            edges.append((a, b))
    edges += [(1000 + i, 1000 + i + 1) for i in range(15)]  # path of 16
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    want = {r["doc_id"]: r["canonical_id"] for r in resolve_dup_groups(pairs).collect()}
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_dup_groups_distributed(pairs).collect()
    }
    assert got == want
    assert got[1015] == 1000  # long path converged to its min id


def test_normalize_text_collapses_variants(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO --- WORLD")],
        ["doc_id", "text"],
    )
    got = df.select("doc_id", normalize_text("text").alias("n")).collect()
    assert len({r["n"] for r in got}) == 1  # all collapse to "hello world"
    assert got[0]["n"] == "hello world"
