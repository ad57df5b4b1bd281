"""Dedup group resolution + text normalization."""

from __future__ import annotations

import pytest

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


def test_auto_routing_selects_distributed_above_edge_bound(spark, monkeypatch):
    """resolve_dup_groups_auto must (a) produce identical groups on
    both paths and (b) actually route to the distributed resolver when
    the bounded probe sees more edges than the driver cap."""
    from nt_data_pipelines_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (7, 8)],
        "id_a int, id_b int",
    )
    want = {r["doc_id"]: r["canonical_id"] for r in D.resolve_dup_groups(pairs).collect()}

    calls = []
    real_dist = D.resolve_dup_groups_distributed
    real_driver = D.resolve_dup_groups
    monkeypatch.setattr(
        D, "resolve_dup_groups_distributed",
        lambda *a, **k: calls.append("distributed") or real_dist(*a, **k),
    )
    monkeypatch.setattr(
        D, "resolve_dup_groups",
        lambda *a, **k: calls.append("driver") or real_driver(*a, **k),
    )

    # cap below the edge count -> distributed path, same groups
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in D.resolve_dup_groups_auto(pairs, max_driver_edges=5).collect()
    }
    assert got == want
    assert calls == ["distributed"]

    # cap above the edge count -> driver path, same groups
    calls.clear()
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in D.resolve_dup_groups_auto(pairs, max_driver_edges=10_000).collect()
    }
    assert got == want
    assert calls == ["driver"]

    # explicit modes bypass the probe entirely
    calls.clear()
    D.resolve_dup_groups_auto(pairs, mode="distributed").collect()
    assert calls == ["distributed"]
    import pytest

    with pytest.raises(ValueError, match="auto|driver|distributed"):
        D.resolve_dup_groups_auto(pairs, mode="bogus")


@pytest.mark.slow  # ~15s: heaviest of its parity family; cheaper siblings stay default
def test_curate_corpus_distributed_resolver_matches_driver(spark):
    """The composed pipeline yields identical survivors whichever
    dup-group resolver the config routes to."""
    from nt_data_pipelines_spark.pipelines.corpus import CurationConfig, curate_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through fields of green grass under a wide open summer sky today"
    )
    rows = [(i, base + f" tail{i % 3}", "web") for i in range(12)]
    rows += [(100 + i, f"unique document number {i} with its own distinct words "
              + " ".join(f"tok{i}_{j}" for j in range(20)), "web") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")

    outs = {}
    for mode in ("driver", "distributed"):
        cfg = CurationConfig(dup_group_resolver=mode)
        packed, acct = curate_corpus(docs, config=cfg)
        outs[mode] = (
            sorted((r["stage"], r["docs"]) for r in acct.collect()),
            packed.count(),
        )
    assert outs["driver"] == outs["distributed"]


def test_spanning_edges_same_components_linear_size(spark):
    """Chain edges must reach exactly the clique's transitive closure,
    with edge count bounded by signature rows instead of bucket^2."""
    from nt_data_pipelines_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_spanning_edges,
        resolve_dup_groups,
    )
    from nt_data_pipelines_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    clique = minhash_lsh_candidates(docs, "doc_id")
    chain = minhash_lsh_spanning_edges(docs, "doc_id")
    assert chain.count() <= clique.count()
    g1 = {(r["doc_id"], r["canonical_id"])
          for r in resolve_dup_groups(clique, "id_a", "id_b").collect()}
    g2 = {(r["doc_id"], r["canonical_id"])
          for r in resolve_dup_groups(chain, "id_a", "id_b").collect()}
    assert g1 == g2


def test_distributed_cc_converges_on_long_chain(spark):
    """Regression (review finding): spanning-edge hot buckets are
    CHAINS — a 100-node path (diameter 100) must resolve within the
    default 20 rounds via pointer jumping, and a genuinely-too-deep
    graph must RAISE, never silently return wrong components."""
    import pytest

    from nt_data_pipelines_spark.operators.dedup import (
        resolve_dup_groups_distributed,
    )

    n = 100
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_dup_groups_distributed(chain).collect()
    }
    assert got == {i: 0 for i in range(n)}
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_dup_groups_distributed(chain, max_iterations=2)
