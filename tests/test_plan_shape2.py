"""Plan-shape guards for the round-5 operators: the physical
properties that matter at 100 TB (codes-only PQ scans, broadcast LUTs,
linear LM shuffles, no cartesian products outside documented tiers)."""

from __future__ import annotations

import re

from nt_data_pipelines_spark import plans

SF = "/root/testdata/sf0.001"


def _explain(spark, name: str) -> str:
    df = plans.REGISTRY[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _op_count(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {op}", plan, flags=re.M))


def test_pq_search_scans_codes_not_vectors(spark):
    """ADC search must rank candidates from the codes relation; raw
    embeddings are read only for the (tiny) query-side LUT, which is
    broadcast."""
    plan = _explain(spark, "s_pq_search_topk")
    assert _op_count(plan, "BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    # the LUT (queries x codebook) side reaches the join via broadcast
    assert "BroadcastExchange" in plan


def test_knn_graph_has_no_cartesian_product(spark):
    """The all-rows graph must come from the bucket equi-join — a
    cross product here would be N^2 at corpus scale."""
    plan = _explain(spark, "s_knn_graph")
    assert "CartesianProduct" not in plan
    assert _op_count(plan, "SortMergeJoin") + _op_count(plan, "BroadcastHashJoin") >= 1


def test_unigram_logprob_word_join_not_nested_loop(spark):
    plan = _explain(spark, "t_unigram_logprob")
    assert "CartesianProduct" not in plan
    # the only broadcast-nested-loop join allowed is the scalar total
    assert _op_count(plan, "BroadcastNestedLoopJoin") <= 1


def test_zorder_key_single_bounds_broadcast(spark):
    """The key computation is one bounds aggregate broadcast back onto
    the scan — no shuffle of the fact rows."""
    plan = _explain(spark, "p_zorder_key")
    assert "BroadcastNestedLoopJoin" in plan  # scalar bounds crossJoin
    # fact rows never hash-shuffle for the key itself
    assert _op_count(plan, "Exchange") <= 1


def test_funnel_steps_stay_aggregates(spark):
    plan = _explain(spark, "a_funnel_conversion")
    assert "CartesianProduct" not in plan
    # three per-step HashAggregate pairs (partial+final) at minimum
    assert _op_count(plan, "HashAggregate") >= 6


def test_md5_sample_is_distributed_take_ordered(spark):
    """The recall-harness sampler must plan as TakeOrderedAndProject —
    a global row_number window would drag the whole corpus through ONE
    task (WindowExec: No Partition Defined) and die at 100 TB."""
    from nt_data_pipelines_spark.operators.similarity import md5_sample
    from nt_data_pipelines_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    df = md5_sample(emb, sample_size=50)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert _op_count(plan, "Window") == 0


def test_knn_graph_candidates_have_no_global_window(spark):
    """The hot-bucket salt must stay a bucket-count join — no global
    sort/window sneaking in."""
    from nt_data_pipelines_spark.operators.similarity import _knn_candidates
    from nt_data_pipelines_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    df = _knn_candidates(emb, bucket_cap=64)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert _op_count(plan, "Window") == 0


def _arg_lists(detail: str) -> list[str]:
    """Top-level bracketed argument lists of one formatted-plan node."""
    m = re.search(r"Arguments: (.*)", detail, flags=re.S)
    if not m:
        return []
    s = m.group(1)
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return out


def _partitionless_windows(plan: str) -> list[str]:
    """Window nodes whose partition spec is empty.

    In the formatted plan a Window's Arguments are [exprs, partition,
    order] — but an UNORDERED partitioned window prints only [exprs,
    partition]. The discriminator is the second list's content: sort
    orders carry ASC/DESC, partition column lists never do. Flag when
    the second list is an order (or empty/absent) — i.e. the whole
    input moves through ONE task."""
    bad = []
    for node in re.findall(
        r"^\(\d+\) Window\b.*?(?=^\(\d+\) |\Z)", plan, flags=re.S | re.M
    ):
        lists = _arg_lists(node)
        if (
            len(lists) < 2
            or not lists[1].strip()
            or re.search(r"\b(ASC|DESC)\b", lists[1])
        ):
            bad.append(node.splitlines()[0])
    return bad


# Partitionless windows that are DELIBERATE and bounded, each
# documented at its definition site:
#   a_equidepth_hist — exact global-NTILE tier (plans/extra6.py; the
#       100-TB path is the GK sketch);
#   a_funnel_conversion — cumulative window over #steps rows;
#   s_pq_encode / s_pq_search_topk — codebook/LUT prep windows over
#       post-limit(k) frames (operators/pq.py), never the corpus.
PARTITIONLESS_WINDOW_WHITELIST = {
    "a_equidepth_hist",
    "a_funnel_conversion",
    "s_pq_encode",
    "s_pq_search_topk",
    # rank window runs AFTER a distributed TakeOrdered limit(20) — the
    # single task sees at most _FUSE_TOPN rows (plans/extra9.py)
    "s_hybrid_rrf",
    # offsets cumsum + grand total run over the 256-row per-bucket
    # aggregate, never the corpus (operators/sampling.py — the bucket
    # count is fixed by the md5 first byte regardless of data size)
    "p_pps_sample",
    # global top-k rank runs AFTER the two-phase local prune, so its
    # input is <= k_max * shuffle-partitions rows (plans/extra15.py)
    "a_vocab_coverage",
    # the cumulative window runs over the multiplicity VALUE DOMAIN
    # (distinct per-key counts — a handful of values even at billions
    # of keys), never key or corpus rows (plans/extra15.py)
    "a_join_key_skew",
}


def test_registry_sweep_no_partitionless_windows(spark):
    """Every registered query's plan is free of single-task global
    windows, except the whitelisted documented-bounded ones."""
    offenders = {}
    for name, spec in plans.REGISTRY.items():
        if name in PARTITIONLESS_WINDOW_WHITELIST:
            continue
        df = spec.fn(spark, SF)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        bad = _partitionless_windows(plan)
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_curate_corpus_composed_plan_is_scale_safe(spark):
    """End-to-end plan pin for the curation pipeline (VERDICT r5 #7):
    the COMPOSED plan — all stages enabled — has no cartesian product,
    no partitionless window, and a bounded shuffle count."""
    from nt_data_pipelines_spark.pipelines.corpus import (
        CurationConfig,
        curate_corpus,
    )
    from nt_data_pipelines_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    # AQE wraps every subtree in its own AdaptiveSparkPlan, which
    # defeats exchange reuse in the STATIC plan string; with it off,
    # duplicated lineage collapses into ReusedExchange nodes and the
    # Exchange count is the number of UNIQUE shuffles.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        packed, accounting = curate_corpus(
            docs,
            config=CurationConfig(
                token_budget_per_source=2000,
                max_docs_per_source=200,
                perplexity_band=(0.1, 0.9),
                quality_model_threshold=0.05,
                remove_dup_spans_n=8,
                semantic_threshold=0.99,
            ),
            embeddings=emb.withColumnRenamed("vec_id", "doc_id"),
        )
        # (plan, unique-shuffle bound): ~1-2 per documented stage with
        # every optional stage enabled — packed measures 18, the
        # accounting report 30 (one count-agg per stage). Growth here
        # means a stage started double-shuffling.
        for df, bound in ((packed, 20), (accounting, 34)):
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            assert "CartesianProduct" not in plan
            assert _partitionless_windows(plan) == [], _partitionless_windows(plan)
            assert _op_count(plan, "Exchange") <= bound, _op_count(plan, "Exchange")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_curate_stage_boundaries_truncate_lineage(spark):
    """Pin the round-8 fix for the deep-lineage AQE pathology: with the
    default stage_boundary=local_checkpoint, downstream curate plans
    scan checkpointed RDDs instead of embedding every upstream stage's
    full plan (driver plan-description generation was measured at 22 s
    per fresh action at stage depth 8 — docs/SCALE.md round-8 note). A
    revert to persist() here silently reintroduces that cost."""
    from nt_data_pipelines_spark.pipelines.corpus import (
        CurationConfig,
        curate_corpus,
    )
    from nt_data_pipelines_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    packed, accounting = curate_corpus(
        docs, config=CurationConfig(token_budget_per_source=2000)
    )
    for df in (packed, accounting):
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # upstream stages appear only as checkpointed-RDD scans
        assert "Scan ExistingRDD" in plan
        assert "InMemoryTableScan" not in plan
    # the accounting tree stays O(stages), not O(stages^2): a union of
    # tagged checkpoint scans + one aggregate, nothing nested
    acct_plan = spark._jvm.PythonSQLUtils.explainString(
        accounting._jdf.queryExecution(), "formatted"
    )
    assert len(acct_plan.splitlines()) < 400, len(acct_plan.splitlines())


def test_centroid_outlier_broadcasts_centroids(spark):
    """The scoring pass must get centroids via broadcast — a shuffle
    of the corpus vectors onto the (tiny) centroid frame would move
    the whole embedding column twice."""
    plan = _explain(spark, "s_centroid_outlier")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert _op_count(plan, "BroadcastHashJoin") >= 1


def test_cdc_dedup_is_linear_no_pairwise_join(spark):
    """Chunk-level dedup must stay linear: CDC window + min-per-hash
    aggregate + per-doc regroup — never a pairwise chunk join."""
    plan = _explain(spark, "t_cdc_dedup")
    assert "CartesianProduct" not in plan
    # per-doc position window exists, but no partitionless window
    assert "No Partition Defined" not in plan


def test_source_divergence_totals_broadcast(spark):
    """The corpus-total scalar joins via broadcast; the word-level
    join is a real equi-join (shuffle or broadcast), never a loop."""
    plan = _explain(spark, "t_source_divergence")
    assert "CartesianProduct" not in plan
    assert _op_count(plan, "BroadcastNestedLoopJoin") <= 1  # scalar total only


def test_bloom_decontaminate_prefilters_before_join(spark):
    """The Bloom probe must run as a plain Filter over the corpus gram
    explosion BEFORE any join (map-side pruning is the whole point),
    and the bitset rides as a literal — no extra join or UDF to fetch
    it."""
    plan = _explain(spark, "t_bloom_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the probe compiles to shiftright/substring-hex inside a Filter node
    assert "shiftright" in plan and "substring" in plan


def test_zipf_slope_windows_vocab_not_corpus(spark):
    """The rank window must partition by source over the vocab-sized
    counts frame — a partitionless window (global sort of the corpus)
    would serialize the whole explosion through one task."""
    plan = _explain(spark, "t_zipf_slope")
    assert "CartesianProduct" not in plan
    assert "No Partition Defined" not in plan
    # counts aggregate (with partial) feeds the window: two-level agg
    assert _op_count(plan, "HashAggregate") >= 2


def test_fuzzy_match_blocks_on_grams_no_cartesian(spark):
    """The linkage join must be a gram-keyed equi-join (the blocking
    is the whole point) — a cartesian/nested-loop all-pairs compare
    would be the O(n^2) shape blocking exists to avoid."""
    plan = _explain(spark, "j_fuzzy_name_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
