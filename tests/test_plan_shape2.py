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
