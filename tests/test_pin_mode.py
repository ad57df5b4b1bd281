"""NT_PIN_MODE: the shared-relation pin's deployment-stance knob.

The default pin is a lazy localCheckpoint (plan truncation, no fault
tolerance); real clusters can flip to reliable checkpoints or plain
persist without touching any operator. These tests pin that every
mode yields identical operator output — the knob changes the
materialization mechanism, never the result.
"""

from __future__ import annotations

import pytest

from nt_data_pipelines_spark import pin as pin_mod
from nt_data_pipelines_spark.operators.dedup import minhash_verified_dup_edges
from nt_data_pipelines_spark.operators.text import duplicated_ngram_fraction

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "a completely different document about spark shuffles and joins"),
    (4, "the quick brown fox jumps over the lazy cat again and again"),
    (5, "short text"),
]


def _edges(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    return sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_verified_dup_edges(df, "doc_id", bucket_cap=64).collect()
    )


def _fracs(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    return sorted(
        (r["doc_id"], round(r["dup_ngram_frac"], 9))
        for r in duplicated_ngram_fraction(df, "doc_id", "text", n=3).collect()
    )


@pytest.mark.parametrize("mode", ["checkpoint", "persist"])
def test_pin_modes_identical_results(spark, tmp_path, monkeypatch, mode):
    base_edges, base_fracs = _edges(spark), _fracs(spark)
    if mode == "checkpoint":
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    monkeypatch.setenv("NT_PIN_MODE", mode)
    assert pin_mod.pin_mode() == mode
    assert _edges(spark) == base_edges
    assert _fracs(spark) == base_fracs


def test_pin_mode_rejects_unknown(monkeypatch):
    monkeypatch.setenv("NT_PIN_MODE", "magic")
    with pytest.raises(ValueError, match="NT_PIN_MODE"):
        pin_mod.pin_mode()
