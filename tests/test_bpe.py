"""BPE trainer/encoder vs the shared pure-Python reference
(tests/bpe_reference.py — also the source of the t_bpe_tokenize
driver golden, so there is exactly one reference to drift from)."""

from __future__ import annotations

from tests.bpe_reference import END_OF_WORD as REF_END_OF_WORD
from tests.bpe_reference import ref_encode as _ref_encode
from tests.bpe_reference import ref_train as _ref_train

from nt_data_pipelines_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
)


def test_reference_end_of_word_matches_engine():
    assert REF_END_OF_WORD == END_OF_WORD


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "the lowest of the low and the newest of the new",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    got = bpe_train(docs, num_merges=12, checkpoint_every=4)
    want = _ref_train(CORPUS, 12)
    assert got == want


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=10)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        assert out[i] == _ref_encode(text, merges)
        # lossless: stripping the end-of-word marks reconstructs the text
        rebuilt = "".join(out[i]).replace(END_OF_WORD, " ").strip()
        assert rebuilt == text


def test_bpe_encode_handles_unseen_and_empty(spark):
    train = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges = bpe_train(train, num_merges=8)
    docs = spark.createDataFrame(
        [(1, "lowly zzz"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert out[1]["bpe_tokens"] == _ref_encode("lowly zzz", merges)
    assert out[2]["bpe_tokens"] == [] and out[2]["n_bpe_tokens"] == 0
    assert out[3]["bpe_tokens"] == [] and out[3]["n_bpe_tokens"] == 0


def test_bpe_train_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=50)
    assert len(merges) < 50  # every pair unique -> early stop


def test_bpe_encode_arrow_matches_fold_encoder(spark):
    """The Arrow-batched rank-priority encoder must produce EXACTLY the
    fold encoder's tokens (GPT-2-style lowest-rank-first merging is
    equivalent to applying merges in learned order) — including on
    unseen words, empty and null texts."""
    from nt_data_pipelines_spark.operators.bpe import bpe_encode_arrow

    train = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges = bpe_train(train, num_merges=10)
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)) + [(90, "lowly zzz unseen"), (91, ""), (92, None)],
        ["doc_id", "text"],
    )
    a = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
         for r in bpe_encode(docs, merges).collect()}
    b = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
         for r in bpe_encode_arrow(docs, merges).collect()}
    assert a == b
