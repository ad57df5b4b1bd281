"""BPE trainer/encoder vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from nt_data_pipelines_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
)


def _ref_train(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Sennrich et al. 2016 reference: iterate on the word-freq table,
    greedy-left merge application, count-then-lexical tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [END_OF_WORD])] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (left, right), _ = best
        merges.append((left, right))
        new_vocab: Counter = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w) + [END_OF_WORD]
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


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
