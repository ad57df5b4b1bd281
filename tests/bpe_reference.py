"""The ONE pure-Python BPE reference implementation (Sennrich et al.
2016) — shared by tests/test_bpe.py (exact merge-table/token equality
against the Spark trainer/encoder) and scripts/make_bpe_golden.py
(the t_bpe_tokenize driver golden).

Single-sourced deliberately: the golden's validity rests on the
reference the engine is pinned to and the reference the golden is
computed from being the SAME semantics — two copies was a drift
vector (a tie-break fix applied to one would silently produce a
golden the engine no longer matches).

Semantics pinned here (must mirror operators/bpe.py):
- words split on single spaces, empties dropped;
- each word becomes chars + END_OF_WORD (merges never cross words);
- per merge round, the (count desc, pair lexical asc) argmax wins,
  applied greedy-left; training stops when no pair repeats (count<2).
"""

from __future__ import annotations

from collections import Counter

END_OF_WORD = "</w>"  # must match operators/bpe.py


def apply_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Greedy-left merge of adjacent (left, right) pairs."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_train(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Iterate on the word-frequency table; count-then-lexical
    tie-break; stop when the best pair's count < 2."""
    vocab: Counter = Counter()
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
            new_vocab[apply_merge(syms, left, right)] += c
        vocab = new_vocab
    return merges


def ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one text: per word, chars + END_OF_WORD, merges applied
    in learned rank order."""
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms: tuple[str, ...] = tuple(list(w) + [END_OF_WORD])
        for left, right in merges:
            syms = apply_merge(syms, left, right)
        toks.extend(syms)
    return toks
