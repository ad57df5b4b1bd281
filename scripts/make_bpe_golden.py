"""Materialize the BPE-tokenize golden for the driver oracle.

``t_bpe_tokenize`` (train 16 merges on the corpus, then encode it) was
the registry's only oracle-less entry: iterative merge learning is not
SQL-expressible, so the driver recorded ``err:no_oracle`` and the
query was structurally barred from the driver window (VERDICT r11
"What's missing" #2). This script gives it the pinned-golden protocol
``w6_rolling_regression_k5`` established: a parquet the oracle SQL
reads back with ``read_parquet``, discriminated per scale factor.

The discriminator is ``SUM(LEN(text))`` over documents — NOT row
count, because sf0.001 and sf0.01 both ship 500 documents (verified:
153,156 vs 149,174 chars, distinct at every sf).

Honesty note: unlike the w6 golden (same numpy routine as the
kernel), these token counts come from an INDEPENDENT pure-Python
Sennrich-2016 implementation — tests/bpe_reference.py, the SAME
module tests/test_bpe.py pins the Spark trainer/encoder against with
exact merge-table/token equality (single-sourced so the golden cannot
drift from the semantics the engine is pinned to). A driver green on
this oracle therefore verifies the full distributed pipeline
(word-frequency shuffle, distributed pair-count argmax with
count-then-lexical tie-break, fold-encode, per-doc aggregation)
against independently-derived values, not against itself.

tests/test_golden_artifacts.py asserts every /root/testdata/sf* dir
has a discriminator row in the artifact — pointing the harness at a
new sf dir fails THERE with a regenerate message, instead of the
oracle silently returning zero rows.

Usage: python scripts/make_bpe_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.bpe_reference import END_OF_WORD, apply_merge, ref_train  # noqa: E402

NUM_MERGES = 16  # must match plans/extra10.py t_bpe_tokenize
OUT = REPO / "tests" / "golden" / "bpe_tokenize.parquet"
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",  # parity harness / bench may run here too
]


def encode_word_len(word: str, merges: list[tuple[str, str]]) -> int:
    syms: tuple[str, ...] = tuple(list(word) + [END_OF_WORD])
    for left, right in merges:
        syms = apply_merge(syms, left, right)
    return len(syms)


def golden_for(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).df()
    src_chars = int(
        con.sql(f"SELECT SUM(LEN(text)) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    )
    texts = [t if isinstance(t, str) else "" for t in docs["text"]]
    merges = ref_train(texts, NUM_MERGES)
    # encode each DISTINCT word once; a doc's token count is the sum
    # over its words (merges never cross the end-of-word boundary)
    word_len: dict[str, int] = {}
    counts = []
    for t in texts:
        n = 0
        for w in t.split(" "):
            if not w:
                continue
            if w not in word_len:
                word_len[w] = encode_word_len(w, merges)
            n += word_len[w]
        counts.append(n)
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "n_bpe_tokens": pd.Series(counts, dtype="int64"),
            "src_chars": pd.Series([src_chars] * len(counts), dtype="int64"),
        }
    )


def main() -> None:
    frames = [golden_for(d) for d in SF_DIRS]
    discriminators = [int(f["src_chars"].iloc[0]) for f in frames]
    assert len(set(discriminators)) == len(discriminators), (
        f"SUM(LEN(text)) must be distinct per sf, got {discriminators}"
    )
    out = pd.concat(frames, ignore_index=True)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    out.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(out)} rows, discriminators {discriminators}")


if __name__ == "__main__":
    main()
