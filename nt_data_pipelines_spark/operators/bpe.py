"""Byte-pair-encoding subword tokenizer: distributed merge learning
and relational encoding.

The missing piece between raw text operators (token_count's regex
tier) and a training pipeline: learn a BPE merge table FROM the
corpus, then tokenize with it — the Sennrich et al. 2016 algorithm
re-expressed for Spark:

- **Training never touches the raw corpus after one pass.** Classic
  BPE iterates over the word-frequency table, not the text: the first
  (and only) corpus-wide shuffle builds (word, count); every merge
  iteration then runs on that vocab relation, whose size is the
  corpus's distinct-word count — millions of rows at 100 TB, not
  trillions. Per iteration: explode adjacent symbol pairs weighted by
  word count (linear in vocab symbols), aggregate pair counts
  (map-side partial), take the argmax (driver: one tiny row), apply
  the merge with a fold expression (codegen, no shuffle).
- **Determinism**: ties on pair count break on the pair's lexical
  order, so the merge table is a pure function of the corpus.
- **Plan depth**: each merge chains a transformation onto the vocab
  frame; every ``checkpoint_every`` iterations the frame is
  localCheckpoint-truncated (the round-8 lesson: deep AQE lineage
  costs driver time quadratically).

Encoding applies the learned merges in rank order as chained fold
expressions — one codegen stage, no Python in the row path. That is
the right shape for the dozens-of-merges regime this module targets
(tests, domain-specific vocabs); for a production 30k-merge
tokenizer, per-row merge application belongs in an Arrow-batched
Pandas UDF with the merge table broadcast — the training side here is
already the scale path either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import words

END_OF_WORD = "</w>"


def _chars_with_eow(word: Column) -> Column:
    """Split a word into single-char symbols with the end-of-word mark
    appended — BPE's standard boundary so merges can't cross words."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right greedy merge of adjacent (left, right) symbol
    pairs — a single fold: append each symbol unless it completes the
    pair with the accumulator's tail, in which case the tail is
    replaced by the merged symbol. Greedy-left matches the reference
    algorithm (in "aaa" with pair (a,a): first two merge, third stays).
    """
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — BPE training's only corpus-wide
    shuffle; everything after runs on this (distinct-word-sized) frame."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right), ...] (rank = list position).

    Driver state is one (left, right, count) row per iteration — the
    argmax of the distributed pair-count aggregate; the vocab relation
    itself never leaves the cluster.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = word_frequencies(df, text_col).select(
        _chars_with_eow(F.col("word")).alias("syms"), "count"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        pairs = vocab.select(
            F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias("__i", "left"),
            F.col("syms"),
            F.col("count"),
        ).select(
            "left",
            F.element_at("syms", F.col("__i") + 2).alias("right"),
            "count",
        )
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("count").alias("__n"))
            .orderBy(F.desc("__n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["__n"] < 2:
            break  # no pair occurs twice: further merges are noise
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "count"
        )
        if (it + 1) % checkpoint_every == 0:
            # truncate lineage: chained fold expressions nest the plan
            # per merge, and AQE's plan-string regeneration is
            # quadratic in that depth (docs/ROUND8.md)
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with a learned merge table.

    Output: (id, bpe_tokens array<string>, n_bpe_tokens). Every word
    starts as chars + end-of-word mark; merges apply in rank order as
    chained codegen folds (see module docstring for the
    large-merge-table variant). Empty texts yield an empty token array.
    """
    per_word = _chars_with_eow(F.col("__w"))
    for left, right in merges:
        per_word = _apply_merge(per_word, left, right)
    exploded = df.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("__p", "__w")
    ).filter(F.col("__w") != "")
    toks = exploded.select(
        F.col(id_col), "__p", per_word.alias("__toks")
    )
    agg = toks.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__toks"))),
                lambda s: s["__toks"],
            )
        ).alias("bpe_tokens")
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("bpe_tokens", F.array().cast("array<string>")).alias(
                "bpe_tokens"
            ),
            F.size(F.coalesce("bpe_tokens", F.array().cast("array<string>")))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def token_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer-health report for a fixed BPE merge table:
    word count, BPE token count, tokens-per-word (fertility) and
    chars-per-token (compression).

    Fertility is THE go/no-go number for a tokenizer on a new corpus
    slice: a table trained on one distribution tokenizes a drifted or
    foreign-language source into near-character shrapnel (fertility
    toward word length + 1), inflating training cost per byte and
    shrinking the effective context window. Chars-per-token is the
    inverse compression view. Run per source before mixing; a source
    whose fertility is an outlier needs its own merge budget or a
    retrain.

    Scale shape: the corpus is touched once for (group, word) counts;
    the merge chain ENCODES ONLY THE DISTINCT VOCABULARY (the same
    encode-the-vocabulary-not-the-corpus shape as the
    t_bpe_encode_fixed oracle) and joins the per-word token count
    back by word — per-group totals are then weighted sums. Counts
    ride as decimal(38,0) before the multiply (a 100-TB group's
    micro numerator passes int64); the two rationals are integer
    half-up round-6 (registry rule 3). Token counts include the
    end-of-word symbol when it stays unmerged — exactly
    :func:`bpe_encode`'s accounting.
    """
    wc = (
        df.select(F.col(group_col), F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(group_col, "word")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    per_word = _chars_with_eow(F.col("word"))
    for left, right in merges:
        per_word = _apply_merge(per_word, left, right)
    enc = (
        wc.select("word")
        .distinct()
        .select("word", F.size(per_word).cast("long").alias("__ntok"))
    )
    j = wc.join(enc, "word")
    cnt = F.col("__cnt").cast("decimal(38,0)")
    n_words = F.sum(cnt)
    n_toks = F.sum(cnt * F.col("__ntok"))
    n_chars = F.sum(cnt * F.length("word"))

    def r6(num, den):
        return (
            F.call_function("div", 2 * num * 1000000 + den, 2 * den).cast("double")
            / 1000000.0
            + 0.0
        )

    return j.groupBy(group_col).agg(
        n_words.cast("long").alias("n_words"),
        n_toks.cast("long").alias("n_bpe_tokens"),
        r6(n_toks, n_words).alias("tokens_per_word"),
        r6(n_chars, n_toks).alias("chars_per_token"),
    )


def bpe_encode_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Arrow-batched encoder for PRODUCTION-size merge tables.

    The chained-fold encoder above inlines one fold expression per
    merge — perfect codegen up to dozens of merges, but a 30k-merge
    tokenizer would compile a 30k-deep expression tree. This variant
    ships the merge table to executors once (closure capture, ~MBs)
    and tokenizes per Arrow batch with the rank-priority algorithm
    (repeatedly merge the lowest-rank adjacent pair — the standard
    GPT-2-style encoder, equivalent to applying merges in learned
    order), memoizing per distinct word within each batch. Same output
    contract as :func:`bpe_encode`; tests pin exact equality.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode_series(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [END_OF_WORD]
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[w] = syms
            return syms

        def encode_text(t):
            if t is None:
                return []
            out: list[str] = []
            for w in t.split(" "):
                if w:
                    out.extend(encode_word(w))
            return out

        return texts.map(encode_text)

    return df.select(
        F.col(id_col),
        encode_series(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
