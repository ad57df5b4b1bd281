"""Corpus language-model scoring (perplexity-proxy quality tier).

CCNet-style curation ranks documents by the perplexity of a language
model over the corpus; the cheap, fully-distributed stand-in is the
corpus's own unigram distribution: a document whose tokens are
globally rare (or rare-in-corpus gibberish) scores a high
bits-per-token surprisal, boilerplate scores low, and the middle of
the distribution is the "natural text" band CCNet keeps.

Scale shape (100 TB): token counts are one linear shuffle on the word
key with map-side partial aggregation; the global token total is a
scalar broadcast; the per-document roll-up is a second linear shuffle
on the doc key. No pairwise joins, no Python — everything is codegen
expressions. The word-count join is a plain shuffle join (the vocab
of a web corpus is far too large to broadcast safely).

Engine parity: per-token surprisal is rounded to 6 decimals, then
summed through DECIMAL so the per-document total is exact and
independent of shuffle order (registry rule 1/2). The per-document
MEAN divides that exact total by the token count — and an exact
6-decimal sum over an integer count lands EXACTLY on a round-6
midpoint whenever micro_sum ≡ n/2 (mod n), where Spark (half-up on
the nearest double) and DuckDB disagree by one ulp (hit in practice:
two docs at sf0.1). So the mean's rounding runs in INTEGER space:
micro = sum x 10^6 as a long (exact through decimal), and
round-half-up(micro / n) = (2*micro + n) DIV (2*n) — pure integer
ops both engines evaluate identically; the result divides by 10^6 in
double (exact, six decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import words


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bits_per_token",
) -> DataFrame:
    """Per-document mean unigram surprisal (bits/token) under the
    corpus's own unigram MLE distribution.

    surprisal(w) = -log2(count(w) / total_tokens); every observed
    token has count >= 1, so probabilities are never zero and no
    smoothing constant is needed. Documents with no tokens (empty
    text) return n_tokens = 0 and NULL bits_per_token.

    Returns (id, n_tokens, bits_per_token).
    """
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("__cw"))
    total = counts.agg(F.sum("__cw").alias("__T"))
    surprisal = F.round(
        -F.log2(F.col("__cw").cast("double") / F.col("__T")), 6
    )
    per_doc = (
        toks.join(counts, "word")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), surprisal.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                (F.col("__s").cast("decimal(28,6)") * 1000000).cast("long")
            ).alias("__micro"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            (
                F.expr(
                    "CAST((2 * __micro + n_tokens) DIV (2 * n_tokens) AS DOUBLE)"
                )
                / 1000000.0
            ).alias(out_col),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bigram_bits_per_token",
) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's own
    bigram MLE: p(w2|w1) = c(w1 w2) / c(w1 ·), with c(w1 ·) the count
    of w1 as a bigram PREFIX (proper conditional normalization).

    The context-sensitive sibling of :func:`unigram_logprob`: word
    salad built from common words fools a unigram model (every token
    is frequent) but scores high bigram surprisal because the
    TRANSITIONS are rare. Every document's bigrams exist in the corpus
    by construction, so probabilities never hit zero. Documents with
    fewer than two tokens return NULL. Scale shape: bigram counts and
    prefix counts are two linear shuffles on the gram/prefix keys; the
    per-doc roll-up is a third — no pairwise joins, no Python.
    """
    from nt_data_pipelines_spark.operators.text import _word_ngrams

    grams = df.select(
        F.col(id_col), F.explode(_word_ngrams(text_col, 2)).alias("gram")
    ).withColumn("prefix", F.substring_index("gram", " ", 1))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__cg"))
    prefix_counts = grams.groupBy("prefix").agg(F.count(F.lit(1)).alias("__cp"))
    surprisal = F.round(
        -F.log2(F.col("__cg").cast("double") / F.col("__cp")), 6
    )
    per_doc = (
        grams.join(counts, "gram")
        .join(prefix_counts, "prefix")
        .select(F.col(id_col), surprisal.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                (F.col("__s").cast("decimal(28,6)") * 1000000).cast("long")
            ).alias("__micro"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            (
                F.expr(
                    "CAST((2 * __micro + n_bigrams) DIV (2 * n_bigrams) AS DOUBLE)"
                )
                / 1000000.0
            ).alias(out_col),
        )
    )


def perplexity_band_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lo_quantile: float = 0.1,
    hi_quantile: float = 0.9,
) -> DataFrame:
    """Keep documents inside the central surprisal band (CCNet's
    "head/middle/tail" cut, keeping the middle).

    The band bounds are EXACT quantiles of the per-document
    bits-per-token distribution, computed with percentile on the tiny
    per-doc score table and broadcast back — the corpus itself never
    shuffles a second time. Zero-token documents are dropped (no
    signal to rank them by).
    """
    if not 0.0 <= lo_quantile < hi_quantile <= 1.0:
        raise ValueError("need 0 <= lo_quantile < hi_quantile <= 1")
    scored = unigram_logprob(df, id_col, text_col).filter(F.col("n_tokens") > 0)
    bounds = scored.agg(
        F.percentile("bits_per_token", lo_quantile).alias("__lo"),
        F.percentile("bits_per_token", hi_quantile).alias("__hi"),
    )
    kept = (
        scored.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("bits_per_token") >= F.col("__lo"))
            & (F.col("bits_per_token") <= F.col("__hi"))
        )
        .select(id_col, "n_tokens", "bits_per_token")
    )
    return df.join(kept, id_col).select(
        *[F.col(c) for c in df.columns], "bits_per_token"
    )
