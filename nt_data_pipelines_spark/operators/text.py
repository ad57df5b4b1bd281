"""Text-analysis operators for training-data pipelines.

Not part of the reference (a market-data system), but first-class
capabilities of this engine for large-scale corpus work: language ID,
quality scoring, token counting, and document fingerprinting — all
expressed with built-in JVM-side functions (no Python UDFs), so they
whole-stage-codegen and scale linearly with the corpus.

Determinism notes: hashes are md5 (identical in any engine), word
splitting is single-space (the testdata convention; swap the
delimiter regex for real corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny public stopword lexicons (top function words per language).
STOPWORD_LEXICON: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "une"],
    "zh": ["的", "一", "是", "不", "了", "人", "我", "在", "有", "他"],
}

# A BPE-ish tokenizer regex: alphabetic runs, digit runs, single
# non-alphanumeric marks. Compatible across Java regex and RE2.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / marks)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def normalize_text(text: Column | str) -> Column:
    """Cleaning normalization: lowercase, strip non-alphanumerics to
    spaces, squeeze runs of whitespace, trim. The canonical form fed
    to exact dedup so case/punctuation variants collapse."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append length / word / character-class quality features.

    All built-in expressions — one codegen stage over the corpus scan.
    """
    t = F.col(text_col)
    ws = words(t)
    n_chars = F.length(t)
    n_words = F.size(ws)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(t, "[^ ]", ""))
    stop_hits = F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in STOPWORD_LEXICON["en"]])))
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.try_divide(n_chars.cast("double"), n_words).alias("q_avg_word_len"),
        F.try_divide(n_alpha.cast("double"), n_chars).alias("q_alpha_ratio"),
        F.try_divide(n_digit.cast("double"), n_chars).alias("q_digit_ratio"),
        F.try_divide(n_space.cast("double"), n_chars).alias("q_space_ratio"),
        F.try_divide(stop_hits.cast("double"), n_words).alias("q_en_stopword_distinct_ratio"),
        token_count(t).alias("q_tokens"),
    )


def language_scores(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Long-format (id, lang, hits): stopword-lexicon hit counts.

    The lexicon is a literal-backed DataFrame (broadcast join against
    the exploded corpus) — the idiomatic shape for dictionary lookups
    at scale.
    """
    spark = df.sparkSession
    lex = spark.createDataFrame(
        [(lang, w) for lang, ws in STOPWORD_LEXICON.items() for w in ws], ["lang", "word"]
    )
    exploded = df.select(id_col, F.explode(words(text_col)).alias("word"))
    return (
        exploded.join(F.broadcast(lex), "word")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def language_id(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Argmax language per document; deterministic tie-break on lang name."""
    from pyspark.sql import Window

    scores = language_scores(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("hits"), F.asc("lang"))
    best = scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return df.select(id_col).join(best.select(id_col, "lang", "hits"), id_col, "left").select(
        id_col,
        F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(F.col("hits"), F.lit(0)).alias("lex_hits"),
    )


def bigram_fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over word bigrams.

    A winnowing-lite fingerprint — robust to word appends/prepends,
    cheap to compare (string equality). Documents shorter than two
    words fall back to the md5 of the whole text.
    """
    ws = words(text_col)
    # Guard: sequence(0, -1) would produce a *descending* range for
    # single-word docs; gate on size >= 2 and fall back to md5(text).
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.md5(F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2))),
        ),
    )
    fp = F.array_min(bigrams)
    return df.select(
        id_col, F.coalesce(fp, F.md5(F.col(text_col))).alias("fingerprint")
    )
