"""Record linkage: fuzzy string matching via blocked similarity join.

Entity-resolution primitive the training-data tier uses for catalog /
metadata reconciliation (vendor names, titles, author strings): an
all-pairs string comparison is O(n^2), so candidates come from a
BLOCKING equi-join on character n-grams — only strings sharing at
least one gram ever meet — and the verify metric (exact set Jaccard)
falls out of the same join for free: with per-string distinct grams,
the per-pair match count IS |A ∩ B|.

Scale shape: one gram explode + one gram-keyed equi-join (shuffle is
gram-bucketed, never string x string), two broadcast-or-shuffle joins
against the per-string gram counts. Skew risk is a hot gram (an "ing"
shared by half the catalog); the deployment answer is the same
hot-bucket cap/stop-gram treatment the dedup tier's
``_bounded_band_candidates`` documents — this operator keeps the
exact form so the DuckDB oracle can mirror it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_ngrams(text: Column, n: int) -> Column:
    """Distinct character n-grams; strings shorter than n fall back to
    one whole-string gram (mirrored in the SQL oracle)."""
    return F.when(
        F.length(text) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text) - n + 1),
                lambda i: F.substring(text, i, F.lit(n)),
            )
        ),
    ).otherwise(F.array(text))


def fuzzy_string_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    ngram: int = 3,
) -> DataFrame:
    """All id pairs whose strings' character-``ngram`` Jaccard meets
    ``threshold``; returns (id_a, id_b, name_jaccard) with id_a < id_b.

    The Jaccard is a ratio of integers (IEEE-exact, engine-identical),
    so the threshold compare is differential-safe; the reported value
    rounds to 6 per the registry convention. Callers resolving
    entities should first collapse exact duplicates (groupBy the
    string, min id) — matching distinct strings shrinks the join
    quadratically and is the realistic linkage shape.
    """
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"), _char_ngrams(t, ngram).alias("__g"))
    sz = base.select("id", F.size("__g").cast("long").alias("n_g"))
    g = base.select("id", F.explode("__g").alias("gram"))
    pairs = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    jac = F.col("__inter") / (
        F.col("__na") + F.col("__nb") - F.col("__inter")
    ).cast("double")
    return (
        pairs.join(sz.select(F.col("id").alias("id_a"), F.col("n_g").alias("__na")), "id_a")
        .join(sz.select(F.col("id").alias("id_b"), F.col("n_g").alias("__nb")), "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", (F.round(jac, 6) + 0.0).alias("name_jaccard"))
    )
