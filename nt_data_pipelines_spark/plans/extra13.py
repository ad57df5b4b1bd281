"""Round-10 additions, third batch.

Linkage gains the POSITIONAL verify metric (bounded Levenshtein over
the same gram-blocked candidates — set Jaccard is order-blind), and
the per-group cap every web-corpus recipe applies (`cap_per_group`,
until now only pipeline-tested) gets an oracle-paired registration on
its new two-phase, skew-proof plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

# Same blocking cap as j_fuzzy_name_match: passed explicitly (no
# warning noise) AND mirrored in the oracle so recall is compared too.
_GRAM_DF_CAP = 1000


@register(
    "j_edit_distance_pairs",
    oracle=f"""
    WITH nm AS (
      SELECT MIN(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name
    ),
    gl AS (
      SELECT id, name, CASE WHEN len(name) >= 3 THEN list_distinct(
        list_transform(range(1, len(name) - 1), i -> substr(name, i, 3))
      ) ELSE [name] END AS grams FROM nm
    ),
    g AS (SELECT id, UNNEST(grams) AS gram FROM gl),
    rare AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {_GRAM_DF_CAP}
    ),
    gr AS (SELECT g.id, g.gram FROM g JOIN rare USING (gram)),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM gr a JOIN gr b ON a.gram = b.gram AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(levenshtein(ga.name, gb.name) AS INT) AS edit_distance
    FROM cand JOIN gl ga ON cand.id_a = ga.id
              JOIN gl gb ON cand.id_b = gb.id
    WHERE levenshtein(ga.name, gb.name) <= 3
    """,
    doc="Bounded-Levenshtein record linkage over DISTINCT part names "
    "(min key per name): the same trigram-blocked candidate join as "
    "j_fuzzy_name_match, verified by the POSITIONAL metric (exact "
    "integer distance — set Jaccard cannot tell 'cold rod' from 'rod "
    "cold'). A length-gap prune runs before the O(len^2) DP and the "
    "DP itself is JVM codegen; the hot-gram cap is mirrored in the "
    "oracle so recall is compared, not just surviving values.",
)
def j_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.linkage import edit_distance_pairs

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    return edit_distance_pairs(
        names.select("id", "p_name"),
        "id",
        "p_name",
        max_dist=3,
        max_gram_df=_GRAM_DF_CAP,
    )


@register(
    "p_per_group_cap",
    oracle="""
    SELECT doc_id, source, lang, n_chars FROM (
      SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 15
    """,
    doc="Deterministic per-source document cap (at most 15 docs per "
    "source, ranked by md5(doc_id) — the per-domain cap web-corpus "
    "recipes apply so boilerplate-heavy hosts cannot dominate the "
    "token budget). The rank is two-phase (local per input partition, "
    "then global over the pruned frame) so no window task ever holds "
    "a whole group; results are identical to the naive single-window "
    "form and stable across runs, engines, and repartitioning.",
)
def p_per_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", "doc_id", max_rows=15).select(
        "doc_id", "source", "lang", "n_chars"
    )
