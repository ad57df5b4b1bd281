"""Round-10 additions, second batch.

``a_hll_distinct`` is the first ORACLE-PAIRED sketch in the repo: the
builtin HLL++/approx_count_distinct tier (operators/sketches.py) is
deliberately unpaired because each engine hashes privately, while this
md5-register HyperLogLog produces bit-identical estimates in Spark and
DuckDB — the estimate itself is driver-verified, not just bounded by a
test. The rest extend the corpus-QA tier: PMI collocations, a
source-vocabulary Jaccard matrix, and a per-source Kolmogorov–Smirnov
drift statistic whose ECDF comparison runs in exact integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

# The HLL estimate numerator alpha_256 * 256^2 * 2^57 pre-folded into
# ONE double literal (see operators/sketches.deterministic_hll_distinct)
# so the float path on both engines is a single division. repr() of the
# Python double round-trips exactly through both parsers.
_HLL_NUM = 0.7213 / (1 + 1.079 / 256) * 256 * 256 * float(1 << 57)
assert repr(_HLL_NUM) == "6.783892839851034e+21"


@register(
    "a_hll_distinct",
    oracle=f"""
    WITH w0 AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (SELECT DISTINCT source, w FROM w0 WHERE w <> ''),
    h AS (
      SELECT source,
             CAST(concat('0x', substr(md5(w), 1, 2)) AS INT) AS reg,
             CAST(concat('0x', substr(md5(w), 3, 14)) AS BIGINT) AS x
      FROM vocab
    ),
    regs AS (
      SELECT source, reg,
             MAX(CASE WHEN x = 0 THEN 57 ELSE 57 - LENGTH(bin(x)) END) AS m
      FROM h GROUP BY source, reg
    ),
    per_source AS (
      SELECT source,
             SUM(CAST((CAST(1 AS BIGINT) << (57 - m)) AS DECIMAL(38,0))) AS s_obs,
             COUNT(*) AS n_obs
      FROM regs GROUP BY source
    ),
    ex AS (SELECT source, COUNT(*) AS exact_distinct FROM vocab GROUP BY source),
    est AS (
      SELECT source,
             CAST(256 - n_obs AS INT) AS empty_registers,
             {_HLL_NUM!r} / CAST(
               s_obs + CAST(256 - n_obs AS DECIMAL(38,0)) * 144115188075855872
               AS DOUBLE) AS hll_raw
      FROM per_source
    ),
    corrected AS (
      SELECT source, empty_registers, hll_raw,
             CASE WHEN hll_raw <= 640.0 AND empty_registers > 0
                  THEN ROUND(256.0 * ln(256.0 / empty_registers), 6)
                  ELSE hll_raw END AS hll_estimate
      FROM est
    )
    SELECT c.source, c.empty_registers, c.hll_raw, c.hll_estimate,
           ex.exact_distinct,
           abs(c.hll_estimate - ex.exact_distinct) / ex.exact_distinct
             AS rel_error
    FROM corrected c JOIN ex USING (source)
    """,
    doc="Oracle-paired HyperLogLog: per-source distinct-word estimate "
    "from md5-derived registers, bit-identical across engines (exact "
    "integer harmonic sum, one-division float path), with the exact "
    "count and realized error as the calibration columns.",
)
def a_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.sketches import deterministic_hll_distinct

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_hll_distinct(
        docs.selectExpr("source", "explode(split(text, ' ')) AS w").filter("w <> ''"),
        "source",
        "w",
        p=8,
        include_exact=True,
    )


@register(
    "t_pmi_collocations",
    oracle="""
    WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM d CROSS JOIN UNNEST(range(1, len(ws))) AS t(i)
    ),
    pairs AS (SELECT w1, w2, COUNT(*) AS pair_count FROM g GROUP BY w1, w2),
    l AS (SELECT w1, COUNT(*) AS cl FROM g GROUP BY w1),
    r AS (SELECT w2, COUNT(*) AS cr FROM g GROUP BY w2),
    n AS (SELECT COUNT(*) AS n FROM g),
    s AS (
      SELECT w1, w2, pair_count,
             (CAST(pair_count AS DOUBLE) * n.n)
               / (CAST(cl AS DOUBLE) * cr) AS score
      FROM pairs JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
      WHERE pair_count >= 5
    )
    SELECT w1, w2, pair_count, ROUND(log2(score), 6) AS pmi
    FROM s ORDER BY score DESC, w1, w2 LIMIT 50
    """,
    doc="Top-50 adjacent-word collocations by PMI over one shared pair "
    "population (Church & Hanks); double-first fixed-order score "
    "arithmetic makes even the ranking bit-identical across engines.",
)
def t_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.lm import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, "text", min_count=5, k=50)


@register(
    "a_source_vocab_jaccard",
    oracle="""
    WITH w0 AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (SELECT DISTINCT source, w FROM w0 WHERE w <> ''),
    sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS intersection_size
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, intersection_size,
           sa.n + sb.n - intersection_size AS union_size,
           CAST((2 * intersection_size * 1000000
                 + (sa.n + sb.n - intersection_size))
                // (2 * (sa.n + sb.n - intersection_size)) AS DOUBLE)
             / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
    doc="Pairwise source-vocabulary Jaccard (upper triangle; pairs with "
    "empty intersection are omitted on both sides). Word-keyed join "
    "fans out by sources-per-word choose 2 — bounded by source count, "
    "never corpus size.",
)
def a_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import source_vocab_jaccard

    docs = load_table(spark, sf_dir, "documents")
    return source_vocab_jaccard(docs, "source", "text")


@register(
    "a_ks_drift",
    oracle="""
    WITH c AS (
      SELECT source AS g, n_chars AS v, COUNT(*) AS c
      FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM c GROUP BY g),
    grand AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
    gv AS (
      SELECT v,
             SUM(SUM(c)) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      FROM c GROUP BY v
    ),
    grid AS (SELECT g, ng, v, cum_all FROM tot CROSS JOIN gv),
    j AS (
      SELECT grid.g, grid.ng, grid.v, grid.cum_all, COALESCE(c.c, 0) AS c
      FROM grid LEFT JOIN c ON c.g = grid.g AND c.v = grid.v
    ),
    cum AS (
      SELECT g, ng, v, cum_all,
             SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
      FROM j
    ),
    scored AS (
      SELECT g, ng, n - ng AS nr,
             abs(CAST(cg AS DECIMAL(19,0)) * CAST(n - ng AS DECIMAL(19,0))
                 - CAST(cum_all - cg AS DECIMAL(19,0))
                   * CAST(ng AS DECIMAL(19,0))) AS num
      FROM cum CROSS JOIN grand
    )
    SELECT g AS source, ng AS n_rows,
           -- mirror the operator's single-group guard: no comparison
           -- population (nr = 0) => NULL, never a 0/0 NaN
           CASE WHEN nr > 0 THEN
             CAST(MAX(num) AS DOUBLE)
               / CAST(CAST(ng AS DECIMAL(19,0)) * CAST(nr AS DECIMAL(19,0))
                      AS DOUBLE)
           END AS ks_stat
    FROM scored GROUP BY g, ng, nr
    """,
    doc="Per-source two-sample Kolmogorov-Smirnov drift of the doc-"
    "length distribution vs the rest of the corpus; the ECDF gap is "
    "maximized over exact cross-multiplied integers (decimal 19x19), "
    "one final division (NULL for a single-group corpus).",
)
def a_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.drift import ks_drift_by_group

    docs = load_table(spark, sf_dir, "documents")
    return ks_drift_by_group(docs, "source", "n_chars")
