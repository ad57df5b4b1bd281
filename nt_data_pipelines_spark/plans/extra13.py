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


# a_corr_matrix's sufficient statistics, shared between the column
# list here and the oracle below.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    cols = _CORR_COLS
    sums = [f"SUM(CAST({c} AS DECIMAL(38,6))) AS s_{c}" for c in cols]
    prods = [
        f"SUM(CAST({a} * {b} AS DECIMAL(38,8))) AS p_{a}_{b}"
        for i, a in enumerate(cols)
        for b in cols[i:]
    ]
    selects = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            # fixed-order double arithmetic, mirrored from
            # operators/stats.pairwise_corr so both engines run the
            # same IEEE ops in the same order
            num = (
                f"CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE)"
            )
            den = (
                f"sqrt(CAST(n AS DOUBLE) * CAST(p_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * sqrt(CAST(n AS DOUBLE) * CAST(p_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            selects.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, "
                f"ROUND(({num}) / ({den}), 6) + 0.0 AS corr FROM s"
            )
    return (
        "WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        + ", ".join(sums + prods)
        + " FROM lineitem) "
        + " UNION ALL ".join(selects)
    )


@register(
    "a_corr_matrix",
    oracle=_corr_oracle(),
    doc="Pairwise Pearson correlation of the four lineitem measures in "
    "ONE whole-stage-codegen scan: all sufficient statistics (n, "
    "decimal sums, the upper product-moment triangle) come from a "
    "single map-side-partial aggregation — never k^2 table scans — "
    "and the six coefficients assemble on the one-row result with "
    "fixed-order IEEE arithmetic (bit-identical across engines; "
    "round-6 per registry rule 2, sqrt makes a midpoint measure-zero).",
)
def a_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.stats import pairwise_corr

    li = load_table(spark, sf_dir, "lineitem")
    return pairwise_corr(li, _CORR_COLS)


@register(
    "w_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dt
      FROM events
    ),
    a AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_intervals,
             CAST(SUM(dt) AS BIGINT) AS total_us,
             -- micro numerator as HUGEINT (the Spark side rides
             -- decimal(38,0)): value*dt is an IEEE-deterministic
             -- product; its micro units sum exactly
             SUM(CAST(CAST(value * dt AS DECIMAL(28,6)) * 1000000
                      AS HUGEINT)) AS micro
      FROM o WHERE dt IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_intervals, total_us,
           CAST((2 * micro + total_us) // (2 * total_us) AS DOUBLE)
             / 1000000.0 AS twa_value
    FROM a
    """,
    doc="Per-user time-weighted mean of the event value (each value "
    "weighted by the exact integer microseconds until the user's next "
    "event; right-open step function, single-event users dropped) — "
    "the irregular-tick mean that is invariant to quote bursts. The "
    "weighted mean is an exact rational, so it rounds via the integer "
    "half-up micro form (registry rule 3), never a midpoint-unsafe "
    "ROUND.",
)
def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.stats import time_weighted_mean

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_mean(
        ev, "user_id", "ts", "value", tiebreak_col="event_id"
    )


@register(
    "a_cms_heavy_hitters",
    oracle="""
    WITH w0 AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM w0 WHERE w <> '' GROUP BY w
    ),
    h AS (
      SELECT w, exact_count, r,
             CAST(concat('0x', substr(
               md5(concat(CAST(r AS VARCHAR), ':', w)), 1, 8)) AS BIGINT)
               % 512 AS cell
      FROM wc CROSS JOIN UNNEST(range(4)) AS t(r)
    ),
    cells AS (
      SELECT r, cell, CAST(SUM(exact_count) AS BIGINT) AS cell_count
      FROM h GROUP BY r, cell
    ),
    top AS (
      SELECT w, exact_count FROM wc ORDER BY exact_count DESC, w LIMIT 20
    )
    SELECT top.w AS value, top.exact_count,
           CAST(MIN(cells.cell_count) AS BIGINT) AS cms_count,
           CAST(MIN(cells.cell_count) - top.exact_count AS BIGINT)
             AS overestimate
    FROM top
    JOIN h ON h.w = top.w
    JOIN cells ON cells.r = h.r AND cells.cell = h.cell
    GROUP BY top.w, top.exact_count
    """,
    doc="Oracle-paired count-min sketch (4 x 512 md5-keyed counters) "
    "probed at the exact top-20 corpus words: exact count, sketch "
    "estimate, and realized one-sided overestimate — the calibration "
    "pattern (the estimate itself is driver-verified, like "
    "a_hll_distinct). The count shuffle is the only corpus-sized "
    "stage; the cell table is fixed-size and broadcast back.",
)
def a_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.sketches import deterministic_cms_estimates

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.selectExpr("explode(split(text, ' ')) AS w").filter("w <> ''")
    return deterministic_cms_estimates(toks, "w", depth=4, width=512, k=20)


@register(
    "a_gini_doclen",
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ),
    cum AS (
      SELECT source, v, c,
             SUM(c) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS a
      FROM c
    ),
    g AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             -- rank-weighted mass as HUGEINT (the Spark side rides
             -- decimal(38,0)): a 100-TB group's sum wraps int64
             SUM(CAST(v AS HUGEINT) * c) AS s,
             SUM(CAST(v AS HUGEINT) * c * (2 * a + c + 1)) AS tt
      FROM cum GROUP BY source
    )
    SELECT source, n_rows, CAST(s AS BIGINT) AS total_value,
           CAST((2 * (tt - (n_rows + 1) * s) * 1000000 + n_rows * s)
                // (2 * n_rows * s) AS DOUBLE) / 1000000.0 AS gini
    FROM g
    """,
    doc="Per-source Gini coefficient of document length — the "
    "inequality audit complementing a_token_concentration's half-mass "
    "cuts. Exact WITHOUT any per-source row sort: equal values occupy "
    "contiguous rank runs, so the rank-weighted sum folds "
    "arithmetically over the (source, value) VALUE domain; all "
    "integer until one rule-3 half-up micro division.",
)
def a_gini_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.stats import gini_by_group

    docs = load_table(spark, sf_dir, "documents")
    return gini_by_group(docs, "source", "n_chars")


@register(
    "p_quantile_gate",
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source),
    cum AS (
      SELECT source, v,
             SUM(c) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c
    ),
    -- integer cutoff: cum >= ceil(n/4) for integer cum is exactly
    -- 4*cum >= n, so both engines pick the identical cutoff value
    cuts AS (
      SELECT cum.source, MIN(v) AS cutoff
      FROM cum JOIN tot USING (source)
      WHERE 4 * cum >= n GROUP BY cum.source
    )
    SELECT d.doc_id, d.source, d.lang, d.n_chars
    FROM documents d JOIN cuts ON cuts.source = d.source
    WHERE d.n_chars >= cuts.cutoff
    """,
    doc="Per-source quality gate: drop each source's shortest quartile "
    "of documents (discrete quantile — the value at ascending rank "
    "ceil(n/4), ties kept). The cutoff is integer-exact over the "
    "(source, value) VALUE domain (q_den*cum >= q_num*n — never a "
    "float quantile), needs no per-source row sort, and applies as a "
    "broadcast-join codegen compare per row.",
)
def p_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.stats import quantile_gate

    docs = load_table(spark, sf_dir, "documents")
    return quantile_gate(docs, "source", "n_chars", 1, 4).select(
        "doc_id", "source", "lang", "n_chars"
    )


@register(
    "w_vwap_daily",
    oracle="""
    WITH a AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_date,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             -- quantities are integer-valued (asserted Spark-side):
             -- the divisor stays an exact integer
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS notional
      FROM lineitem GROUP BY 1
    )
    SELECT ship_date, n_lines, qty AS total_qty,
           -- exact rational -> rule-3 integer half-up micro division
           CAST((2 * CAST(notional * 1000000 AS HUGEINT) + qty)
                // (2 * qty) AS DOUBLE)
             / 1000000.0 AS vwap
    FROM a
    """,
    doc="Per-ship-date volume-weighted average price over lineitem: "
    "notional and quantity ride decimal sums (rule 1), and the "
    "weighted mean — an exact rational — divides in integer micro "
    "units with half-up rounding (rule 3). One map-side-partial "
    "aggregation; the irregular-tick sibling is w_time_weighted_avg.",
)
def w_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            # the integrality guard keeps the divisor exact: a
            # fractional quantity would silently truncate here
            F.sum(
                F.when(
                    F.col("l_quantity") == F.floor("l_quantity"),
                    F.col("l_quantity").cast("bigint"),
                ).otherwise(
                    F.raise_error(
                        F.lit("w_vwap_daily expects integer-valued l_quantity")
                    ).cast("bigint")
                )
            ).cast("long")
            .alias("total_qty"),
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(38,6)")
            ).alias("__notional"),
        )
        .select(
            "ship_date",
            "n_lines",
            "total_qty",
            (
                F.expr(
                    "CAST((2 * CAST(__notional * 1000000 AS DECIMAL(38,0))"
                    " + total_qty)"
                    " DIV (2 * total_qty) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("vwap"),
        )
    )


@register(
    "p_pps_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars AS w, md5(CAST(doc_id AS VARCHAR)) AS h,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bkt
      FROM documents WHERE n_chars > 0
    ),
    loc AS (
      SELECT doc_id, w, bkt,
             SUM(CAST(w AS HUGEINT)) OVER (PARTITION BY bkt ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
      FROM b
    ),
    per AS (SELECT bkt, SUM(CAST(w AS HUGEINT)) AS bs FROM b GROUP BY bkt),
    off AS (
      SELECT bkt,
             SUM(bs) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bs AS off
      FROM per
    ),
    tot AS (SELECT SUM(bs) AS total FROM per),
    c AS (
      SELECT doc_id, w, off + lc AS after, off + lc - w AS before
      FROM loc JOIN off USING (bkt)
    ),
    p AS (
      SELECT doc_id, w,
             (after * 100) // total - (before * 100) // total AS n_picks
      FROM c CROSS JOIN tot
    )
    SELECT doc_id, w AS n_chars, CAST(n_picks AS BIGINT) AS n_picks
    FROM p WHERE n_picks >= 1
    """,
    doc="Systematic PPS sample of exactly 100 picks, mass-weighted by "
    "document length: every doc owns a half-open interval on the "
    "total-weight line (an EXACT distributed prefix sum — md5-first-"
    "byte buckets give a deterministic, sampling-free, skew-free "
    "range partition; in-bucket window + 256-row offsets broadcast), "
    "and n_picks counts the pick points inside it via pure integer "
    "div identities. The token-budget mixer's sampler: mass, not "
    "documents, is sampled uniformly.",
)
def p_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.sampling import pps_systematic_sample

    docs = load_table(spark, sf_dir, "documents")
    return pps_systematic_sample(docs, "doc_id", "n_chars", m=100)
