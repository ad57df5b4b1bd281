"""Round-9 additions: per-source distribution drift, content-defined
chunking (+ chunk-level dedup), source-centroid outlier scoring, and
corpus-learned BPE tokenization."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

# checkout-relative: the oracle SQL string embeds an absolute path,
# resolved at import time so any clone location works (same protocol
# as plans/extra8.py's w6 golden)
_BPE_GOLDEN = str(
    Path(__file__).resolve().parents[2] / "tests" / "golden" / "bpe_tokenize.parquet"
)

# word hashed to the shared 60-bit gram key (operators/text.gram_key)
_WKEY = "CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)"


@register(
    "t_source_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    t AS (SELECT source, w FROM toks WHERE w <> ''),
    sw AS (SELECT source, w, COUNT(*) AS csw FROM t GROUP BY 1, 2),
    cw AS (SELECT w, SUM(csw) AS cw FROM sw GROUP BY 1),
    ns AS (SELECT source, SUM(csw) AS ns FROM sw GROUP BY 1),
    tot AS (SELECT SUM(cw) AS N FROM cw),
    terms AS (
      SELECT sw.source, ns.ns,
             ROUND(sw.csw * log2((CAST(sw.csw AS DOUBLE) * tot.N)
                                 / (CAST(ns.ns AS DOUBLE) * cw.cw)), 6) AS trm
      FROM sw JOIN cw USING (w) JOIN ns USING (source) CROSS JOIN tot
    )
    SELECT source, CAST(ns AS BIGINT) AS n_tokens,
           -- integer-exact half-up mean (registry rule 3)
           CAST(GREATEST(2 * SUM(CAST(CAST(trm AS DECIMAL(28,6)) * 1000000
                                      AS BIGINT)) + ns, 0)
                // (2 * ns) AS DOUBLE) / 1000000.0 AS kl_bits
    FROM terms GROUP BY source, ns
    """,
    doc="Per-source KL divergence (bits/token) of the source's unigram "
    "distribution from the corpus pool — the mixture-audit drift "
    "signal DoReMi-style reweighting monitors. Linear shuffles on "
    "(word, source) and word; corpus total broadcast.",
)
def t_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import source_unigram_divergence

    docs = load_table(spark, sf_dir, "documents")
    return source_unigram_divergence(docs, "source", "text")


_CDC_MOD = 8


@register(
    "t_cdc_chunks",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (
      SELECT doc_id, p, ws[p+1] AS w
      FROM d, UNNEST(generate_series(0, len(ws)-1)) AS t(p)
      WHERE ws[p+1] <> ''
    ),
    marked AS (
      SELECT doc_id, p, w,
             CASE WHEN {_WKEY} % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ),
    chunked AS (
      SELECT doc_id, p, w,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM marked
    ),
    chunks AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             string_agg(w, ' ' ORDER BY p) AS chunk_text
      FROM chunked GROUP BY 1, 2
    )
    SELECT doc_id, chunk_id, n_words, chunk_text,
           md5(chunk_text) AS chunk_hash,
           CAST(COUNT(*) OVER (PARTITION BY md5(chunk_text)) AS BIGINT)
             AS n_occurrences
    FROM chunks
    """,
    doc="Content-defined chunking (Gear/FastCDC rationale at word "
    "level): a word whose 60-bit hash is 0 mod 8 closes its chunk, so "
    "boundaries move locally under edits and chunk-hash dedup is "
    "stable across crawl snapshots. n_occurrences counts identical "
    "chunks corpus-wide. One per-doc window + one chunk-hash shuffle.",
)
def t_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs, "doc_id", "text", boundary_mod=_CDC_MOD)


@register(
    "t_cdc_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (
      SELECT doc_id, p, ws[p+1] AS w
      FROM d, UNNEST(generate_series(0, len(ws)-1)) AS t(p)
      WHERE ws[p+1] <> ''
    ),
    marked AS (
      SELECT doc_id, p, w,
             CASE WHEN {_WKEY} % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ),
    chunked AS (
      SELECT doc_id, p, w,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM marked
    ),
    chunks AS (
      SELECT doc_id, chunk_id, COUNT(*) AS n_words,
             string_agg(w, ' ' ORDER BY p) AS chunk_text
      FROM chunked GROUP BY 1, 2
    ),
    hashed AS (SELECT *, md5(chunk_text) AS h FROM chunks),
    first AS (
      SELECT h, MIN(struct_pack(d := doc_id, c := chunk_id)) AS fst
      FROM hashed GROUP BY h
    ),
    tagged AS (
      SELECT hashed.*,
             (n_words < 2 OR (fst.d = hashed.doc_id
                              AND fst.c = hashed.chunk_id)) AS keep
      FROM hashed JOIN first USING (h)
    ),
    reb AS (
      SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_id) AS clean_text
      FROM tagged WHERE keep GROUP BY doc_id
    ),
    rem AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed_chunks,
             CAST(SUM(n_words) AS BIGINT) AS n_removed_words
      FROM tagged WHERE NOT keep GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(rem.n_removed_chunks, 0) AS n_removed_chunks,
           COALESCE(rem.n_removed_words, 0) AS n_removed_words
    FROM documents d LEFT JOIN reb USING (doc_id) LEFT JOIN rem USING (doc_id)
    """,
    doc="Chunk-level dedup over content-defined chunks: every repeated "
    "chunk survives only in its first (min doc, min position) "
    "occurrence — the snapshot-stable middle ground between document "
    "dedup and span removal. Linear: CDC shuffles + one min-per-hash "
    "aggregate + per-doc regroup.",
)
def t_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import cdc_dedup_documents

    docs = load_table(spark, sf_dir, "documents")
    return cdc_dedup_documents(docs, "doc_id", "text", boundary_mod=_CDC_MOD)


@register(
    "s_centroid_outlier",
    oracle="""
    WITH e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    j AS (SELECT d.doc_id, d.source, e.v
          FROM documents d JOIN e USING (doc_id)),
    long AS (
      SELECT source, i, v[i+1] AS x
      FROM j, UNNEST(generate_series(0, len(v)-1)) AS t(i)
    ),
    cent AS (
      SELECT source, i,
             CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS c
      FROM long GROUP BY 1, 2
    ),
    carr AS (SELECT source, list(c ORDER BY i) AS cv FROM cent GROUP BY 1)
    SELECT j.doc_id, j.source,
           (ROUND(list_dot_product(v, cv) /
                  (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(cv, cv))),
                  6) + 0.0) AS centroid_cosine
    FROM j JOIN carr USING (source)
    """,
    doc="Per-doc cosine to its source's embedding centroid — the "
    "outlier-pruning curation signal (low score = off-topic or "
    "garbage-embedded doc). Centroids are exact decimal means, "
    "broadcast back; scoring is one codegen pass, no pairwise work.",
)
def s_centroid_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.similarity import source_centroid_outliers

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return source_centroid_outliers(docs, emb)


@register(
    "t_bpe_tokenize",
    oracle=f"""
    SELECT doc_id, n_bpe_tokens
    FROM read_parquet('{_BPE_GOLDEN}')
    WHERE src_chars = (SELECT SUM(LEN(text)) FROM documents)
    """,
    doc="BPE subword tokenization learned FROM the corpus (Sennrich "
    "2016): 16 merges trained on the word-frequency relation (one "
    "corpus shuffle total; per-merge work is vocab-sized), then "
    "encoded with chained codegen folds. Iterative merge learning is "
    "not SQL-expressible, so the oracle is a PINNED GOLDEN "
    "(tests/golden/bpe_tokenize.parquet, scripts/make_bpe_golden.py) "
    "computed by an INDEPENDENT pure-Python Sennrich implementation "
    "over the same documents tables — discriminated by SUM(LEN(text)) "
    "because sf0.001 and sf0.01 share a row count. tests/test_bpe.py "
    "additionally pins trainer+encoder against that reference on a "
    "toy corpus with exact merge-table/token equality.",
)
def t_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=16, checkpoint_every=8)
    return bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens")


@register(
    "t_bloom_decontaminate",
    oracle="""
    WITH corpus AS (SELECT * FROM documents WHERE source <> 'src1'),
    bench AS (SELECT * FROM documents WHERE source = 'src1'),
    cg AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, len(string_split(text,' '))),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
      )) AS gram FROM corpus
    ),
    bg AS (
      SELECT DISTINCT UNNEST(
        list_transform(range(1, len(string_split(text,' '))),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
      ) AS gram FROM bench
    ),
    totals AS (
      SELECT doc_id, CAST(len(list_distinct(
        list_transform(range(1, len(string_split(text,' '))),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
      )) AS BIGINT) AS n_grams FROM corpus
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT t.doc_id, n_grams,
           CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN n_grams > 0
                THEN CAST((2 * COALESCE(n_contaminated, 0) * 1000000 + n_grams)
                          // (2 * n_grams) AS DOUBLE) / 1000000.0 END + 0.0
             AS overlap_ratio
    FROM totals t LEFT JOIN hits USING (doc_id)
    """,
    doc="Decontamination for benchmarks too large to broadcast: the "
    "benchmark's gram set collapses into a fixed-size Bloom bitset "
    "built from public primitives (xxhash64 bit positions, per-byte "
    "bit_or, one binary-literal codegen probe; Spark's own "
    "bloom_filter_agg is internal-only) that prefilters corpus grams "
    "map-side; Bloom has no false negatives and an exact verify join "
    "discards false positives, so the result — and therefore the "
    "oracle — is identical to the exact check's. Word-2-grams vs the "
    "source='src1' slice.",
)
def t_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.text import bloom_contamination

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src1")
    bench = docs.filter(F.col("source") == "src1")
    return bloom_contamination(corpus, bench, "doc_id", n=2)


@register(
    "t_zipf_slope",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
      SELECT source, word, COUNT(*) AS cnt
      FROM toks WHERE word <> '' GROUP BY 1, 2
    ),
    r AS (
      SELECT source, cnt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, word ASC) AS rnk
      FROM c
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 6) + 0.0 AS zipf_slope
    FROM r WHERE rnk <= 25 GROUP BY source
    """,
    doc="Per-source Zipf slope: OLS fit of ln(count) on ln(rank) over "
    "the top-25 tokens — natural text sits near -1; template or "
    "machine-generated sources flatten or steepen. One (source, word) "
    "count shuffle; the rank window runs over the vocab-sized counts "
    "frame, never the corpus. Slope rounded to 6 (registry rule 2).",
)
def t_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.text import zipf_slope

    docs = load_table(spark, sf_dir, "documents")
    return zipf_slope(docs)


_GRAM_DF_CAP = 1000


@register(
    "j_fuzzy_name_match",
    oracle=f"""
    WITH nm AS (
      SELECT MIN(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name
    ),
    gl AS (
      SELECT id, CASE WHEN len(name) >= 3 THEN list_distinct(
        list_transform(range(1, len(name) - 1), i -> substr(name, i, 3))
      ) ELSE [name] END AS grams FROM nm
    ),
    g AS (SELECT id, UNNEST(grams) AS gram FROM gl),
    sz AS (SELECT id, CAST(len(grams) AS BIGINT) AS n_g FROM gl),
    -- hot-gram cap mirrored from fuzzy_string_pairs' default-on bound:
    -- grams shared by more than {_GRAM_DF_CAP} names leave candidate
    -- generation; the Jaccard is then exact over the full gram sets
    rare AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {_GRAM_DF_CAP}
    ),
    gr AS (SELECT g.id, g.gram FROM g JOIN rare USING (gram)),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM gr a JOIN gr b ON a.gram = b.gram AND a.id < b.id
    ),
    p AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS inter
      FROM cand JOIN gl ga ON cand.id_a = ga.id
                JOIN gl gb ON cand.id_b = gb.id
    )
    SELECT id_a, id_b,
           CAST((2 * inter * 1000000 + (sa.n_g + sb.n_g - inter))
                // (2 * (sa.n_g + sb.n_g - inter)) AS DOUBLE) / 1000000.0 + 0.0
             AS name_jaccard
    FROM p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
    WHERE inter / CAST(sa.n_g + sb.n_g - inter AS DOUBLE) >= 0.4
    """,
    doc="Record linkage: character-trigram blocking join + exact set-"
    "Jaccard verify over DISTINCT part names (min key per name) — the "
    "entity-resolution primitive. The gram-keyed shuffle replaces the "
    "O(n^2) all-pairs comparison; the default-on hot-gram cap bounds a "
    "hot trigram's O(df^2) candidate blow-up, and the per-pair exact "
    "re-verify (array_intersect over full gram sets) keeps reported "
    "values identical to the uncapped form — the cap is mirrored in "
    "the oracle so recall is compared too. Threshold compare on an "
    "exact integer ratio (engine-identical).",
)
def j_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.linkage import fuzzy_string_pairs

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    return fuzzy_string_pairs(
        names.select("id", "p_name"),
        "id",
        "p_name",
        threshold=0.4,
        max_gram_df=_GRAM_DF_CAP,
    )
