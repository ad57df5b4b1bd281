"""Text-analysis & deduplication queries over the documents table.

These are the training-data-pipeline capabilities (dedup family,
quality scoring, language ID, fingerprinting). Every hash in the
Spark operators is md5, so the DuckDB oracles reproduce signatures
bit-for-bit — including the MinHash-LSH banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import dedup as D
from nt_data_pipelines_spark.operators import text as TX
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

_EN = ", ".join(f"'{w}'" for w in TX.STOPWORD_LEXICON["en"])
_LEX_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in TX.STOPWORD_LEXICON.items() for w in ws
)


_SIMHASH_CTE = """
    WITH shingles AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(word), 4, 1)) - 1) AS h
      FROM shingles
    ),
    weights AS (
      SELECT doc_id, {bit_sums}
      FROM hashed GROUP BY doc_id
    ),
    fps AS (SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM weights)
""".format(
    bit_sums=", ".join(
        f"SUM(CASE WHEN CAST(FLOOR(h / {1 << b}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS w_{b}"
        for b in range(16)
    ),
    fingerprint=" + ".join(
        f"CASE WHEN w_{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16)
    ),
)


# Shared oracle fragment: MinHash(16) signatures banded 4x4 — ONE copy
# (d_minhash_lsh here + d_lsh_verified_dedup in plans/extra.py) so the
# seed scheme can never silently diverge between the two oracles.
MINHASH_BANDS_CTE = """\
    WITH shingles AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    sigs AS (
      SELECT doc_id,
        MIN(md5('0:' || word)) AS mh_0,  MIN(md5('1:' || word)) AS mh_1,
        MIN(md5('2:' || word)) AS mh_2,  MIN(md5('3:' || word)) AS mh_3,
        MIN(md5('4:' || word)) AS mh_4,  MIN(md5('5:' || word)) AS mh_5,
        MIN(md5('6:' || word)) AS mh_6,  MIN(md5('7:' || word)) AS mh_7,
        MIN(md5('8:' || word)) AS mh_8,  MIN(md5('9:' || word)) AS mh_9,
        MIN(md5('10:' || word)) AS mh_10, MIN(md5('11:' || word)) AS mh_11,
        MIN(md5('12:' || word)) AS mh_12, MIN(md5('13:' || word)) AS mh_13,
        MIN(md5('14:' || word)) AS mh_14, MIN(md5('15:' || word)) AS mh_15
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 'band_0' AS band, md5(mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3) AS band_hash FROM sigs
      UNION ALL
      SELECT doc_id, 'band_1', md5(mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7) FROM sigs
      UNION ALL
      SELECT doc_id, 'band_2', md5(mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11) FROM sigs
      UNION ALL
      SELECT doc_id, 'band_3', md5(mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15) FROM sigs
    )"""


_SIG_MATCHES = " + ".join(
    f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(16)
)


@register(
    "d_minhash_jaccard_estimate",
    oracle=MINHASH_BANDS_CTE + """,
    sized AS (
      SELECT doc_id, band, band_hash,
             COUNT(*) OVER (PARTITION BY band, band_hash) AS bsize,
             MIN(doc_id) OVER (PARTITION BY band, band_hash) AS hub
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE a.bsize <= 64
        UNION ALL
        SELECT LEAST(hub, doc_id), GREATEST(hub, doc_id)
        FROM sized WHERE bsize > 64 AND doc_id <> hub
      )
    )
    SELECT c.id_a, c.id_b,
           {matches} AS n_match,
           ROUND(({matches}) / 16.0, 6) AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b
    """.format(matches=_SIG_MATCHES),
    doc="Signature-only Jaccard estimate for LSH candidates: matching "
    "MinHash components / 16. The O(1)-per-pair triage tier — orders "
    "candidates without the O(words)-per-pair shingle join; unbiased "
    "with stderr sqrt(J(1-J)/k). Candidates are the bounded edge set "
    "(all pairs <= 64/bucket, min-id hub-star above) — a triage tier "
    "must never cost more than the verify tier it triages for.",
)
def d_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_jaccard_estimate(
        docs, "doc_id", "text", bucket_cap=D.DEFAULT_BUCKET_CAP
    )


@register(
    "d_containment_pairs",
    oracle=MINHASH_BANDS_CTE + """,
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id),
    sized AS (
      SELECT b.doc_id, b.band, b.band_hash,
             COUNT(*) OVER (PARTITION BY b.band, b.band_hash) AS bsize,
             FIRST_VALUE(b.doc_id) OVER (
               PARTITION BY b.band, b.band_hash
               ORDER BY z.set_size DESC, b.doc_id
             ) AS hub
      FROM bands b JOIN sizes z ON z.doc_id = b.doc_id
    ),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE a.bsize <= 64
        UNION ALL
        SELECT LEAST(hub, doc_id), GREATEST(hub, doc_id)
        FROM sized WHERE bsize > 64 AND doc_id <> hub
      )
    ),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.word = sa.word
      GROUP BY 1, 2
    )
    SELECT m.id_a, m.id_b, m.n_common,
           za.set_size AS size_a, zb.set_size AS size_b,
           CAST((2 * m.n_common * 1000000 + LEAST(za.set_size, zb.set_size))
                // (2 * LEAST(za.set_size, zb.set_size)) AS DOUBLE) / 1000000.0 AS containment
    FROM common m
    JOIN sizes za ON za.doc_id = m.id_a
    JOIN sizes zb ON zb.doc_id = m.id_b
    WHERE m.n_common / CAST(LEAST(za.set_size, zb.set_size) AS DOUBLE) >= 0.9
    """,
    doc="Asymmetric near-dup: word-set containment |A∩B|/min(|A|,|B|) "
    ">= 0.9 on LSH candidates — catches doc-inside-doc duplication "
    "(quotes, aggregator pages) that Jaccard punishes by size ratio. "
    "Candidates are bounded: all pairs for buckets <= 64, hub-star to "
    "the bucket's LARGEST doc (the superset survivor) above.",
)
def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(
        docs, "doc_id", "text", threshold=0.9, bucket_cap=D.DEFAULT_BUCKET_CAP
    )


# per-side minhash fragments for oracles joining TWO banded relations
# (same md5 seed scheme as MINHASH_BANDS_CTE — one construction, two
# renderings, so the signatures can never diverge between oracles)
_MINS_SQL = ", ".join(f"MIN(md5('{s}:' || word)) AS mh_{s}" for s in range(16))
_BANDS_SQL = " UNION ALL ".join(
    "SELECT doc_id, 'band_{b}' AS band, md5({parts}) AS band_hash FROM {{sig}}".format(
        b=b, parts=" || '|' || ".join(f"mh_{b * 4 + r}" for r in range(4))
    )
    for b in range(4)
)


@register(
    "d_dedup_against_corpus",
    oracle=f"""
    WITH newdocs AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
    corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
    nsh AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM newdocs),
    osh AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM corpus),
    nsig AS (SELECT doc_id, {_MINS_SQL} FROM nsh GROUP BY doc_id),
    osig AS (SELECT doc_id, {_MINS_SQL} FROM osh GROUP BY doc_id),
    nbands AS ({_BANDS_SQL.format(sig="nsig")}),
    obands AS ({_BANDS_SQL.format(sig="osig")}),
    ocapped AS (
      SELECT doc_id, band, band_hash FROM (
        SELECT doc_id, band, band_hash,
               ROW_NUMBER() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS brank
        FROM obands
      ) WHERE brank <= 64
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
      FROM nbands n JOIN ocapped o
        ON n.band = o.band AND n.band_hash = o.band_hash
    ),
    common AS (
      SELECT c.id_new, c.id_old, COUNT(*) AS n_common
      FROM cand c
      JOIN nsh ON nsh.doc_id = c.id_new
      JOIN osh ON osh.doc_id = c.id_old AND osh.word = nsh.word
      GROUP BY 1, 2
    ),
    sn AS (SELECT doc_id, COUNT(*) AS s FROM nsh GROUP BY 1),
    so AS (SELECT doc_id, COUNT(*) AS s FROM osh GROUP BY 1),
    dups AS (
      SELECT DISTINCT c.id_new
      FROM common c
      JOIN sn ON sn.doc_id = c.id_new
      JOIN so ON so.doc_id = c.id_old
      WHERE c.n_common / CAST(sn.s + so.s - c.n_common AS DOUBLE) >= 0.7
    )
    SELECT d.doc_id, d.text
    FROM newdocs d LEFT JOIN dups ON dups.id_new = d.doc_id
    WHERE dups.id_new IS NULL
    """,
    doc="Incremental-ingestion dedup: new batch (doc_id % 10 = 7) kept "
    "only where no corpus doc (the other 90%) is a verified near-dup "
    "(MinHash-LSH candidates batch-vs-corpus, exact Jaccard >= 0.7). "
    "The continuous-training-data shape: each round dedups its delta "
    "against the accumulated corpus, O(batch x bucket) never corpus^2. "
    "Corpus side joins through precomputed corpus_dedup_state frames "
    "(the persisted-state path) with hot corpus buckets capped at 64 "
    "min-id members (mirrored in the oracle).",
)
def d_dedup_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    cb, csh = D.corpus_dedup_state(corpus, "doc_id", "text")
    kept = D.dedup_new_against_corpus(
        new_docs, None, "doc_id", "text", threshold=0.7,
        corpus_bands=cb, corpus_shingles=csh,
        corpus_bucket_cap=D.DEFAULT_BUCKET_CAP,
    )
    return kept.select("doc_id", "text")


@register(
    "d_verified_dup_edges",
    oracle=MINHASH_BANDS_CTE + """,
    sized AS (
      SELECT doc_id, band, band_hash,
             COUNT(*) OVER (PARTITION BY band, band_hash) AS bsize,
             MIN(doc_id) OVER (PARTITION BY band, band_hash) AS hub
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sized a JOIN sized b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        WHERE a.bsize <= 64
        UNION ALL
        SELECT hub, doc_id FROM sized WHERE bsize > 64 AND doc_id <> hub
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id),
    verified AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.word = sa.word
      GROUP BY 1, 2
    )
    SELECT v.id_a, v.id_b,
           CAST((2 * v.n_common * 1000000 + (za.set_size + zb.set_size - v.n_common))
                // (2 * (za.set_size + zb.set_size - v.n_common)) AS DOUBLE) / 1000000.0 AS jaccard
    FROM verified v
    JOIN sizes za ON za.doc_id = v.id_a
    JOIN sizes zb ON zb.doc_id = v.id_b
    WHERE v.n_common / CAST(za.set_size + zb.set_size - v.n_common AS DOUBLE) >= 0.7
    """,
    doc="Near-dup edges for dup-group resolution: bounded LSH candidates "
    "(all-pairs for buckets <= 64, hub-star above) verified at exact "
    "word-set Jaccard >= 0.7. The verified default of curate_corpus's "
    "near-dedup tier — unverified band collisions amplified by "
    "connected components collapse a shared-vocabulary corpus into one "
    "giant group (dedup.minhash_verified_dup_edges documents the "
    "measured failure).",
)
def d_verified_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_verified_dup_edges(
        docs, "doc_id", "text", threshold=0.7, bucket_cap=D.DEFAULT_BUCKET_CAP
    )


@register(
    "d_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS survivor_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on content, min-id survivor.",
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "doc_id", "text").select("text_hash", "survivor_id", "n_dups")


@register(
    "d_ngram_jaccard",
    oracle="""
    WITH shingles AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common, sa.set_size AS size_a, sb.set_size AS size_b,
           CAST((2 * n_common * 1000000 + (sa.set_size + sb.set_size - n_common))
                // (2 * (sa.set_size + sb.set_size - n_common)) AS DOUBLE) / 1000000.0 AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common / CAST(sa.set_size + sb.set_size - n_common AS DOUBLE) >= 0.8
    """,
    doc="n-gram (word-set) Jaccard near-dup pairs at threshold 0.8.",
)
def d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)


@register(
    "d_minhash_lsh",
    oracle=MINHASH_BANDS_CTE + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
    doc="MinHash(16) + LSH(4 bands) candidate near-dup pairs; md5-seeded "
    "min-hashing so the oracle reproduces signatures exactly.",
)
def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=16, bands=4)


@register(
    "d_simhash",
    oracle=_SIMHASH_CTE + """
    SELECT doc_id, simhash FROM fps
    """,
    doc="SimHash-16 fingerprint from word md5 bits (JVM-side bit math).",
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text", bits=16)




@register(
    "d_simhash_pairs",
    oracle=_SIMHASH_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup candidate pairs: hamming distance <= 3 over the "
    "16-bit fingerprints (JVM bit math on both engines).",
)
def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = D.simhash(docs, "doc_id", "text", bits=16)
    return D.simhash_near_pairs(fps, "doc_id", "simhash", max_hamming=3)


@register(
    "d_simhash_banded",
    oracle=_SIMHASH_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="Banded SimHash near-dup pairs — the SCALE path: the 16-bit "
    "fingerprint splits into max_hamming+1=4 chunks; pigeonhole "
    "guarantees any pair within hamming 3 agrees on >=1 chunk, so "
    "candidates come from an equi-join on (chunk, value), never a pair "
    "scan. The oracle is deliberately the O(n^2) scan: hash equality "
    "proves the banded plan recovers exactly the full pair set.",
)
def d_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = D.simhash(docs, "doc_id", "text", bits=16)
    return D.simhash_banded_pairs(fps, "doc_id", "simhash", max_hamming=3, bits=16)


@register(
    "t_quality_features",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS q_chars,
           LEN(string_split(text, ' ')) AS q_words,
           LENGTH(text) / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS q_avg_word_len,
           LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE) AS q_alpha_ratio,
           LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE) AS q_digit_ratio,
           LENGTH(regexp_replace(text, '[^ ]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE) AS q_space_ratio,
           LEN(list_filter(list_distinct(string_split(text, ' ')), x -> x IN ({_EN})))
             / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS q_en_stopword_distinct_ratio,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS q_tokens
    FROM documents
    """,
    doc="Quality scoring: length/word/charclass/stopword/token features.",
)
def t_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(docs, "text")
    return feats.select(
        "doc_id",
        F.col("q_chars").cast("long").alias("q_chars"),
        F.col("q_words").cast("long").alias("q_words"),
        "q_avg_word_len",
        "q_alpha_ratio",
        "q_digit_ratio",
        "q_space_ratio",
        "q_en_stopword_distinct_ratio",
        F.col("q_tokens").cast("long").alias("q_tokens"),
    )


@register(
    "t_language_id",
    oracle=f"""
    WITH lexicon(lang, word) AS (VALUES {_LEX_VALUES}),
    exploded AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    scores AS (
      SELECT e.doc_id, l.lang, COUNT(*) AS hits
      FROM exploded e JOIN lexicon l ON e.word = l.word
      GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rk
      FROM scores
    )
    SELECT d.doc_id,
           COALESCE(b.lang, 'und') AS pred_lang,
           COALESCE(b.hits, 0) AS lex_hits
    FROM documents d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.doc_id
    """,
    doc="Language ID: stopword-lexicon hit argmax, deterministic tie-break.",
)
def t_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.language_id(docs, "doc_id", "text")


@register(
    "t_fingerprint",
    oracle="""
    WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
    bigrams AS (
      SELECT doc_id, UNNEST(list_transform(range(1, GREATEST(LEN(ws), 1)),
                                           i -> md5(ws[i] || ' ' || ws[i + 1]))) AS bh
      FROM w
    ),
    fps AS (SELECT doc_id, MIN(bh) AS fp FROM bigrams GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(f.fp, md5(d.text)) AS fingerprint
    FROM documents d LEFT JOIN fps f ON d.doc_id = f.doc_id
    """,
    doc="Document fingerprint: min rolling (bigram) md5 hash — winnowing-lite.",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.bigram_fingerprint(docs, "doc_id", "text")


@register(
    "t_normalize",
    oracle="""
    SELECT doc_id,
           TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
    doc="Cleaning normalization: lowercase, punctuation->space, squeeze "
    "whitespace — the canonical form fed to exact dedup.",
)
def t_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.normalize_text("text").alias("norm_text"))


@register(
    "t_token_totals",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]'))) AS BIGINT) AS total_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY source, lang
    """,
    doc="Corpus token accounting per (source, lang) — integer sums, exact.",
)
def t_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count("text")).alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )
