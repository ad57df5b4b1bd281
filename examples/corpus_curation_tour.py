"""Tour of the training-data curation tier (rounds 8-10 additions).

Run: python examples/corpus_curation_tour.py  (~2 min on local CPUs)

Walks the documents fixture through the pipeline a 100-TB pretraining
corpus would run, printing a compact audit at each stage:

1. profile     — per-source length Gini, KS drift, discrete quantiles;
2. sketches    — oracle-pairable HLL distinct words + CMS heavy hitters;
3. gate        — per-source quality floor (drop each source's shortest
                 quartile) and the per-source document cap;
4. dedup      — MinHash-LSH verified duplicate edges;
5. decontam   — Bloom-prefiltered benchmark-overlap removal;
6. sample     — systematic PPS: a 100-pick token-budget sample with
                 zero size variance.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.dedup import minhash_verified_dup_edges
from nt_data_pipelines_spark.operators.drift import ks_drift_by_group
from nt_data_pipelines_spark.operators.sampling import pps_systematic_sample
from nt_data_pipelines_spark.operators.sketches import (
    deterministic_cms_estimates,
    deterministic_hll_distinct,
)
from nt_data_pipelines_spark.operators.stats import gini_by_group, quantile_gate
from nt_data_pipelines_spark.operators.text import bloom_contamination, cap_per_group
from nt_data_pipelines_spark.session import get_spark
from nt_data_pipelines_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("corpus-tour")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    print("== 1. profile ==")
    gini_by_group(docs, "source", "n_chars").orderBy(F.desc("gini")).show(3)
    ks_drift_by_group(docs, "source", "n_chars").orderBy(F.desc("ks_stat")).show(3)

    print("== 2. sketches (engine-reproducible) ==")
    words = docs.selectExpr("source", "explode(split(text, ' ')) AS w").filter("w <> ''")
    deterministic_hll_distinct(words, "source", "w", include_exact=True).orderBy(
        "source"
    ).show(3)
    deterministic_cms_estimates(words.select("w"), "w", k=5).show()

    print("== 3. gate: quality floor + per-source cap ==")
    gated = quantile_gate(docs, "source", "n_chars", 1, 4)
    capped = cap_per_group(gated, "source", "doc_id", max_rows=15)
    print(
        f"docs {docs.count()} -> quality-gated {gated.count()} "
        f"-> capped {capped.count()}"
    )

    print("== 4. near-duplicate edges (MinHash-LSH, verified) ==")
    edges = minhash_verified_dup_edges(capped, "doc_id")
    print(f"verified duplicate edges: {edges.count()}")

    print("== 5. decontamination (Bloom-prefiltered, exact verify) ==")
    bench = docs.filter(F.col("source") == "src0")
    pool = capped.filter(F.col("source") != "src0")
    clean = bloom_contamination(pool, bench, "doc_id", n=3)
    print(f"pool {pool.count()} -> contamination-checked rows {clean.count()}")

    print("== 6. systematic PPS sample (token-budget mixer) ==")
    sample = pps_systematic_sample(capped, "doc_id", "n_chars", m=100)
    picks = sample.agg(F.sum("n_picks")).first()[0]
    print(f"sampled rows: {sample.count()}  total picks (exactly m): {picks}")

    spark.stop()


if __name__ == "__main__":
    main()
