"""Operator library: pure DataFrame -> DataFrame functions.

Each module covers one operator family from SURVEY.md §2:

- :mod:`windows` — lag/pct-change, gated rolling sum/std/cov,
  z-scores, partition counts (W1-W3, W5, W8, A5, A6)
- :mod:`ewma` — exact Polars-semantics EWMA via applyInPandas (W4)
- :mod:`rolling_ols` — per-key rolling OLS via applyInPandas (W6)
- :mod:`dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine deduplication (training-data ops)
- :mod:`similarity` — brute-force and LSH-bucketed cosine top-k
- :mod:`ivf` — deterministic k-means coarse quantizer + cell-probe ANN
- :mod:`skew` — salted joins / two-phase aggregation for hot keys
- :mod:`text` — language-ID, quality scoring, token counting,
  fingerprinting
- :mod:`multimodal` — binary-column plumbing with stubbed decoders
- :mod:`portfolio` — covariance assembly + QP weights (U3)

Reshaping (R2-R4 pivot/unpivot/explode) is expressed directly with
the built-in DataFrame API at call sites (pipelines/factor_model.py,
plans/relational.py) — Spark's primitives are already the operator.
"""
