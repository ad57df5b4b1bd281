"""Dump .explain("formatted") for registry queries into plans/<round>/ 
(SPARK_GRAFT_PLANS_ROUND, default r14).

Usage: python scripts/dump_plans.py <suffix> [name ...]

Writes plans/r13/<query>_<suffix>.txt for each named registry query
(default: the seven headline queries plus the corpus-tier operators the
optimization round touches). Two sessions mirror bench.py's profiles:
the headline queries under the latency profile (AQE off, shuffle=8),
everything else under prod (AQE on, env-sized shuffle).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nt_data_pipelines_spark import plans  # noqa: E402
from nt_data_pipelines_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "w1_pct_change",
    "w2_rolling_sum21",
    "a5_zscore_global",
    "a6_equal_weight_benchmark",
    "j2_shipping_priority",
    "r2_pivot_event_type",
    "o3_topk_dates",
]

# corpus/dedup-tier operator compositions benched by bench.py's corpus
# block — captured through their registry twins where one exists, and
# directly otherwise (see _extra below).
EXTRA = [
    "d_minhash_lsh",
    "d_lsh_verified_dedup",
    "d_exact_dedup",
    "w4_ewma_halflife",
    "w6_rolling_regression",
]


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE + EXTRA
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (Path(__file__).resolve().parents[1] / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(
        "dump_plans",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        if n not in plans.REGISTRY:
            print(f"skip {n}: not in registry")
            continue
        df = plans.REGISTRY[n].fn(spark, sf_dir)
        txt = _explain_str(df)
        p = out_dir / f"{n}_{suffix}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({txt.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
