"""Quickstart: the engine end to end on the synthetic fixtures.

Run: python examples/quickstart.py  (~2 min on local[32])

Builds a lakehouse in /tmp, ingests the hermetic reference-domain
fixtures, runs the full nightly DAG, queries it through the Engine
accessor API and SQL, executes the trading loop against a recording
broker, and prints a dedup + ANN demo over the driver testdata.
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from nt_data_pipelines_spark.api import Engine
from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.operators.dedup import minhash_lsh_candidates
from nt_data_pipelines_spark.operators.similarity import brute_force_topk
from nt_data_pipelines_spark.pipelines.runner import backfill_flow, ensure_tables
from nt_data_pipelines_spark.pipelines.trading import trading_daily_flow
from nt_data_pipelines_spark.session import get_spark
from nt_data_pipelines_spark.sinks import RecordingBroker, RecordingMessageSink
from nt_data_pipelines_spark.sources import synthetic as S
from nt_data_pipelines_spark.sources.broker import SyntheticBroker
from nt_data_pipelines_spark.sources.testdata import load_table


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, f"{tmp}/lake")
        ensure_tables(cat)
        print("== ingest fixtures ==")
        cat.upsert("calendar", S.load_calendar(spark, 300))
        cat.upsert("universe", S.load_universe(spark, 300))
        cat.upsert("stock_prices", S.load_stock_prices(spark, 300))
        cat.upsert("etf_prices", S.load_etf_prices(spark, 300))

        print("== nightly DAG (backfill) ==")
        backfill_flow(spark, cat, window=120, half_life=20.0)

        engine = Engine(cat)
        end = engine.get_last_market_date()
        start = end - dt.timedelta(days=30)
        print("last market date:", end)
        print("alphas sample:")
        engine.get_alphas(start, end).show(3, truncate=False)
        print("SQL surface:")
        engine.sql(
            "SELECT date, SUM(weight) AS total FROM portfolio_weights "
            "GROUP BY date ORDER BY date DESC LIMIT 3"
        ).show()

        print("== trading loop ==")

        class Broker(SyntheticBroker, RecordingBroker):
            def __init__(self):
                SyntheticBroker.__init__(self, equity=1_000_000.0, holdings=[("T00", 40_000.0)])
                RecordingBroker.__init__(self)

        broker, slack = Broker(), RecordingMessageSink()
        # trade ON the last fixture market date (end+1 may be a
        # weekend, which the market-open gate correctly skips)
        result = trading_daily_flow(cat, broker, slack, today=end)
        if result["ran"]:
            print("orders placed:", result["orders"], "| closed:", result["closed"])
            print(result["summary"])
        else:
            print("trading skipped:", result["reason"])

    print("== training-data ops on driver testdata ==")
    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    cands = minhash_lsh_candidates(docs, "doc_id", "text")
    print("minhash-lsh candidate pairs:", cands.count())
    emb = load_table(spark, sf, "embeddings")
    top = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    top.show()

    print("== corpus curation pipeline ==")
    from nt_data_pipelines_spark.pipelines.corpus import CurationConfig, curate_corpus

    packed, accounting = curate_corpus(
        docs, config=CurationConfig(min_words=5, max_dup_ngram_frac=0.95)
    )
    accounting.show()
    print("packed training bins:", packed.select("shard", "bin_id").distinct().count())


if __name__ == "__main__":
    main()
