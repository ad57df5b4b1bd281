"""Lakehouse catalog: named parquet tables with primary-key upsert.

Reproduces the reference's bear-lake storage contract (SURVEY.md §1.1;
reference calls at e.g. stock_prices_flow.py:99-121):

- ``create(name, schema, partition_keys, primary_keys, mode)`` with
  ``mode`` in {"replace", "skip"}
- ``insert(name, df, mode="append")``
- ``optimize(name)`` — compact + dedupe on primary keys, last write
  wins (the commented-out ClickHouse variant in the reference spells
  the semantics out: ReplacingMergeTree ORDER BY pk + OPTIMIZE FINAL,
  stock_prices_yfinance_flow.py:128-148)
- ``table(name)`` / ``query(fn)`` — lazy scans composing with the
  DataFrame API

Spark-first design:

- storage is plain parquet + ``partitionBy(*partition_keys)`` so
  Catalyst prunes partitions on filter;
- every insert stamps a monotonically increasing ``_ingest_seq`` so
  optimize's last-write-wins tie-break is deterministic (SURVEY §7.4);
- optimize = one window (``row_number() over (partition by pk order
  by _ingest_seq desc) = 1``) and rewrites ONLY the partitions that
  contain duplicate keys — at 100 TB you compact the handful of
  partitions an incremental load touched, not the table;
- metadata is a JSON sidecar per database directory (on a cluster
  this would be a metastore; the contract is identical).

On object stores the rewrite would stage new files then swap a
manifest; locally we stage to a temp dir and atomically rename.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

INGEST_COL = "_ingest_seq"


@dataclass
class TableMeta:
    name: str
    schema_json: str
    partition_keys: list[str] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)

    @property
    def struct(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "_catalog.json")
        self._state = self._load()

    # ---- metadata ----
    def _load(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"tables": {}, "next_seq": 1}

    def _save(self) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=2)
        os.replace(tmp, self._meta_path)

    def _meta(self, name: str) -> TableMeta:
        raw = self._state["tables"].get(name)
        if raw is None:
            raise KeyError(f"table {name!r} does not exist")
        return TableMeta(**raw)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return name in self._state["tables"]

    def list_tables(self) -> list[str]:
        return sorted(self._state["tables"])

    # ---- DDL ----
    def create(
        self,
        name: str,
        schema: T.StructType,
        partition_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        mode: str = "skip",
    ) -> None:
        """mode="replace": drop + recreate; mode="skip": create if absent."""
        if mode not in ("replace", "skip"):
            raise ValueError(f"mode must be replace|skip, got {mode!r}")
        if self.exists(name):
            if mode == "skip":
                return
            shutil.rmtree(self._path(name), ignore_errors=True)
        self._state["tables"][name] = {
            "name": name,
            "schema_json": json.dumps(schema.jsonValue()),
            "partition_keys": list(partition_keys or []),
            "primary_keys": list(primary_keys or []),
        }
        self._save()
        # materialize an empty table dir so scans of a fresh table work
        empty = self.spark.createDataFrame([], self._with_ingest(schema))
        self._write(name, empty, "overwrite")

    def drop(self, name: str) -> None:
        if self.exists(name):
            del self._state["tables"][name]
            self._save()
            shutil.rmtree(self._path(name), ignore_errors=True)

    # ---- write path ----
    @staticmethod
    def _with_ingest(schema: T.StructType) -> T.StructType:
        return T.StructType(list(schema.fields) + [T.StructField(INGEST_COL, T.LongType())])

    def _write(self, name: str, df: DataFrame, mode: str) -> None:
        meta = self._meta(name)
        writer = df.write.mode(mode)
        if meta.partition_keys:
            writer = writer.partitionBy(*meta.partition_keys)
        writer.parquet(self._path(name))
        self._refresh(name)

    def _refresh(self, name: str) -> None:
        # Spark caches parquet file listings per path; a rewrite that
        # deletes files would otherwise poison later scans in the same
        # session (FAILED_READ_FILE.FILE_NOT_EXIST).
        self.spark.catalog.refreshByPath(self._path(name))

    def insert(self, name: str, df: DataFrame, mode: str = "append") -> None:
        """Append rows; stamps a monotone _ingest_seq for upsert ordering."""
        meta = self._meta(name)
        seq = self._state["next_seq"]
        self._state["next_seq"] = seq + 1
        self._save()
        cols = [f.name for f in meta.struct.fields]
        out = df.select(*cols).withColumn(INGEST_COL, F.lit(seq).cast("long"))
        self._write(name, out, "append" if mode == "append" else "overwrite")

    def upsert(self, name: str, df: DataFrame) -> None:
        self.insert(name, df, mode="append")
        self.optimize(name)

    # ---- optimize (PK dedup, last write wins) ----
    def optimize(self, name: str) -> None:
        meta = self._meta(name)
        pks = meta.primary_keys
        if not pks:
            return
        full = self._raw_table(name)
        dup_keys = (
            full.groupBy(*pks).agg(F.count(F.lit(1)).alias("__n")).filter(F.col("__n") > 1)
        )
        if meta.partition_keys:
            # Only partitions containing duplicate PKs get rewritten.
            dirty = (
                full.join(dup_keys.select(*pks), pks, "left_semi")
                .select(*meta.partition_keys)
                .distinct()
                .collect()
            )
            if not dirty:
                return
            w = Window.partitionBy(*pks).orderBy(F.desc(INGEST_COL))
            for row in dirty:
                pred = None
                for k in meta.partition_keys:
                    c = F.col(k) == F.lit(row[k])
                    pred = c if pred is None else (pred & c)
                part = full.filter(pred)
                deduped = (
                    part.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
                self._rewrite_partition(name, meta, row, deduped)
        else:
            if not dup_keys.limit(1).count():
                return
            w = Window.partitionBy(*pks).orderBy(F.desc(INGEST_COL))
            deduped = (
                full.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            self._rewrite_table(name, deduped)

    def _rewrite_partition(self, name: str, meta: TableMeta, part_row, deduped: DataFrame):
        subdir = "/".join(f"{k}={part_row[k]}" for k in meta.partition_keys)
        final = os.path.join(self._path(name), subdir)
        staging = os.path.join(self._path(name), ".staging", subdir)
        shutil.rmtree(staging, ignore_errors=True)
        deduped.drop(*meta.partition_keys).write.mode("overwrite").parquet(staging)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        shutil.move(staging, final)
        shutil.rmtree(os.path.join(self._path(name), ".staging"), ignore_errors=True)
        self._refresh(name)

    def _rewrite_table(self, name: str, deduped: DataFrame) -> None:
        staging = self._path(name) + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        deduped.write.mode("overwrite").parquet(staging)
        shutil.rmtree(self._path(name))
        os.replace(staging, self._path(name))
        self._refresh(name)

    # ---- read path ----
    def _raw_table(self, name: str) -> DataFrame:
        meta = self._meta(name)
        df = self.spark.read.schema(self._with_ingest(meta.struct)).parquet(self._path(name))
        # partition columns come back typed by the declared schema
        return df

    def table(self, name: str) -> DataFrame:
        """Lazy scan, ingest bookkeeping hidden (the reference's bl.table).

        Acquire a fresh handle after ``optimize``/``upsert``: a
        DataFrame pins its file listing at creation, and optimize may
        rewrite (delete) files underneath it.
        """
        meta = self._meta(name)
        return self._raw_table(name).select(*[f.name for f in meta.struct.fields])

    def query(self, build) -> DataFrame:
        """reference client.query(expr): build(catalog) -> DataFrame."""
        return build(self)
