"""Per-partition lineage + metrics checkpointing (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference logs per-job counters to an append-only history JSON
(scheduler.rb:177-183,249-254); at cluster scale that becomes an
append-only lineage table: one row per (run_id, stage, partition/bucket)
with input/output counts and completion status.  A stage is resumable
because (a) its output is written with dynamic partition overwrite keyed
by a deterministic bucket column, so re-processing a bucket is
idempotent, and (b) the lineage row for a bucket is appended only after
the bucket's data is committed — on restart, buckets without a 'done'
row are recomputed and their partial output overwritten.

Sandbox implementation is parquet-append; on Iceberg the same contract
maps to MERGE + snapshot isolation."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LINEAGE_SCHEMA


class LineageLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(self.path) and any(
            f.endswith(".parquet")
            for _, _, files in os.walk(self.path)
            for f in files
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)

    def done_buckets(self, run_id: str, stage: str) -> set[int]:
        rows = (
            self.read()
            .filter(
                (F.col("run_id") == run_id)
                & (F.col("stage") == stage)
                & (F.col("status") == "done")
            )
            .select("partition_id")
            .collect()
        )
        return {r.partition_id for r in rows}

    def append(self, run_id: str, stage: str, bucket_counts: DataFrame) -> None:
        """bucket_counts: (partition_id, input_rows, output_triples)."""
        now = dt.datetime.now()
        rows = bucket_counts.select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.col("input_rows").cast("long"),
            F.col("output_triples").cast("long"),
            F.lit("done").alias("status"),
            F.lit(now).alias("updated_at"),
        )
        rows.write.mode("append").parquet(self.path)

    def metrics(self, run_id: str) -> DataFrame:
        return (
            self.read()
            .filter(F.col("run_id") == run_id)
            .groupBy("stage")
            .agg(
                F.count("*").alias("partitions_done"),
                F.sum("input_rows").alias("input_rows"),
                F.sum("output_triples").alias("output_triples"),
            )
        )
