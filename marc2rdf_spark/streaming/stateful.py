"""Custom stateful streaming operator: cross-micro-batch exact dedup of
an incoming document feed (first-seen wins), built on
``applyInPandasWithState``.

A streaming ingest of crawled documents re-delivers identical content
across micro-batches (re-crawls, mirrors, retry storms).  Batch-local
dedup misses re-deliveries in LATER batches; this operator keeps the
seen-fingerprint set in Spark's streaming state store, so a document's
content fingerprint admits exactly one row across the entire stream —
and across restarts, because state lives in the checkpoint.

Scale design: state is partitioned by a fingerprint PREFIX bucket, so
no single state row holds the corpus — the seen-set shards across
``16^prefix_len`` keys that the state store hash-partitions over
executors; per-group state is a fingerprint array whose size is
bounded by distinct-content per bucket.  (At 100 TB scale the state
store backend is RocksDB with changelog checkpointing; the operator
code is identical.)  The stream shuffles once, on the bucket key —
the same single-exchange shape as the batch exact-dedup groupBy
(operators/dedup.py:34).

Reference counterpart: the store's dedup-on-insert semantics
(sparql_update.rb INSERT after DELETE — re-delivered records must not
duplicate triples), lifted to the streaming-document setting.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fp", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])


def _dedup_group(
    key: tuple,
    pdfs: Iterator["pd.DataFrame"],
    state: "GroupState",
) -> Iterator["pd.DataFrame"]:
    """Emit the first-seen (doc_id, fp) per fingerprint; the seen set
    persists in the state store between micro-batches.

    All Arrow chunks for the group are concatenated BEFORE the
    sort/dedup: a group whose micro-batch spans multiple chunks must
    still resolve ties by smallest doc_id across the whole batch, not
    by chunk-arrival order — per-chunk dedup would break the documented
    "smallest doc_id wins" determinism once per-bucket batch size
    exceeds the Arrow batch size."""
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        # within-batch order: smallest doc_id wins, deterministically
        pdf = pdf.sort_values("doc_id")
        fresh = pdf[~pdf["fp"].isin(seen)].drop_duplicates(
            "fp", keep="first"
        )
        if len(fresh):
            seen.update(fresh["fp"])
            yield fresh[["doc_id", "fp"]]
    state.update((sorted(seen),))


def streaming_dedup(docs: DataFrame, prefix_len: int = 2) -> DataFrame:
    """First-seen-wins streaming dedup: (doc_id, fp) rows for documents
    whose normalized-content md5 has not appeared in any earlier
    micro-batch (or earlier in this one).  ``docs`` must be a streaming
    DataFrame with (doc_id, text); state shards by the fingerprint's
    first ``prefix_len`` hex chars."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    withfp = docs.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    ).withColumn("bucket", F.substring("fp", 1, prefix_len))
    return withfp.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark,
    docs_path: str,
    out_path: str,
    checkpoint_path: str,
    schema: str = "doc_id long, text string",
    prefix_len: int = 2,
) -> None:
    """availableNow driver: dedup all unseen files under ``docs_path``
    and append the first-seen rows to ``out_path`` parquet; re-running
    resumes from the checkpoint with the seen-set intact, so content
    already admitted in a previous invocation stays suppressed."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_path)
    )
    deduped = streaming_dedup(stream, prefix_len=prefix_len)
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
