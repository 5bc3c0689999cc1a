"""Cross-micro-batch stateful streaming dedup
(streaming/stateful.py, applyInPandasWithState): re-delivered content
must be suppressed across batches AND across restarts (state lives in
the checkpoint)."""

import os

import pytest


def _write_docs(spark, path, rows, fname):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(path)
    del fname  # parquet names its own files; arg kept for call-site clarity


@pytest.mark.usefixtures("spark")
def test_streaming_dedup_across_batches_and_restarts(spark, tmp_path):
    from marc2rdf_spark.streaming.stateful import run_streaming_dedup

    docs = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: two docs, one duplicated content within the batch
    _write_docs(
        spark,
        docs,
        [(1, "alpha beta"), (2, "gamma"), (3, "Alpha  BETA")],  # 3 dups 1
        "b1",
    )
    run_streaming_dedup(spark, docs, out, ckpt)
    got1 = {
        (r.doc_id, r.fp) for r in spark.read.parquet(out).collect()
    }
    assert {d for d, _ in got1} == {1, 2}  # first-seen wins, 3 suppressed

    # run 2 (restart): one re-delivery of run-1 content + one new doc.
    # The seen-set must survive the restart via the checkpointed state.
    _write_docs(
        spark,
        docs,
        [(4, "alpha beta"), (5, "delta")],
        "b2",
    )
    run_streaming_dedup(spark, docs, out, ckpt)
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 5}  # 4 suppressed by state from run 1
