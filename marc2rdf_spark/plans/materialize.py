"""Resumable three-stage materialization (SURVEY.md §7 step 6; raw
staging zone per S5):

 stage "extract":     pages bucketed by url-hash -> raw RECORDS
                      (url, record_xml, parsed struct) — the
                      pre-conversion replay zone (the reference stages
                      raw harvest XML to db/converted/full/*.xml and
                      replays it, scheduler.rb:477-485,
                      oaiclient.rb:112-124).  Keyed by ``extract_id`` so
                      a mapping change replays conversion WITHOUT
                      re-running the Arrow extract stage.
 stage "convert":     raw records -> raw triples, written
                      partitionBy(bucket) with dynamic partition
                      overwrite; lineage row per bucket.
 stage "materialize": raw triples re-bucketed by triple-hash (so global
                      dedup is bucket-local => exactly-once semantics),
                      dropDuplicates within bucket, written
                      partitionBy(bucket); lineage row per bucket.

Kill the job at any point and re-run with the same run_id: done buckets
are skipped, partial buckets are overwritten — the final triple set is
identical (tests/test_resume.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compiler import MappingCompiler
from ..config import Library, Mapping
from ..sources.extract import extract_and_parse
from .lineage import LineageLog
from .pipeline import TRIPLE_COLS, load_mapping

EXTRACT_STAGE = "extract"
RAW_STAGE = "convert"
FINAL_STAGE = "materialize"


def _with_bucket(df: DataFrame, cols: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")
    )


def _overwrite_partitions(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    mapping: Mapping | str = "skeleton",
    library: Library | None = None,
    n_buckets: int = 32,
    extract_id: str | None = None,
) -> DataFrame:
    """Execute (or resume) the extract+convert+materialize stages;
    returns the final deduplicated triples DF.

    ``extract_id`` keys the raw-records staging zone (defaults to
    run_id).  To replay a mapping change without re-extraction, pass a
    NEW run_id with the ORIGINAL run's extract_id — the staged records
    parquet is reused and only convert+materialize re-run."""
    if isinstance(mapping, str):
        mapping = load_mapping(mapping)
    library = library or Library()
    extract_id = extract_id or run_id
    lineage = LineageLog(spark, f"{out_dir}/_lineage")
    # staging zone keyed BY PATH per extract_id (not just in lineage):
    # two runs with different extract_ids in one out_dir must not mix
    # staged buckets (dynamic partition overwrite would leave the other
    # run's buckets in place and convert would read the union)
    records_path = f"{out_dir}/raw_records/{extract_id}"
    raw_path = f"{out_dir}/raw_triples"
    final_path = f"{out_dir}/triples"

    # ---- stage 0: extract (raw pre-conversion staging zone, S5) --------
    done0 = lineage.done_buckets(extract_id, EXTRACT_STAGE)
    pages_b = _with_bucket(pages, ["url"], n_buckets)
    todo0 = pages_b.filter(
        ~F.col("bucket").isin(list(done0)) if done0 else F.lit(True)
    )
    if todo0.limit(1).count() > 0:
        records = extract_and_parse(todo0.drop("bucket"))
        records_b = _with_bucket(records, ["url"], n_buckets)
        records_b = records_b.localCheckpoint(eager=True)
        _overwrite_partitions(records_b, records_path)
        counts0 = (
            records_b.groupBy("bucket")
            .agg(
                F.countDistinct("url").alias("input_rows"),
                F.count("*").alias("output_triples"),
            )
            .select(
                F.col("bucket").alias("partition_id"),
                "input_rows",
                "output_triples",
            )
        )
        lineage.append(extract_id, EXTRACT_STAGE, counts0)

    # ---- stage 1: convert (bucketed by url hash) -----------------------
    done = lineage.done_buckets(run_id, RAW_STAGE)
    from pyspark.errors import AnalysisException

    try:
        raw_records = spark.read.parquet(records_path)
    except AnalysisException as e:  # PATH_NOT_FOUND
        raise FileNotFoundError(
            f"no staged records for extract_id={extract_id!r} under "
            f"{out_dir}/raw_records/ — a replay must reference an "
            "extract_id whose extract stage ran in this out_dir"
        ) from e
    todo = raw_records.filter(
        ~F.col("bucket").isin(list(done)) if done else F.lit(True)
    )
    if todo.limit(1).count() > 0:
        # cache_records: the hybrid plan's two branches would otherwise
        # re-read the staged records twice inside this checkpoint job
        triples = MappingCompiler(mapping, library).convert(
            todo.drop("bucket"), cache_records=True
        )
        triples_b = _with_bucket(triples, ["url"], n_buckets).select(
            *TRIPLE_COLS, "url", "bucket"
        )
        triples_b = triples_b.localCheckpoint(eager=True)  # compute once
        _overwrite_partitions(triples_b, raw_path)
        counts = (
            triples_b.groupBy("bucket")
            .agg(
                F.countDistinct("url").alias("input_rows"),
                F.count("*").alias("output_triples"),
            )
            .select(
                F.col("bucket").alias("partition_id"),
                "input_rows",
                "output_triples",
            )
        )
        lineage.append(run_id, RAW_STAGE, counts)

    # ---- stage 2: materialize (global dedup via triple-hash buckets) ---
    raw = spark.read.parquet(raw_path)
    done2 = lineage.done_buckets(run_id, FINAL_STAGE)
    deduped = (
        _with_bucket(raw.drop("bucket"), TRIPLE_COLS, n_buckets)
        .dropDuplicates(TRIPLE_COLS + ["bucket"])
        .select(*TRIPLE_COLS, "bucket")
    )
    todo2 = deduped.filter(
        ~F.col("bucket").isin(list(done2)) if done2 else F.lit(True)
    )
    if todo2.limit(1).count() > 0:
        todo2 = todo2.localCheckpoint(eager=True)
        _overwrite_partitions(todo2, final_path)
        counts2 = (
            todo2.groupBy("bucket")
            .agg(F.count("*").alias("output_triples"))
            .select(
                F.col("bucket").alias("partition_id"),
                F.lit(None).cast("long").alias("input_rows"),
                "output_triples",
            )
        )
        lineage.append(run_id, FINAL_STAGE, counts2)

    return spark.read.parquet(final_path).select(*TRIPLE_COLS)
