"""Table-ref dispatch seam (sources/catalog.py): parquet paths resolve
in the sandbox, Iceberg catalog refs parse and fail fast without the
runtime jar (which this container does not ship)."""

import pytest

from marc2rdf_spark.sources.catalog import (
    ICEBERG_PREFIX,
    iceberg_available,
    is_table_ref,
    read_table,
    table_identifier,
    write_table,
)


def test_ref_classification():
    assert not is_table_ref("/data/web_pages")
    assert not is_table_ref("s3://bucket/web_pages")
    assert is_table_ref("iceberg:cat.crawl.web_pages")
    assert is_table_ref("table:spark_catalog.db.t")


def test_identifier_stripping():
    assert table_identifier("iceberg:cat.crawl.web_pages") == (
        "cat.crawl.web_pages"
    )
    assert table_identifier("table:db.t") == "db.t"
    with pytest.raises(ValueError):
        table_identifier("/plain/path")


def test_parquet_roundtrip_and_partitioning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id int, k string, v int"
    )
    out = str(tmp_path / "t")
    write_table(df, out, mode="overwrite", partition_by=["k"])
    back = read_table(spark, out)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]
    # partitionBy materialized as directory partitions
    assert (tmp_path / "t" / "k=a").exists()
    # append through the same seam
    write_table(df.filter("id = 1"), out, mode="append", partition_by=["k"])
    assert read_table(spark, out).count() == 4


def test_iceberg_ref_fails_fast_without_runtime(spark):
    assert not iceberg_available(spark)  # no jar in this container
    with pytest.raises(RuntimeError, match="--packages"):
        read_table(spark, ICEBERG_PREFIX + "cat.db.web_pages")


def test_session_catalog_table_ref(spark, tmp_path):
    """table: refs resolve through the session catalog — the same code
    path an Iceberg catalog identifier takes on a real cluster."""
    spark.createDataFrame([(1, "x")], "id int, s string").createOrReplaceTempView(
        "catalog_seam_probe"
    )
    got = read_table(spark, "table:catalog_seam_probe").collect()
    assert [(r.id, r.s) for r in got] == [(1, "x")]
