"""Table-reference dispatch: one IO seam for parquet paths and Iceberg
catalog tables.

The north rule runs this pipeline "over Iceberg tables of
Common-Crawl-style web pages"; the sandbox has no Iceberg runtime jar,
so every job in this repo reads/writes parquet paths.  This module is
the single seam where that difference lives: a *table ref* is either

  ``/data/web_pages``                  -> parquet path (sandbox, tests)
  ``iceberg:my_cat.crawl.web_pages``   -> Iceberg catalog identifier
  ``table:any.catalog.table``          -> whatever format the session
                                          catalog resolves (Iceberg,
                                          Delta, Hive...)

so ``spark-submit ... --pages iceberg:cat.crawl.web_pages`` works
unchanged on a real cluster (with ``--packages
org.apache.iceberg:iceberg-spark-runtime-...`` and a configured
``spark.sql.catalog.<name>``) while the sandbox keeps exercising the
identical plan through parquet.  Reference counterpart: the reference's
single storage seam is its SPARQL endpoint config
(``config/init.rb:19-27``); this is the Spark-native equivalent.

Catalog-table reads are *better* than path reads at 10^12-doc scale —
Iceberg gives snapshot isolation for the incremental reader
(``streaming/incremental.py`` consumes ``warc_ts`` windows; with a
catalog ref those become metadata-pruned snapshot range scans instead
of full listings), hidden-partition pruning on ``days(warc_ts)``, and
MERGE for the store upsert (``operators/store.py`` implements the
same last-write-wins semantics as a join today).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"
TABLE_PREFIX = "table:"


def is_table_ref(ref: str) -> bool:
    """True when ``ref`` names a catalog table rather than a path."""
    return ref.startswith((ICEBERG_PREFIX, TABLE_PREFIX))


def table_identifier(ref: str) -> str:
    """Strip the dispatch prefix from a catalog table ref."""
    for p in (ICEBERG_PREFIX, TABLE_PREFIX):
        if ref.startswith(p):
            return ref[len(p):]
    raise ValueError(f"not a catalog table ref: {ref!r}")


def iceberg_available(spark: SparkSession) -> bool:
    """Whether the Iceberg Spark runtime is on the session classpath.

    Cheap, side-effect-free probe; jobs use it to fail fast with an
    actionable message instead of an opaque ClassNotFoundException
    twenty stages in.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a table ref: catalog identifier via the session catalog
    (Iceberg/Delta/Hive — resolved by the configured catalog plugins,
    which is what makes snapshot/metadata pruning kick in), plain path
    via the parquet source."""
    if is_table_ref(ref):
        if ref.startswith(ICEBERG_PREFIX) and not iceberg_available(spark):
            raise RuntimeError(
                f"{ref!r} needs the Iceberg runtime on the classpath: "
                "spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<ver> and a "
                "spark.sql.catalog.<name> config"
            )
        return spark.read.table(table_identifier(ref))
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write to a table ref.

    Catalog refs use the DataFrameWriterV2 API (``writeTo``): append
    or createOrReplace — atomic snapshot commits on Iceberg, which is
    exactly the property the resumable materializer's
    overwrite-by-partition relies on (``plans/materialize.py``:
    dynamic partition overwrite on parquet today, REPLACE WHERE on a
    catalog table).  Path refs keep the sandbox parquet behavior.
    """
    if is_table_ref(ref):
        ident = table_identifier(ref)
        w = df.writeTo(ident)
        if ref.startswith(ICEBERG_PREFIX):
            w = w.using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            # append to an existing table; create it on first write
            try:
                w.append()
            except Exception:
                w.create()
        elif mode == "overwrite":
            w.createOrReplace()
        else:
            raise ValueError(f"unsupported mode for table ref: {mode!r}")
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)
