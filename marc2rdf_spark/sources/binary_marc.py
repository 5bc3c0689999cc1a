"""Binary ISO 2709 source (SURVEY.md S1; reference MARC::ForgivingReader,
/root/reference/marc2rdf.rb:50).

Files are read with Spark's binaryFile source (splittable per file; at
scale, many small .mrc files parallelize naturally), then parsed in one
Arrow pass: the ISO 2709 leader/directory parse is pure string slicing
(marc.parse_iso2709), forgiving of bad records."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..marc import parse_iso2709, record_to_dict, record_to_xml
from ..schema import RECORDS_SCHEMA


def read_binary_marc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ISO 2709 files -> records DF (url = file path,
    record_xml = canonical serialization of the parsed record)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, xmls, recs = [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_iso2709(bytes(content)):
                    urls.append(p)
                    xmls.append(record_to_xml(rec))
                    recs.append(record_to_dict(rec))
            yield pd.DataFrame({"url": urls, "record_xml": xmls, "record": recs})

    return files.mapInPandas(worker, schema=RECORDS_SCHEMA)
