"""Canonical schemas (SURVEY.md §1.1).

All stages exchange these shapes; nested arrays because MARC tags AND
subfield codes repeat (reference fixture spec/example.normarc.xml:57-61).
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint — authoritative input shape.
WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SUBFIELD_STRUCT = T.StructType(
    [
        T.StructField("code", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

CONTROLFIELD_STRUCT = T.StructType(
    [
        T.StructField("tag", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

DATAFIELD_STRUCT = T.StructType(
    [
        T.StructField("tag", T.StringType(), True),
        T.StructField("ind1", T.StringType(), True),
        T.StructField("ind2", T.StringType(), True),
        T.StructField("subfields", T.ArrayType(SUBFIELD_STRUCT), True),
    ]
)

RECORD_STRUCT = T.StructType(
    [
        T.StructField("leader", T.StringType(), True),
        T.StructField("controlfields", T.ArrayType(CONTROLFIELD_STRUCT), True),
        T.StructField("datafields", T.ArrayType(DATAFIELD_STRUCT), True),
    ]
)

# url-keyed record rows: the output of extract+parse, input to the compiler.
RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("record_xml", T.StringType(), True),  # byte-identical
        T.StructField("record", RECORD_STRUCT, True),
    ]
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("obj_is_uri", T.BooleanType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("dtype", T.StringType(), True),
    ]
)

TRIPLE_STRUCT_DDL = (
    "struct<subj:string,pred:string,obj:string,"
    "obj_is_uri:boolean,lang:string,dtype:string>"
)
TRIPLE_ARRAY_DDL = f"array<{TRIPLE_STRUCT_DDL}>"

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType(), True),
        T.StructField("output_triples", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)
