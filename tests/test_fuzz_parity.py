"""Randomized structure-fuzz parity: randomly-shaped MARC records
(repeated tags, repeated subfield codes, empty values, regex-special
and unicode content, odd indicators) converted by the Spark compiler
must equal the independent pure-Python oracle converter triple-for-
triple, for BOTH shipped mappings.  Complements the fixture-corpus
three-way parity test (test_spark_pipeline) by exploring record
structures the fixtures don't contain.  Deterministic seed; the path
goes through the binary ISO 2709 writer/reader, so it also exercises
S1 end-to-end."""

import random

from marc2rdf_spark.config import (
    SPEC_LIBRARY,
    load_dummy_mapping,
    load_skeleton_mapping,
)
from marc2rdf_spark.marc import (
    ControlField,
    DataField,
    Record,
    Subfield,
    record_to_iso2709,
)
from marc2rdf_spark.oracle.converter import convert_records

CODES = "abcdefghijx03"
TAGS = [
    "015", "019", "020", "041", "090", "100", "245", "260", "300", "440",
    "500", "600", "650", "700", "850", "245",
]
VALS = [
    "Det aller fineste", "Bache-Wiig, Anna", "82-10-04798-1", "",
    "a/b (c) [d]", "1975-", "n.", "32026400", "Ås, Bjørn", "x;y;z",
    "Nkr 269.00", "  spaced  ", "http://ex.com/x", "5", "ib.",
    # 041-shaped language strings: clean triple groups, punctuation
    # between groups (split keeps captures, strip cleans), short tails
    "nobengswe", "nob,eng. swe", "no", "NOBENG",
]


def _rand_record(rng: random.Random, i: int) -> Record:
    fields = [ControlField("001", f"F{i:06d}")]
    if rng.random() < 0.5:
        # random LENGTH too: short 008s exercise the substr guard
        # (offset+len beyond string -> no object), full-width ones
        # exercise the whole position table (offsets 21-38: audience,
        # periodica, literary format, bio content, language, script)
        fields.append(
            ControlField(
                "008",
                "".join(
                    rng.choice("abcdejnp 01")
                    for _ in range(rng.randrange(0, 41))
                ),
            )
        )
    for _ in range(rng.randrange(1, 8)):
        subs = [
            Subfield(rng.choice(CODES), rng.choice(VALS))
            for _ in range(rng.randrange(1, 5))
        ]
        fields.append(
            DataField(
                rng.choice(TAGS), rng.choice(" 012"), rng.choice(" 012"), subs
            )
        )
    return Record(leader=" " * 24, fields=fields)


def test_random_records_spark_equals_oracle(spark, tmp_path):
    rng = random.Random(20260817)
    records = [_rand_record(rng, i) for i in range(60)]
    path = tmp_path / "fuzz.mrc"
    path.write_bytes(b"".join(record_to_iso2709(r) for r in records))

    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.sources.binary_marc import read_binary_marc

    records_df = read_binary_marc(spark, str(path))
    assert records_df.count() == len(records)
    for mapping in (load_dummy_mapping(), load_skeleton_mapping()):
        comp = MappingCompiler(mapping, SPEC_LIBRARY)
        spark_t = {
            tuple(r)
            for r in comp.convert(records_df)
            .select("subj", "pred", "obj", "obj_is_uri", "lang", "dtype")
            .collect()
        }
        oracle_t = {
            (t.subj, t.pred, t.obj, t.obj_is_uri, t.lang, t.dtype)
            for t in convert_records(records, mapping, SPEC_LIBRARY)
        }
        assert spark_t == oracle_t
        assert spark_t  # non-vacuous


# round-5 widening: the FULL skeleton tag space (every rule family,
# incl. the ones first hand-pinned in test_reference_spec_scenarios'
# skeleton2 record), role codes that hit the 700 $e substitution
# table, subfield codes that trigger combine/relation/urlize paths,
# accent-rich and URL-shaped values that stress the urlize fold and
# the URI-vs-literal coercion, and indicator values covering the 082
# space sub-key.
TAGS_FULL = [
    # data-field tags only: ISO 2709 defines tags 00X as CONTROL
    # fields, so a DataField("008", ...) is malformed MARC — the byte
    # round-trip (correctly) re-reads it as a control field and the
    # oracle/Spark inputs would differ by construction.  001/008 are
    # exercised as ControlFields below.
    "015", "019", "020", "022", "025", "041", "082",
    "090", "092", "099", "100", "110", "111", "130", "240", "245",
    "246", "250", "260", "300", "440", "503", "505", "520", "521",
    "546", "571", "580", "590", "592", "595", "599", "600", "610",
    "611", "630", "650", "651", "652", "653", "655", "690", "691",
    "692", "693", "694", "695", "699", "700", "710", "711", "730",
    "740", "760", "780", "785", "850", "856",
]
CODES_FULL = "abcdefghjnpqtuvwx013"
VALS_FULL = VALS + [
    "overs", "dir", "red", "forf", "ukjent",
    "Ærlig, Øystein", "ÅSE-grünn", "café au lait",
    "Se: http://Ex.org/Thing?id=1", "http://ex.org/ok",
    "(NO-TrBIB)12-34", "Del 1.", "312 s.", "[1997?]",
    "Tittel : undertittel /", "A. B; c,", "2. utg.",
]


def test_full_skeleton_tagspace_spark_equals_oracle(spark, tmp_path):
    rng = random.Random(20260818)
    records = []
    for i in range(80):
        fields = [ControlField("001", f"G{i:06d}")]
        if rng.random() < 0.4:
            fields.append(
                ControlField(
                    "008",
                    "".join(
                        rng.choice("abcdejnp 01")
                        for _ in range(rng.randrange(0, 41))
                    ),
                )
            )
        for _ in range(rng.randrange(2, 9)):
            subs = [
                Subfield(rng.choice(CODES_FULL), rng.choice(VALS_FULL))
                for _ in range(rng.randrange(1, 6))
            ]
            fields.append(
                DataField(
                    rng.choice(TAGS_FULL),
                    rng.choice(" 0123"),
                    rng.choice(" 0123"),
                    subs,
                )
            )
        records.append(Record(leader=" " * 24, fields=fields))
    path = tmp_path / "fuzz_full.mrc"
    path.write_bytes(b"".join(record_to_iso2709(r) for r in records))

    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.sources.binary_marc import read_binary_marc

    records_df = read_binary_marc(spark, str(path))
    assert records_df.count() == len(records)
    comp = MappingCompiler(load_skeleton_mapping(), SPEC_LIBRARY)
    spark_t = {
        tuple(r)
        for r in comp.convert(records_df)
        .select("subj", "pred", "obj", "obj_is_uri", "lang", "dtype")
        .collect()
    }
    oracle_t = {
        (t.subj, t.pred, t.obj, t.obj_is_uri, t.lang, t.dtype)
        for t in convert_records(
            records, load_skeleton_mapping(), SPEC_LIBRARY
        )
    }
    assert spark_t == oracle_t
    # non-vacuous: the tag space really fired (the SET dedup collapses
    # the heavily-repeated value pool, so hundreds, not thousands)
    assert len(spark_t) > 400


def test_full_tagspace_xml_route_spark_equals_oracle(spark):
    """Same full-tag-space fuzz through the MARCXML route: records
    serialized to MARCXML, embedded in web pages, extracted by the
    Arrow `extract_and_parse` pass (S2/S3), converted by the Spark
    compiler — still triple-identical to the oracle on the original
    Record objects."""
    import datetime as dt

    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.marc import record_to_xml
    from marc2rdf_spark.schema import WEB_PAGES_SCHEMA
    from marc2rdf_spark.sources.extract import extract_and_parse

    rng = random.Random(20260819)
    records = []
    for i in range(40):
        fields = [ControlField("001", f"X{i:06d}")]
        if rng.random() < 0.4:
            fields.append(
                ControlField(
                    "008",
                    "".join(
                        rng.choice("abcdejnp 01")
                        for _ in range(rng.randrange(0, 41))
                    ),
                )
            )
        for _ in range(rng.randrange(2, 9)):
            subs = [
                Subfield(rng.choice(CODES_FULL), rng.choice(VALS_FULL))
                for _ in range(rng.randrange(1, 6))
            ]
            fields.append(
                DataField(
                    rng.choice(TAGS_FULL),
                    rng.choice(" 0123"),
                    rng.choice(" 0123"),
                    subs,
                )
            )
        records.append(Record(leader=" " * 24, fields=fields))

    pages = spark.createDataFrame(
        [
            (
                f"http://crawl.example/fz{i}",
                dt.datetime(2020, 1, 1),
                None,
                "<html>" + record_to_xml(r) + "</html>",
                None,
            )
            for i, r in enumerate(records)
        ],
        WEB_PAGES_SCHEMA,
    )
    comp = MappingCompiler(load_skeleton_mapping(), SPEC_LIBRARY)
    spark_t = {
        tuple(r)
        for r in comp.convert(extract_and_parse(pages))
        .select("subj", "pred", "obj", "obj_is_uri", "lang", "dtype")
        .collect()
    }
    oracle_t = {
        (t.subj, t.pred, t.obj, t.obj_is_uri, t.lang, t.dtype)
        for t in convert_records(
            records, load_skeleton_mapping(), SPEC_LIBRARY
        )
    }
    assert spark_t == oracle_t
    assert len(spark_t) >= 200
