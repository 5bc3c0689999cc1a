"""S1 binary ISO 2709 source (SURVEY.md §2.1; reference
MARC::ForgivingReader, marc2rdf.rb:50): writer/parser round trip plus
the Spark binaryFile-scan reader feeding the compiler."""

from marc2rdf_spark.marc import (
    find_record_strings,
    parse_iso2709,
    parse_record_xml,
    record_to_dict,
    record_to_iso2709,
)


def _fixture_records():
    with open("fixtures/example.normarc.xml", encoding="utf-8") as f:
        return [parse_record_xml(x) for x in find_record_strings(f.read())]


def test_iso2709_round_trip():
    recs = _fixture_records()
    blob = b"".join(record_to_iso2709(r) for r in recs)
    back = parse_iso2709(blob)
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        assert record_to_dict(a)["controlfields"] == \
            record_to_dict(b)["controlfields"]
        assert record_to_dict(a)["datafields"] == \
            record_to_dict(b)["datafields"]


def test_iso2709_forgiving_skips_garbage():
    recs = _fixture_records()
    blob = (
        b"garbage-without-leader\x1d"
        + record_to_iso2709(recs[0])
        + b"\x00\x01bad\x1d"
        + record_to_iso2709(recs[1])
    )
    back = parse_iso2709(blob)
    assert [r.first_value("001") for r in back] == [
        recs[0].first_value("001"), recs[1].first_value("001")
    ]


def test_read_binary_marc_to_triples(spark, tmp_path):
    """binaryFile scan -> Arrow parse -> records DF -> compiled mapping:
    triples match the same records converted via the XML path."""
    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.config import Library, load_dummy_mapping
    from marc2rdf_spark.sources.binary_marc import read_binary_marc

    recs = _fixture_records()
    half = len(recs) // 2
    (tmp_path / "a.mrc").write_bytes(
        b"".join(record_to_iso2709(r) for r in recs[:half])
    )
    (tmp_path / "b.mrc").write_bytes(
        b"".join(record_to_iso2709(r) for r in recs[half:])
    )

    records_df = read_binary_marc(spark, str(tmp_path))
    assert records_df.count() == len(recs)

    comp = MappingCompiler(load_dummy_mapping(), Library())
    spark_triples = {
        tuple(r) for r in comp.convert(records_df)
        .select("subj", "pred", "obj").collect()
    }

    from marc2rdf_spark.oracle.converter import convert_records

    oracle_triples = {
        (t.subj, t.pred, t.obj)
        for t in convert_records(recs, load_dummy_mapping(), Library())
    }
    assert spark_triples == oracle_triples


def test_iso2709_overflow_raises():
    """ISO 2709 directory slots are fixed-width; oversized fields must
    raise instead of silently corrupting offsets (ADVICE r1)."""
    import pytest

    from marc2rdf_spark.marc import (
        DataField,
        Record,
        Subfield,
        record_to_iso2709,
    )

    big = Record(
        leader=" " * 24,
        fields=[DataField("245", " ", " ", [Subfield("a", "x" * 10000)])],
    )
    with pytest.raises(ValueError, match="4 digits"):
        record_to_iso2709(big)

    many = Record(
        leader=" " * 24,
        fields=[
            DataField("650", " ", " ", [Subfield("a", "y" * 9000)])
            for _ in range(12)
        ],
    )
    with pytest.raises(ValueError, match="5-digit|5 digits"):
        record_to_iso2709(many)


# --- reference-authored binary artifact (independence evidence) -------------

def test_reference_binary_artifact_parses():
    """The reference's OWN on-disk ISO 2709 file
    (spec/example.binary.normarc.mrc — the input of
    sparql_update_spec.rb:7 and the marc2rdf.rb:50 ForgivingReader CLI
    path) parses to reference-authored expectations: 57 records, first
    record 001 = 0583095 (sparql_update_spec.rb:22 mints
    ...id_0583095 from it) with creator authority id 32026400
    (sparql_update_spec.rb:36 expects person/x32026400), and UTF-8
    content decodes ("Bjørlykke").  Unlike the round-trip tests above,
    neither the bytes nor the expected values were produced by this
    repo's code."""
    blob = open("fixtures/example.binary.normarc.mrc", "rb").read()
    recs = parse_iso2709(blob)
    assert len(recs) == 57
    assert recs[0].first_value("001") == "0583095"
    d = record_to_dict(recs[0])
    f100 = next(df for df in d["datafields"] if df["tag"] == "100")
    assert {"code": "3", "value": "32026400"} in f100["subfields"]
    assert any(
        sf["value"] == "Bjørlykke, Oskar Stein"
        for r in recs
        for df in record_to_dict(r)["datafields"]
        for sf in df["subfields"]
    )


def test_reference_binary_artifact_converts(spark):
    """End-to-end over the reference's binary artifact: binaryFile scan
    -> Arrow ISO 2709 parse -> compiled dummy mapping.  Asserts the
    subject URI + authority URI the reference's own specs pin for this
    record (sparql_update_spec.rb:22,36; rdfmodeler_spec via
    tnr_ prefix in SPEC_LIBRARY)."""
    from pyspark.sql import functions as F

    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.config import SPEC_LIBRARY, load_dummy_mapping
    from marc2rdf_spark.sources.binary_marc import read_binary_marc

    records_df = read_binary_marc(spark, "fixtures/example.binary.normarc.mrc")
    assert records_df.count() == 57

    comp = MappingCompiler(load_dummy_mapping(), SPEC_LIBRARY)
    first = records_df.filter(
        F.exists(
            F.col("record.controlfields"),
            lambda cf: (cf["tag"] == "001") & (cf["value"] == "0583095"),
        )
    )
    triples = comp.convert(first)
    s = {v for r in triples.select("subj", "pred", "obj").collect() for v in r}
    assert "http://data.deichman.no/resource/tnr_0583095" in s
    assert "http://data.deichman.no/person/x32026400" in s
