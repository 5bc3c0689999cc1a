"""OAI-PMH harvest-response parity against the reference's own fixture
and spec expectations (spec/oaiclient_spec.rb over
spec/example.oairesponse.xml): record count, resumption token, header
identifiers, deleted status, and MARCXML-to-triples conversion of a
harvested record.  Every asserted value is reference-authored."""

import pytest
from pyspark.sql import functions as F

FIXTURE = "/root/reference/spec/example.oairesponse.xml"


@pytest.fixture(scope="module")
def oai_text():
    with open(FIXTURE, encoding="utf-8") as f:
        return f.read()


def test_oai_response_record_count(oai_text):
    """oaiclient_spec.rb:29-31 — response.count == 12 (deleted-header
    envelopes included, as in the reference's OAIResponse)."""
    from marc2rdf_spark.marc import find_record_strings

    assert len(find_record_strings(oai_text)) == 12


def test_oai_record_blocks_are_balanced_xml(oai_text):
    """The backreferenced record regex must keep a nested
    <marcxchange:record> inside its outer OAI <record> envelope —
    every extracted block parses as XML and the metadata-bearing ones
    surface their MARC fields (oaiclient.rb:62-66 response metadata)."""
    from marc2rdf_spark.marc import find_record_strings, parse_record_xml

    blocks = find_record_strings(oai_text)
    parsed = [parse_record_xml(b) for b in blocks]
    with_fields = [r for r in parsed if r.fields]
    assert len(with_fields) == 10  # 12 minus the two deleted envelopes
    # oaiclient_spec.rb:37-39: first record's id is 103215 — and the
    # envelope descent finds its 001 controlfield
    assert parsed[0].first_value("001") == "103215"


def test_oai_envelope_columns(spark, oai_text):
    """parse_oai_envelope: per-record header fields + response token as
    pure Column regex (oaiclient_spec.rb:25-44)."""
    from marc2rdf_spark.schema import WEB_PAGES_SCHEMA
    from marc2rdf_spark.streaming.incremental import parse_oai_envelope

    pages = spark.createDataFrame(
        [("http://example.com/oai", None, None, oai_text, "no")],
        WEB_PAGES_SCHEMA,
    )
    rows = parse_oai_envelope(pages).collect()
    assert len(rows) == 12
    first = rows[0]
    assert first["oai_id"] == "oai:bibliofil.no:NO-2030000:103215"
    assert first["rec_id"] == "103215"                  # :37-39
    assert first["deleted"] is False                    # :41-43
    assert first["subj"] == "http://example.com/id_103215"
    # :33-35 — resumption token from the response header
    assert first["resumption_token"] == "24590-1343733244"
    assert sum(r["deleted"] for r in rows) == 2


def test_oai_metadata_converts_to_triples(spark, oai_text):
    """oaiclient_spec.rb:56-71 — converting a harvested MARCXML record
    to triples mints <http://example.com/id_103215> with the dummy
    mapping (same library config as the spec: base http://example.com/,
    prefix id_, identifier tag 001)."""
    from marc2rdf_spark.plans.pipeline import convert_pages
    from marc2rdf_spark.schema import WEB_PAGES_SCHEMA

    pages = spark.createDataFrame(
        [("http://example.com/oai", None, None, oai_text, "no")],
        WEB_PAGES_SCHEMA,
    )
    triples = convert_pages(pages, mapping="dummy")
    subjects = {
        r["subj"] for r in triples.select("subj").distinct().collect()
    }
    assert "http://example.com/id_103215" in subjects
    # one record subject per non-deleted envelope record (the mapping's
    # relation blocks additionally mint authority person nodes)
    rec_subjects = {s for s in subjects if s.startswith("http://example.com/id_")}
    assert len(rec_subjects) == 10


def test_same_prefix_nested_record_rebalanced():
    """A provider emitting BOTH the OAI envelope <record> and the
    nested MARC record unprefixed (default-xmlns at each level — valid
    and common) must yield ONE balanced outer fragment, not a
    malformed one that stops at the inner </record>."""
    from marc2rdf_spark.marc import find_record_strings, parse_record_xml

    env = (
        "<OAI-PMH xmlns='http://www.openarchives.org/OAI/2.0/'>"
        "<ListRecords>"
        "<record><header><identifier>oai:x:1</identifier></header>"
        "<metadata>"
        "<record xmlns='info:lc/xmlns/marcxchange-v1'>"
        "<leader>00000nam</leader>"
        "<controlfield tag='001'>111</controlfield>"
        "</record>"
        "</metadata></record>"
        "<record><header><identifier>oai:x:2</identifier></header>"
        "<metadata>"
        "<record xmlns='info:lc/xmlns/marcxchange-v1'>"
        "<controlfield tag='001'>222</controlfield>"
        "</record>"
        "</metadata></record>"
        "</ListRecords></OAI-PMH>"
    )
    blocks = find_record_strings(env)
    assert len(blocks) == 2
    for block, ident in zip(blocks, ("111", "222")):
        # balanced: parses, and descends to the inner MARC record
        rec = parse_record_xml(block)
        assert rec.first_value("001") == ident


def test_unbalanced_record_snippet_skipped_not_crashed():
    """A truncated/malformed snippet must cost one record, not the
    Arrow batch: try_parse_record_xml returns None."""
    from marc2rdf_spark.marc import try_parse_record_xml

    assert try_parse_record_xml("<record><leader>x</record></oops>") is None
    ok = try_parse_record_xml(
        "<record><controlfield tag='001'>9</controlfield></record>"
    )
    assert ok is not None and ok.first_value("001") == "9"


def test_self_closing_record_does_not_swallow_next():
    """A self-closing <record .../> needs no close tag: counting it as
    an open would extend the balance scan past the true close and
    silently swallow the NEXT record (review r4 finding)."""
    from marc2rdf_spark.marc import find_record_strings, parse_record_xml

    env = (
        "<OAI-PMH xmlns='http://www.openarchives.org/OAI/2.0/'>"
        "<ListRecords>"
        "<record><header status='deleted'>"
        "<identifier>oai:x:1</identifier></header>"
        "<metadata>"
        "<record xmlns='info:lc/xmlns/marcxchange-v1' />"
        "</metadata></record>"
        "<record><header><identifier>oai:x:2</identifier></header>"
        "<metadata>"
        "<record xmlns='info:lc/xmlns/marcxchange-v1'>"
        "<controlfield tag='001'>222</controlfield>"
        "</record>"
        "</metadata></record>"
        "</ListRecords></OAI-PMH>"
    )
    blocks = find_record_strings(env)
    assert len(blocks) == 2
    assert parse_record_xml(blocks[1]).first_value("001") == "222"
