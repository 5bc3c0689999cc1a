"""Tests for the reverse converter (A3/marcmodeler.rb), the stored-rule
engine (rule.rb) and the enrichment harvest join (batch_harvest.rb),
mirroring the reference's spec style (marcmodeler_spec.rb:50-76,
batchharvest_spec.rb:45-50)."""

import pytest
from pyspark.sql import functions as F

TRIPLE_SCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "lang string, dtype string"
)

ED = "http://example.com/id_1"
ED2 = "http://example.com/id_2"
PERSON = "http://example.com/person_1"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
BIBO_DOC = "http://purl.org/ontology/bibo/Document"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # edition 1: full manifestation (marcmodeler_spec.rb golden shape)
        (ED, RDF_TYPE, BIBO_DOC, True, None, None),
        (ED, "http://purl.org/dc/terms/identifier", "1", False, None, None),
        (ED, "http://purl.org/dc/terms/title", "Tittelen", False, "no", None),
        (ED, "http://purl.org/spar/fabio/hasSubtitle", "undertittel",
         False, "no", None),
        (ED, "http://rdvocab.info/Elements/statementOfResponsibility",
         "ved N. N.", False, None, None),
        (ED, "http://purl.org/dc/terms/creator", PERSON, True, None, None),
        (ED, "http://data.deichman.no/location_signature", "Hei", False,
         None, None),
        (ED, "http://data.deichman.no/ageLimit", "15", False, None, None),
        (ED, "http://purl.org/ontology/bibo/isbn", "82-05-30003-8", False,
         None, None),
        (PERSON, "http://def.bibsys.no/xmlns/radatana/1.0#catalogueName",
         "Navnesen, Navn", False, None, None),
        (PERSON, "http://purl.org/dc/terms/identifier", "p1", False,
         None, None),
        # edition 2: minimal (id+title only)
        (ED2, RDF_TYPE, BIBO_DOC, True, None, None),
        (ED2, "http://purl.org/dc/terms/identifier", "2", False, None, None),
        (ED2, "http://purl.org/dc/terms/title", "Bare tittel", False,
         "no", None),
        # a work without identifier -> must NOT become a record
        ("http://example.com/work_9", "http://purl.org/dc/terms/title",
         "Verket", False, "no", None),
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_manifestations_required_and_optional(triples):
    from marc2rdf_spark.operators.reverse import manifestations

    rows = {r["subj"]: r for r in manifestations(triples).collect()}
    assert set(rows) == {ED, ED2}  # work_9 lacks dc:identifier
    m = rows[ED]
    assert m["rec_id"] == "1" and m["title"] == "Tittelen"
    assert m["creator_name"] == "Navnesen, Navn"
    assert m["creator_id"] == "p1"
    assert m["age_limit"] == "15" and m["isbn"] == "82-05-30003-8"
    assert rows[ED2]["creator_name"] is None
    assert rows[ED2]["isbn"] is None


def test_compose_marc_serial_field_order(triples):
    """marcmodeler.rb:70-89: 001, 019$s, 020$a, 090$d, 100[$3,$a],
    245[$a,$b,$c,$p] composed serially; absent props skip their field."""
    from marc2rdf_spark.operators.reverse import compose_marc, manifestations

    recs = {
        r["subj"]: r["record"]
        for r in compose_marc(manifestations(triples)).collect()
    }
    r = recs[ED]
    assert [(c["tag"], c["value"]) for c in r["controlfields"]] == [("001", "1")]
    assert [f["tag"] for f in r["datafields"]] == [
        "019", "020", "090", "100", "245"
    ]
    f100 = r["datafields"][3]
    assert [(s["code"], s["value"]) for s in f100["subfields"]] == [
        ("3", "p1"), ("a", "Navnesen, Navn")
    ]
    f245 = r["datafields"][4]
    assert [(s["code"], s["value"]) for s in f245["subfields"]] == [
        ("a", "Tittelen"), ("b", "undertittel"), ("c", "ved N. N."),
        ("p", "undertittel"),
    ]
    # minimal record: only 001 + 245$a
    r2 = recs[ED2]
    assert [f["tag"] for f in r2["datafields"]] == ["245"]
    assert [(s["code"], s["value"]) for s in r2["datafields"][0]["subfields"]] \
        == [("a", "Bare tittel")]


def test_marcmodeler_spec_manifestation_golden(spark):
    """Reference-authored end-to-end golden for the reverse converter:
    triples are derived from the reference's OWN SPARQL-response fixture
    (spec/example.sparqlresponse_manifestation.json — the binding-to-
    pattern mapping is the SELECT at marcmodeler.rb:18-37), and every
    assertion value is copied verbatim from marcmodeler_spec.rb:50-76
    ("MARC record should have ..." cases).  Neither input nor expected
    output originates in this repo."""
    import json

    from marc2rdf_spark.operators.reverse import (
        BIBO_ISBN,
        DC_CREATOR,
        DC_IDENTIFIER,
        DC_TITLE,
        RADATANA_NAME,
        RDA_RESPONSIBLE,
        compose_marc,
        manifestations,
    )

    with open(
        "/root/reference/spec/example.sparqlresponse_manifestation.json",
        encoding="utf-8",
    ) as f:
        b = {
            k: v["value"]
            for k, v in json.load(f)["results"]["bindings"][0].items()
        }
    # the spec's queried subject (marcmodeler_spec.rb:20)
    subj = "http://data.deichman.no/resource/tnr_583095"
    rows = [
        (subj, DC_IDENTIFIER, b["id"], False, None, None),
        (subj, DC_TITLE, b["title"], False, None, None),
        (subj, RDA_RESPONSIBLE, b["responsible"], False, None, None),
        (subj, DC_CREATOR, b["creatorURI"], True, None, None),
        (subj, BIBO_ISBN, b["isbn"], False, None, None),
        (b["creatorURI"], RADATANA_NAME, b["creatorName"], False, None, None),
        (b["creatorURI"], DC_IDENTIFIER, b["creatorID"], False, None, None),
    ]
    triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    recs = compose_marc(manifestations(triples)).collect()
    assert len(recs) == 1
    r = recs[0]["record"]
    fields = {f["tag"]: f for f in r["datafields"]}

    def sf(tag, code):
        return next(
            s["value"] for s in fields[tag]["subfields"] if s["code"] == code
        )

    # marcmodeler_spec.rb expectations, verbatim
    assert r["controlfields"][0]["value"] == "583095"   # :50-52
    assert sf("020", "a") == "8210047981"               # :58-60
    assert sf("100", "a") == "Bache-Wiig, Anna"         # :62-64
    assert sf("100", "3") == "32026400"                 # :66-68
    assert sf("245", "a") == "Det aller fineste"        # :70-72
    assert sf("245", "c") == "Anna Bache-Wiig"          # :74-76
    # "returns nil for a non-existing resource" (:30-36): the empty
    # SPARQL response fixture => zero manifestation rows
    empty = spark.createDataFrame([], TRIPLE_SCHEMA)
    assert manifestations(empty).count() == 0


def test_to_marcxml_escapes(spark, triples):
    from marc2rdf_spark.operators.reverse import rdf_to_marc

    amp = spark.createDataFrame(
        [
            ("http://e/x", "http://purl.org/dc/terms/identifier", "9",
             False, None, None),
            ("http://e/x", "http://purl.org/dc/terms/title", "A & B <C>",
             False, None, None),
        ],
        TRIPLE_SCHEMA,
    )
    xml = rdf_to_marc(amp).collect()[0]["marcxml"]
    assert '<controlfield tag="001">9</controlfield>' in xml
    assert "A &amp; B &lt;C&gt;" in xml


def test_rule_engine_localize_and_run(spark, triples):
    from marc2rdf_spark.config import Library
    from marc2rdf_spark.operators.rules import (
        EXAMPLE_GLOBAL_RULE,
        Rule,
        localize,
        run_rule,
        run_rules_engine,
    )

    # placeholder substitution (rule.rb:80-93)
    r = Rule(id="x", name="x", script="SELECT * FROM DEFAULT_GRAPH WHERE "
             "obj = DEFAULT_PREFIX.Document")
    lr = localize(r, Library(base="http://b/"), view="t")
    assert "FROM t" in lr.script and "'http://b/Document'" in lr.script

    out = run_rule(spark, triples, EXAMPLE_GLOBAL_RULE)
    got = {(r["subj"], r["title"]) for r in out.collect()}
    assert got == {(ED, "Tittelen"), (ED2, "Bare tittel")}

    results = run_rules_engine(spark, triples, [EXAMPLE_GLOBAL_RULE])
    assert results[0][1] == 2  # last_result bookkeeping


def test_solutions_query_with_minus_and_manifestation(spark, triples):
    from marc2rdf_spark.operators.enrichment import solutions_query

    # without manifestation edges: work == edition; minus drops ED
    # (it has an isbn -> minus on isbn excludes it)
    sol = solutions_query(
        triples, predicate="http://purl.org/dc/terms/title",
        manifestation_pred=None,
        minuses=("http://purl.org/ontology/bibo/isbn",),
    ).collect()
    assert {(s["work"], s["object"]) for s in sol} == {(ED2, "Bare tittel")}

    # with manifestation edges
    plus = triples.union(
        spark.createDataFrame(
            [("http://e/w1", "http://purl.org/spar/fabio/hasManifestation",
              ED, True, None, None)],
            TRIPLE_SCHEMA,
        )
    )
    sol2 = solutions_query(
        plus, predicate="http://purl.org/ontology/bibo/isbn"
    ).collect()
    assert [(s["work"], s["edition"], s["object"]) for s in sol2] == [
        ("http://e/w1", ED, "82-05-30003-8")
    ]


def test_harvest_join_dummy_filter_and_subject(spark):
    from marc2rdf_spark.operators.enrichment import (
        DUMMY_COVER_MD5,
        harvest_join,
    )

    sol = spark.createDataFrame(
        [("http://e/w1", "http://e/e1", "111"),
         ("http://e/w2", "http://e/e2", "222")],
        "work string, edition string, object string",
    )
    resp = spark.createDataFrame(
        [("111", "u", "http://cover/111.jpg", "aaaa"),
         ("222", "u", "http://cover/222.jpg", DUMMY_COVER_MD5)],
        "key string, url string, value string, payload_md5 string",
    )
    out = harvest_join(sol, resp, subject="work").collect()
    assert [(r["subj"], r["obj"]) for r in out] == [
        ("http://e/w1", "http://cover/111.jpg")
    ]
    out_ed = harvest_join(sol, resp, subject="edition",
                          filter_dummy=False).collect()
    assert {r["subj"] for r in out_ed} == {"http://e/e1", "http://e/e2"}


def test_batched_windows(spark):
    from marc2rdf_spark.operators.enrichment import batched

    sol = spark.createDataFrame(
        [(f"w{i:02d}", f"e{i:02d}", f"o{i:02d}") for i in range(7)],
        "work string, edition string, object string",
    )
    out = batched(sol, batch_limit=3).collect()
    ids = [r["batch_id"] for r in sorted(out, key=lambda r: r["work"])]
    assert ids == [0, 0, 0, 1, 1, 1, 2]


def test_embedding_near_dups_exact_vs_lsh(spark):
    from marc2rdf_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    # two near-identical vectors + orthogonal noise
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = embedding_near_dups(emb, threshold=0.9).collect()
    assert [(r["a_id"], r["b_id"]) for r in exact] == [(0, 1)]
    approx = embedding_near_dups_lsh(
        emb, threshold=0.9, dim=4, n_planes=4, n_tables=8
    ).collect()
    assert [(r["a_id"], r["b_id"]) for r in approx] == [(0, 1)]


def test_localize_does_not_rewrite_sql_aliases():
    """ADVICE r1: vocabulary expansion is anchored on registered
    prefixes — an uppercase SQL alias like T.subj must survive."""
    from marc2rdf_spark.operators.rules import Rule, localize
    from marc2rdf_spark.vocab import default_vocabulary

    rule = Rule(
        id="x", name="x",
        script=(
            "SELECT T.subj FROM DEFAULT_GRAPH T "
            "WHERE T.obj = 'BIBO.Document' AND T.pred = RDF.type"
        ),
    )
    out = localize(rule, vocab=default_vocabulary()).script
    assert "T.subj" in out and "T.obj" in out and "T.pred" in out
    # known-prefix refs DO expand
    assert "'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'" in out
