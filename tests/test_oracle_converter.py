"""Oracle-converter unit tests mirroring the reference's own spec cases
(/root/reference/spec/rdfmodeler_spec.rb) one-to-one — same inputs, same
expected strings."""

import copy
import os

from marc2rdf_spark.config import SPEC_LIBRARY, load_dummy_mapping, Mapping
from marc2rdf_spark.functions.textsem import py_is_uri, py_urlize
from marc2rdf_spark.marc import DataField, Subfield, parse_collection_xml
from marc2rdf_spark.oracle.converter import OracleConverter, generate_objects

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _records():
    with open(os.path.join(FIXTURES, "example.normarc.xml"), encoding="utf-8") as f:
        return parse_collection_xml(f.read())


def _convert(tag, rule, record_idx=0):
    mapping = load_dummy_mapping()
    mapping.tags[tag] = rule
    conv = OracleConverter(mapping, SPEC_LIBRARY)
    return conv.convert(_records()[record_idx])


# --- generate_objects micro-operators (rdfmodeler_spec.rb:32-94) -----------

def test_substr_offset_length():
    assert generate_objects("abcdef", {"substr_offset": 2, "substr_length": 4}) == ["cdef"]


def test_substr_beyond_length_is_empty():
    assert generate_objects("abcdef", {"substr_offset": 11, "substr_length": 1}) == []


def test_generate_uri_valid():
    assert py_is_uri("http://example.com/abcdef")


def test_generate_uri_invalid_characters():
    assert not py_is_uri("http:||example.comabcdef")


def test_generate_uri_missing_scheme():
    assert not py_is_uri("www.example.comabcdef")


def test_regex_split_then_substitute():
    objs = generate_objects(
        "abcdef",
        {
            "regex_split": "(\\w{2})",
            "regex_substitute": {
                "orig": "ab|cd|ef",
                "subs": {"ab": "AA", "cd": "BB", "ef": "CC"},
                "default": "ZERO",
            },
        },
    )
    assert objs == ["AA", "BB", "CC"]


def test_combine_with_combinestring():
    mf = DataField("245", " ", " ", [Subfield("a", "A Title"), Subfield("b", "A Subtitle")])
    objs = generate_objects(
        "abcdef", {"combine": ["a", "b"], "combinestring": " : "}, marcfield=mf
    )
    assert objs == ["A Title : A Subtitle"]


def test_urlize_defaults():
    assert generate_objects("A Simple String", {"urlize": True}) == ["a_simple_string"]


def test_urlize_no_downcase_no_spaces():
    # direct twin of String#urlize options (generate_objects never passes
    # no_downcase from mappings; tested at the urlize level)
    assert py_urlize("A Simple String", downcase=False, convert_spaces=False) == "ASimpleString"


def test_urlize_special_characters():
    assert generate_objects("Ægir", {"urlize": True}) == ["aegir"]


def test_urlize_custom_regexp():
    assert py_urlize("abcdef", regexp="[^a-e]") == "abcde"


# --- advanced conversion over example.normarc.xml (spec :97-354) ------------

def _all_strings(triples):
    return " ".join(f"{t.subj} {t.pred} {t.obj} {t.dtype}" for t in triples)


def test_literal_mapping_isbn():
    rule = {"subfield": {"a": {"predicate": "BIBO.isbn", "object": {"datatype": "literal"}}}}
    triples = _convert("020", rule)
    assert "http://purl.org/ontology/bibo/isbn" in _all_strings(triples)


def test_integer_typed_literal():
    rule = {
        "subfield": {
            "a": {
                "predicate": "BIBO.isbn",
                "object": {"datatype": "integer", "regex_strip": "[\\D]+"},
            }
        }
    }
    triples = _convert("300", rule)
    hits = [t for t in triples if t.obj == "202" and t.dtype == "xsd:integer"]
    assert hits


def test_float_typed_literal():
    rule = {
        "subfield": {
            "a": {
                "predicate": "BIBO.isbn",
                "object": {"datatype": "float", "regex_strip": "[\\D]+"},
            }
        }
    }
    triples = _convert("300", rule)
    assert [t for t in triples if t.obj == "202" and t.dtype == "xsd:float"]


def test_audience_uri_from_008():
    rule = {
        "audience": {
            "predicate": "DC.audience",
            "object": {
                "datatype": "uri",
                "prefix": "http://data.deichman.no/audience/",
                "substr_length": 1,
                "regex_substitute": {
                    "default": "adult",
                    "subs": {"a": "adult", "j": "juvenile"},
                    "orig": "a|j",
                },
                "substr_offset": 22,
            },
        }
    }
    triples = _convert("008", rule)
    assert "http://data.deichman.no/audience/adult" in _all_strings(triples)


def test_language_relation_class_from_008():
    rule = {
        "language": {
            "predicate": "DC.language",
            "object": {
                "datatype": "uri",
                "prefix": "http://lexvo.org/id/iso639-3/",
                "substr_length": 3,
                "substr_offset": 35,
            },
            "relation": {"class": "LVONT.Language"},
        }
    }
    triples = _convert("008", rule)
    s = _all_strings(triples)
    assert "http://lexvo.org/ontology#Language" in s
    assert "http://lexvo.org/id/iso639-3/nob" in s


def test_format_uri_from_datafield_substitute():
    rule = {
        "subfield": {
            "b": {
                "predicate": "DC.format",
                "object": {
                    "datatype": "uri",
                    "prefix": "http://data.deichman.no/format/",
                    "regex_substitute": {
                        "default": "Document",
                        "subs": {"l": "Book"},
                        "orig": "l",
                    },
                },
            }
        }
    }
    triples = _convert("019", rule)
    assert "http://data.deichman.no/format/Book" in _all_strings(triples)


def _conditions_700(orig, cond_subfield="e"):
    return {
        "subfield": {
            "3": {
                "object": {"datatype": "uri", "prefix": "http://example.com/person/x"},
                "conditions": {
                    "subfield": {
                        cond_subfield: {
                            "default": "DC.contributor",
                            "subs": {"overs": "BIBO.translator"},
                            "orig": orig,
                        }
                    }
                },
            }
        }
    }


def test_conditions_subfield_match():
    triples = _convert("700", _conditions_700("overs"), record_idx=1)
    assert "http://purl.org/ontology/bibo/translator" in _all_strings(triples)


def test_conditions_no_match_uses_default():
    triples = _convert("700", _conditions_700("nonexistingcondition"), record_idx=1)
    assert "http://purl.org/dc/terms/contributor" in _all_strings(triples)


def test_conditions_missing_subfield_uses_default():
    rule = _conditions_700("nonexistingcondition", cond_subfield="nonexistingsubfield")
    rule["subfield"]["3"]["conditions"]["subfield"]["nonexistingsubfield"]["subs"] = {
        "ignore": "ignore"
    }
    triples = _convert("700", rule, record_idx=1)
    assert "http://purl.org/dc/terms/contributor" in _all_strings(triples)


def test_conditions_indicator1():
    rule = {
        "subfield": {
            "a": {
                "object": {"datatype": "literal"},
                "conditions": {
                    "indicator": {
                        "default": "DC.originalTitle",
                        "indicator1": {
                            "subs": {"0": "DC.originalTitle", "1": "DC.uniformTitle"},
                            "orig": "0|1",
                        },
                    }
                },
            }
        }
    }
    triples = _convert("240", rule, record_idx=1)
    assert "http://purl.org/dc/terms/uniformTitle" in _all_strings(triples)


def test_conditions_indicator2():
    rule = {
        "subfield": {
            "a": {
                "object": {"datatype": "literal"},
                "conditions": {
                    "indicator": {
                        "default": "DC.anyTitle",
                        "indicator2": {
                            "subs": {"0": "DC.someTitle", "1": "DC.anotherTitle"},
                            "orig": "0|1",
                        },
                    }
                },
            }
        }
    }
    triples = _convert("245", rule, record_idx=1)
    assert "http://purl.org/dc/terms/someTitle" in _all_strings(triples)


# --- dummy-mapping end-to-end sanity ----------------------------------------

def test_dummy_mapping_person_relation():
    conv = OracleConverter(load_dummy_mapping(), SPEC_LIBRARY)
    triples = conv.convert(_records()[0])
    s = _all_strings(triples)
    # subject minting (rdfmodeler.rb:14-15) + 100$3 relation block
    assert "http://data.deichman.no/resource/tnr_0583095" in s
    assert "http://data.deichman.no/person/x32026400" in s
    assert "http://xmlns.com/foaf/0.1/Person" in s
    # relation subfield a -> RADATANA.catalogueName literal
    assert any(
        t.pred == "http://def.bibsys.no/xmlns/radatana/1.0#catalogueName"
        and t.obj == "Bache-Wiig, Anna"
        for t in triples
    )
    # 245$a DC.title with trailing-punct strip
    assert any(
        t.pred == "http://purl.org/dc/terms/title" and t.obj == "Det aller fineste"
        for t in triples
    )
    # 100$j regex_split on '-' + nationality URI
    assert any(
        t.obj == "http://data.deichman.no/nationality/n" and t.obj_is_uri
        for t in triples
    )
