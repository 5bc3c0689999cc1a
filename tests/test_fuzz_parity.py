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
