"""Adversarial string-edge-case parity: Spark-side rendering/escaping
vs independent pure-Python implementations over a deterministic random
unicode corpus (quotes, backslashes, control chars, emoji, combining
marks, RTL).  Batch-style property test: one DataFrame per surface."""

import random

from pyspark.sql import functions as F

CHARS = (
    'abc "quoted" back\\slash\ttab\nnl\rcr'
    "æøåÆØÅéüñçЯ中文🎸🧪é‏ "
)


def _corpus(n=300, maxlen=40, seed=99):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        out.append(
            "".join(rng.choice(CHARS) for _ in range(rng.randrange(maxlen)))
        )
    out += ['', '"', "\\", "\\\\", '\\"', "\n\r\t", '"""', "\\n"]
    return out


def _py_nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def test_nt_escape_parity(spark):
    from marc2rdf_spark.functions.exprs import nt_line

    rows = [(i, s) for i, s in enumerate(_corpus())]
    df = spark.createDataFrame(rows, ["i", "s"])
    got = {
        r.i: r.line
        for r in df.select(
            "i",
            nt_line(
                F.lit("http://x/s"), F.lit("http://x/p"), F.col("s"),
                F.lit(False), F.lit(None).cast("string"),
                F.lit(None).cast("string"),
            ).alias("line"),
        ).collect()
    }
    for i, s in rows:
        assert got[i] == f'<http://x/s> <http://x/p> "{_py_nt_escape(s)}" .', (
            repr(s)
        )


def test_xml_escape_parity(spark):
    from xml.sax.saxutils import escape as sax_escape

    from marc2rdf_spark.functions.exprs import xml_escape

    rows = [(i, s) for i, s in enumerate(_corpus(seed=7))]
    df = spark.createDataFrame(rows, ["i", "s"])
    got = {r.i: r.e for r in df.select("i", xml_escape("s").alias("e")).collect()}
    for i, s in rows:
        assert got[i] == sax_escape(s, {'"': "&quot;"}), repr(s)


def test_iso2709_round_trip_random_records():
    """Random unicode records (excluding the ISO 2709 separator bytes,
    which the writer rejects or the format cannot carry) survive
    write -> parse byte-exactly at the field level."""
    from marc2rdf_spark.marc import (
        ControlField,
        DataField,
        Record,
        Subfield,
        parse_iso2709,
        record_to_dict,
        record_to_iso2709,
    )

    rng = random.Random(42)
    safe = [c for c in CHARS if c not in "\x1d\x1e\x1f"]

    def rnd(maxlen=25):
        return "".join(
            rng.choice(safe) for _ in range(rng.randrange(1, maxlen))
        )

    recs = []
    for i in range(25):
        fields = [ControlField("001", f"rec{i:05d}")]
        for _ in range(rng.randrange(1, 6)):
            tag = f"{rng.randrange(10, 900):03d}"
            subs = [
                Subfield(rng.choice("abcdx3"), rnd())
                for _ in range(rng.randrange(1, 4))
            ]
            fields.append(
                DataField(tag, rng.choice(" 01"), rng.choice(" 01"), subs)
            )
        recs.append(Record(leader=" " * 24, fields=fields))

    blob = b"".join(record_to_iso2709(r) for r in recs)
    back = parse_iso2709(blob)
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        da, db = record_to_dict(a), record_to_dict(b)
        assert da["controlfields"] == db["controlfields"]
        assert da["datafields"] == db["datafields"]
