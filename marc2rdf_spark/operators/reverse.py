"""Reverse conversion: RDF triples -> MARC records (SURVEY.md §2 A3 /
MARCModeler, /root/reference/lib/marcmodeler.rb).

The reference walks one manifestation URI at a time: a SPARQL SELECT
with optional patterns (marcmodeler.rb:18-37), rdf2map folding the
solutions into {property: [values...]} (marcmodeler.rb:58-67), then a
serially-composed MARC record (marcmodeler.rb:70-89).

Spark-first re-expression, set-oriented over the whole triple corpus:

 - ``manifestations``: ONE conditional aggregation per subject (a single
   shuffle; map-side partial MIN) replaces the per-URI SELECT; the
   creator's two-hop optional pattern (?uri dc:creator ?c . ?c
   radatana:catalogueName ?name) is a second aggregate over the same
   scan joined back on the creator URI.  At 10^12-triple scale both
   aggregates partition on subj and the creator join is a shuffle-free
   AQE-broadcast when the creator set is small, sort-merge otherwise.
 - ``compose_marc``: columnar serial composition of the MARC record
   struct (field order fixed exactly as marcmodeler.rb:70-89 — 001,
   019, 020, 021, 090, 100, 245) plus a MARCXML rendering, all native
   Column expressions (no per-row Python, BASELINE.json input_hint).

Determinism note: rdf2map keeps the FIRST solution's value per
property; solution order is store-dependent in the reference, so we
take MIN (deterministic under any partitioning) — documented deviation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marcmodeler.rb:20-32 query vocabulary (expanded per vocabularies.json)
DC_IDENTIFIER = "http://purl.org/dc/terms/identifier"
DC_TITLE = "http://purl.org/dc/terms/title"
DC_CREATOR = "http://purl.org/dc/terms/creator"
RDA_RESPONSIBLE = "http://rdvocab.info/Elements/statementOfResponsibility"
RADATANA_NAME = "http://def.bibsys.no/xmlns/radatana/1.0#catalogueName"
DEICH_LOCATION_SIGNATURE = "http://data.deichman.no/location_signature"
DEICH_AGE_LIMIT = "http://data.deichman.no/ageLimit"
FABIO_SUBTITLE = "http://purl.org/spar/fabio/hasSubtitle"
BIBO_ISBN = "http://purl.org/ontology/bibo/isbn"
BIBO_ISSN = "http://purl.org/ontology/bibo/issn"

MANIFESTATION_COLS = [
    "subj", "rec_id", "title", "subtitle", "responsible", "creator_uri",
    "creator_name", "creator_id", "location_signature", "age_limit",
    "isbn", "issn",
]


def _first(pred_uri: str) -> Column:
    """rdf2map first-value per property (deterministic MIN, see module
    docstring)."""
    return F.min(F.when(F.col("pred") == pred_uri, F.col("obj")))


def manifestations(triples: DataFrame) -> DataFrame:
    """All manifestation rows: one wide row per subject having the two
    REQUIRED properties dc:identifier and dc:title
    (marcmodeler.rb:20-23; optional patterns null when absent)."""
    base = triples.groupBy("subj").agg(
        _first(DC_IDENTIFIER).alias("rec_id"),
        _first(DC_TITLE).alias("title"),
        _first(FABIO_SUBTITLE).alias("subtitle"),
        _first(RDA_RESPONSIBLE).alias("responsible"),
        _first(DC_CREATOR).alias("creator_uri"),
        _first(DEICH_LOCATION_SIGNATURE).alias("location_signature"),
        _first(DEICH_AGE_LIMIT).alias("age_limit"),
        _first(BIBO_ISBN).alias("isbn"),
        _first(BIBO_ISSN).alias("issn"),
    ).filter(F.col("rec_id").isNotNull() & F.col("title").isNotNull())

    # the reference's creator patterns form ONE SPARQL optional group
    # (marcmodeler.rb:24-27): dc:creator, catalogueName AND dc:identifier
    # bind all-or-nothing — a creator lacking either property leaves
    # creatorURI itself unbound and emits no 100 field
    creators = (
        triples.filter(F.col("pred").isin(RADATANA_NAME, DC_IDENTIFIER))
        .groupBy("subj")
        .agg(
            _first(RADATANA_NAME).alias("creator_name"),
            _first(DC_IDENTIFIER).alias("creator_id"),
        )
        .filter(
            F.col("creator_name").isNotNull() & F.col("creator_id").isNotNull()
        )
        .withColumnRenamed("subj", "creator_uri")
    )
    return (
        base.join(creators, "creator_uri", "left")
        .withColumn(
            "creator_uri",
            F.when(F.col("creator_name").isNotNull(), F.col("creator_uri")),
        )
        .select(*MANIFESTATION_COLS)
    )


# ---------------------------------------------------------------------------
# serial MARC composition (marcmodeler.rb:70-89)
# ---------------------------------------------------------------------------

_SF_DDL = "array<struct<code:string,value:string>>"
_DF_DDL = (
    "struct<tag:string,ind1:string,ind2:string,"
    f"subfields:{_SF_DDL}>"
)

# ruby-marc MARC::Record.new default leader (24 blanks)
DEFAULT_LEADER = " " * 24


def _sf(code: str, value: Column) -> Column:
    return F.struct(F.lit(code).alias("code"), value.alias("value"))


def _field(tag: str, subfields: Column) -> Column:
    return F.struct(
        F.lit(tag).alias("tag"), F.lit(" ").alias("ind1"),
        F.lit(" ").alias("ind2"), subfields.alias("subfields"),
    ).cast(_DF_DDL)


def _opt_field(cond: Column, tag: str, code: str, value: Column) -> Column:
    """``marc.append(DataField(tag, ' ', ' ', [code, value])) if present``"""
    return F.when(
        cond, F.array(_field(tag, F.array(_sf(code, value))))
    ).otherwise(F.array().cast(f"array<{_DF_DDL}>"))


def compose_marc(manifest: DataFrame) -> DataFrame:
    """Manifestation rows -> (subj, record) with the record struct
    composed serially in the reference's exact field order
    (marcmodeler.rb:72-88): 001 control, then 019$s ageLimit, 020$a
    isbn, 021$a issn, 090$d locationSignature, 100[$3 id, $a name],
    245[$a title, $b sub, $c responsible, $p sub] (245 always)."""
    c = F.col
    f019 = _opt_field(c("age_limit").isNotNull(), "019", "s", c("age_limit"))
    f020 = _opt_field(c("isbn").isNotNull(), "020", "a", c("isbn"))
    f021 = _opt_field(c("issn").isNotNull(), "021", "a", c("issn"))
    f090 = _opt_field(
        c("location_signature").isNotNull(), "090", "d",
        c("location_signature"),
    )
    f100_sfs = F.filter(
        F.array(
            F.when(c("creator_id").isNotNull(), _sf("3", c("creator_id"))),
            _sf("a", c("creator_name")),
        ),
        lambda s: s.isNotNull(),
    )
    f100 = F.when(
        c("creator_name").isNotNull(), F.array(_field("100", f100_sfs))
    ).otherwise(F.array().cast(f"array<{_DF_DDL}>"))
    f245_sfs = F.filter(
        F.array(
            F.when(c("title").isNotNull(), _sf("a", c("title"))),
            F.when(c("subtitle").isNotNull(), _sf("b", c("subtitle"))),
            F.when(c("responsible").isNotNull(), _sf("c", c("responsible"))),
            F.when(c("subtitle").isNotNull(), _sf("p", c("subtitle"))),
        ),
        lambda s: s.isNotNull(),
    )
    f245 = F.array(_field("245", f245_sfs))

    record = F.struct(
        F.lit(DEFAULT_LEADER).alias("leader"),
        F.array(
            F.struct(F.lit("001").alias("tag"), c("rec_id").alias("value"))
        ).alias("controlfields"),
        F.concat(f019, f020, f021, f090, f100, f245).alias("datafields"),
    )
    return manifest.select("subj", record.alias("record"))


# ---------------------------------------------------------------------------
# MARCXML rendering (marcmodeler.rb to_xml) — columnar, JVM-side
# ---------------------------------------------------------------------------

def _xml_escape(v: Column) -> Column:
    out = F.regexp_replace(v, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def to_marcxml(records: DataFrame, record_col: str = "record") -> DataFrame:
    """(.., record) -> (.., marcxml string) — native concat/transform."""
    r = F.col(record_col)
    cfs = F.array_join(
        F.transform(
            r["controlfields"],
            lambda f: F.concat(
                F.lit('<controlfield tag="'), f["tag"], F.lit('">'),
                _xml_escape(f["value"]), F.lit("</controlfield>"),
            ),
        ),
        "",
    )
    dfs = F.array_join(
        F.transform(
            r["datafields"],
            lambda f: F.concat(
                F.lit('<datafield tag="'), f["tag"],
                F.lit('" ind1="'), f["ind1"],
                F.lit('" ind2="'), f["ind2"], F.lit('">'),
                F.array_join(
                    F.transform(
                        f["subfields"],
                        lambda s: F.concat(
                            F.lit('<subfield code="'), s["code"],
                            F.lit('">'), _xml_escape(s["value"]),
                            F.lit("</subfield>"),
                        ),
                    ),
                    "",
                ),
                F.lit("</datafield>"),
            ),
        ),
        "",
    )
    xml = F.concat(
        F.lit("<record><leader>"), r["leader"], F.lit("</leader>"),
        cfs, dfs, F.lit("</record>"),
    )
    return records.withColumn("marcxml", xml)


def rdf_to_marc(triples: DataFrame) -> DataFrame:
    """Full reverse path: triples -> manifestation map -> serial MARC
    compose -> MARCXML (the MARCModeler.convert + to_xml pipeline)."""
    return to_marcxml(compose_marc(manifestations(triples)))
