"""The mapping-rule compiler: marc2rdf JSON mapping -> Spark plan
(vectorized, data-driven).

The declarative mapping (tags.{tagPattern}.subfield.{code} ->
predicate/object specs, /root/reference/config/templates/
mapping_skeleton.json) is flattened once on the driver into a small
BROADCAST spec table (specs.py) plus regex-dispatch registries; the
conversion plan is then mapping-size-independent:

    records
      -> one explode of a unified field array (rec|cf|df rows)
      -> broadcast hash join with specs on (tag, kind)   [rule match P1]
      -> one generic projection: conditions -> predicate, micro-operator
         pipeline (substr|split -> substitute -> combine -> strip ->
         urlize, exact order rdfmodeler.rb:75-131) -> per-object triple
         array (parent + rdf:type + relation-subfield triples)
      -> one explode -> triples

Why this shape at 100 TB (vs unrolling rules into the expression tree,
kept as unrolled.py for cross-checking): the plan has O(distinct regex
patterns) expression nodes instead of O(rules x operators), so driver
plan-build, per-task plan deserialization, and codegen stay constant as
mappings grow; regex patterns remain literals (compiled once); the only
join is a broadcast of a few hundred spec rows.  One scan, no shuffle
before the final dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import Library, Mapping
from ..functions.exprs import (
    is_blank_stripped,
    is_uri,
    last_match,
    ruby_strip,
    split_with_captures,
    urlize,
)
from ..schema import TRIPLE_ARRAY_DDL, TRIPLE_STRUCT_DDL
from ..vocab import RDF_TYPE, Vocabulary, default_vocabulary
from .specs import REC_TAG, SPEC_SCHEMA, Registries, flatten_mapping

FIELD_DDL = (
    "struct<kind:string,tag:string,value:string,ind1:string,ind2:string,"
    "subfields:array<struct<code:string,value:string>>>"
)


def _empty_triples() -> Column:
    return F.array().cast(TRIPLE_ARRAY_DDL)


def _triple(subj, pred, obj, obj_is_uri, lang, dtype) -> Column:
    return F.struct(
        subj.alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
        obj_is_uri.alias("obj_is_uri"),
        lang.cast("string").alias("lang"),
        dtype.cast("string").alias("dtype"),
    ).cast(TRIPLE_STRUCT_DDL)


def _null() -> Column:
    return F.lit(None).cast("string")


def _first_subfield(field: Column, code: Column) -> Column:
    """field[code] with a runtime code column (ruby-marc first-subfield
    semantics, rdfmodeler.rb:244,286)."""
    return F.get(
        F.filter(field["subfields"], lambda s: s["code"] == code), 0
    )["value"]


# ---------------------------------------------------------------------------
# dispatch chains: id column -> literal-pattern expression
# ---------------------------------------------------------------------------

def _dispatch_last(c: Column, id_col: Column, patterns: list[str]) -> Column:
    """scan-last-match by interned pattern id; null when no id/no match."""
    expr = None
    for i, p in enumerate(patterns, 1):
        m = last_match(c, p)
        expr = F.when(id_col == i, m) if expr is None else expr.when(id_col == i, m)
    return expr.otherwise(_null()) if expr is not None else _null()


def _dispatch_split(o: Column, id_col: Column, patterns: list[str]) -> Column:
    """regex_split by pattern id, empties dropped (rdfmodeler.rb:89-91);
    falls through to [o] when id is null (whole-string branch)."""
    expr = None
    for i, p in enumerate(patterns, 1):
        branch = F.filter(
            split_with_captures(o, p), lambda x: x.isNotNull() & (x != "")
        )
        expr = (
            F.when(id_col == i, branch)
            if expr is None
            else expr.when(id_col == i, branch)
        )
    default = F.array(o)
    return expr.otherwise(default) if expr is not None else default


def _dispatch_strip(x: Column, id_col: Column, patterns: list[str]) -> Column:
    expr = None
    for i, p in enumerate(patterns, 1):
        branch = F.regexp_replace(x, p, "")
        expr = (
            F.when(id_col == i, branch)
            if expr is None
            else expr.when(id_col == i, branch)
        )
    return expr.otherwise(x) if expr is not None else x


class MappingCompiler:
    """Same public API as the original unrolled compiler; plan shape per
    module docstring."""

    def __init__(
        self,
        mapping: Mapping,
        library: Library | None = None,
        vocab: Vocabulary | None = None,
    ):
        self.mapping = mapping
        self.library = library or Library()
        self.vocab = vocab or default_vocabulary()
        self.spec_rows, self.regs = flatten_mapping(
            mapping, self.library, self.vocab
        )

    # -- generic micro-operator pipeline (rdfmodeler.rb:49-135) ----------
    def _pipeline(self, o: Column, s, field: Column) -> Column:
        """s: accessor fn, s('substr_off') etc. returns the spec column —
        works for the spec struct column and for rel-array lambda vars."""
        regs = self.regs

        piece = o.substr(s("substr_off") + F.lit(1), s("substr_len"))
        substr_branch = F.when(
            (F.length(o) >= s("substr_off") + s("substr_len"))
            & ~is_blank_stripped(piece),
            F.array(piece),
        ).otherwise(F.array().cast("array<string>"))
        arr = F.when(s("substr_off").isNotNull(), substr_branch).otherwise(
            _dispatch_split(o, s("split_id"), regs.split)
        )

        def _subst(x: Column) -> Column:
            cleaned = F.lower(F.regexp_replace(x, r"[\W]+", ""))
            last = _dispatch_last(cleaned, s("subst_orig_id"), regs.last)
            # no-match => cleaned passthrough (rdfmodeler.rb:96-104);
            # matched-but-unmapped would crash the reference -> null,
            # filtered
            return F.when(last.isNull(), cleaned).otherwise(
                F.element_at(s("subst_map"), last)
            )

        arr = F.when(
            s("subst_orig_id").isNotNull(),
            F.filter(F.transform(arr, _subst), lambda x: x.isNotNull()),
        ).otherwise(arr)

        # F.array_join only takes a literal delimiter; the SQL function
        # accepts a column — call it directly
        combined = F.call_function(
            "array_join",
            F.flatten(
                F.transform(
                    s("combine"),
                    lambda c: F.transform(
                        F.filter(field["subfields"], lambda sf: sf["code"] == c),
                        lambda sf: sf["value"],
                    ),
                )
            ),
            F.coalesce(s("combine_sep"), F.lit("")),
        )
        arr = F.when(
            s("combine").isNotNull(),
            F.transform(arr, lambda _: combined),
        ).otherwise(arr)

        arr = F.when(
            s("strip_id").isNotNull(),
            F.transform(
                arr, lambda x: _dispatch_strip(x, s("strip_id"), regs.strip)
            ),
        ).otherwise(arr)

        return F.when(s("urlize"), F.transform(arr, urlize)).otherwise(arr)

    # -- conditions -> predicate (rdfmodeler.rb:200-234) ------------------
    def _predicate(self, field: Column, s) -> Column:
        regs = self.regs
        default = s("cond_default")

        m = _first_subfield(field, s("cond_code"))
        cleaned = F.lower(F.regexp_replace(m, r"[\.\-]+", ""))
        cand_sub = F.element_at(
            s("cond1_map"), _dispatch_last(cleaned, s("cond1_orig_id"), regs.last)
        )
        sub_pred = F.when(m.isNull() | (m == ""), default).otherwise(
            F.when(cand_sub.isNotNull() & (cand_sub != ""), cand_sub).otherwise(
                default
            )
        )

        cand1 = F.element_at(
            s("cond1_map"),
            _dispatch_last(field["ind1"], s("cond1_orig_id"), regs.last),
        )
        cand2 = F.element_at(
            s("cond2_map"),
            _dispatch_last(field["ind2"], s("cond2_orig_id"), regs.last),
        )
        ind_pred = (
            F.when(cand2.isNotNull() & (cand2 != ""), cand2)
            .when(cand1.isNotNull() & (cand1 != ""), cand1)
            .otherwise(default)
        )

        return (
            F.when(s("cond_kind") == "sub", sub_pred)
            .when(s("cond_kind") == "ind", ind_pred)
            .otherwise(s("pred"))
        )

    # -- emission: one object -> triple array -----------------------------
    def _emission(
        self, subj: Column, field: Column, spec: Column, pred: Column
    ) -> "callable":
        def s(name: str) -> Column:
            return spec[name]

        def per_object(o: Column) -> Column:
            obj_full = F.concat(F.coalesce(s("prefix"), F.lit("")), o)
            uri_flag = is_uri(obj_full)
            dt = s("datatype")

            p_obj = F.when(dt == "uri", obj_full).otherwise(o)
            p_is_uri = F.when(dt == "uri", uri_flag).otherwise(F.lit(False))
            p_dtype = (
                F.when(dt == "integer", F.lit("xsd:integer"))
                .when(dt == "float", F.lit("xsd:float"))
                .otherwise(_null())
            )
            p_lang = F.when(dt == "literal", s("lang")).otherwise(_null())
            parent = F.when(
                pred.isNotNull() & (pred != ""),
                F.array(_triple(subj, pred, p_obj, p_is_uri, p_lang, p_dtype)),
            ).otherwise(_empty_triples())

            # relate() force-URIs its subject (rdfmodeler.rb:145): type
            # triple emitted even when the parent coerced to a literal
            type_t = F.when(
                s("rel_class").isNotNull(),
                F.array(
                    _triple(
                        obj_full, F.lit(RDF_TYPE), s("rel_class"),
                        F.lit(True), _null(), _null(),
                    )
                ),
            ).otherwise(_empty_triples())

            def per_rel(r: Column) -> Column:
                def rs(name: str) -> Column:
                    return r[name]

                ro_src = _first_subfield(field, rs("code"))
                relobjs = self._pipeline(ro_src, rs, field)

                def mk_rel(ro: Column) -> Column:
                    # 'uri' is FORCED (rdfmodeler.rb:268)
                    r_obj = F.when(
                        rs("datatype") == "uri",
                        F.concat(F.coalesce(rs("prefix"), F.lit("")), ro),
                    ).otherwise(ro)
                    r_is_uri = rs("datatype") == "uri"
                    r_lang = F.when(
                        rs("datatype") == "uri", _null()
                    ).otherwise(rs("lang"))
                    return _triple(
                        obj_full, rs("pred"), r_obj, r_is_uri, r_lang, _null()
                    )

                return F.when(
                    ro_src.isNotNull() & (ro_src != ""),
                    F.transform(relobjs, mk_rel),
                ).otherwise(_empty_triples())

            rel_t = F.coalesce(
                F.flatten(F.transform(F.coalesce(s("rel"), F.array().cast(
                    "array<struct<code:string,pred:string,substr_off:int,"
                    "substr_len:int,split_id:int,"
                    "subst_orig_id:int,subst_map:map<string,string>,"
                    "combine:array<string>,combine_sep:string,"
                    "strip_id:int,urlize:boolean,"
                    "datatype:string,prefix:string,lang:string>>"
                )), per_rel)),
                _empty_triples(),
            )
            return F.concat(parent, type_t, rel_t)

        return per_object

    # -- record-level helpers ---------------------------------------------
    def subject_expr(self, record: Column) -> Column:
        ident = F.get(
            F.filter(
                record["controlfields"],
                lambda f: f["tag"] == F.lit(self.library.identifier_tag),
            ),
            0,
        )["value"]
        return F.concat(
            F.lit(self.library.base + self.library.prefix),
            F.coalesce(ident, F.lit("")),
        )

    def _fields_array(self, record: Column) -> Column:
        rec_field = F.struct(
            F.lit("rec").alias("kind"), F.lit(REC_TAG).alias("tag"),
            F.lit("").alias("value"), _null().alias("ind1"),
            _null().alias("ind2"),
            F.lit(None).cast(
                "array<struct<code:string,value:string>>"
            ).alias("subfields"),
        ).cast(FIELD_DDL)
        cf = F.transform(
            F.coalesce(record["controlfields"], F.array()),
            lambda f: F.struct(
                F.lit("cf").alias("kind"), f["tag"].alias("tag"),
                f["value"].alias("value"), _null().alias("ind1"),
                _null().alias("ind2"),
                F.lit(None).cast(
                    "array<struct<code:string,value:string>>"
                ).alias("subfields"),
            ).cast(FIELD_DDL),
        )
        df_ = F.transform(
            F.coalesce(record["datafields"], F.array()),
            lambda f: F.struct(
                F.lit("df").alias("kind"), f["tag"].alias("tag"),
                _null().alias("value"), f["ind1"].alias("ind1"),
                f["ind2"].alias("ind2"), f["subfields"].alias("subfields"),
            ).cast(FIELD_DDL),
        )
        return F.concat(F.array(rec_field), cf, df_)

    def specs_df(self, spark) -> DataFrame:
        return spark.createDataFrame(self.spec_rows, SPEC_SCHEMA)

    # -- public API ---------------------------------------------------------
    def convert(
        self, records: DataFrame, record_col: str = "record", keep: tuple = ("url",)
    ) -> DataFrame:
        """records DF (schema.RECORDS_SCHEMA) -> triples DF.  One scan,
        one broadcast join, two explodes, no shuffle; dedup is the
        materialize stage's concern (G8, SURVEY.md §2.4)."""
        spark = records.sparkSession
        kept = [c for c in keep if c in records.columns]
        record = F.col(record_col)
        fields = records.select(
            *kept,
            self.subject_expr(record).alias("subj"),
            F.explode(self._fields_array(record)).alias("field"),
        ).select(
            *kept, "subj", "field",
            F.col("field.tag").alias("tag"), F.col("field.kind").alias("kind"),
        )

        joined = fields.join(F.broadcast(self.specs_df(spark)), ["tag", "kind"])

        spec = F.col("spec")
        field = F.col("field")
        subj = F.col("subj")
        kind = F.col("kind")

        src = (
            F.when(kind == "cf", field["value"])
            .when(kind == "df", _first_subfield(field, spec["code"]))
            .otherwise(F.lit(""))
        )
        guard = (
            F.when(kind == "cf", ~is_blank_stripped(field["value"]))
            .when(kind == "df", src.isNotNull() & (src != ""))
            .otherwise(F.lit(True))
        )

        def s(name: str) -> Column:
            return spec[name]

        objs = self._pipeline(src, s, field)
        # per-object strip-empty guard: controlfield branch ONLY (:168)
        objs = F.when(
            kind == "cf",
            F.filter(objs, lambda o: ~is_blank_stripped(o)),
        ).otherwise(objs)

        pred = self._predicate(field, s)
        emission = self._emission(subj, field, spec, pred)
        triples_arr = F.flatten(F.transform(objs, emission))

        # F.inline = explode + struct-expansion in ONE generator: one
        # fewer chained select, and each chained DataFrame op on this
        # tree costs a full eager JVM analysis pass (seconds for the
        # compiled-mapping expression tree).
        return joined.where(guard).select(*kept, F.inline(triples_arr))
