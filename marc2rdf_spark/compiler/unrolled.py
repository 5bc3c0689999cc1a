"""Unrolled mapping compiler (reference implementation, superseded).

Kept for cross-checking: it unrolls every rule into the expression
tree, which is exactly correct but makes the plan grow with the mapping
(driver build time + per-task deserialization).  The production
compiler (compiler.py) is the data-driven broadcast-spec design.
Original docstring follows.

This is the engine's "codegen" (SURVEY.md §4.1): the declarative mapping
(tags.{tagPattern}.subfield.{code} -> predicate/object specs,
/root/reference/config/templates/mapping_skeleton.json) is compiled ONCE
on the driver into a single Column-expression DAG.  The record loop of
the reference (RDFModeler#convert, /root/reference/lib/rdfmodeler.rb:149-309)
disappears: one narrow ``select`` per input row computes the complete
triple array for that record via nested higher-order functions
(transform/filter/flatten), then one ``explode`` yields the triples DF.

Scale properties (the 100 TB design point):
 - ONE pass over the input, no shuffle until the final dedup;
 - no Python in the hot path (note: the higher-order-function lambdas
   are NOT whole-stage-codegen-eligible — they run on the interpreted
   evaluator, which is why compiler.py grew a scalar codegen branch);
 - the mapping itself is compile-time constant — embedded in the plan as
   literals, never shuffled or broadcast as data;
 - nested-field pruning keeps the scan at the columns the rules touch.

Semantics compiled exactly per SURVEY.md §2.2-2.4 (micro-operator order
rdfmodeler.rb:75-78: substr -> regex_split -> whole -> regex_substitute
-> combine -> regex_strip -> urlize; conditions per :200-231; relation
blocks per :238-278).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import Library, Mapping
from ..functions.exprs import (
    first_subfield,
    generate_objects_expr,
    is_blank_stripped,
    is_uri,
    last_match,
    ruby_strip,
)
from ..schema import TRIPLE_ARRAY_DDL, TRIPLE_STRUCT_DDL
from ..vocab import RDF_TYPE, Vocabulary, default_vocabulary

_PLAIN_KEY = re.compile(r"^\d{3}(\|\d{3})*$")


def _empty_triples() -> Column:
    return F.array().cast(TRIPLE_ARRAY_DDL)


def _triple(
    subj: Column,
    pred: Column,
    obj: Column,
    obj_is_uri: Column,
    lang=None,
    dtype=None,
) -> Column:
    return F.struct(
        subj.alias("subj"),
        pred.alias("pred"),
        obj.alias("obj"),
        obj_is_uri.alias("obj_is_uri"),
        (F.lit(lang) if not isinstance(lang, Column) else lang)
        .cast("string")
        .alias("lang"),
        F.lit(dtype).cast("string").alias("dtype"),
    ).cast(TRIPLE_STRUCT_DDL)


def _norm_lang(lang) -> str | None:
    if not lang:
        return None
    return lang.lstrip(":") or None


# lambda factories: PySpark higher-order functions introspect the lambda's
# parameter list, so closures must be bound via factories, not default args.

def _mk_rel_uri(subj: Column, pred: Column, prefix: str):
    def mk(ro: Column) -> Column:
        return _triple(subj, pred, F.concat(F.lit(prefix), ro), F.lit(True))

    return mk


def _mk_rel_literal(subj: Column, pred: Column, lang: str | None):
    def mk(ro: Column) -> Column:
        return _triple(subj, pred, ro, F.lit(False), lang)

    return mk


def _mk_cf_uri(subj: Column, pred: Column | None, prefix: str, rel_class: Column | None):
    def mk(o: Column) -> Column:
        full = F.concat(F.lit(prefix), o)
        pieces = []
        if pred is not None:
            pieces.append(F.array(_triple(subj, pred, full, is_uri(full))))
        if rel_class is not None:
            pieces.append(
                F.array(_triple(full, F.lit(RDF_TYPE), rel_class, F.lit(True)))
            )
        return F.concat(*pieces) if pieces else _empty_triples()

    return mk


def _mk_cf_literal(subj: Column, pred: Column):
    def mk(o: Column) -> Column:
        return _triple(subj, pred, o, F.lit(False))

    return mk


class UnrolledMappingCompiler:
    def __init__(
        self,
        mapping: Mapping,
        library: Library | None = None,
        vocab: Vocabulary | None = None,
    ):
        self.mapping = mapping
        self.library = library or Library()
        self.vocab = vocab or default_vocabulary()
        # fail fast on unknown prefixes (G6): expand every vocab ref now
        self._validate()

    # ------------------------------------------------------------------
    def _validate(self) -> None:
        for key, rule in self.mapping.tags.items():
            re.compile(key)  # tag pattern must be a valid regex (P1)

    def expand(self, ref: str) -> str:
        return self.vocab.expand(ref)

    # ------------------------------------------------------------------
    # tag-match predicates (P1): mapping keys are unanchored regexes over
    # the 3-char tag (rdfmodeler.rb:155).  Plain keys / alternations
    # compile to isin() (cheaper than regex in codegen); anything else
    # (e.g. the "^5(?!03|…)" negative lookahead) stays rlike.
    # ------------------------------------------------------------------
    @staticmethod
    def _tag_predicate(tag_col: Column, key: str) -> Column:
        if _PLAIN_KEY.match(key):
            literals = sorted(set(key.split("|")))
            if len(literals) == 1:
                return tag_col == literals[0]
            return tag_col.isin(literals)
        return tag_col.rlike(key)

    # ------------------------------------------------------------------
    # conditions (C1/C2, rdfmodeler.rb:200-234) -> predicate Column
    # ------------------------------------------------------------------
    def _predicate_expr(self, field: Column, spec: dict) -> Column | None:
        """Returns the predicate URI column, or None when the rule has no
        predicate at all (parent assertion suppressed, rdfmodeler.rb:139)."""
        if "conditions" not in spec:
            p = spec.get("predicate")
            return F.lit(self.expand(p)) if p else None

        cond = spec["conditions"]
        if "subfield" in cond:
            # keys fold in order with the reference's keep-previous-
            # unless-empty chain (rdfmodeler.rb:205-216): empty sibling
            # subfield -> that key's default; regex match -> overwrite
            # (unmapped match counts as empty -> default); no match ->
            # keep accumulated predicate unless empty -> default
            pred: Column = F.lit("")
            for key, value in cond["subfield"].items():
                subs = {k: self.expand(v) for k, v in value["subs"].items()}
                # missing "default" => nil predicate => triple skipped
                # (Ruby assert() guard, rdfmodeler.rb:137-141)
                default = F.lit(
                    self.expand(value["default"]) if value.get("default") else None
                ).cast("string")
                m = first_subfield(field, key)
                cleaned = F.lower(F.regexp_replace(m, r"[\.\-]+", ""))
                last = last_match(cleaned, value["orig"])
                subs_map = F.create_map(
                    *[F.lit(x) for kv in subs.items() for x in kv]
                )
                candidate = subs_map[last]
                matched = F.when(
                    last.isNotNull(), F.coalesce(candidate, F.lit(""))
                ).otherwise(pred)
                chained = F.when(
                    matched.isNull() | (matched == ""), default
                ).otherwise(matched)
                pred = F.when(m.isNull() | (m == ""), default).otherwise(
                    chained
                )
            return pred

        ind = cond["indicator"]
        default = F.lit(
            self.expand(ind["default"]) if ind.get("default") else None
        ).cast("string")
        candidates = []
        for ind_key, col_name in (("indicator1", "ind1"), ("indicator2", "ind2")):
            if ind.get(ind_key):
                subs = {
                    k: self.expand(v) for k, v in ind[ind_key]["subs"].items()
                }
                subs_map = F.create_map(
                    *[F.lit(x) for kv in subs.items() for x in kv]
                )
                last = last_match(field[col_name], ind[ind_key]["orig"])
                candidates.append(subs_map[last])
        # later indicator overwrites earlier on match (rdfmodeler.rb:219-230)
        pred = default
        expr = None
        for cand in reversed(candidates):
            valid = cand.isNotNull() & (cand != "")
            expr = (
                F.when(valid, cand) if expr is None else expr.when(valid, cand)
            )
        return expr.otherwise(default) if expr is not None else default

    # ------------------------------------------------------------------
    # datafield branches (rdfmodeler.rb:188-304)
    # ------------------------------------------------------------------
    def _straight_triples(
        self, subj: Column, field: Column, code: str, spec: dict
    ) -> Column:
        ospec = spec["object"]
        pred = self._predicate_expr(field, spec)
        if pred is None:
            return _empty_triples()
        marc_object = first_subfield(field, code)
        objs = generate_objects_expr(marc_object, ospec, field)
        dt = ospec.get("datatype")

        if dt == "uri":
            prefix = ospec.get("prefix") or ""

            def mk(o):
                full = F.concat(F.lit(prefix), o)
                return _triple(subj, pred, full, is_uri(full))

        elif dt in ("integer", "float"):

            def mk(o):
                return _triple(subj, pred, o, F.lit(False), None, f"xsd:{dt}")

        else:
            lang = _norm_lang(ospec.get("lang"))

            def mk(o):
                return _triple(subj, pred, o, F.lit(False), lang)

        out = F.transform(objs, mk)
        return F.when(
            marc_object.isNotNull() & (marc_object != "")
            & (pred.isNotNull() & (pred != "")),
            out,
        ).otherwise(_empty_triples())

    def _relation_triples(
        self, subj: Column, field: Column, code: str, spec: dict
    ) -> Column:
        ospec = spec["object"]
        pred = self._predicate_expr(field, spec)
        rel = spec["relation"]
        rel_class = F.lit(self.expand(rel["class"]))
        prefix = ospec.get("prefix") or ""
        marc_object = first_subfield(field, code)
        objs = generate_objects_expr(marc_object, ospec, field)

        rel_subfields = list((rel.get("subfield") or {}).items())

        def per_object(o: Column) -> Column:
            obj_full = F.concat(F.lit(prefix), o)
            pieces = []
            if pred is not None:
                pieces.append(
                    F.when(
                        pred.isNotNull() & (pred != ""),
                        F.array(_triple(subj, pred, obj_full, is_uri(obj_full))),
                    ).otherwise(_empty_triples())
                )
            # relate() force-URIs its subject (rdfmodeler.rb:145): the type
            # triple is emitted unconditionally with obj_full as subject.
            pieces.append(
                F.array(_triple(obj_full, F.lit(RDF_TYPE), rel_class, F.lit(True)))
            )
            for rel_code, rel_spec in rel_subfields:
                rospec = rel_spec["object"]
                rel_pred = F.lit(self.expand(rel_spec["predicate"]))
                relobj = first_subfield(field, rel_code)
                relobjs = generate_objects_expr(relobj, rospec, field)
                if rospec.get("datatype") == "uri":
                    # forced URI (rdfmodeler.rb:268)
                    mk_rel = _mk_rel_uri(
                        obj_full, rel_pred, rospec.get("prefix") or ""
                    )
                else:
                    mk_rel = _mk_rel_literal(
                        obj_full, rel_pred, _norm_lang(rospec.get("lang"))
                    )
                pieces.append(
                    F.when(
                        relobj.isNotNull() & (relobj != ""),
                        F.transform(relobjs, mk_rel),
                    ).otherwise(_empty_triples())
                )
            return F.concat(*pieces)

        out = F.flatten(F.transform(objs, per_object))
        return F.when(
            marc_object.isNotNull() & (marc_object != ""), out
        ).otherwise(_empty_triples())

    def _datafield_triples(self, subj: Column, field: Column) -> Column:
        """All triples for one datafield across all matching rules."""
        branches = []
        for key, rule in self.mapping.tags.items():
            if "subfield" not in rule:
                continue  # controlfield-style rule (never matches datafields
                # in practice; the reference would crash if it did)
            rule_branches = []
            for code, spec in rule["subfield"].items():
                if "relation" in spec:
                    rule_branches.append(
                        self._relation_triples(subj, field, code, spec)
                    )
                else:
                    rule_branches.append(
                        self._straight_triples(subj, field, code, spec)
                    )
            branches.append(
                F.when(
                    self._tag_predicate(field["tag"], key),
                    F.concat(*rule_branches),
                ).otherwise(_empty_triples())
            )
        if not branches:
            return _empty_triples()
        return F.concat(*branches)

    # ------------------------------------------------------------------
    # controlfield branch (rdfmodeler.rb:160-186)
    # ------------------------------------------------------------------
    def _controlfield_triples(self, subj: Column, field: Column) -> Column:
        branches = []
        value = field["value"]
        for key, rule in self.mapping.tags.items():
            if "subfield" in rule:
                continue
            rule_branches = []
            for _name, sub_rule in rule.items():
                ospec = sub_rule["object"]
                p = sub_rule.get("predicate")
                pred = F.lit(self.expand(p)) if p else None
                objs = generate_objects_expr(value, ospec, None)
                # per-object strip-empty guard — cf branch ONLY (:168)
                objs = F.filter(objs, lambda o: ~is_blank_stripped(o))

                if ospec.get("datatype") != "literal":
                    rel_class = (
                        F.lit(self.expand(sub_rule["relation"]["class"]))
                        if "relation" in sub_rule
                        else None
                    )
                    mk = _mk_cf_uri(
                        subj, pred, ospec.get("prefix") or "", rel_class
                    )
                    rule_branches.append(F.flatten(F.transform(objs, mk)))
                else:
                    if pred is not None:
                        rule_branches.append(
                            F.transform(objs, _mk_cf_literal(subj, pred))
                        )
            if not rule_branches:
                continue
            branches.append(
                F.when(
                    self._tag_predicate(field["tag"], key)
                    & ~is_blank_stripped(value),
                    F.concat(*rule_branches),
                ).otherwise(_empty_triples())
            )
        if not branches:
            return _empty_triples()
        return F.concat(*branches)

    # ------------------------------------------------------------------
    # record-level (subject minting G1, rdf:type G2)
    # ------------------------------------------------------------------
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

    def _type_triples(self, subj: Column) -> Column:
        types = self.library.rdf_types.replace(" ", "").split(",")
        return F.array(
            *[
                _triple(subj, F.lit(RDF_TYPE), F.lit(self.expand(t)), F.lit(True))
                for t in types
                if t
            ]
        )

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def triples_array_expr(self, record: Column) -> Column:
        """array<triple> for one record struct column — a single narrow
        expression, no shuffle."""
        subj = self.subject_expr(record)
        cf = F.flatten(
            F.transform(
                F.coalesce(record["controlfields"], F.array()),
                lambda f: self._controlfield_triples(subj, f),
            )
        )
        df = F.flatten(
            F.transform(
                F.coalesce(record["datafields"], F.array()),
                lambda f: self._datafield_triples(subj, f),
            )
        )
        return F.concat(self._type_triples(subj), cf, df)

    def convert(
        self, records: DataFrame, record_col: str = "record", keep: tuple = ("url",)
    ) -> DataFrame:
        """records DF (schema.RECORDS_SCHEMA) -> triples DF.

        One narrow select + one explode; dedup is the caller's
        materialize-stage concern (G8: reference file output keeps
        duplicates, the store dedups on insert — we dropDuplicates at
        materialize, SURVEY.md §2.4)."""
        arr = self.triples_array_expr(F.col(record_col))
        kept = [F.col(c) for c in keep if c in records.columns]
        # identifier guard (parity with MappingCompiler.convert):
        # records lacking the identifier control field mint no subject
        # and emit nothing (rdfmodeler.rb:14-15 cannot construct one)
        ident = F.get(
            F.filter(
                F.col(record_col)["controlfields"],
                lambda f: f["tag"] == F.lit(self.library.identifier_tag),
            ),
            0,
        )["value"]
        return records.filter(ident.isNotNull() & (ident != "")).select(
            *kept, F.explode(arr).alias("t")
        ).select(*kept, "t.*")
