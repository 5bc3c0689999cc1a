"""Pure-Python row-at-a-time reference converter (the ORACLE).

A faithful, independent reimplementation of the reference's
``RDFModeler#convert`` semantics (/root/reference/lib/rdfmodeler.rb:149-309)
used to (a) generate golden triple fixtures and (b) cross-check the Spark
columnar plan in tests.  This module deliberately follows the
record-at-a-time control flow of the reference so the two code paths
(this and compiler/compiler.py) are independent implementations.

Every behavioral quirk preserved (SURVEY.md §2.2-2.4):
 - pipeline order: substr | regex_split | whole -> regex_substitute ->
   combine -> regex_strip -> urlize (rdfmodeler.rb:75-131)
 - per-object strip-empty guard ONLY in the controlfield branch
   (rdfmodeler.rb:168; absent at :248 and :289)
 - regex_substitute no-match => cleaned string passes through, default
   is never applied there (rdfmodeler.rb:96-104)
 - conditions: clean with gsub(/[.\\-]+/,'')+downcase, last scan match
   wins, empty/missing source or no match => default
   (rdfmodeler.rb:200-231)
 - relation branch always URI-coerces the parent object and emits the
   rdf:type triple even when the predicate is empty-skipped
   (rdfmodeler.rb:248-256)
 - relation-subfield "uri" objects are forced to URIs of prefix+value
   (RDF::URI(generate_uri(...)) at rdfmodeler.rb:268)
 - language tags taken from mapping (leading ':' normalized away, e.g.
   mapping value ":no" -> "no").
"""

from __future__ import annotations

import re
from typing import NamedTuple

from ..config import Library, Mapping
from ..functions.textsem import (
    py_is_uri,
    py_mapping_regex,
    py_ruby_strip,
    py_urlize,
    ruby_scan_last,
    ruby_split,
)
from ..marc import ControlField, DataField, Record
from ..vocab import RDF_TYPE, Vocabulary, default_vocabulary


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_is_uri: bool
    lang: str | None  # None for non-literals / untagged
    dtype: str | None  # 'xsd:integer' | 'xsd:float' | None


def _norm_lang(lang) -> str | None:
    if not lang:
        return None
    return lang.lstrip(":") or None


_NONWORD = re.compile(r"[\W]+", re.ASCII)  # Ruby \W is ASCII (Onigmo)
_DOTDASH = re.compile(r"[\.\-]+")


def generate_objects(o: str, opts: dict, marcfield=None) -> list[str]:
    """Twin of rdfmodeler.rb:49-135 (generate_objects)."""
    opts = {k: v for k, v in opts.items() if v is not None}
    objs: list[str] = []

    if "substr_offset" in opts:
        off, ln = opts["substr_offset"], opts["substr_length"]
        if len(o) >= off + ln:
            piece = o[off : off + ln]  # noqa: E203
            if piece is not None and py_ruby_strip(piece):
                objs.append(piece)
    elif "regex_split" in opts:
        objs = ruby_split(o, opts["regex_split"])
    else:
        objs = [o]

    if "regex_substitute" in opts and objs:
        rs = opts["regex_substitute"]
        out = []
        for obj in objs:
            cleaned = _NONWORD.sub("", obj).lower()
            last = ruby_scan_last(cleaned, rs["orig"])
            if last is None:
                out.append(cleaned)  # no-match passthrough quirk
            else:
                subbed = rs["subs"].get(last)
                # missing subs key would crash the reference; drop here
                if subbed is not None:
                    out.append(subbed)
        objs = out

    if "combine" in opts and objs:
        vals: list[str] = []
        for code in opts["combine"]:
            if isinstance(marcfield, DataField):
                vals.extend(marcfield.values(code))
        combined = (opts.get("combinestring") or "").join(vals)
        objs = [combined for _ in objs]

    if "regex_strip" in opts and objs:
        strip_re = py_mapping_regex(opts["regex_strip"])
        objs = [strip_re.sub("", obj) for obj in objs]

    if "urlize" in opts and objs:
        objs = [py_urlize(obj) for obj in objs]

    return objs


def _obj_opts(obj_spec: dict) -> dict:
    return {
        "regex_split": obj_spec.get("regex_split"),
        "urlize": obj_spec.get("urlize"),
        "regex_strip": obj_spec.get("regex_strip"),
        "regex_substitute": obj_spec.get("regex_substitute"),
        "substr_offset": obj_spec.get("substr_offset"),
        "substr_length": obj_spec.get("substr_length"),
        "combine": obj_spec.get("combine"),
        "combinestring": obj_spec.get("combinestring"),
    }


class OracleConverter:
    def __init__(
        self,
        mapping: Mapping,
        library: Library | None = None,
        vocab: Vocabulary | None = None,
    ):
        self.mapping = mapping
        self.library = library or Library()
        self.vocab = vocab or default_vocabulary()
        self._tag_res = {
            k: py_mapping_regex(k) for k in self.mapping.tags
        }

    # -- generate_uri (rdfmodeler.rb:35-47) --------------------------------
    def generate_uri(self, s: str, prefix: str = "") -> tuple[str, bool]:
        full = f"{prefix or ''}{s}"
        return full, py_is_uri(full)

    def expand(self, ref: str) -> str:
        return self.vocab.expand(ref)

    # -- convert (rdfmodeler.rb:149-309) ------------------------------------
    def convert(self, record: Record, set_types: bool = True) -> list[Triple]:
        stmts: list[Triple] = []
        rec_id = record.first_value(self.library.identifier_tag) or ""
        # identifier guard (rdfmodeler.rb:14-15: nil.value raises, so an
        # identifier-less record never constructs an RDFModeler) — e.g.
        # a field-less OAI deleted-header envelope
        if not rec_id:
            return []
        subj = self.library.mint_subject(rec_id)

        def assert_(p_ref: str | None, obj, is_uri, lang=None, dtype=None):
            # rdfmodeler.rb:137-141: skip nil/empty predicate
            if p_ref and obj is not None:
                stmts.append(
                    Triple(subj, self.expand(p_ref), obj, is_uri, lang, dtype)
                )

        def relate(s, p_uri: str, obj, is_uri, lang=None):
            if s and p_uri and obj is not None:
                stmts.append(Triple(s, p_uri, obj, is_uri, lang, None))

        if set_types:
            for t in self.library.rdf_types.replace(" ", "").split(","):
                stmts.append(
                    Triple(subj, RDF_TYPE, self.expand(t), True, None, None)
                )

        for marctag in record.tags():
            marcfields = record.fields_with_tag(marctag)
            for key, rule in self.mapping.tags.items():
                if not self._tag_res[key].search(marctag):
                    continue
                for mf in marcfields:
                    if "subfield" not in rule:
                        if isinstance(mf, ControlField):
                            self._convert_controlfield(mf, rule, assert_, relate)
                    else:
                        if isinstance(mf, DataField):
                            self._convert_datafield(mf, rule, assert_, relate)
        return stmts

    # -- controlfield branch (rdfmodeler.rb:160-186) -------------------------
    def _convert_controlfield(self, mf, rule, assert_, relate):
        marc_object = mf.value
        if not py_ruby_strip(marc_object):
            return
        for _name, value in rule.items():
            ospec = value["object"]
            objects = generate_objects(marc_object, _obj_opts(ospec), mf)
            for o in objects:
                if not py_ruby_strip(o):
                    continue  # per-object guard, cf branch only (:168)
                if ospec.get("datatype") != "literal":
                    obj, is_uri = self.generate_uri(o, ospec.get("prefix"))
                    assert_(value.get("predicate"), obj, is_uri)
                    if "relation" in value:
                        # relate() force-wraps its subject with RDF::URI
                        # (rdfmodeler.rb:145), so this is emitted even when
                        # the object coerced to a literal.
                        relate(
                            obj,
                            RDF_TYPE,
                            self.expand(value["relation"]["class"]),
                            True,
                        )
                else:
                    assert_(value.get("predicate"), o, False)

    # -- datafield branch (rdfmodeler.rb:188-304) ----------------------------
    def _convert_datafield(self, mf: DataField, rule, assert_, relate):
        for code, spec in rule["subfield"].items():
            predicate = self._conditions_predicate(mf, spec)
            if "relation" in spec:
                self._relation_branch(mf, code, spec, predicate, assert_, relate)
            else:
                self._straight_branch(mf, code, spec, predicate, assert_)

    def _conditions_predicate(self, mf: DataField, spec) -> str | None:
        """rdfmodeler.rb:200-234 — CASE-expression predicate selection."""
        if "conditions" not in spec:
            return spec.get("predicate")
        cond = spec["conditions"]
        predicate = ""
        if "subfield" in cond:
            for key, value in cond["subfield"].items():
                # a missing "default" key (e.g. skeleton 015$a) yields a nil
                # predicate in Ruby -> assert() skips the triple
                m = mf.first(key) or ""
                if m:
                    cleaned = _DOTDASH.sub("", m).lower()
                    last = ruby_scan_last(cleaned, value["orig"])
                    if last is not None:
                        predicate = value["subs"].get(last) or ""
                    if not predicate:
                        predicate = value.get("default")
                else:
                    predicate = value.get("default")
        elif "indicator" in cond:
            ind = cond["indicator"]
            for ind_key, ind_col in (("indicator1", mf.ind1), ("indicator2", mf.ind2)):
                if ind.get(ind_key):
                    last = ruby_scan_last(ind_col, ind[ind_key]["orig"])
                    if last is not None:
                        predicate = ind[ind_key]["subs"].get(last) or ""
            if not predicate:
                predicate = ind.get("default")
        return predicate

    def _relation_branch(self, mf, code, spec, predicate, assert_, relate):
        """rdfmodeler.rb:238-278."""
        marc_object = mf.first(code)
        if not marc_object:
            return
        ospec = spec["object"]
        objects = generate_objects(marc_object, _obj_opts(ospec), mf)
        rel_class = self.expand(spec["relation"]["class"])
        for o in objects:
            obj_uri, is_uri = self.generate_uri(o, ospec.get("prefix"))
            assert_(predicate, obj_uri, is_uri)
            # relate() force-wraps its subject with RDF::URI
            # (rdfmodeler.rb:145): the rdf:type and relation-subfield
            # triples are emitted with the full string as subject URI even
            # when the parent object coerced to a literal.
            relate(obj_uri, RDF_TYPE, rel_class, True)
            rel_subfields = spec["relation"].get("subfield")
            if not rel_subfields:
                continue
            for rel_code, rel_spec in rel_subfields.items():
                relobject = mf.first(rel_code)
                if not relobject:
                    continue
                rospec = rel_spec["object"]
                relobjects = generate_objects(relobject, _obj_opts(rospec), mf)
                rel_pred = self.expand(rel_spec["predicate"])
                for ro in relobjects:
                    if rospec.get("datatype") == "uri":
                        # forced URI (rdfmodeler.rb:268)
                        ro_uri, _ = self.generate_uri(ro, rospec.get("prefix"))
                        relate(obj_uri, rel_pred, ro_uri, True)
                    else:
                        relate(
                            obj_uri,
                            rel_pred,
                            ro,
                            False,
                            _norm_lang(rospec.get("lang")),
                        )

    def _straight_branch(self, mf, code, spec, predicate, assert_):
        """rdfmodeler.rb:283-303."""
        marc_object = mf.first(code)
        if not marc_object:
            return
        ospec = spec["object"]
        objects = generate_objects(marc_object, _obj_opts(ospec), mf)
        dt = ospec.get("datatype")
        for o in objects:
            if dt == "uri":
                obj, is_uri = self.generate_uri(o, ospec.get("prefix"))
                assert_(predicate, obj, is_uri)
            elif dt == "integer":
                assert_(predicate, o, False, None, "xsd:integer")
            elif dt == "float":
                assert_(predicate, o, False, None, "xsd:float")
            else:
                assert_(predicate, o, False, _norm_lang(ospec.get("lang")))


def convert_records(
    records, mapping: Mapping, library: Library | None = None, dedup: bool = True
) -> list[Triple]:
    conv = OracleConverter(mapping, library)
    out: list[Triple] = []
    for rec in records:
        out.extend(conv.convert(rec))
    if dedup:
        seen = set()
        uniq = []
        for t in out:
            if t not in seen:
                seen.add(t)
                uniq.append(t)
        return uniq
    return out
