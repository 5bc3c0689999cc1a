"""RDF vocabulary registry: prefix -> namespace URI, and mapping-key
expansion ("DC.creator" -> "http://purl.org/dc/terms/creator").

Reference semantics: marc2rdf registers each vocabulary as an RDF.rb
constant via ``RDF.const_set(prefix.upcase, RDF::Vocabulary.new(uri))``
(/root/reference/lib/vocabularies.rb:71-73) and resolves mapping
predicate strings with ``RDF.module_eval("DC.creator")``
(/root/reference/lib/rdfmodeler.rb:139,177,255,268).  A vocabulary term
URI is plain string concatenation of namespace + term.

This is driver-side config: loaded once, expanded at mapping-compile
time, and (conceptually) broadcast — never shuffled (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_VOCAB_PATH = os.path.join(_HERE, "fixtures", "vocabularies.json")

# RDF.rb built-ins the mapping/config rely on beyond the JSON registry:
# RDF.type (rdfmodeler.rb:31,177,255) and RDF::XSD typed literals
# (rdfmodeler.rb:294,296).
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF_NS + "type"
XSD_INTEGER = XSD_NS + "integer"
XSD_FLOAT = XSD_NS + "float"


class Vocabulary:
    """prefix(upper) -> namespace URI registry with term expansion."""

    def __init__(self, prefix_to_uri: dict[str, str]):
        self._ns = {k.upper(): v for k, v in prefix_to_uri.items()}
        # Built-ins (RDF.rb predefined constants usable in mappings even
        # if absent from the JSON registry).
        self._ns.setdefault("RDF", RDF_NS)
        self._ns.setdefault("XSD", XSD_NS)

    @classmethod
    def load(cls, path: str = DEFAULT_VOCAB_PATH) -> "Vocabulary":
        with open(path, encoding="utf-8") as f:
            entries = json.load(f)
        return cls({e["prefix"]: e["uri"] for e in entries})

    def prefixes(self) -> list[str]:
        """Registered (upper-case) prefixes."""
        return list(self._ns)

    def namespace(self, prefix: str) -> str:
        try:
            return self._ns[prefix.upper()]
        except KeyError:
            raise KeyError(
                f"unknown vocabulary prefix {prefix!r}; register it in "
                f"vocabularies.json (fail-fast at compile, SURVEY.md G6)"
            ) from None

    def expand(self, ref: str) -> str:
        """Expand "PREFIX.term" to a full URI.

        Mirrors ``RDF.module_eval("#{p}")``: PREFIX is a registered
        vocabulary constant, term is concatenated onto its namespace.
        """
        prefix, sep, term = ref.partition(".")
        if not sep or not term:
            raise ValueError(f"malformed vocabulary reference {ref!r}")
        return self.namespace(prefix) + term


@lru_cache(maxsize=1)
def default_vocabulary() -> Vocabulary:
    return Vocabulary.load()
