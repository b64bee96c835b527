"""Format router for RDF inputs — parity twin of loaders/parse.ts:30-41:
``.rdf``/``.xml`` → RDF/XML, ``.jsonld`` → JSON-LD, ``.nt``/``.nq`` →
the line-parallel distributed N-Triples path, everything else → the
permissive Turtle/TriG parser (the reference's N3 default)."""

from __future__ import annotations

import re

_EXT_RE = re.compile(r"\.([a-z]+)([?#].*)?$", re.I)


def read_rdf(spark, path: str, base: str = "", resolver=None):
    """Parse any supported RDF file into a TRIPLE_COLS DataFrame.

    NT/NQ stay DISTRIBUTED (spark.read.text + regexp parse — the 100 TB
    ingest path); the context-dependent whole-document grammars (Turtle/
    TriG/JSON-LD/RDF-XML) parse driver-side, which matches their
    fixture-scale role (see the module docstrings of turtle_parse/jsonld/
    rdfxml)."""
    m = _EXT_RE.search(path)
    ext = (m.group(1).lower() if m else "")
    if ext in ("rdf", "xml"):
        from .rdfxml import read_rdfxml
        return read_rdfxml(spark, path, base)
    if ext == "jsonld":
        from .jsonld import read_jsonld
        return read_jsonld(spark, path, base=base, resolver=resolver)
    if ext in ("nt", "nq", "ntriples", "nquads"):
        from ..functions.ntriples import parse_ntriples
        return parse_ntriples(spark, path)
    from .turtle_parse import read_turtle
    return read_turtle(spark, path, base)
