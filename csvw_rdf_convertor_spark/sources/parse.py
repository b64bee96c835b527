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


def serialize_rdf(triples, fmt: str, prefix_map: dict | None = None,
                  base: str = ""):
    """Format router for RDF OUTPUT — parity twin of loaders/serialize.ts:
    44-66 (N3 StreamWriter for nt/nq/ttl/trig, streaming JSON-LD writer).

    Line formats stay DISTRIBUTED: ``nt``/``nq`` return a DataFrame of
    serialized lines (write with ``.write.text``) — the 100 TB path. The
    buffered pretty formats (``ttl``/``trig``/``jsonld``) collect and
    return the document as a ``str`` (fixture-scale by design, same as the
    reference's buffered writers)."""
    fmt = fmt.lower().lstrip(".")
    if fmt in ("nt", "ntriples", "nq", "nquads"):
        from ..functions.ntriples import to_ntriples_lines
        return to_ntriples_lines(triples)
    if fmt in ("ttl", "turtle"):
        from .turtle import to_pretty_turtle
        return to_pretty_turtle(triples, prefix_map, base)
    if fmt == "trig":
        from .turtle import to_pretty_trig
        return to_pretty_trig(triples, prefix_map, base)
    if fmt == "jsonld":
        from .jsonld_write import to_jsonld
        return to_jsonld(triples, prefix_map)
    if fmt in ("rdf", "rdfxml", "xml"):
        # beyond the reference: its N3 route writes TURTLE for 'rdfxml'
        # (rdf-serialization.ts:1-8) — this is real RDF/XML
        from .rdfxml_write import to_rdfxml
        return to_rdfxml(triples, prefix_map, base)
    raise ValueError(f"unsupported RDF output format: {fmt!r}")
