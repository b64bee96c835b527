"""JSON-LD writer (S5 completion; reference loaders/serialize.ts:62-66
routes ``jsonld`` output through a streaming JSON-LD serializer).

Driver-side and fixture-scale by design, mirroring the reader
(``sources/jsonld.py``): JSON-LD is a whole-document format (one object
tree), so the buffered writer collects the graph like the reference's
serializer buffers its quad stream; the DISTRIBUTED serialization paths
stay N-Triples/N-Quads/flat Turtle (``functions/ntriples.py``,
``sources/turtle.py``).

Output shape (compacted with the prefix map, deterministic ordering):

```json
{"@context": {"pfx": "namespace…", …},
 "@graph": [ {default-graph node objects…},
             {"@id": "g", …graph-node props…, "@graph": [children…]} ]}
```

- literals keep their EXACT lexical form: typed literals are emitted as
  ``{"@value": lex, "@type": dtype}`` with string values (never native JSON
  numbers, which would re-canonicalize on read), language-tagged as
  ``{"@value": lex, "@language": lang}``;
- IRIs compact to ``pfx:local`` when the prefix map covers them (the reader
  expands them back through the same ``@context``);
- blank nodes keep their ``_:`` identifiers verbatim;
- named-graph triples nest under graph objects; a graph node's OWN
  default-graph properties merge into the same object (the inverse of the
  reader's @graph-sibling handling).

Round-trip contract (tested): ``jsonld_to_triples(json.loads(
serialize_jsonld(rows)))`` is graph-isomorphic to ``rows``.
"""

from __future__ import annotations

import json
import re

from ..spec import RDF, XSD

_PN_LOCAL = re.compile(r"^[A-Za-z_][\w.-]*$")


def _compact(iri: str, pm: dict[str, str]) -> str:
    """IRI → prefixed name when a prefix matches and the local part is a
    term the reader's context expansion reverses; else the absolute IRI."""
    best = None
    for pfx, ns in pm.items():
        if iri.startswith(ns) and (best is None or len(ns) > len(pm[best])):
            if _PN_LOCAL.match(iri[len(ns):]):
                best = pfx
    return f"{best}:{iri[len(pm[best]):]}" if best else iri


def _value_obj(lex: str, kind: str, dtype: str, lang: str,
               pm: dict[str, str]):
    if kind == "iri":
        return {"@id": _compact(lex, pm)}
    if kind == "bnode":
        return {"@id": lex if lex.startswith("_:") else "_:" + lex}
    if lang:
        return {"@value": lex, "@language": lang}
    # ROUND-TRIP CONTRACT (ADVICE r4): a literal typed exactly xsd:string
    # serializes as a plain JSON string and re-parses with obj_dtype '' —
    # RDF-isomorphic (RDF 1.1 §3.3: simple literals ≡ xsd:string) but not
    # tuple-identical. Same normalization pretty_turtle applies; producers
    # in this repo already emit '' for plain strings, so the hash gates see
    # identical tuples in practice.
    if dtype and dtype != XSD + "string":
        return {"@value": lex, "@type": _compact(dtype, pm)}
    return lex


def _node_objects(rows, pm: dict[str, str], graph_children: dict) -> list:
    """Deterministic node objects for one graph's rows; ``graph_children``
    maps graph-name → pre-built child node list to nest under that node."""
    by_subj: dict[str, list] = {}
    for s, p, o, kind, dtype, lang, _g in rows:
        by_subj.setdefault(s, []).append((p, o, kind, dtype, lang))
    # graph names with no triples of their own still need a carrier object
    for g in graph_children:
        by_subj.setdefault(g, [])
    nodes = []
    for s in sorted(by_subj):
        node: dict = {"@id": s if s.startswith("_:") else _compact(s, pm)}
        types = sorted(o for p, o, kind, *_x in by_subj[s]
                       if p == RDF + "type" and kind == "iri")
        if types:
            tv = [_compact(t, pm) for t in types]
            node["@type"] = tv[0] if len(tv) == 1 else tv
        groups: dict[str, list] = {}
        for p, o, kind, dtype, lang in by_subj[s]:
            if p == RDF + "type" and kind == "iri":
                continue
            groups.setdefault(p, []).append((o, kind, dtype, lang))
        for p in sorted(groups):
            vals = [_value_obj(*v, pm) for v in sorted(groups[p])]
            node[_compact(p, pm)] = vals[0] if len(vals) == 1 else vals
        if s in graph_children:
            node["@graph"] = graph_children[s]
        nodes.append(node)
    return nodes


def serialize_jsonld(rows, prefix_map: dict[str, str] | None = None,
                     indent: int = 2) -> str:
    """7-tuple rows (TRIPLE_COLS order) → compacted JSON-LD document text."""
    from .turtle import _derive_prefixes
    rows = [tuple(r) for r in rows]
    pm = dict(prefix_map) if prefix_map is not None else _derive_prefixes(rows)
    graphs: dict[str, list] = {}
    for r in rows:
        graphs.setdefault(r[6] or "", []).append(r)
    default = graphs.pop("", [])
    children = {g: _node_objects(graphs[g], pm, {}) for g in sorted(graphs)}
    top = _node_objects(default, pm, children)
    doc: dict = {}
    if pm:
        doc["@context"] = {p: pm[p] for p in sorted(pm)}
    doc["@graph"] = top
    return json.dumps(doc, indent=indent, ensure_ascii=False)


def to_jsonld(triples, prefix_map: dict[str, str] | None = None) -> str:
    """Collect a triples DataFrame (driver-side, fixture-scale) → JSON-LD."""
    from .turtle import _collect_rows
    return serialize_jsonld(_collect_rows(triples), prefix_map)
