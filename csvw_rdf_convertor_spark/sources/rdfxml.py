"""RDF/XML-subset parser (S4 completion; reference loaders/parse.ts:23-41 +
rdf-serialization.ts route ``.rdf``/``.xml`` inputs through rdfxml-streaming-
parser).

Driver-side by design, like the Turtle and JSON-LD readers: RDF/XML is a
whole-document grammar and the reference's ``.rdf`` inputs are fixture-
scale; big-data ingest stays on the line-parallel NT/NQ path. Stdlib
``xml.etree`` only — no new libraries.

Subset covered (the shapes the W3C CSVW corpus and common vocab dumps use):

- ``rdf:RDF`` roots and bare single-node documents;
- node elements: ``rdf:Description`` and TYPED node elements (element name
  becomes an rdf:type triple), ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID``
  / anonymous (deterministic skolem bnode from the element path — T9);
- property elements: ``rdf:resource`` references, nested node elements,
  text literals with ``rdf:datatype`` / ``xml:lang`` (inherited), property
  ATTRIBUTES on node elements AND on property elements (empty property
  element → implicit bnode per RDF/XML §2.12; with ``rdf:resource`` →
  properties of the referenced object), ``rdf:parseType="Resource"``
  (implicit bnode) and ``rdf:parseType="Collection"`` (rdf:first/rest
  chains with deterministic bnode ids);
- ``xml:base`` resolution for about/resource/ID;
- ``rdf:parseType="Literal"`` → rdf:XMLLiteral-typed literal whose lexical
  form is EXCLUSIVE XML CANONICALIZATION (xml-exc-c14n, without comments)
  of the content, per RDF 1.1 Concepts §5.1: attributes sorted by
  (namespace-URI, local-name), namespace declarations only for visibly-
  utilized prefixes not already rendered by an output ancestor, c14n
  character escaping, no self-closing tags. One documented seam remains:
  ElementTree does not record WHICH source prefix a namespace binding used
  when several in-scope prefixes bind the same URI — the serializer then
  picks deterministically (default prefix first, then lexicographic), and
  that choice could differ from the source document's. One binding per URI
  (the overwhelmingly common case) round-trips exactly.

Unsupported (raises ``ValueError``): reification attributes
(``rdf:bagID``), ``rdf:aboutEach``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..functions.terms import skolem_value
from ..spec import RDF, XSD

Triple7 = tuple[str, str, str, str, str, str, str]

_RDF_NS = "{" + RDF + "}"
_XML_NS = "{http://www.w3.org/XML/1998/namespace}"
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

#: rdf: attributes that are NOT property attributes
#: rdf:type is NOT here: it is a legal PROPERTY attribute on both node and
#: property elements (RDF/XML §2.13/§2.12) — the attribute loops handle it
#: explicitly (ADVICE r4: with 'type' in this set those branches were
#: unreachable and a property-element rdf:type attribute was dropped).
_SYNTAX_ATTRS = {_RDF_NS + a for a in
                 ("about", "ID", "nodeID", "resource", "datatype",
                  "parseType")}


def _split_qname(tag: str) -> str:
    """'{ns}local' → ns + local (IRI of the element/attribute)."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _resolve(iri: str, base: str) -> str:
    if _ABS_IRI.match(iri) or not base:
        return iri
    if iri.startswith("#") or not iri:
        return base.split("#")[0] + iri
    import urllib.parse
    return urllib.parse.urljoin(base, iri)


def _parse_with_scopes(text: str):
    """Parse, recording each element's IN-SCOPE prefix→URI map (what
    ``ET.fromstring`` throws away and exclusive c14n needs). Returns
    ``(root, scopes)`` with ``scopes`` keyed by ``id(element)`` — ids stay
    valid because the tree keeps every element alive."""
    parser = ET.XMLPullParser(("start", "end", "start-ns"))
    parser.feed(text)
    scopes: dict[int, dict[str, str]] = {}
    stack: list[dict[str, str]] = [{}]
    pending: list[tuple[str, str]] = []
    root = None
    for ev, obj in parser.read_events():
        if ev == "start-ns":
            pending.append(obj)          # (prefix, uri); '' = default ns
        elif ev == "start":
            scope = dict(stack[-1])
            scope.update(pending)
            pending.clear()
            stack.append(scope)
            scopes[id(obj)] = scope
            if root is None:
                root = obj
        else:                            # end
            stack.pop()
    parser.close()
    if root is None:
        raise ValueError("empty RDF/XML document")
    return root, scopes


def parse_rdfxml(text: str, base: str = "") -> list[Triple7]:
    root, scopes = _parse_with_scopes(text)
    out: list[Triple7] = []
    base = root.get(_XML_NS + "base", base)
    if root.tag == _RDF_NS + "RDF":
        for i, child in enumerate(root):
            _node(child, base, out, path=f"[{i}]", scopes=scopes)
    else:
        _node(root, base, out, path="$", scopes=scopes)
    return out


# --- exclusive XML canonicalization (xml-exc-c14n, without comments) ----
# Subset serializer for rdf:XMLLiteral lexical forms: ET's default parser
# already drops comments and processing instructions, so the
# "without comments" variant is exactly what the tree holds.

_XML_URI = "http://www.w3.org/XML/1998/namespace"


def _esc_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace("\r", "&#xD;"))


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace('"', "&quot;").replace("\t", "&#x9;")
             .replace("\n", "&#xA;").replace("\r", "&#xD;"))


def _prefix_for(uri: str, scope: dict[str, str], path: str,
                attr: bool = False) -> str:
    """Deterministic prefix choice for a namespace URI (docstring seam:
    the source prefix is unrecoverable when several bind the same URI).
    Attributes cannot use the default prefix."""
    if uri == _XML_URI:
        return "xml"
    cands = [p for p, u in scope.items() if u == uri and (p or not attr)]
    if not cands:
        raise ValueError(
            f"XMLLiteral content at {path} uses namespace {uri!r} with no "
            f"in-scope {'non-default ' if attr else ''}prefix declaration")
    return min(cands, key=lambda p: (p != "", p))


def _c14n_elem(el: ET.Element, scopes: dict[int, dict[str, str]],
               rendered: dict[str, str], out: list[str], path: str) -> None:
    scope = scopes.get(id(el), {})
    if el.tag.startswith("{"):
        uri, local = el.tag[1:].split("}", 1)
        eprefix = _prefix_for(uri, scope, path)
    else:
        uri, local, eprefix = "", el.tag, ""
    name = f"{eprefix}:{local}" if eprefix else local

    # visibly-utilized namespace prefixes: the element's own + each
    # namespaced attribute's (exc-c14n §3; xml: is built in, never declared)
    utilized: dict[str, str] = {}
    if uri:
        utilized[eprefix] = uri
    elif rendered.get(""):
        utilized[""] = ""                # undeclare inherited default ns
    attrs = []
    for aname, aval in el.attrib.items():
        if aname.startswith("{"):
            auri, alocal = aname[1:].split("}", 1)
            if auri == _XML_URI:
                aprefix = "xml"
            else:
                aprefix = _prefix_for(auri, scope, path, attr=True)
                utilized[aprefix] = auri
            attrs.append((auri, alocal, f"{aprefix}:{alocal}", aval))
        else:
            attrs.append(("", aname, aname, aval))

    decls = sorted((p, u) for p, u in utilized.items()
                   if p != "xml" and rendered.get(p, "") != u)
    new_rendered = rendered
    if decls:
        new_rendered = dict(rendered)
        new_rendered.update(decls)

    out.append("<" + name)
    for p, u in decls:                   # ns nodes first, sorted by prefix
        out.append(f' xmlns="{_esc_attr(u)}"' if p == ""
                   else f' xmlns:{p}="{_esc_attr(u)}"')
    for auri, alocal, aqname, aval in sorted(attrs):
        out.append(f' {aqname}="{_esc_attr(aval)}"')
    out.append(">")
    out.append(_esc_text(el.text or ""))
    for j, child in enumerate(el):
        _c14n_elem(child, scopes, new_rendered, out, f"{path}.{j}")
        out.append(_esc_text(child.tail or ""))
    out.append(f"</{name}>")


def _c14n_literal(prop: ET.Element, scopes: dict[int, dict[str, str]],
                  path: str) -> str:
    """Exclusive c14n of a parseType="Literal" property element's CONTENT
    (mixed text + elements). The output context starts empty — every
    visibly-utilized prefix re-declares inside the literal, which is what
    makes the lexical form context-free (RDF 1.1 Concepts §5.1)."""
    parts = [_esc_text(prop.text or "")]
    for j, child in enumerate(prop):
        _c14n_elem(child, scopes, {}, parts, f"{path}.{j}")
        parts.append(_esc_text(child.tail or ""))
    return "".join(parts)


def _subject_of(el: ET.Element, base: str, path: str) -> tuple[str, str]:
    about = el.get(_RDF_NS + "about")
    rid = el.get(_RDF_NS + "ID")
    node_id = el.get(_RDF_NS + "nodeID")
    if about is not None:
        return _resolve(about, base), "iri"
    if rid is not None:
        return _resolve("#" + rid, base), "iri"
    if node_id is not None:
        return "_:" + node_id, "bnode"
    return "_:" + skolem_value("rdfxml", path)[:24], "bnode"


def _node(el: ET.Element, base: str, out: list[Triple7], path: str,
          lang: str = "", scopes: dict | None = None) -> tuple[str, str]:
    """Emit a node element's triples; returns (subject, kind)."""
    base = el.get(_XML_NS + "base", base)
    lang = el.get(_XML_NS + "lang", lang)
    if el.get(_RDF_NS + "aboutEach") is not None or \
            el.get(_RDF_NS + "bagID") is not None:
        raise ValueError(f"unsupported RDF/XML feature at {path}")
    subj, kind = _subject_of(el, base, path)

    def emit(pred, lex, okind, dtype="", olang=""):
        out.append((subj, pred, lex, okind, dtype, olang, ""))

    tag_iri = _split_qname(el.tag)
    if tag_iri != RDF + "Description":
        emit(RDF + "type", tag_iri, "iri")
    # property attributes (non-syntax, non-xml)
    for attr, val in el.attrib.items():
        if attr in _SYNTAX_ATTRS or attr.startswith(_XML_NS):
            continue
        a_iri = _split_qname(attr)
        if a_iri == RDF + "type":
            emit(RDF + "type", _resolve(val, base), "iri")
        else:
            emit(a_iri, val, "literal", "", lang)
    for j, prop in enumerate(el):
        _property(prop, subj, base, out, f"{path}.{j}", lang, emit, scopes)
    return subj, kind


def _property(prop: ET.Element, subj: str, base: str, out: list[Triple7],
              path: str, lang: str, emit, scopes: dict | None = None) -> None:
    pred = _split_qname(prop.tag)
    lang = prop.get(_XML_NS + "lang", lang)
    parse_type = prop.get(_RDF_NS + "parseType")
    resource = prop.get(_RDF_NS + "resource")
    node_id = prop.get(_RDF_NS + "nodeID")
    dtype = prop.get(_RDF_NS + "datatype")

    if parse_type == "Literal":
        # XML literal (RDF/XML §2.11): content canonicalizes to the
        # lexical form (exclusive c14n without comments, RDF 1.1 Concepts
        # §5.1), datatype rdf:XMLLiteral. Source prefixes are preserved
        # via the pull-parser scope map (see _parse_with_scopes).
        emit(pred, _c14n_literal(prop, scopes or {}, path),
             "literal", RDF + "XMLLiteral")
        return
    if parse_type == "Resource":
        b = "_:" + skolem_value("rdfxml-res", path)[:24]
        emit(pred, b, "bnode")
        for j, child in enumerate(prop):
            def bemit(p2, lex, k2, d2="", l2=""):
                out.append((b, p2, lex, k2, d2, l2, ""))
            _property(child, b, base, out, f"{path}.{j}", lang, bemit,
                      scopes)
        return
    if parse_type == "Collection":
        items = [(j, child) for j, child in enumerate(prop)]
        if not items:
            emit(pred, RDF + "nil", "iri")
            return
        heads = ["_:" + skolem_value("rdfxml-li", path, str(j))[:24]
                 for j, _c in items]
        emit(pred, heads[0], "bnode")
        for idx, (j, child) in enumerate(items):
            o, okind = _node(child, base, out, f"{path}.{j}", lang, scopes)
            out.append((heads[idx], RDF + "first", o, okind, "", "", ""))
            nxt = (heads[idx + 1], "bnode") if idx + 1 < len(heads) \
                else (RDF + "nil", "iri")
            out.append((heads[idx], RDF + "rest", nxt[0], nxt[1], "", "", ""))
        return
    # property ATTRIBUTES on the property element (RDF/XML §2.12 "omitting
    # blank nodes"): properties of the (resource or implicit-bnode) OBJECT
    prop_attrs = [(attr, val) for attr, val in prop.attrib.items()
                  if attr not in _SYNTAX_ATTRS
                  and not attr.startswith(_XML_NS)]

    def emit_obj_attrs(obj: str) -> None:
        for attr, val in prop_attrs:
            a_iri = _split_qname(attr)
            if a_iri == RDF + "type":
                out.append((obj, RDF + "type", _resolve(val, base),
                            "iri", "", "", ""))
            else:
                out.append((obj, a_iri, val, "literal", "", lang, ""))

    if resource is not None:
        o = _resolve(resource, base)
        emit(pred, o, "iri")
        emit_obj_attrs(o)
        return
    if node_id is not None:
        emit(pred, "_:" + node_id, "bnode")
        emit_obj_attrs("_:" + node_id)
        return
    children = list(prop)
    if children:
        if len(children) != 1:
            raise ValueError(f"property element with {len(children)} "
                             f"node children at {path}")
        if prop_attrs:
            raise ValueError(f"property attributes alongside a node-element "
                             f"child at {path}")
        o, okind = _node(children[0], base, out, f"{path}.0", lang, scopes)
        emit(pred, o, okind)
        return
    if prop_attrs:
        # empty property element with property attributes → implicit bnode
        # (ADVICE r3: previously silently dropped + wrong empty literal)
        if (prop.text or "").strip():
            raise ValueError(f"property attributes mixed with literal "
                             f"content at {path}")
        b = "_:" + skolem_value("rdfxml-pa", path)[:24]
        emit(pred, b, "bnode")
        emit_obj_attrs(b)
        return
    # text literal
    text = prop.text or ""
    if dtype:
        emit(pred, text, "literal", _resolve(dtype, base), "")
    else:
        emit(pred, text, "literal", "", lang)


def read_rdfxml(spark, path: str, base: str = ""):
    """Parse an .rdf/.xml file driver-side → triples DataFrame in
    TRIPLE_COLS shape (same contract as read_turtle/read_jsonld)."""
    from pathlib import Path

    from ..functions.terms import TRIPLE_COLS
    rows = parse_rdfxml(Path(path).read_text("utf-8"), base)
    return spark.createDataFrame(
        rows, ", ".join(f"{c} string" for c in TRIPLE_COLS))
