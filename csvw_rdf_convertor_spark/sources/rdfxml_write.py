"""RDF/XML writer (S5 completion — BEYOND the reference: its serializer
routes every format through N3, whose ``n3Formats`` table maps ``rdfxml`` to
``'text/turtle'`` (loaders/rdf-serialization.ts:1-8) — i.e. asking the
reference for RDF/XML silently yields a Turtle document. This module writes
real RDF/XML, so all six advertised serializations genuinely round-trip.

Driver-side buffered pretty writer, same contract as ``pretty_turtle`` /
``to_jsonld`` (fixture-scale by design; the distributed at-scale outputs
stay the NT/NQ and streaming-Turtle line paths). Deterministic: subjects,
predicates and objects sorted; namespace prefixes assigned in sorted
namespace order.

Shape emitted (the exact subset ``sources/rdfxml.py`` parses back):

- one ``<rdf:Description rdf:about=…>`` (or ``rdf:nodeID=…``) per subject;
- ``rdf:type`` and IRI objects as ``rdf:resource`` property elements;
- bnode objects as ``rdf:nodeID`` property elements;
- plain / language / typed literals as text property elements with
  ``xml:lang`` / ``rdf:datatype``;
- ``rdf:XMLLiteral`` lexical forms embedded RAW under
  ``rdf:parseType="Literal"`` — lexical forms are exclusive-c14n and hence
  context-free (every visibly-utilized prefix is declared inside the
  content), so byte-identical embedding round-trips through the parser's
  re-canonicalization. Non-well-formed XMLLiteral input raises.

RDF/XML has NO named graphs: a non-empty ``graph`` value raises (write TriG
or N-Quads instead) — loudly, where the reference would silently emit the
wrong format.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..spec import RDF

#: longest IRI suffix usable as an XML element local name (NCName: starts
#: with a letter/underscore; no colon). Predicates that cannot split this
#: way (e.g. all-digit local parts) have no RDF/XML representation → raise.
_NCNAME_SUFFIX = re.compile(r"[A-Za-z_][A-Za-z0-9._\-]*$")
_NCNAME = re.compile(r"^[A-Za-z_][A-Za-z0-9._\-]*$")
XMLLITERAL = RDF + "XMLLiteral"


def _esc_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace("\r", "&#xD;"))


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace('"', "&quot;").replace("\t", "&#x9;")
             .replace("\n", "&#xA;").replace("\r", "&#xD;"))


def split_qname(iri: str) -> tuple[str, str]:
    """IRI → (namespace, NCName local) at the longest valid local suffix.

    Raises when no split exists — such predicates are unserializable in
    RDF/XML (the grammar has no rdf:resource-style escape for property
    NAMES), which this writer reports instead of corrupting the IRI."""
    m = _NCNAME_SUFFIX.search(iri)
    if not m or m.start() == 0:
        raise ValueError(
            f"predicate IRI {iri!r} has no namespace/NCName split — it "
            "cannot be expressed as an RDF/XML property element; use "
            "Turtle/N-Triples output for this graph")
    return iri[:m.start()], iri[m.start():]


def _strip_bnode(label: str) -> str:
    return label[2:] if label.startswith("_:") else label


def _node_id_map(labels: set[str]) -> dict[str, str]:
    """Document-scoped INJECTIVE NCName relabeling for rdf:nodeID values.

    NCName labels keep their name; others are prefixed with ``b`` (and any
    NCName-invalid characters hex-escaped). Prefixing alone is not
    injective — ``_:1`` and ``_:b1`` would both become ``b1`` and merge two
    distinct nodes on re-parse — so images are assigned over the document's
    full label set with a deterministic ``_k`` counter on collision."""
    out: dict[str, str] = {}
    taken: set[str] = set()
    for lab in sorted(labels):
        cand = lab if _NCNAME.match(lab) else "b" + "".join(
            c if re.match(r"[A-Za-z0-9._\-]", c) else f"_{ord(c):x}_"
            for c in lab)
        final, k = cand, 0
        while final in taken:
            k += 1
            final = f"{cand}_{k}"
        out[lab] = final
        taken.add(final)
    return out


def _check_xml_literal(lex: str) -> str:
    try:
        ET.fromstring(f"<c14n>{lex}</c14n>")
    except ET.ParseError as exc:
        raise ValueError(
            f"rdf:XMLLiteral lexical form is not well-formed XML content "
            f"({exc}); cannot embed under parseType=\"Literal\"") from exc
    return lex


def pretty_rdfxml(rows, prefix_map: dict[str, str] | None = None,
                  base: str = "") -> str:
    """7-tuple rows (TRIPLE_COLS order) → deterministic RDF/XML document."""
    rows = [tuple(r) for r in rows]
    named = sorted({r[6] for r in rows if len(r) > 6 and r[6]})
    if named:
        raise ValueError(
            f"RDF/XML has no named graphs; got graph(s) {named[:3]} — "
            "serialize as trig/nquads instead (the reference silently "
            "writes Turtle here; this engine refuses)")

    # namespace table: only predicates need QName splits (datatypes and
    # resources are attribute VALUES — full IRIs, no prefix required)
    namespaces: set[str] = {RDF}
    for r in rows:
        namespaces.add(split_qname(r[1])[0])
    inv: dict[str, str] = {}
    for pref, ns in sorted((prefix_map or {}).items()):
        inv.setdefault(ns, pref)
    prefixes: dict[str, str] = {}
    used: set[str] = {"xml", "xmlns"}
    n = 0
    for ns in sorted(namespaces):
        if ns == RDF:
            prefixes[ns] = "rdf"
            continue
        pref = inv.get(ns)
        if not pref or pref in used or pref == "rdf" \
                or not _NCNAME.match(pref):
            n += 1
            pref = f"ns{n}"
        prefixes[ns] = pref
        used.add(pref)

    out = ['<?xml version="1.0" encoding="utf-8"?>']
    decls = "".join(f' xmlns:{p}="{_esc_attr(ns)}"'
                    for ns, p in sorted(prefixes.items(),
                                        key=lambda kv: kv[1]))
    base_attr = f' xml:base="{_esc_attr(base)}"' if base else ""
    out.append(f"<rdf:RDF{decls}{base_attr}>")

    by_subj: dict[str, list] = {}
    for r in rows:
        by_subj.setdefault(r[0], []).append(r)
    bnode_labels = ({_strip_bnode(s) for s in by_subj if s.startswith("_:")}
                    | {_strip_bnode(r[2]) for r in rows if r[3] == "bnode"})
    nid = _node_id_map(bnode_labels)
    for subj in sorted(by_subj):
        if subj.startswith("_:"):
            out.append(f'  <rdf:Description rdf:nodeID='
                       f'"{_esc_attr(nid[_strip_bnode(subj)])}">')
        else:
            out.append(f'  <rdf:Description rdf:about="{_esc_attr(subj)}">')
        for r in sorted(set(by_subj[subj])):
            _, pred, lex, kind, dtype, lang = r[:6]
            ns, local = split_qname(pred)
            q = f"{prefixes[ns]}:{local}"
            if kind == "iri":
                out.append(f'    <{q} rdf:resource="{_esc_attr(lex)}"/>')
            elif kind == "bnode":
                out.append(f'    <{q} rdf:nodeID='
                           f'"{_esc_attr(nid[_strip_bnode(lex)])}"/>')
            elif dtype == XMLLITERAL:
                out.append(f'    <{q} rdf:parseType="Literal">'
                           f"{_check_xml_literal(lex)}</{q}>")
            elif dtype:
                out.append(f'    <{q} rdf:datatype="{_esc_attr(dtype)}">'
                           f"{_esc_text(lex)}</{q}>")
            elif lang:
                out.append(f'    <{q} xml:lang="{_esc_attr(lang)}">'
                           f"{_esc_text(lex)}</{q}>")
            else:
                out.append(f"    <{q}>{_esc_text(lex)}</{q}>")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def to_rdfxml(triples, prefix_map: dict[str, str] | None = None,
              base: str = "") -> str:
    """Collect + pretty-print (driver-side, fixture-scale — the same
    contract as to_pretty_turtle/to_jsonld)."""
    from .turtle import _collect_rows
    return pretty_rdfxml(_collect_rows(triples), prefix_map, base)
