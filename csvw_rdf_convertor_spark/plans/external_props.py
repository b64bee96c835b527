"""T8: external (non-CSVW) descriptor annotations re-emitted as RDF.

Reference: descriptor.ts:334-390 splits namespaced JSON-LD props off the
descriptor into quads under temp subjects; convertor.ts:867-878 re-points
them at the group/table node at emission. Here the props arrive already
collected on ``TableSpec.external``; this module flattens them driver-side
into a constant triple list (they are descriptor-sized, not data-sized) that
standard mode unions into the output.

Nested objects get deterministic skolem children keyed by their JSON path —
matching the engine-wide T9 rule (no counters like the reference's
``externalsubj/N``; reproducible across retries).
"""

from __future__ import annotations

import hashlib
from typing import Any

from ..spec import XSD, datatype_iri, expand_iri

Triple = tuple[str, str, str, str, str, str, str]


def _skolem(*parts: str) -> str:
    h = hashlib.sha256("\x1f".join(parts).encode()).hexdigest()[:32]
    return f"_:sk{h}"


def external_triples(external: tuple[tuple[str, Any], ...], subject: str,
                     base: str = "", default_lang: str = "") -> list[Triple]:
    out: list[Triple] = []
    for key, value in external:
        _emit(out, subject, expand_iri(key, base), value, base, default_lang,
              path=(subject, key))
    return out


def _emit(out: list[Triple], subj: str, pred: str, value: Any, base: str,
          lang: str, path: tuple[str, ...]) -> None:
    if isinstance(value, list):
        for i, v in enumerate(value):
            _emit(out, subj, pred, v, base, lang, path + (str(i),))
        return
    if isinstance(value, dict):
        if "@id" in value and len(value) == 1:
            out.append((subj, pred, expand_iri(value["@id"], base),
                        "iri", "", "", ""))
            return
        if "@value" in value:
            dtype = value.get("@type", "")
            if dtype:
                dtype = (datatype_iri(dtype.split(":", 1)[1])
                         if dtype.startswith("xsd:") else expand_iri(dtype, base))
            vlang = value.get("@language", "" if dtype else lang)
            out.append((subj, pred, str(value["@value"]), "literal",
                        dtype, vlang if not dtype else "", ""))
            return
        # nested annotation object → skolem child
        child = _skolem(*path)
        out.append((subj, pred, child, "bnode", "", "", ""))
        for k, v in value.items():
            if k.startswith("@"):
                continue
            _emit(out, child, expand_iri(k, base), v, base, lang, path + (k,))
        return
    if isinstance(value, bool):
        out.append((subj, pred, "true" if value else "false", "literal",
                    XSD + "boolean", "", ""))
        return
    if isinstance(value, (int, float)):
        dtype = XSD + ("integer" if isinstance(value, int) else "double")
        out.append((subj, pred, str(value), "literal", dtype, "", ""))
        return
    out.append((subj, pred, str(value), "literal", "", lang, ""))
