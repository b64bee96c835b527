"""Driver-side descriptor resolution: locate + load + cache (S2/S3/S6/S8).

Reference behavior (csvw2rdf/convertor.ts:220-318, utils/replace-url.ts,
fetch-cache.ts:16-53): resolve metadata for a CSV URL via Link header →
`/.well-known/csvm` templates → default locations `{+url}-metadata.json`
and `csv-metadata.json` → empty-schema fallback; all fetches memoized and
subject to longest-prefix URL overrides.

This is pure driver-side control flow (never a Spark op). The sandbox has no
network, so only ``file:`` / local-path resolution is active; the HTTP
branch raises cleanly. The resolved descriptor compiles via
``spec.parse_descriptor`` into the broadcastable mapping spec.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

from ..spec import TableGroupSpec, parse_descriptor

#: default metadata locations, in priority order (convertor.ts:74-77)
DEFAULT_LOCATIONS = ("{+url}-metadata.json", "csv-metadata.json")


class PathOverrides:
    """Longest-prefix URL rewriting (S8; utils/replace-url.ts)."""

    def __init__(self, rules: dict[str, str] | None = None,
                 regex_rules: list[tuple[str, str]] | None = None):
        self.rules = dict(rules or {})
        self.regex_rules = list(regex_rules or [])

    def apply(self, url: str) -> str:
        best = ""
        for prefix in self.rules:
            if url.startswith(prefix) and len(prefix) > len(best):
                best = prefix
        out = self.rules[best] + url[len(best):] if best else url
        for pat, repl in self.regex_rules:
            new = re.sub(pat, repl, out)
            if new != out:
                return new
        return out


class FetchCache:
    """Memoized loads (S6; fetch-cache.ts:16-53). Driver-side dict."""

    def __init__(self, overrides: PathOverrides | None = None):
        self.overrides = overrides or PathOverrides()
        self._cache: dict[str, Any] = {}

    def load_json(self, url: str) -> Any:
        url = self.overrides.apply(url)
        if url in self._cache:
            return self._cache[url]
        if re.match(r"^https?://", url):
            raise NotImplementedError(
                "HTTP descriptor fetch is environment-specific; wire a "
                "requests-backed loader here in production")
        path = Path(url[len("file://"):] if url.startswith("file://") else url)
        data = json.loads(path.read_text())
        self._cache[url] = data
        return data


def locate_metadata(csv_url: str, cache: FetchCache | None = None) -> str | None:
    """Well-known/default metadata discovery for a CSV location
    (convertor.ts:220-318; Link-header branch needs HTTP → production only).
    Returns the metadata URL/path, or None (→ empty-schema fallback)."""
    cache = cache or FetchCache()
    base = Path(csv_url[len("file://"):] if csv_url.startswith("file://") else csv_url)
    for tpl in DEFAULT_LOCATIONS:
        cand = (str(base) + "-metadata.json" if tpl.startswith("{+url}")
                else str(base.parent / tpl))
        if Path(cand).exists():
            return cand
    return None


def resolve_descriptor(csv_url: str, *, cache: FetchCache | None = None,
                       base: str | None = None) -> TableGroupSpec:
    """csv location → TableGroupSpec (empty schema if nothing found —
    the reference's fallback binds a url-less table to the CSV)."""
    cache = cache or FetchCache()
    meta = locate_metadata(csv_url, cache)
    if meta is None:
        raw: dict = {"url": csv_url, "tableSchema": {"columns": []}}
    else:
        raw = _load_normalized(meta, cache)
        if "url" not in raw and "tables" not in raw:
            raw = {**raw, "url": csv_url}
    return parse_descriptor(raw, base or "")


def _load_normalized(meta_url: str, cache: FetchCache) -> dict:
    """Load a descriptor and run the JSON-LD normalization pass
    (descriptor_norm.normalize_descriptor), so csvw:-prefixed / full-IRI
    keys, @value wrappers, and referenced tableSchema/dialect URLs all
    reach parse_descriptor in compact form."""
    from pathlib import Path

    from ..descriptor_norm import normalize_descriptor

    raw = cache.load_json(meta_url)
    meta_dir = str(Path(str(meta_url)).parent)
    return normalize_descriptor(raw, base=meta_dir, loader=cache.load_json,
                                url=str(meta_url))


def resolve_with_header(csv_url: str, *, cache: FetchCache | None = None,
                        base: str | None = None) -> TableGroupSpec:
    """The reference's full default invocation (P11): locate metadata (or
    fall back to a bare url-bound table), then merge each table's own CSV
    header rows into its schema (processCsvHeader, sources/header.py) —
    so a descriptor-less CSV converts end-to-end with header-derived,
    percent-encoded column names."""
    from ..spec import context_language
    from .header import apply_csv_header

    cache = cache or FetchCache()
    meta = locate_metadata(csv_url, cache)
    if meta is None:
        raw: dict = {"url": csv_url, "tableSchema": {"columns": []}}
    else:
        raw = _load_normalized(meta, cache)
        if "url" not in raw and "tables" not in raw:
            raw = {**raw, "url": csv_url}
    ctx_lang = context_language(raw)
    group_lang = raw.get("lang")
    for t in (raw["tables"] if "tables" in raw else [raw]):
        lang = t.get("lang") or group_lang or ctx_lang or "@none"
        apply_csv_header(t, cache.overrides.apply(t.get("url", csv_url)),
                         default_lang=lang)
    return parse_descriptor(raw, base or "")
