"""Header-driven column naming (P11 default path; reference
csvw2rdf/convertor.ts:409-592 — processCsvHeader / processMicrosyntax /
headerRowToTitles / columnTitlesToNames).

The single most common real-world invocation is "convert this bare CSV, no
descriptor": the reference then derives the table schema from the CSV's own
header row(s) — titles merge into (possibly partial) descriptor columns,
columns gain percent-encoded names from their first default-language title,
nameless/titleless columns fall back to ``_col.N``, and duplicate names are
an error.

This runs DRIVER-SIDE on the raw descriptor dict, before spec compilation:
header rows are a per-file prefix concern (O(header bytes)), never a Spark
job, and mutating the descriptor mirrors the reference exactly — the normal
``parse_descriptor`` path then performs name derivation (including the
'-' → '%2D' percent-encoding and the language-map default-language rule)
and the duplicate-name check.

Divergence note: the reference's headerRowToTitles early-returns out of the
whole row when it meets an already-present title in an array
(convertor.ts:525 ``return`` where a ``continue`` is clearly intended); we
continue with the remaining columns. Its no-header/no-columns fallback also
sizes columns from the UNSLICED first data row even when skipColumns > 0;
we subtract skipColumns so the schema matches what row conversion reads.
"""

from __future__ import annotations

import csv as _csv
from pathlib import Path

from ..spec import DialectSpec


def _local_path(url: str) -> Path:
    return Path(url[len("file://"):] if url.startswith("file://") else url)


def read_csv_prefix(path: str | Path, dialect: DialectSpec, n_rows: int
                    ) -> list[list[str]]:
    """First ``n_rows`` parsed records after comment filtering + skipRows."""
    d = dialect
    out: list[list[str]] = []
    with open(_local_path(str(path)), encoding=d.encoding or "utf-8",
              newline="") as f:
        lines = (ln for ln in f
                 if not (d.commentPrefix and ln.startswith(d.commentPrefix)))
        reader = _csv.reader(
            lines, delimiter=d.delimiter, quotechar=d.quoteChar or '"',
            doublequote=d.doubleQuote,
            escapechar=None if d.doubleQuote else "\\",
            skipinitialspace=bool(d.skipInitialSpace))
        for i, rec in enumerate(reader):
            if i < d.skipRows:
                continue
            out.append(rec)
            if len(out) >= n_rows:
                break
    return out


def _merge_title(col: dict, val: str, default_lang: str) -> None:
    """headerRowToTitles merge cases (convertor.ts:510-545)."""
    t = col.get("titles")
    if t is None:
        col["titles"] = [val]
    elif isinstance(t, str):
        if t != val:
            col["titles"] = [t, val]
    elif isinstance(t, list):
        if val not in t:
            t.append(val)
    elif isinstance(t, dict):
        cur = t.get(default_lang)
        if cur is None:
            t[default_lang] = val
        elif isinstance(cur, str):
            if cur != val:
                t[default_lang] = [cur, val]
        elif val not in cur:
            cur.append(val)


def merge_header_into_table(raw_table: dict, header_rows: list[list[str]],
                            default_lang: str = "@none") -> dict:
    """Merge parsed header rows into a raw table descriptor (in place +
    returned). Empty header cells are skipped; header cells beyond the
    known columns create new (titles-only) columns."""
    dialect = DialectSpec.parse(raw_table.get("dialect"))
    schema = raw_table.setdefault("tableSchema", {})
    cols: list[dict] = schema.setdefault("columns", [])
    # '@none' titles promote to the default language up front
    # (convertor.ts:471-478)
    for col in cols:
        t = col.get("titles")
        if isinstance(t, dict) and "@none" in t and default_lang not in t:
            t[default_lang] = t.pop("@none")
    for row in header_rows:
        vals = row[dialect.skipColumns:]
        for j, val in enumerate(vals):
            if not val:
                continue
            while j >= len(cols):
                cols.append({})
            _merge_title(cols[j], val, default_lang)
    return raw_table


def apply_csv_header(raw_table: dict, csv_path: str | Path | None = None,
                     default_lang: str = "@none") -> dict:
    """processCsvHeader for one raw table descriptor: read headerRowCount
    rows from the table's CSV and merge them; when there is NO header and
    NO columns, peek one data row to size the table with ``_col.N`` columns
    (the peeked row is metadata-only here — the Spark scan re-reads it as
    data, unlike the reference's single-pass stream)."""
    dialect = DialectSpec.parse(raw_table.get("dialect"))
    path = csv_path if csv_path is not None else raw_table.get("url", "")
    hdr = dialect.header_row_count
    if hdr:
        rows = read_csv_prefix(path, dialect, hdr)
        merge_header_into_table(raw_table, rows, default_lang)
    elif not raw_table.get("tableSchema", {}).get("columns"):
        rows = read_csv_prefix(path, dialect, 1)
        schema = raw_table.setdefault("tableSchema", {})
        if rows:
            n = max(len(rows[0]) - dialect.skipColumns, 0)
            schema["columns"] = [{} for _ in range(n)]  # → '_col.N' names
    return raw_table
