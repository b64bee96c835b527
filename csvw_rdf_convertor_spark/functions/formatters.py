"""rdf2csvw output formatting: trim IRIs back to cell values and format each
bound term per its column datatype before writing CSV.

Reference: rdf2csvw/bindings-to-row-transformation.ts:16-85 (dispatch +
null substitution), utils/url-trimming.ts:3-52 (inverse-template trim),
utils/format-boolean.ts, format-number.ts:21-98,184-297,
format-datetime.ts:1-226, format-duration.ts, format-other.ts.

Everything is a Column expression (JVM, codegen) except the rare LDML
number-pattern path, which is an Arrow-batched pandas UDF
(``ldml.format_number_ldml``) — same split as the forward direction.
The reference formats values only when they VALIDATE against the datatype's
lexical regex; invalid values pass through unchanged (with a warning there,
silently here — the issues side-channel covers the forward direction).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..spec import DatatypeSpec

# --- inverse-template URL trimming (url-trimming.ts:3-52) --------------------

_TRIM_OPERATORS = "+#./;?&"
#: the reference builds the optional-operator char class with
#: ``operators.join()`` (comma-joined) — the commas are redundant members
#: but harmless; reproduced for byte-level parity of the regex semantics
_OP_CLASS = "[" + ",".join(_TRIM_OPERATORS) + "]?"
_TMPL_RE = re.compile(r"\{([^{}]+)\}")


def trim_url_pattern(template: str) -> tuple[str, list[str]]:
    """(anchored Java-compatible regex, ordered var names) for a template.

    Each ``{var}`` becomes an optional-operator prefix plus a LAZY capture
    group; literals are regex-escaped. Match groups are addressed by index
    (named groups would choke on CSVW's percent-encoded variable names).
    """
    out: list[str] = []
    variables: list[str] = []
    pos = 0
    for m in _TMPL_RE.finditer(template):
        out.append(re.escape(template[pos:m.start()]))
        var = m.group(1)
        if var[:1] in _TRIM_OPERATORS:
            var = var[1:]
        variables.append(var)
        out.append(_OP_CLASS + "(.*?)")
        pos = m.end()
    out.append(re.escape(template[pos:]))
    return "^" + "".join(out) + "$", variables


def trim_url(value: Column, template: str, column_name: str) -> Column:
    """Trim an IRI back to the cell value for ``column_name``; falls back to
    the raw value when the column is not in the template, the IRI does not
    match, or the captured group is empty (the reference's falsy check,
    bindings-to-row-transformation.ts:56-66 + url-trimming.ts:38-51)."""
    pattern, variables = trim_url_pattern(template)
    if column_name not in variables:
        return value
    idx = variables.index(column_name) + 1
    extracted = F.regexp_extract(value, pattern, idx)
    return F.when(extracted != "", extracted).otherwise(value)


# --- datatype lexical validation regexes (format-number/datetime/duration) --

_INT_RE = r"^[-+]?[0-9]+$"
_DEC_RE = r"^(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"
_FLOAT_RE = (r"^(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?$"
             r"|^(\+|-)?INF$|^NaN$")
_TZ = r"(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))"

NUMERIC_REGEX: dict[str, str] = {
    "decimal": _DEC_RE, "integer": _INT_RE, "long": _INT_RE, "int": _INT_RE,
    "short": _INT_RE, "byte": _INT_RE, "nonNegativeInteger": _INT_RE,
    "positiveInteger": _INT_RE, "unsignedLong": _INT_RE,
    "unsignedInt": _INT_RE, "unsignedShort": _INT_RE, "unsignedByte": _INT_RE,
    "nonPositiveInteger": _INT_RE, "negativeInteger": _INT_RE,
    "double": _FLOAT_RE, "number": _FLOAT_RE, "float": _FLOAT_RE,
}

DATETIME_REGEX: dict[str, str] = {
    "date": rf"^-?([1-9][0-9]{{3,}}|0[0-9]{{3}})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01]){_TZ}?$",
    "dateTime": rf"^-?([1-9][0-9]{{3,}}|0[0-9]{{3}})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])T(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?)){_TZ}?$",
    "dateTimeStamp": rf"^-?([1-9][0-9]{{3,}}|0[0-9]{{3}})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])T(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?)){_TZ}$",
    "time": rf"^(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?)){_TZ}?$",
    "gDay": rf"^---(0[1-9]|[12][0-9]|3[01]){_TZ}?$",
    "gMonth": rf"^--(0[1-9]|1[0-2]){_TZ}?$",
    "gMonthDay": rf"^--(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01]){_TZ}?$",
    "gYear": rf"^-?([1-9][0-9]{{3,}}|0[0-9]{{3}}){_TZ}?$",
    "gYearMonth": rf"^-?([1-9][0-9]{{3,}}|0[0-9]{{3}})-(0[1-9]|1[0-2]){_TZ}?$",
}
DATETIME_REGEX["datetime"] = DATETIME_REGEX["dateTime"]

DURATION_REGEX: dict[str, str] = {
    "duration": r"^-?P([0-9]+Y)?([0-9]+M)?([0-9]+D)?(T([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$",
    "dayTimeDuration": r"^-?P([0-9]+D)?(T([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$",
    "yearMonthDuration": r"^-?P([0-9]+Y)?([0-9]+M)?$",
}

_BOOL_FORMAT_RE = re.compile(r"^[^|]+\|[^|]+$")


def is_boolean(dt: DatatypeSpec) -> bool:
    return dt.base == "boolean"


def is_numeric(dt: DatatypeSpec) -> bool:
    return dt.base in NUMERIC_REGEX


def is_datetime(dt: DatatypeSpec) -> bool:
    return dt.base in DATETIME_REGEX


def is_duration(dt: DatatypeSpec) -> bool:
    return dt.base in DURATION_REGEX


# --- per-datatype output formatters ------------------------------------------

def format_boolean(value: Column, dt: DatatypeSpec) -> Column:
    """'true'/'false' → the format's pair (format-boolean.ts:31-64)."""
    pair = ("true", "false")
    if isinstance(dt.format, str) and _BOOL_FORMAT_RE.match(dt.format):
        pair = tuple(dt.format.split("|"))
    v = F.trim(value)
    return (F.when(v == "true", F.lit(pair[0]))
            .when(v == "false", F.lit(pair[1]))
            .otherwise(value))


def format_numeric(value: Column, dt: DatatypeSpec) -> Column:
    """Validate against the base's lexical regex; then apply the LDML number
    pattern (pandas UDF, rare path) or just swap the decimal separator
    (format-number.ts:184-297)."""
    v = F.trim(value)
    valid = v.rlike(NUMERIC_REGEX[dt.base])
    pattern = None
    group_char, decimal_char = ",", "."
    if isinstance(dt.format, str):
        pattern = dt.format
    elif isinstance(dt.format, dict):
        pattern = dt.format.get("pattern")
        group_char = dt.format.get("groupChar", ",")
        decimal_char = dt.format.get("decimalChar", ".")
    if pattern is None:
        formatted = (F.replace(v, F.lit("."), F.lit(decimal_char))
                     if decimal_char != "." else v)
    else:
        from .ldml import ldml_format_udf
        formatted = ldml_format_udf(pattern, group_char, decimal_char)(v)
    return F.when(valid, formatted).otherwise(value)


#: date-fns → JDK DateTimeFormatter token subset used by CSVW descriptors
#: (identical spellings for all of these; listed for the doc trail)
_DATE_TOKENS = "yyyy MM dd HH mm ss SSS M d H m s"


#: trailing ISO-8601 zone tokens of a date-fns/JDK pattern (X = ±HH / Z,
#: XX = ±HHMM / Z, XXX = ±HH:MM / Z; lowercase x = same with +00 for UTC)
_ZONE_TOKEN_RE = re.compile(r"([Xx]{1,3})$")


def _render_zone(tz: Column, token: str) -> Column:
    """Render a lexical zone suffix ('Z' | ±HH:MM | '') per the date-fns /
    JDK X-family token the reference's formatter uses
    (format-datetime.ts:217-225 via date-fns ``format``)."""
    sign, hh, mm = (F.substring(tz, 1, 1), F.substring(tz, 2, 2),
                    F.substring(tz, 5, 2))
    n = len(token)
    if n == 1:
        body = F.concat(sign, hh, F.when(mm != "00", mm).otherwise(F.lit("")))
    elif n == 2:
        body = F.concat(sign, hh, mm)
    else:
        body = F.concat(sign, hh, F.lit(":"), mm)
    utc_rep = (F.lit("Z") if token[0] == "X"
               else F.lit({1: "+00", 2: "+0000", 3: "+00:00"}[n]))
    is_utc = (tz == "Z") | (tz == "") | tz.isNull() | (
        (hh == "00") & (mm == "00"))
    return F.when(is_utc, utc_rep).otherwise(body)


def format_datetime(value: Column, dt: DatatypeSpec) -> Column:
    """Validate against the base's lexical regex; reformat via the format
    pattern when given (format-datetime.ts:115-226). Subset: the date-fns
    tokens above coincide with JDK DateTimeFormatter, so the pattern drives
    ``date_format`` on the parsed local part; a trailing zone offset is
    preserved verbatim when the pattern has no zone tokens, and rendered per
    the X/x token family when it does."""
    v = F.trim(value)
    valid = v.rlike(DATETIME_REGEX[dt.base])
    pattern = dt.format if isinstance(dt.format, str) else None
    if pattern is None:
        return F.when(valid, v).otherwise(value)
    tz_part = F.regexp_extract(v, _TZ + "$", 1)
    local = F.regexp_replace(v, _TZ + "$", "")
    if dt.base == "time":
        ts = F.to_timestamp(F.concat(F.lit("1970-01-01T"), local),
                            "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]")
    elif dt.base in ("date", "gYear", "gYearMonth"):
        fmt = {"date": "yyyy-MM-dd", "gYear": "yyyy",
               "gYearMonth": "yyyy-MM"}[dt.base]
        ts = F.to_timestamp(local, fmt)
    else:
        ts = F.to_timestamp(local, "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]")
    zone_m = _ZONE_TOKEN_RE.search(pattern)
    if zone_m:
        head = pattern[:zone_m.start()]
        formatted = F.concat(
            F.date_format(ts, head.replace("T", "'T'")) if head
            else F.lit(""),
            _render_zone(tz_part, zone_m.group(1)))
    else:
        jdk_pattern = pattern.replace("T", "'T'")
        formatted = F.date_format(ts, jdk_pattern)
        if not any(t in pattern for t in ("X", "x", "Z", "O")):
            formatted = F.concat(formatted, F.coalesce(tz_part, F.lit("")))
    return F.when(valid & formatted.isNotNull(), formatted).otherwise(value)


def format_duration(value: Column, dt: DatatypeSpec) -> Column:
    """Durations validate (optionally against a format regex) but re-emit
    their lexical form unchanged (format-duration.ts:95-175)."""
    return value


def format_value(value: Column, dt: DatatypeSpec | None) -> Column:
    """bindings-to-row dispatch (bindings-to-row-transformation.ts:67-80)."""
    if dt is None:
        return value
    if is_boolean(dt):
        return format_boolean(value, dt)
    if is_numeric(dt):
        return format_numeric(value, dt)
    if is_datetime(dt):
        return format_datetime(value, dt)
    if is_duration(dt):
        return format_duration(value, dt)
    return value  # format-other.ts validates only
