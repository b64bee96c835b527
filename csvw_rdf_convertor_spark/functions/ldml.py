"""UAX-35 / LDML number-pattern parsing — the one pandas-UDF path in the cell
pipeline.

The reference implements full LDML pattern matching with grouping expansion
(packages/core/src/lib/utils/parse-number.ts:179-399). Patterns are rare in
real descriptors (a handful of CSVW test-suite entries), so this path is
vectorized Python (Arrow batches) while everything else stays JVM-side.

The UDF is built per (pattern, base) at plan-build time; the compiled regex
is captured in the closure — no driver-side state is re-pickled per task
beyond the small closure itself.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..spec import INVALID_SENTINEL


@lru_cache(maxsize=256)
def compile_ldml(pattern: str) -> tuple[re.Pattern, int, int, int, int]:
    """Compile an LDML number pattern to (regex, min_int, min_frac, max_frac,
    primary_group).

    Subset: prefix/suffix literals, ``#``/``0`` digit slots, ``,`` grouping,
    ``.`` fraction, ``%``/``‰`` suffix, ``;``-separated negative subpattern
    (only its prefix/suffix are honored, per LDML).
    """
    positive = pattern.split(";")[0]
    m = re.match(r"^([^#0]*)([#0,]*)(?:\.([#0]+))?([^#0]*)$", positive)
    if not m:
        raise ValueError(f"unsupported LDML pattern: {pattern!r}")
    prefix, int_part, frac_part, suffix = m.group(1), m.group(2), m.group(3) or "", m.group(4)
    groups = int_part.split(",")
    primary = len(groups[-1]) if len(groups) > 1 else 0
    min_int = int_part.replace(",", "").count("0")
    min_frac = frac_part.count("0")
    max_frac = len(frac_part)

    if primary:
        int_re = rf"\d{{1,{primary}}}(?:,\d{{{primary}}})*"
    else:
        int_re = r"\d+"
    frac_re = ""
    if max_frac:
        frac_re = rf"(?:\.\d{{{min_frac},{max_frac}}})" + ("?" if min_frac == 0 else "")
    elif min_frac == 0:
        frac_re = ""
    rx = re.compile(
        "^" + re.escape(prefix) + r"([+-]?)(" + int_re + ")" + f"({frac_re})"
        + re.escape(suffix) + "$")
    return rx, min_int, min_frac, max_frac, primary


def js_number_str(num: float) -> str:
    """JS ``Number.prototype.toString`` twin (driver-side): positional for
    1e-6 ≤ |x| < 1e21 (and integral values without a fraction), exponential
    ``d.dde±x`` outside — unlike ``repr``, which goes scientific below 1e-4
    (ADVICE r01: repr(1.5e-05) = '1.5e-05' where JS prints '0.000015')."""
    import math
    if math.isnan(num):
        return "NaN"
    if math.isinf(num):
        return "INF" if num > 0 else "-INF"
    if num == int(num) and abs(num) < 1e21:
        return str(int(num))
    r = repr(num)
    if "e" not in r:
        return r
    mant, exp_s = r.split("e")
    exp = int(exp_s)
    if -7 < exp < 21:
        from decimal import Decimal
        return format(Decimal(r), "f")
    if mant.endswith(".0"):
        mant = mant[:-2]
    return f"{mant}e{'+' if exp > 0 else ''}{exp}"


def _parse_series(s: pd.Series, pattern: str, base: str) -> pd.Series:
    rx, min_int, min_frac, _, _ = compile_ldml(pattern)
    positive = pattern.split(";")[0]
    scale = 100 if "%" in positive else 1000 if "‰" in positive else 1

    def one(v):
        if v is None:
            return None
        m = rx.match(v)
        if not m:
            return INVALID_SENTINEL + v
        sign, int_digits, frac = m.group(1), m.group(2).replace(",", ""), m.group(3)
        if len(int_digits) < min_int:
            return INVALID_SENTINEL + v
        num = float(sign + int_digits + frac)
        if scale != 1:
            num /= scale
        if base in ("double", "float", "number", "decimal"):
            out = js_number_str(num)
            if out in ("0", "0.0") and sign == "-":
                out = "-0"
            return out
        if num != int(num):
            return INVALID_SENTINEL + v
        return str(int(num))

    return s.map(one)


def ldml_number_udf(pattern: str, base: str):
    """Series→Series pandas UDF applying one LDML pattern."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return _parse_series(s, pattern, base)

    return _udf


# --- LDML number FORMATTING (rdf2csvw output direction) ----------------------

def format_number_ldml(num: float, pattern: str, group_char: str = ",",
                       decimal_char: str = ".") -> str:
    """Format a number per an LDML pattern (reference: format-number.ts:
    260-297 via the ldml-number lib; same subset as :func:`compile_ldml` —
    prefix/suffix, 0/# digit slots, primary grouping, %/‰ scaling,
    ';'-separated negative subpattern whose prefix/suffix are honored)."""
    import math

    parts = pattern.split(";")
    positive, negative = parts[0], (parts[1] if len(parts) > 1 else None)
    m = re.match(r"^([^#0]*)([#0,]*)(?:\.([#0]+))?([^#0]*)$", positive)
    if not m:
        raise ValueError(f"unsupported LDML pattern: {pattern!r}")
    prefix, int_part, frac_part, suffix = (
        m.group(1), m.group(2), m.group(3) or "", m.group(4))
    scale = 100 if "%" in positive else 1000 if "‰" in positive else 1

    is_neg = math.copysign(1.0, num) < 0
    if negative is not None:
        nm = re.match(r"^([^#0]*)[#0,.]*([^#0]*)$", negative)
        neg_prefix, neg_suffix = (nm.group(1), nm.group(2)) if nm else ("-", "")
    else:
        neg_prefix, neg_suffix = "-" + prefix, suffix

    if math.isnan(num):
        return "NaN"
    if math.isinf(num):
        body = "INF"
        return (neg_prefix + body + neg_suffix) if is_neg \
            else (prefix + body + suffix)

    x = abs(num) * scale
    min_int = int_part.replace(",", "").count("0")
    min_frac = frac_part.count("0")
    max_frac = len(frac_part)
    groups = int_part.split(",")
    primary = len(groups[-1]) if len(groups) > 1 else 0

    s = f"{x:.{max_frac}f}"
    int_digits, _, frac_digits = s.partition(".")
    frac_digits = frac_digits.rstrip("0")
    while len(frac_digits) < min_frac:
        frac_digits += "0"
    int_digits = int_digits.lstrip("0")
    while len(int_digits) < min_int:
        int_digits = "0" + int_digits
    if not int_digits:
        int_digits = "0"  # '#.##'(0.25) → '0.25' (DecimalFormat behavior)
    if primary and len(int_digits) > primary:
        chunks = []
        i = len(int_digits)
        while i > primary:
            chunks.append(int_digits[i - primary:i])
            i -= primary
        chunks.append(int_digits[:i])
        int_digits = group_char.join(reversed(chunks))
    body = int_digits + (decimal_char + frac_digits if frac_digits else "")
    return (neg_prefix + body + neg_suffix) if is_neg else (prefix + body + suffix)


def ldml_format_udf(pattern: str, group_char: str = ",",
                    decimal_char: str = "."):
    """Series→Series pandas UDF: lexical number → LDML-formatted string."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else format_number_ldml(
            float(v.replace("INF", "inf") if "INF" in v else v),
            pattern, group_char, decimal_char))

    return _udf
