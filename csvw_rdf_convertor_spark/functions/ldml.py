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


# --- faithful walker port of the reference pattern matcher -------------------
# (parse-number.ts:178-399 SEMANTICS re-implemented: per-digit '0'/'#'/','
# matching right-to-left with grouping expansion incl. secondary group
# sizes, exponent clause via pattern/value split on 'e', optional '+'/'-'
# sign slot in the pattern, %/‰ agreement between pattern and value.
# One documented SUPERSET: literal prefix/suffix text in the pattern
# ("$#,##0.00") is stripped before the walk — the reference walker has no
# literal branch and rejects such patterns outright; UAX-35 allows them.)

def _expand_int_groupings(pattern: str, to_size: int) -> str:
    """:370-387 — replicate the last (or last-two, when a secondary size is
    given) group pattern leftward until it covers ``to_size`` digits."""
    tokens = pattern.split(",")
    if len(tokens) == 1:
        return pattern
    correct_groups = 2 if len(tokens) > 2 else 1
    correct = tokens[-correct_groups:]
    group_size = max(len(correct[0]), 1)
    first = "".join(tokens[:-correct_groups]).rjust(to_size, "#")
    for i in range(0, len(first), group_size):
        correct.insert(0, first[max(len(first) - i - group_size, 0):
                                len(first) - i])
    return ",".join(correct)


def _expand_decimal_groupings(pattern: str, to_size: int) -> str:
    """:388-399 — same expansion rightward for fraction groupings."""
    first, *rest = pattern.split(",")
    if not rest:
        return pattern
    correct = [first]
    group_size = max(len(first), 1)
    last = "".join(rest).ljust(to_size, "#")
    for i in range(0, len(last), group_size):
        correct.append(last[i:i + group_size])
    return ",".join(correct)


def _cast_integer(integer: str, pattern: str, group_char: str) -> str | None:
    """:308-365 — right-to-left walk of the integer digits."""
    res, sign = "", ""
    if pattern[:1] in ("+", "-"):
        pattern = pattern[1:]
        if integer[:1] not in ("-", "+"):
            return None
    if integer[:1] in ("-", "+"):
        sign, integer = integer[0], integer[1:]
    pattern = _expand_int_groupings(pattern, len(integer))
    pi = len(pattern) - 1
    ii = len(integer) - 1
    while ii >= 0:
        p = pattern[pi] if pi >= 0 else None
        d = integer[ii]
        if p == "0":
            if not d.isdigit():
                return None
            res, pi = d + res, pi - 1
        elif p == "#":
            if d.isdigit():
                res, pi = d + res, pi - 1
            else:
                while pi >= 0 and pattern[pi] in "#,":
                    pi -= 1
                ii += 1
        elif p == ",":
            if d != group_char:
                return None
            pi -= 1
        elif p is None and d.isdigit():
            if integer.startswith("0"):
                return None
            res = d + res
        else:
            return None
        ii -= 1
    if pi >= 0 and pattern[:pi + 1].replace("#", "").replace(",", ""):
        return None
    return sign + res


def _cast_decimals(decimals: str, pattern: str, group_char: str) -> str | None:
    """:263-307 — left-to-right walk of the fraction digits."""
    pattern = _expand_decimal_groupings(pattern, len(decimals))
    res = ""
    pi = 0
    di = 0
    while di < len(decimals):
        p = pattern[pi] if pi < len(pattern) else None
        d = decimals[di]
        if p == "0":
            if not d.isdigit():
                return None
            res, pi = res + d, pi + 1
        elif p == "#":
            if d.isdigit():
                res, pi = res + d, pi + 1
            else:
                while pi < len(pattern) and pattern[pi] in "#,":
                    pi += 1
                di -= 1
        elif p == ",":
            if d != group_char:
                return None
            pi += 1
        else:
            return None
        di += 1
    if pi < len(pattern) and pattern[pi:].replace("#", "").replace(",", ""):
        return None
    return res


def _divide_by(pattern: str, number: str):
    """getDivideBy (:229-261): %/‰ must appear in the same position in both
    pattern and value; returns (pattern, number, divisor) or None."""
    for char, val in (("%", 100), ("‰", 1000)):
        for pos in ("startswith", "endswith"):
            if getattr(pattern, pos)(char):
                if not getattr(number, pos)(char):
                    return None
                if pos == "startswith":
                    return pattern[1:], number[1:], val
                return pattern[:-1], number[:-1], val
    return pattern, number, 1


_AFFIX_BODY = "#0+-,."


def _is_exp_marker(pattern: str, k: int) -> bool:
    """'e'/'E' is pattern body only when it introduces an actual exponent
    clause (followed by a digit/#/0/sign); a bare 'E' inside literal suffix
    text ('# EUR', '#0 kWh') is affix, not body."""
    return (pattern[k] in "eE" and k + 1 < len(pattern)
            and (pattern[k + 1].isdigit() or pattern[k + 1] in "#0+-"))


def _strip_literal_affixes(pattern: str, number: str):
    """Superset vs the reference walker: strip literal prefix/suffix text
    ("$", " EUR") from both pattern and value (UAX-35 affixes; the
    reference's walker has no literal branch — parse-number.ts:308-365 —
    and would reject). %/‰ are handled earlier; exponent markers stay
    (recognized via :func:`_is_exp_marker`, so suffixes containing a bare
    'E'/'e' — '# EUR' — strip cleanly instead of tripping the later
    exponent-marker agreement check)."""
    i = next((k for k, c in enumerate(pattern) if c in _AFFIX_BODY),
             len(pattern))
    j = next((k for k in range(len(pattern) - 1, -1, -1)
              if pattern[k] in _AFFIX_BODY or _is_exp_marker(pattern, k)),
             i - 1)
    prefix, suffix = pattern[:i], pattern[j + 1:]
    if prefix:
        if not number.startswith(prefix):
            return None
        number = number[len(prefix):]
    if suffix:
        if not number.endswith(suffix):
            return None
        number = number[:len(number) - len(suffix)]
    return pattern[i:j + 1], number


def parse_ldml(value: str, pattern: str, decimal_char: str = ".",
               group_char: str = ",") -> float | None:
    """castToNumberByPattern (:178-227): float result or None (no match)."""
    dv = _divide_by(pattern, value)
    if dv is None:
        return None
    pattern, value, divide_by = dv
    stripped = _strip_literal_affixes(pattern, value)
    if stripped is None:
        return None
    pattern, value = stripped
    # pattern and value must agree on exponent marker case (:193-196)
    if (("e" in pattern) != ("e" in value)) or (("E" in pattern) != ("E" in value)):
        return None
    pattern = pattern.lower()
    value = value.lower()

    # reference uses split()[0..1] (parse-number.ts:205-210): a value with
    # TWO decimal separators ('1.2.3') silently drops the third segment and
    # parses 1.2 — partition() would feed '2.3' to the decimal walker and
    # (more strictly) reject; mimic split-and-take-first-two for fidelity
    def _split2(s: str, sep: str) -> tuple[str, str]:
        parts = s.split(sep)
        return parts[0], (parts[1] if len(parts) > 1 else "")

    mantissa_pattern, exp_pattern = _split2(pattern, "e")
    integer_pattern, decimal_pattern = _split2(mantissa_pattern, ".")
    has_dec_pattern = "." in mantissa_pattern
    mantissa, exp = _split2(value, "e")
    integer, decimal = _split2(mantissa, decimal_char)
    has_decimal = decimal_char in mantissa

    res = _cast_integer(integer, integer_pattern, group_char)
    if res is None:
        return None
    if has_decimal and decimal:
        if not has_dec_pattern:
            return None
        dec_res = _cast_decimals(decimal, decimal_pattern, group_char)
        if dec_res is None:
            return None
        res += "." + dec_res
    elif decimal_pattern and "0" in decimal_pattern:
        return None
    if exp:
        exp_res = _cast_integer(exp, exp_pattern, group_char)
        if exp_res is None:
            return None
        res += "e" + exp_res
    try:
        return float(res) / divide_by
    except ValueError:
        return None


def _parse_series(s: pd.Series, pattern: str, base: str,
                  decimal_char: str = ".", group_char: str = ",") -> pd.Series:
    def one(v):
        if v is None:
            return None
        # INF/NaN pass through BEFORE the pattern path (parse-number.ts:99-110)
        if base in ("double", "float", "number") and v in ("INF", "-INF", "NaN"):
            return v
        num = parse_ldml(v, pattern, decimal_char, group_char)
        if num is None:
            return INVALID_SENTINEL + v
        # the reference emits transformedNumber+'' for EVERY base (:146) —
        # no integrality re-check on the pattern path
        out = js_number_str(num)
        if num == 0 and v.startswith("-"):
            out = "-0"
        return out

    return s.map(one)


def ldml_number_udf(pattern: str, base: str, decimal_char: str = ".",
                    group_char: str = ","):
    """Series→Series pandas UDF applying one LDML pattern."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return _parse_series(s, pattern, base, decimal_char, group_char)

    return _udf


# --- LDML number FORMATTING (rdf2csvw output direction) ----------------------

def _group_int_digits(digits: str, groups: list[str], group_char: str) -> str:
    """Apply LDML integer grouping from the right: the LAST ',' in the
    pattern sets the primary size, the one before it the secondary size used
    for every further group (UAX-35 §3.1; '#,##,#00' → 12,34,567)."""
    if len(groups) < 2:
        return digits
    primary = len(groups[-1])
    secondary = len(groups[-2]) if len(groups) > 2 else primary
    if not primary or len(digits) <= primary:
        return digits
    chunks = [digits[-primary:]]
    i = len(digits) - primary
    while i > secondary:
        chunks.append(digits[i - secondary:i])
        i -= secondary
    chunks.append(digits[:i])
    return group_char.join(reversed(chunks))


def _group_frac_digits(digits: str, groups: list[str], group_char: str) -> str:
    """Fractional grouping runs LEFT to right ('#0.0#,#' → 12.24,5)."""
    if len(groups) < 2:
        return digits
    primary = len(groups[0])
    if not primary or len(digits) <= primary:
        return digits
    chunks = [digits[:primary]]
    i = primary
    secondary = len(groups[1]) if len(groups) > 1 else primary
    while i < len(digits):
        chunks.append(digits[i:i + secondary])
        i += secondary
    return group_char.join(chunks)


def format_number_ldml(num: float, pattern: str, group_char: str = ",",
                       decimal_char: str = ".",
                       explicit_plus: bool = False) -> str:
    """Format a number per an LDML pattern (reference: format-number.ts:
    260-297 via the ldml-number lib; same subset as :func:`compile_ldml` —
    prefix/suffix, 0/# digit slots, primary+secondary integer grouping,
    fractional grouping, %/‰ scaling, explicit '+'/'-' sign placeholders,
    ';'-separated negative subpattern whose prefix/suffix are honored).

    ``explicit_plus`` carries the lexical '+' of the source value (fixture
    283: "+1.23"^^xsd:decimal formats back to '%+123' under '%000')."""
    import math

    parts = pattern.split(";")
    positive, negative = parts[0], (parts[1] if len(parts) > 1 else None)
    if "E" in positive:
        return _format_scientific_ldml(num, positive, decimal_char)
    m = re.match(r"^([^#0]*)([#0,]*)(?:\.([#0,]+))?([^#0]*)$", positive)
    if not m:
        raise ValueError(f"unsupported LDML pattern: {pattern!r}")
    prefix, int_part, frac_part, suffix = (
        m.group(1), m.group(2), m.group(3) or "", m.group(4))
    scale = 100 if "%" in positive else 1000 if "‰" in positive else 1

    is_neg = math.copysign(1.0, num) < 0
    sign = "-" if is_neg else ("+" if explicit_plus else "")
    # '+'/'-' in the affixes are SIGN PLACEHOLDERS (UAX-35): substitute the
    # actual sign there instead of prepending one to the digits
    if negative is None:
        placed = False
        for ph in ("+", "-"):
            if ph in prefix:
                prefix = prefix.replace(ph, "-" if is_neg else ph)
                placed = True
                break
            if ph in suffix:
                suffix = suffix.replace(ph, "-" if is_neg else ph)
                placed = True
                break
        neg_prefix = prefix + ("" if placed else "-")
        neg_suffix = suffix
        pos_prefix = prefix + ("" if placed else sign)
    else:
        nm = re.match(r"^([^#0]*)[#0,.]*([^#0]*)$", negative)
        neg_prefix, neg_suffix = (nm.group(1), nm.group(2)) if nm else ("-", "")
        pos_prefix = prefix + sign

    if math.isnan(num):
        return "NaN"
    if math.isinf(num):
        body = "INF"
        return (neg_prefix + body + neg_suffix) if is_neg \
            else (pos_prefix + body + suffix)

    x = abs(num) * scale
    min_int = int_part.replace(",", "").count("0")
    frac_digits_pat = frac_part.replace(",", "")
    min_frac = frac_digits_pat.count("0")
    max_frac = len(frac_digits_pat)

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
    int_digits = _group_int_digits(int_digits, int_part.split(","), group_char)
    frac_digits = _group_frac_digits(frac_digits, frac_part.split(","),
                                     group_char)
    body = int_digits + (decimal_char + frac_digits if frac_digits else "")
    return (neg_prefix + body + neg_suffix) if is_neg \
        else (pos_prefix + body + suffix)


def _format_scientific_ldml(num: float, positive: str,
                            decimal_char: str = ".") -> str:
    """Scientific LDML pattern ``<mantissa>E<exponent>`` (e.g. ``#0.###E#0``,
    fixture 158): mantissa normalized to its min-integer-digit count, the
    exponent zero-padded to the exponent pattern's digit-slot width, '-'
    only for negative exponents ('+' slot forces a sign)."""
    import math
    mant_pat, exp_pat = positive.split("E", 1)
    mm = re.match(r"^([^#0]*)([#0]*)(?:\.([#0]+))?$", mant_pat)
    em = re.match(r"^(\+?)([#0]+)([^#0]*)$", exp_pat)
    if not mm or not em:
        raise ValueError(f"unsupported LDML pattern: {positive!r}")
    prefix, int_part, frac_part = mm.group(1), mm.group(2), mm.group(3) or ""
    force_sign, exp_slots, suffix = em.group(1), len(em.group(2)), em.group(3)
    min_int = max(int_part.count("0"), 1)
    min_frac = frac_part.count("0")
    max_frac = len(frac_part)

    if math.isnan(num):
        return "NaN"
    if math.isinf(num):
        return prefix + ("-" if num < 0 else "") + "INF" + suffix
    neg = math.copysign(1.0, num) < 0
    x = abs(num)
    if x == 0:
        exp = 0
        mant = 0.0
    else:
        exp = math.floor(math.log10(x)) - (min_int - 1)
        mant = x / (10.0 ** exp)
        # rounding at max_frac can push the mantissa past min_int digits
        if round(mant, max_frac) >= 10.0 ** min_int:
            exp += 1
            mant = x / (10.0 ** exp)
    s = f"{mant:.{max_frac}f}"
    int_digits, _, frac_digits = s.partition(".")
    frac_digits = frac_digits.rstrip("0")
    while len(frac_digits) < min_frac:
        frac_digits += "0"
    while len(int_digits) < min_int:
        int_digits = "0" + int_digits
    body = int_digits + (decimal_char + frac_digits if frac_digits else "")
    exp_s = ("-" if exp < 0 else ("+" if force_sign else "")) \
        + str(abs(exp)).rjust(exp_slots, "0")
    return prefix + ("-" if neg else "") + body + "E" + exp_s + suffix


def ldml_format_udf(pattern: str, group_char: str = ",",
                    decimal_char: str = "."):
    """Series→Series pandas UDF: lexical number → LDML-formatted string."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else format_number_ldml(
            float(v.replace("INF", "inf") if "INF" in v else v),
            pattern, group_char, decimal_char,
            explicit_plus=v.lstrip().startswith("+")))

    return _udf
