"""QuantifiableEntityNormalizer string API (re-expressed).

Behavioral reference: ``ie/QuantifiableEntityNormalizer.java`` —
the pre-SUTime string normalizers the reference still exposes (and
``test/src/edu/stanford/nlp/ie/QuantifiableEntityNormalizerTest.java``
gates). Output conventions follow the reference exactly, which differ
from the pipeline's ISO TIMEX values:

- dates render ``yyyymmdd`` with ``****`` for an unknown year
- money renders ``<currency-sign><java-double>`` (``$1.0E10``)
- times render ``h:mm[am|pm]``

The Spark pipeline itself uses the ISO conventions (operators/ner.py +
operators/sutime.py); this module is the API-parity surface for users of
the reference's ``normalized*String`` entry points.
"""

from __future__ import annotations

import math
import re

from corenlp_spark.operators.ner import (_ORD_WORDS, _RE_ORD,
                                         _word_number_span, _month_of,
                                         _expand_year, _day_of)

__all__ = [
    "normalized_date_string", "normalized_percent_string",
    "normalized_money_string", "normalized_number_string",
    "normalized_ordinal_string", "normalized_time_string",
]


def _java_double(f: float) -> str:
    """Java ``Double.toString`` rendering: plain decimal inside
    [1e-3, 1e7), scientific ``m.mEp`` outside (``1.0E10``, ``5.0E7``)."""
    f = float(f)
    if f == 0:
        return "0.0"
    a = abs(f)
    if 1e-3 <= a < 1e7:
        return f"{f:.1f}" if f == int(f) else repr(f)
    exp = math.floor(math.log10(a))
    mant = f / 10 ** exp
    ms = f"{mant:.1f}" if mant == int(mant) else repr(mant)
    return f"{ms}E{exp}"


def _parse_amount(s: str) -> float | None:
    """Number from a string: digits (commas ok), written numbers, mixed
    forms ("10 thousand million"), bare scales ("million" → 1e6)."""
    s = s.strip()
    if not s:
        return None
    if re.fullmatch(r"-?\d{1,3}(,\d{3})*(\.\d+)?|-?\d+(\.\d+)?", s):
        return float(s.replace(",", ""))
    words = s.split()
    # bare scale words imply one ("million dollars" → 1e6)
    span = _word_number_span(words, 0)
    if span is None and words:
        span = _word_number_span(["one"] + words, 0)
        if span is not None and span[0] >= 2:
            span = (span[0] - 1, span[1])
        else:
            span = None
    if span is not None and span[0] == len(words):
        return float(span[1])
    return None


# --------------------------------------------------------------------------
# dates — QuantifiableEntityNormalizer.normalizedDateString
# --------------------------------------------------------------------------

def normalized_date_string(s: str, doc_date=None) -> str:
    """"February 5, 1923" → 19230205; "Mar 3" → ****0303; ISO passthrough."""
    s = s.strip()
    m = re.fullmatch(r"(\d{4})-(\d\d)-(\d\d)", s)
    if m:
        return "".join(m.groups())
    toks = [t for t in re.split(r"[\s,]+", s) if t]
    month = day = year = None
    for t in toks:
        mo = _month_of(t)
        if mo is not None and month is None:
            month = mo
            continue
        if t.startswith("'") and re.fullmatch(r"'\d\d", t):
            year = _expand_year(t[1:])
            continue
        if re.fullmatch(r"\d{4}", t):
            year = int(t)
            continue
        d = _day_of(t)
        if d is not None:
            if day is None:
                day = d
            elif year is None and month is not None:
                # trailing small number after month+day is a 2-digit year
                year = _expand_year(f"{d:02d}")
            continue
    ys = f"{year:04d}" if year is not None else "****"
    ms = f"{month:02d}" if month is not None else "**"
    ds = f"{day:02d}" if day is not None else "**"
    return ys + ms + ds


# --------------------------------------------------------------------------
# percent / number / ordinal
# --------------------------------------------------------------------------

def normalized_percent_string(s: str, doc_date=None) -> str:
    body = s.replace("%", " ").replace("percent", " ").strip()
    v = _parse_amount(body)
    return f"%{_java_double(v)}" if v is not None else s


def normalized_number_string(s: str, next_word: str = "",
                             doc_date=None) -> str:
    if not s.strip():
        return s
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*-\s*(\d+(?:\.\d+)?)\s*", s)
    if m:  # score-like ranges: "117-111" → "117.0 - 111.0"
        return f"{_java_double(float(m.group(1)))} - " \
               f"{_java_double(float(m.group(2)))}"
    v = _parse_amount(s)
    return _java_double(v) if v is not None else s


def normalized_ordinal_string(s: str, doc_date=None) -> str:
    t = s.strip().lower()
    if t in _ORD_WORDS:
        return _java_double(_ORD_WORDS[t])
    m = _RE_ORD.fullmatch(t.replace(",", ""))
    if m:
        return _java_double(float(m.group(1)))
    if "-" in t:
        a, _, b = t.partition("-")
        span = _word_number_span([a], 0)
        if span is not None and b in _ORD_WORDS:
            return _java_double(span[1] + _ORD_WORDS[b])
    return s


# --------------------------------------------------------------------------
# money — normalizedMoneyString
# --------------------------------------------------------------------------

#: currency word/symbol → (sign, multiplier)
_CURRENCIES = {
    "$": ("$", 1), "dollars": ("$", 1), "dollar": ("$", 1),
    "cents": ("$", 0.01), "cent": ("$", 0.01), "¢": ("$", 0.01),
    "£": ("£", 1), "#": ("£", 1),
    "pounds": ("£", 1), "pound": ("£", 1),
    "won": ("₩", 1), "yuan": ("元", 1), "¥": ("¥", 1),
    "euros": ("€", 1), "euro": ("€", 1), "€": ("€", 1),
}
_SUFFIX_MULT = {"m": 1e6, "b": 1e9, "k": 1e3}


def normalized_money_string(s: str, doc_date=None) -> str:
    s = s.strip()
    sign, mult = "$", 1.0
    body = s
    # find the currency indicator (symbol anywhere, word at the edge)
    for cur, (cs, cm) in _CURRENCIES.items():
        if cur in ("$", "£", "#", "¢", "¥", "€"):
            if cur in body:
                sign, mult = cs, cm
                body = body.replace(cur, " ")
                break
        else:
            m = re.search(rf"\b{cur}\b", body, re.IGNORECASE)
            if m:
                sign, mult = cs, cm
                body = body[:m.start()] + " " + body[m.end():]
                break
    body = body.strip()
    # "$1m" suffix multipliers
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([mbk])", body, re.IGNORECASE)
    if m:
        return sign + _java_double(float(m.group(1))
                                   * _SUFFIX_MULT[m.group(2).lower()])
    # spaced decimals "$ 57 . 60" and European comma decimals "$42,33"
    body = re.sub(r"(\d)\s*\.\s*(\d)", r"\1.\2", body)
    m = re.fullmatch(r"(\d+),(\d\d)", body)
    if m:
        body = f"{m.group(1)}.{m.group(2)}"
    if body.startswith("."):
        body = "0" + body
    v = _parse_amount(body)
    if v is None:
        return s
    return sign + _java_double(v * mult)


# --------------------------------------------------------------------------
# times — normalizedTimeString ("11:00 pm" → 11:00pm, "2 am" → 2:00am,
# "midnight" → 00:00am; bare clock strings pass through)
# --------------------------------------------------------------------------

def normalized_time_string(s: str, doc_date=None) -> str:
    t = s.strip().lower()
    if t == "midnight":
        return "00:00am"
    if t == "noon":
        return "12:00pm"
    m = re.fullmatch(r"(\d{1,2})(:\d\d(?::\d\d)?)?\s*"
                     r"(?:([ap])\.?m\.?)?", t)
    if not m:
        return s
    hh, mm, mer = m.group(1), m.group(2) or ":00", m.group(3)
    if m.group(2) is None and mer is None:
        return s  # bare number is not a time
    out = f"{int(hh)}:{mm[1:]}" if mm != ":00" or mer is None \
        else f"{int(hh)}:00"
    return out + (mer + "m" if mer else "")
