"""Multi-word entity-string matching in raw text (re-expressed).

Behavioral reference: ``ling/tokensregex/MultiWordStringMatcher.java`` —
the surface matcher the reference's entity-linking/KBP mention lookup uses
to locate a known entity name inside running text:

- ``EXCT``: exact substring (letter/digit boundary checks)
- ``EXCTWS``: exact tokens, but punctuation may float between spaces and
  whitespace runs collapse ("Al-Ahram" matches "Al- Ahram")
- ``LWS``: EXCTWS + case-insensitive
- ``LNRM``: letter-normalized — punctuation/whitespace disregarded and
  case-insensitive ("Al-Ahram" matches "alahram")
- ``REGEX``: the target string IS a regex

``find_target_string_offsets`` returns character (begin, end) pairs with
the reference's letter-or-digit boundary rejection.
"""

from __future__ import annotations

import re

__all__ = ["MultiWordStringMatcher"]

#: Java \p{Punct} (POSIX): the 32 ASCII punctuation characters
_PUNCT = r"!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~"
_WS_SPLIT = re.compile(r"\s+")
_PUNCT_WS = re.compile(rf"\s*([{_PUNCT}])\s*")
_LNRM_DELIM = re.compile(rf"(?:[{_PUNCT}]|\s)+")
_LNRM_ANY = rf"(?:[{_PUNCT}]|\s)*"


def get_exctws_regex(target: str) -> str:
    parts: list[str] = []
    for field in _WS_SPLIT.split(target):
        if not field:
            continue
        if parts:
            parts.append(r"\s+")  # whitespace in target needs ≥1 space
        tmp = _PUNCT_WS.sub(r" \1 ", field).strip()
        for j, f in enumerate(x for x in _WS_SPLIT.split(tmp) if x):
            if parts and (j > 0 or parts[-1] != r"\s+"):
                parts.append(r"\s*")
            parts.append(re.escape(f))
    return "".join(parts)


def get_lnrm_regex(target: str) -> str:
    fields = [f for f in _LNRM_DELIM.split(target) if f]
    return "(?iu)" + _LNRM_ANY.join(re.escape(f) for f in fields)


class MultiWordStringMatcher:
    def __init__(self, match_type: str = "EXCTWS"):
        match_type = match_type.upper()
        if match_type not in ("EXCT", "EXCTWS", "LWS", "LNRM", "REGEX"):
            raise ValueError(match_type)
        self.match_type = match_type
        self._cache: dict[str, re.Pattern] = {}

    def get_regex(self, target: str) -> str:
        if self.match_type == "EXCT":
            return re.escape(target)
        if self.match_type == "EXCTWS":
            return get_exctws_regex(target)
        if self.match_type == "LWS":
            return "(?iu)" + get_exctws_regex(target)
        if self.match_type == "LNRM":
            return get_lnrm_regex(target)
        return target  # REGEX

    def get_pattern(self, target: str) -> re.Pattern:
        p = self._cache.get(target)
        if p is None:
            p = re.compile(self.get_regex(target))
            self._cache[target] = p
        return p

    def find_target_string_offsets(self, text: str, target: str
                                   ) -> list[tuple[int, int]]:
        """All (begin, end) character offsets of ``target`` in ``text``
        whose neighbors are not letters/digits (word-ish boundaries)."""
        pattern = self.get_pattern(target)
        out: list[tuple[int, int]] = []
        pos = 0
        while pos <= len(text):
            m = pattern.search(text, pos)
            if m is None:
                break
            s, e = m.start(), m.end()
            ok = True
            if s > 0 and text[s - 1].isalnum():
                ok = False
            if e < len(text) and text[e].isalnum():
                ok = False
            if ok and e > s:
                out.append((s, e))
                pos = e
            else:
                pos = s + 1
        return out
