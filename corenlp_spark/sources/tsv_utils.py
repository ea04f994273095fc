"""TSV/SQL-array utilities (re-expressed).

Behavioral reference: ``process/TSVUtils.java:56-121`` (parseArray — the
Postgres-array parser CoreNLP uses to load TSV-dumped token arrays,
including its documented quirks: "doubly escaped" backslash collapsing and
whole-string double-double-quoting) and ``process/StopList.java``.
"""

from __future__ import annotations

__all__ = ["parse_array", "StopList"]


def parse_array(array: str) -> list[str]:
    """Parse one SQL/Postgres array literal into its string elements."""
    if array.startswith("{") and array.endswith("}"):
        array = array[1:-1]
    # the reference's documented "doubly escaped" collapse (two literal
    # backslashes become one BEFORE scanning; see TSVUtilsTest)
    array = array.replace("\\\\", "\\")
    out: list[str] = []
    elem: list[str] = []
    in_quotes = False
    escaped = False
    doubled_quotes = False
    last_quote = "\0"
    i = 0
    n = len(array)
    while i < n:
        c = array[i]
        nxt = array[i + 1] if i + 1 < n else "\0"
        if escaped:
            elem.append(c)
            escaped = False
        elif c == '"':
            if not in_quotes:
                in_quotes = True
                last_quote = c
                if nxt == c:
                    # doubled opening quote → expect doubled closing quote
                    i += 1
                    doubled_quotes = True
            else:
                if c == last_quote:
                    if nxt == last_quote and not doubled_quotes:
                        escaped = True  # doubled-quote escaping
                    else:
                        in_quotes = False
                        if doubled_quotes:
                            i += 1
                            doubled_quotes = False
                else:
                    elem.append(c)
        elif c == "\\":
            escaped = True
        else:
            if in_quotes:
                elem.append(c)
            elif c == ",":
                out.append("".join(elem))
                elem.clear()
            else:
                elem.append(c)
            escaped = False
        i += 1
    if elem:
        out.append("".join(elem))
    return out


class StopList:
    """Tiny generic stoplist (StopList.java default constructor: the six
    extremely common function words — the generic table skips index 0)."""

    def __init__(self, words: set[str] | None = None):
        if words is None:
            generic = ["a", "an", "the", "and", "or", "but", "nor"]
            words = set(generic[1:])
        self._words = set(words)

    def contains(self, word) -> bool:
        return str(word) in self._words

    def __contains__(self, word) -> bool:
        return self.contains(word)
