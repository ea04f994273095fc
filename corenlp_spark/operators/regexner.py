"""RegexNER mapping-file classifier (re-expressed).

Behavioral reference: ``ie/regexp/RegexNERSequenceClassifier.java`` — the
file format the reference ships gazetteers in::

    regex1 regex2\tTYPE\toverwritableType1,Type2\tpriority

Each whitespace-separated field of the pattern is a full-match regex over
one token. A match stamps TYPE when every matched token's current label is
background ("O") or listed overwritable, and (when a valid-POS pattern is
set — default ``^(NN|JJ)``) at least one matched token's POS matches it.
Priority orders application (higher first; file order breaks ties).

This is the FILE-FORMAT layer of regexner; the pipeline's in-code layer
(gazetteer priority overwrite + tokensregex rules) lives in
operators/ner.py and operators/tokensregex.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["RegexNERClassifier", "parse_regexner_mapping"]

DEFAULT_VALID_POS = "^(NN|JJ)"


@dataclass
class Entry:
    regexes: list[re.Pattern]
    type: str
    overwritable: set[str]
    priority: float


def parse_regexner_mapping(text: str, ignore_case: bool = False
                           ) -> list[Entry]:
    flags = re.IGNORECASE if ignore_case else 0
    entries: list[Entry] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fields = line.split("\t")
        pattern, type_ = fields[0], fields[1]
        overwritable = set()
        priority = 0.0
        if len(fields) > 2 and fields[2].strip():
            overwritable = {t.strip() for t in fields[2].split(",")
                            if t.strip()}
        if len(fields) > 3 and fields[3].strip():
            priority = float(fields[3])
        regexes = [re.compile(tok, flags) for tok in pattern.split()]
        entries.append(Entry(regexes, type_, overwritable, priority))
    # higher priority first; file order breaks ties (stable sort)
    entries.sort(key=lambda e: -e.priority)
    return entries


class RegexNERClassifier:
    def __init__(self, mapping: str, ignore_case: bool = False,
                 overwrite_my_labels: bool = False,
                 valid_pos_pattern: str | None = DEFAULT_VALID_POS):
        self.entries = parse_regexner_mapping(mapping, ignore_case)
        self.my_labels = {"O", None, ""}
        if overwrite_my_labels:
            self.my_labels |= {e.type for e in self.entries}
        self.valid_pos = (re.compile(valid_pos_pattern)
                          if valid_pos_pattern else None)

    def classify(self, words: list[str], pos: list[str] | None,
                 ner: list[str]) -> list[str]:
        """Return a new NER list with matching spans stamped."""
        out = list(ner)
        n = len(words)
        for e in self.entries:
            k = len(e.regexes)
            i = 0
            while i + k <= n:
                if all(rx.fullmatch(words[i + j])
                       for j, rx in enumerate(e.regexes)):
                    ok = all(out[i + j] in self.my_labels
                             or out[i + j] in e.overwritable
                             for j in range(k))
                    if ok and self.valid_pos is not None:
                        if pos is None:
                            raise ValueError(
                                "RegexNER needs POS tags for the valid-POS "
                                "gate; pass valid_pos_pattern=None otherwise")
                        ok = any(self.valid_pos.search(pos[i + j])
                                 for j in range(k))
                    if ok:
                        for j in range(k):
                            out[i + j] = e.type
                        i += k
                        continue
                i += 1
        return out
