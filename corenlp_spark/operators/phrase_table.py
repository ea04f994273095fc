"""Phrase table: trie-backed multi-word phrase lookup over raw text.

Behavioral reference (re-expressed): ``ling/tokensregex/PhraseTable.java``
— the candidate-generation structure the reference's entity linking uses:
phrases are word lists keyed into a nested-dict trie over NORMALIZED words
(NFKD diacritic stripping → NFKC, lowercasing, whitespace removal;
punctuation kept unless ignore_punctuation), text is split on the
``[\\s_-]+`` delimiter, and ``find_all_matches`` returns every phrase
occurrence at every start position (token spans).
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["PhraseTable", "Phrase", "PhraseMatch"]

_DELIM = re.compile(r"[\s_-]+")
_PUNCT_WS = re.compile(r"\s*([!-/:-@\[-`{-~])\s*")
_WS = re.compile(r"\s+")
_POSS = re.compile(r"'s(\s+|$)")
_PHRASE_END = ""  # trie terminal key (words are never empty post-normalize)


class Phrase:
    __slots__ = ("text", "word_list", "tag")

    def __init__(self, text: str, word_list: list[str], tag=None):
        self.text = text
        self.word_list = word_list
        self.tag = tag

    def get_text(self) -> str:
        return self.text

    def __repr__(self):
        return f"Phrase({self.text!r})"


class PhraseMatch:
    __slots__ = ("phrase", "token_begin", "token_end")

    def __init__(self, phrase: Phrase, token_begin: int, token_end: int):
        self.phrase = phrase
        self.token_begin = token_begin
        self.token_end = token_end

    def __repr__(self):
        return f"PhraseMatch({self.phrase.text!r}, {self.token_begin}, {self.token_end})"


class PhraseTable:
    def __init__(self, normalize: bool = True, case_insensitive: bool = False,
                 ignore_punctuation: bool = False):
        self.normalize = normalize
        self.case_insensitive = case_insensitive
        self.ignore_punctuation = ignore_punctuation
        self._root: dict = {}
        self._norm_cache: dict[str, str] = {}

    # -- normalization (StringUtils.normalize + PhraseTable flags) --------
    def _normalized(self, word: str) -> str:
        out = self._norm_cache.get(word)
        if out is not None:
            return out
        w = word
        if self.normalize:
            w = unicodedata.normalize(
                "NFKC",
                "".join(c for c in unicodedata.normalize("NFKD", w)
                        if not unicodedata.combining(c)))
        if self.case_insensitive:
            w = w.lower()
        if self.ignore_punctuation:
            w = _PUNCT_WS.sub("", w)
        w = _WS.sub("", w)
        self._norm_cache[word] = w
        return w

    def split_text(self, text: str) -> list[str]:
        # possessive 's splits into its own token ("Arafat's" matches
        # the phrase "Arafat" — PhraseTable.java:258 possPattern)
        text = _POSS.sub(r" 's\1", text)
        return [t for t in _DELIM.split(text) if t]

    def _normalized_words(self, text: str) -> list[str]:
        return [n for n in (self._normalized(t) for t in self.split_text(text))
                if n]

    # -- construction ------------------------------------------------------
    def add_phrase(self, phrase_text: str, tag=None) -> None:
        words = self._normalized_words(phrase_text)
        node = self._root
        for w in words:
            node = node.setdefault(w, {})
        node[_PHRASE_END] = Phrase(phrase_text, words, tag)

    def add_phrases(self, phrase_texts) -> None:
        for p in phrase_texts:
            self.add_phrase(p)

    # -- lookup --------------------------------------------------------
    def lookup(self, phrase_text: str) -> Phrase | None:
        return self.lookup_normalized(phrase_text)

    def lookup_normalized(self, phrase_text: str) -> Phrase | None:
        node = self._root
        for w in self._normalized_words(phrase_text):
            node = node.get(w)
            if node is None:
                return None
        return node.get(_PHRASE_END)

    def __contains__(self, phrase_text: str) -> bool:
        return self.lookup(phrase_text) is not None

    # -- matching --------------------------------------------------------
    def find_all_matches(self, text: str) -> list[PhraseMatch]:
        """Every phrase occurrence at every start position (token spans
        over the normalized word list)."""
        tokens = self._normalized_words(text)
        n = len(tokens)
        out: list[PhraseMatch] = []
        for start in range(n):
            node = self._root
            i = start
            while True:
                end_phrase = node.get(_PHRASE_END)
                if end_phrase is not None:
                    out.append(PhraseMatch(end_phrase, start, i))
                if i >= n:
                    break
                node = node.get(tokens[i])
                if node is None:
                    break
                i += 1
        return out

    def find_non_overlapping_phrases(self, text: str) -> list[PhraseMatch]:
        """Longest-match-first greedy selection of non-overlapping spans."""
        matches = sorted(self.find_all_matches(text),
                         key=lambda m: (-(m.token_end - m.token_begin),
                                        m.token_begin))
        taken: set[int] = set()
        out = []
        for m in matches:
            span = range(m.token_begin, m.token_end)
            if not any(k in taken for k in span):
                out.append(m)
                taken.update(span)
        return sorted(out, key=lambda m: m.token_begin)
