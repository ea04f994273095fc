"""DocumentPreprocessor: reader → iterator of tokenized sentences.

Behavioral reference (re-expressed): ``process/DocumentPreprocessor.java``
— the reference's plain-text document reader: PTB-tokenize then split on
sentence-final punctuation words (default: "." or !/? runs, never the
ellipsis token), attaching boundary followers (quotes/brackets) to the
closing sentence; or, with a null tokenizer factory, whitespace-tokenize
with an explicit sentence delimiter (e.g. one sentence per line).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from corenlp_spark.operators.tokenize import (_FOLLOWER, _SENT_END,
                                              tokenize_text,
                                              whitespace_tokenize)

__all__ = ["DocumentPreprocessor"]


class DocumentPreprocessor:
    def __init__(self, text: str, tokenizer: str | None = "ptb",
                 options: dict | None = None):
        """``tokenizer="ptb"`` (default) or None for whitespace mode
        (pair with ``set_sentence_delimiter("\\n")``)."""
        self.text = text
        self.tokenizer = tokenizer
        self.options = options
        self._punc_words: set[str] | None = None
        self._delimiter: str | None = None

    @classmethod
    def from_path(cls, path: str, **kw) -> "DocumentPreprocessor":
        with open(path, encoding="utf-8") as f:
            return cls(f.read(), **kw)

    def set_sentence_final_punc_words(self, words) -> None:
        self._punc_words = set(words)

    def set_tokenizer_factory(self, factory) -> None:
        self.tokenizer = factory  # None → whitespace mode

    def set_sentence_delimiter(self, delim: str) -> None:
        self._delimiter = delim

    def _is_boundary(self, word: str) -> bool:
        if self._punc_words is not None:
            return word in self._punc_words
        return bool(_SENT_END.match(word))

    def __iter__(self) -> Iterator[list[str]]:
        if self.tokenizer is None:
            delim = self._delimiter or "\n"
            for part in self.text.split(delim):
                words = [t[0] for t in whitespace_tokenize(part)]
                if words:
                    yield words
            return
        toks = [t[0] for t in tokenize_text(self.text, self.options)]
        sent: list[str] = []
        i = 0
        while i < len(toks):
            sent.append(toks[i])
            if self._is_boundary(toks[i]):
                while i + 1 < len(toks) and _FOLLOWER.match(toks[i + 1]):
                    i += 1
                    sent.append(toks[i])
                yield sent
                sent = []
            i += 1
        if sent:
            yield sent
