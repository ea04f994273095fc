"""Fused PTB-style tokenization + sentence splitting as one Arrow-batched stage.

Behavioral reference (re-expressed, not ported):
  - token rules: ``process/PTBLexer.flex`` (rule cascade: URLs, emoticons,
    ellipses, currency, abbreviations, clitic splits like ``I'm → I 'm``,
    ``gonna → gon na``), API ``process/PTBTokenizer.java:61-177``.
  - sentence boundaries: ``process/WordToSentenceProcessor.java:76-131``
    (terminators ``[.!?]+``, boundary followers — close quotes/brackets —
    attach left; annotator ``pipeline/WordsToSentencesAnnotator.java:178``).
  - media spans terminate sentences, the analog of CleanXML block tags
    (``pipeline/CleanXmlAnnotator.java:164-226``).

Implementation is a compiled-regex cascade over each text span, run inside a
``mapInPandas`` iterator (one Python loop per *Arrow batch*, never a Spark
row-at-a-time UDF). The stage is a narrow transformation: no shuffle, and at
cluster scale it pipelines with every other per-doc stage.

Output columns:
  tokens:    array<struct<idx,word,original,begin,end,span_idx,sent>>
  sentences: array<struct<sent_idx,start_tok,end_tok,span_idx>>
The input ``spans`` column passes through untouched (span-sequence invariant).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

TOKENS_TYPE = (
    "array<struct<idx:int,word:string,original:string,begin:int,end:int,"
    "span_idx:int,sent:int>>"
)
SENTENCES_TYPE = "array<struct<sent_idx:int,start_tok:int,end_tok:int,span_idx:int>>"

# ---------------------------------------------------------------------------
# Rule cascade (ordered alternatives, first match wins — the JFlex discipline)
# ---------------------------------------------------------------------------

ABBREVS = {
    "mr.", "mrs.", "ms.", "dr.", "prof.", "sen.", "rep.", "gen.", "gov.",
    "inc.", "ltd.", "co.", "corp.", "pty.", "vs.", "etc.", "jr.", "sr.",
    "st.", "mt.", "no.", "dept.", "univ.", "assn.", "bros.", "ph.d.",
    "jan.", "feb.", "mar.", "apr.", "jun.", "jul.", "aug.", "sep.", "sept.",
    "oct.", "nov.", "dec.", "mon.", "tue.", "wed.", "thu.", "fri.", "sat.",
    "sun.", "approx.", "appt.", "est.", "min.", "max.", "misc.",
    "art.", "fig.", "sec.", "op.", "ch.", "p.m.", "a.m.", "ore.",
    "calif.", "ave.", "blvd.", "rd.",
}

# multi-word split table: PTBLexer splits these informal contractions
SPLIT_WORDS = {
    "gimme": ("gim", "me"),
    "gonna": ("gon", "na"),
    "wanna": ("wan", "na"),
    "gotta": ("got", "ta"),
    "lemme": ("lem", "me"),
    "outta": ("out", "ta"),
    "dunno": ("du", "n't", "know"),
    "cannot": ("can", "not"),
}

CLITICS = ("'s", "'m", "'re", "'ve", "'ll", "'d", "n't", "'S", "'M", "'RE", "'VE", "'LL", "'D", "N'T")

_RULES = [
    ("URL", r"(?:(?:https?|ftp|svn(?:\+ssh)?)://|www\.|mailto:)[\w.\-@]+(?:/[\w.\-/%&?=+#~:@]*)?"),
    ("EMAIL", r"[\w.+\-]+@[\w\-]+(?:\.[\w\-]+)+"),
    ("EMOTICON", r"\^_\^|<3|[<>]?[:;=8][\-o*']?[)\](\[dDpP/\\|@3]"),
    ("ELLIPSIS", r"\.\.\.|…"),
    ("TIME", r"\d{1,2}:\d{2}(?::\d{2})?"),
    ("ORDINAL", r"\d+(?:st|nd|rd|th)\b"),
    # hyphenated ranges / number-word compounds stay whole: 2010-2015,
    # 20-30%, 80,000-man (PTBLexer hyphenated-token behavior)
    ("NUMRANGE", r"\d[\d,.]*(?:[-–][\w.%]+)+"),
    ("NUMBER", r"\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+\.\d+|\d+"),
    ("PROGLANG", r"[A-Za-z]#"),
    ("CENSORED", r"[A-Za-z]+\*+[A-Za-z*]*"),
    ("CURRENCY", r"(?:US|HK|A|C|NZ)?\$|£|€|¥"),
    ("ACRONYM", r"(?:[A-Za-z]\.){2,}"),
    # word with optional internal hyphens/slashes/apostrophes (O'Malley,
    # anti-acquisition, Sydney-based). Trailing clitics split in post-pass.
    ("WORD", r"[A-Za-zÀ-ɏ0-9]+(?:[-/'’][A-Za-zÀ-ɏ0-9]+)*\.?"),
    ("MULTIPUNCT", r"[?!]+"),
    ("DASH", r"--+|—|–"),
    ("QUOTE", r"``|''|[\"'`‘’“”]"),
    ("PUNCT", r"[^\sA-Za-z0-9]"),
]
MASTER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _RULES))

# normalization map (PTBLexer quote/dash/ellipsis normalization, default opts)
_NORM = {"‘": "`", "’": "'", "“": "``", "”": "''",
         "—": "--", "–": "--", "…": "..."}

_SENT_END = re.compile(r"^[.!?]+$|^[。！？]+$")
_FOLLOWER = re.compile(r"^[\"'`)\]}’”]+$|^''$")


def _split_word(original: str, begin: int):
    """Post-pass on a WORD match: abbreviation periods, clitics, split table.

    Yields (word, original, begin, end) 4-tuples.
    """
    lower = original.lower()
    # abbreviation: keep trailing period iff known abbrev, else detach
    if original.endswith("."):
        if lower in ABBREVS:
            yield (original, original, begin, begin + len(original))
            return
        core = original[:-1]
        yield from _split_word(core, begin)
        yield (".", ".", begin + len(core), begin + len(original))
        return
    if lower in SPLIT_WORDS:
        parts = SPLIT_WORDS[lower]
        pos = 0
        for i, p in enumerate(parts):
            seg = original[pos : pos + len(p)] if i < len(parts) - 1 else original[pos:]
            word = seg if seg.lower() == p.lower() else p  # keep original case
            yield (word, seg, begin + pos, begin + pos + len(seg))
            pos += len(seg)
        return
    # clitic split: don't → do + n't ; Mary's → Mary + 's ; I'm → I + 'm
    norm = original.replace("’", "'")
    for cl in CLITICS:
        if norm.lower().endswith(cl.lower()) and len(norm) > len(cl):
            stem_orig = original[: len(original) - len(cl)]
            cl_orig = original[len(original) - len(cl):]
            if cl.lower() == "n't":
                yield (stem_orig, stem_orig, begin, begin + len(stem_orig))
            else:
                yield from _split_word(stem_orig, begin)
            yield (norm[len(norm) - len(cl):], cl_orig,
                   begin + len(stem_orig), begin + len(original))
            return
    yield (original, original, begin, begin + len(original))


def tokenize_text(text: str) -> list[tuple[str, str, int, int]]:
    """Tokenize one text span → list of (word, original, begin, end)."""
    out: list[tuple[str, str, int, int]] = []
    for m in MASTER.finditer(text):
        kind = m.lastgroup
        original = m.group()
        if kind == "WORD":
            out.extend(_split_word(original, m.start()))
        elif kind == "URL" and original.endswith("."):
            core = original[:-1]
            out.append((core, core, m.start(), m.end() - 1))
            out.append((".", ".", m.end() - 1, m.end()))
        else:
            word = _NORM.get(original, original)
            if kind == "QUOTE" and original == '"':
                # PTB: straight double quote → `` if opening else ''
                prev_sp = m.start() == 0 or text[m.start() - 1].isspace() or text[m.start() - 1] in "([{"
                word = "``" if prev_sp else "''"
            out.append((word, original, m.start(), m.end()))
    return out


def annotate_doc(spans: Iterable[dict]) -> tuple[list[dict], list[dict]]:
    """Tokenize + ssplit one document's span list. Media spans are barriers."""
    tokens: list[dict] = []
    sentences: list[dict] = []
    sent_start = 0

    def close_sentence(span_idx: int):
        nonlocal sent_start
        if len(tokens) > sent_start:
            sidx = len(sentences)
            for t in tokens[sent_start:]:
                t["sent"] = sidx
            sentences.append(
                {"sent_idx": sidx, "start_tok": sent_start,
                 "end_tok": len(tokens), "span_idx": span_idx}
            )
            sent_start = len(tokens)

    for span in spans:
        kind = span["kind"]
        if kind != "text" or not span["text"]:
            close_sentence(span["offset"])  # media barrier ends open sentence
            continue
        span_idx = span["offset"]
        toks = tokenize_text(span["text"])
        i = 0
        while i < len(toks):
            w, orig, b, e = toks[i]
            tokens.append(
                {"idx": len(tokens), "word": w, "original": orig,
                 "begin": b, "end": e, "span_idx": span_idx, "sent": -1}
            )
            if _SENT_END.match(w):
                # attach boundary followers (close quotes / brackets) left
                while i + 1 < len(toks) and _FOLLOWER.match(toks[i + 1][0]):
                    i += 1
                    w2, o2, b2, e2 = toks[i]
                    tokens.append(
                        {"idx": len(tokens), "word": w2, "original": o2,
                         "begin": b2, "end": e2, "span_idx": span_idx, "sent": -1}
                    )
                close_sentence(span_idx)
            i += 1
        close_sentence(span_idx)  # span end is also a boundary
    return tokens, sentences


def tokenize_docs(df: DataFrame) -> DataFrame:
    """DataFrame transform: docs(doc_id, spans, ...) → + tokens, sentences."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", tokens {TOKENS_TYPE}, sentences {SENTENCES_TYPE}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_col, sents_col = [], []
            for spans in pdf["spans"]:
                t, s = annotate_doc(spans)
                toks_col.append(t)
                sents_col.append(s)
            pdf = pdf.copy()
            pdf["tokens"] = toks_col
            pdf["sentences"] = sents_col
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
