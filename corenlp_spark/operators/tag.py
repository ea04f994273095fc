"""POS tagging + lemmatization as one fused Arrow-batched stage.

Behavioral reference (re-expressed):
  - POS: ``tagger/maxent/MaxentTagger.java`` (MaxEnt CMM over left3words
    features, ``ExtractorFrames.java:104-145``). Here: a TRAINED averaged
    perceptron over the same feature frame (prev tag, ±1 words, suffixes,
    shape) — weights trained deterministically by scripts/train_models.py
    and shipped as a committed artifact (the analog of the reference's model
    files, ``pipeline/DefaultPaths.java``). A closed-class dictionary pins
    function words — the analog of the tag dictionary restricting the
    MaxEnt search space (``tagger/maxent/TestSentence.java:335-341``) —
    but carries NO open-class vocabulary: content words are the model's job.
  - lemma: ``process/Morphology.java:110`` / ``process/Morpha.flex`` —
    finite-state stemming re-expressed as exception dict + suffix rules.

The model loads lazily once per executor process and scores Arrow batches.
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
# Closed-class dictionary: genuinely finite English function words only
# (determiners, pronouns, prepositions, auxiliaries, modals, contraction
# artifacts). Open-class/content vocabulary lives in the trained model.
# ---------------------------------------------------------------------------
CLOSED_CLASS: dict[str, str] = {
    # "that" pinned IN (complementizer reading) — the downstream clause
    # patterns (depparse/openie) are built for it, matching the r1 lexicon
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "IN",
    "these": "DT", "those": "DT", "all": "DT", "some": "DT", "no": "DT",
    "every": "DT", "any": "DT", "each": "DT", "both": "DT", "there": "EX",
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "him": "PRP", "her": "PRP$", "them": "PRP",
    "his": "PRP$", "its": "PRP$", "their": "PRP$", "my": "PRP$",
    "your": "PRP$", "our": "PRP$", "me": "PRP", "us": "PRP",
    "himself": "PRP", "herself": "PRP", "itself": "PRP", "themselves": "PRP",
    "myself": "PRP", "who": "WP", "whom": "WP", "which": "WDT",
    "what": "WP", "whose": "WP$", "where": "WRB", "when": "WRB", "why": "WRB",
    "how": "WRB",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN", "from": "IN",
    "with": "IN", "for": "IN", "as": "IN", "to": "TO", "into": "IN",
    "over": "IN", "under": "IN", "after": "IN", "before": "IN",
    "about": "IN", "between": "IN", "during": "IN", "against": "IN",
    "without": "IN", "within": "IN", "through": "IN", "upon": "IN",
    "among": "IN", "since": "IN", "until": "IN", "toward": "IN",
    "despite": "IN", "whether": "IN", "while": "IN", "than": "IN",
    "although": "IN", "though": "IN", "unless": "IN", "because": "IN",
    "beyond": "IN", "beneath": "IN", "across": "IN", "behind": "IN",
    "near": "IN", "amid": "IN", "via": "IN", "per": "IN", "onto": "IN",
    "throughout": "IN", "outside": "IN", "inside": "IN", "if": "IN",
    "is": "VBZ", "am": "VBP", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN", "being": "VBG",
    "'s": "POS", "'m": "VBP", "'re": "VBP", "'ve": "VBP", "'ll": "MD",
    "'d": "MD", "n't": "RB", "not": "RB",
    "has": "VBZ", "does": "VBZ", "did": "VBD",
    "will": "MD", "would": "MD", "can": "MD", "could": "MD",
    "might": "MD", "shall": "MD", "should": "MD", "must": "MD",
    # number words: a genuinely finite class, CD in PTB
    "one": "CD", "two": "CD", "three": "CD", "four": "CD", "five": "CD",
    "six": "CD", "seven": "CD", "eight": "CD", "nine": "CD", "ten": "CD",
    "eleven": "CD", "twelve": "CD", "twenty": "CD", "thirty": "CD",
    "forty": "CD", "fifty": "CD", "hundred": "CD", "thousand": "CD",
    "million": "CD", "billion": "CD", "dozen": "CD",
    # high-frequency adverbs with a single overwhelming PTB reading
    "then": "RB", "now": "RB", "also": "RB", "only": "RB", "just": "RB",
    "very": "RB", "really": "RB", "too": "RB", "soon": "RB", "never": "RB",
    "always": "RB", "often": "RB", "again": "RB", "still": "RB",
    "however": "RB", "so": "RB", "here": "RB", "yet": "RB", "aloud": "RB",
    # weekday / unambiguous month names: a closed set, NNP in PTB
    "monday": "NNP", "tuesday": "NNP", "wednesday": "NNP",
    "thursday": "NNP", "friday": "NNP", "saturday": "NNP", "sunday": "NNP",
    "january": "NNP", "february": "NNP", "april": "NNP", "june": "NNP",
    "july": "NNP", "september": "NNP", "october": "NNP",
    "november": "NNP", "december": "NNP",
    # tokenizer contraction artifacts ("gonna" → "gon na", "gimme" → "gim me")
    "gon": "VBG", "na": "TO", "gim": "VB",
}
# "may" is MD only in lowercase (capitalized it is usually the month NNP)
_LOWER_ONLY = {"may": "MD"}

_PUNCT_TAGS = {".": ".", ",": ",", ":": ":", ";": ":", "?": ".", "!": ".",
               "``": "``", "''": "''", "(": "-LRB-", ")": "-RRB-",
               "[": "-LRB-", "]": "-RRB-", "{": "-LRB-", "}": "-RRB-",
               "--": ":", "$": "$", "US$": "$", "#": "#", "...": ":"}

_RE_NUM = re.compile(r"^\d[\d,.:]*$")
_RE_ORD = re.compile(r"^\d+(st|nd|rd|th)$")

_POS_MODEL = None


def _get_pos_model():
    """Lazy once-per-process model load (executor-side; the committed
    weights artifact rides with the package via --py-files)."""
    global _POS_MODEL
    if _POS_MODEL is None:
        from corenlp_spark.models.perceptron import (
            AveragedPerceptronTagger, load_weights,
        )
        _POS_MODEL = AveragedPerceptronTagger.from_broadcastable(
            load_weights("pos"))
    return _POS_MODEL


def pos_tag(words: list[str], sent_starts: set[int]) -> list[str]:
    """Tag one document's token words with the trained averaged perceptron.
    ``sent_starts``: indices starting a sentence (left context resets)."""
    fixed: dict[int, str] = {}
    for i, w in enumerate(words):
        lw = w.lower()
        if w in _PUNCT_TAGS:
            fixed[i] = _PUNCT_TAGS[w]
        elif _RE_ORD.match(w):
            fixed[i] = "JJ"  # ordinals tag JJ in PTB
        elif _RE_NUM.match(w):
            fixed[i] = "CD"
        elif lw in CLOSED_CLASS:
            fixed[i] = CLOSED_CLASS[lw]
        elif lw in _LOWER_ONLY and w.islower():
            fixed[i] = _LOWER_ONLY[lw]
    return _get_pos_model().predict_with_constraints(words, fixed, sent_starts)


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
