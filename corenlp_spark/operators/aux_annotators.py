"""Auxiliary annotators: quotes (+attribution), truecase, gender.

Behavioral reference (re-expressed):
  - quotes: ``pipeline/QuoteAnnotator.java`` (span detection over quote
    tokens, nesting-free subset) + ``QuoteAttributionAnnotator`` (nearest
    PERSON + speech-verb attribution sieve subset);
  - truecase: ``pipeline/TrueCaseAnnotator.java`` — broadcast dictionary of
    canonical casings (the CRF model's most-frequent-case backoff);
  - gender: ``pipeline/GenderAnnotator.java`` — first-name dictionary on
    PERSON mentions.

All narrow Arrow-batched transforms.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

QUOTES_TYPE = ("array<struct<start_tok:int,end_tok:int,text:string,"
               "speaker:string>>")

_SPEECH_VERBS = {"say", "said", "says", "think", "thought", "reply", "replied",
                 "ask", "asked", "shout", "shouted", "whisper", "whispered",
                 "add", "added", "note", "noted", "claim", "claimed"}

_OPEN_Q = {"``"}
_CLOSE_Q = {"''"}

GENDER_FIRST_NAMES = {
    "barack": "MALE", "george": "MALE", "john": "MALE", "chris": "MALE",
    "james": "MALE", "robert": "MALE", "michael": "MALE", "david": "MALE",
    "marie": "FEMALE", "jane": "FEMALE", "mary": "FEMALE", "sarah": "FEMALE",
    "anna": "FEMALE", "laura": "FEMALE", "emma": "FEMALE",
}

# canonical casings (truecase dictionary; in production: model-derived table)
def _build_truecase() -> dict[str, str]:
    """Most-frequent-casing table (the MFC baseline the reference's CRF
    truecaser is evaluated against) DERIVED from the engine's own proper-
    noun inventories — gazetteer phrases, training-corpus name pools,
    months/days — instead of a hand list. Lowercase-only keys; identity
    casings are skipped (the annotator only rewrites mismatches)."""
    table: dict[str, str] = {"i": "I"}
    try:
        from corenlp_spark.data.train_corpus import PROPER
        for name in PROPER:
            for w in str(name).split():
                if w[:1].isupper():
                    table.setdefault(w.lower(), w)
    except Exception:
        pass
    from corenlp_spark.operators.ner import GAZETTEER
    for phrases in GAZETTEER.values():
        for ph, wt in phrases:
            if wt <= 0:
                continue
            for w in ph:
                if w[:1].isupper():
                    table.setdefault(w.lower(), w)
    for m in ("January February March April May June July August September "
              "October November December Monday Tuesday Wednesday Thursday "
              "Friday Saturday Sunday").split():
        table.setdefault(m.lower(), m)
    return table


TRUECASE = _build_truecase()


def quote_docs(df: DataFrame) -> DataFrame:
    """+ quotes column with speaker attribution."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", quotes {QUOTES_TYPE}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            quotes_col = []
            for toks in pdf["tokens"]:
                toks = list(toks)
                quotes = []

                def emit(open_i: int, close_i: int):
                    text = " ".join(x["word"] for x in toks[open_i + 1: close_i])
                    # attribution: nearest PERSON token within 5 tokens of
                    # either quote edge, gated by a speech verb nearby
                    speaker = None
                    window = list(range(max(0, open_i - 5), open_i)) + \
                        list(range(close_i + 1, min(len(toks), close_i + 6)))
                    has_verb = any(
                        toks[k]["lemma"] in _SPEECH_VERBS
                        or toks[k]["word"].lower() in _SPEECH_VERBS
                        for k in window
                    )
                    if has_verb:
                        for k in window:
                            if toks[k].get("ner") == "PERSON":
                                speaker = toks[k]["word"]
                                break
                        if speaker is None:
                            # pronoun speaker ('"…," he said.') — the
                            # reference's QuoteAttribution pronoun sieve;
                            # downstream coref canonicalization resolves it
                            for k in window:
                                if toks[k]["word"].lower() in (
                                        "he", "she", "they", "i", "we"):
                                    speaker = toks[k]["word"]
                                    break
                    quotes.append({"start_tok": open_i, "end_tok": close_i + 1,
                                   "text": text, "speaker": speaker})

                # NESTED quotes via a typed open-quote stack (QuoteAnnotator
                # nesting semantics): `` … '' may contain ` … ' and vice
                # versa; both levels are emitted
                stack: list[tuple[int, str]] = []
                for i, t in enumerate(toks):
                    w = t["word"]
                    if w == "``":
                        stack.append((i, "d"))
                    elif w == "`":
                        stack.append((i, "s"))
                    elif w == "''" and any(k == "d" for _, k in stack):
                        while stack:
                            oi, k = stack.pop()
                            if k == "d":
                                emit(oi, i)
                                break
                    elif w == "'" and stack and stack[-1][1] == "s":
                        oi, _ = stack.pop()
                        emit(oi, i)
                quotes.sort(key=lambda q: (q["start_tok"], q["end_tok"]))
                # conversation continuation (QuoteAttribution conversational
                # sieve, simplified): an unattributed quote directly
                # following an attributed one (≤3 non-quote tokens between)
                # keeps that speaker ('"A," said John. "B."')
                for qi in range(1, len(quotes)):
                    q, prev = quotes[qi], quotes[qi - 1]
                    if (q["speaker"] is None
                            and prev["speaker"] is not None
                            and q["start_tok"] - prev["end_tok"] <= 3):
                        q["speaker"] = prev["speaker"]
                quotes_col.append(quotes)
            pdf = pdf.copy()
            pdf["quotes"] = quotes_col
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def truecase_docs(df: DataFrame) -> DataFrame:
    """+ truecase field per token (canonical casing; identity when unknown)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_tokens = []
            for toks in pdf["tokens"]:
                out = []
                for t in toks:
                    t = dict(t)
                    lw = t["word"].lower()
                    if lw in TRUECASE and t["word"] != TRUECASE[lw]:
                        t["word"] = TRUECASE[lw]
                    out.append(t)
                new_tokens.append(out)
            pdf = pdf.copy()
            pdf["tokens"] = new_tokens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def gender_of_mention(text: str) -> str:
    first = text.split()[0].lower() if text else ""
    return GENDER_FIRST_NAMES.get(first, "UNKNOWN")


def gender_mentions(mentions: DataFrame) -> DataFrame:
    """mentions → + gender column (PERSON first-name dictionary, broadcast-
    style driver constant; pure SQL CASE chain keeps it JVM-side)."""
    from pyspark.sql import functions as F

    first = F.lower(F.element_at(F.split("text", " "), 1))
    expr = F.lit("UNKNOWN")
    for name, g in GENDER_FIRST_NAMES.items():
        expr = F.when(first == name, g).otherwise(expr)
    return mentions.withColumn(
        "gender",
        F.when(F.col("ner") == "PERSON", expr).otherwise(F.lit(None)),
    )
