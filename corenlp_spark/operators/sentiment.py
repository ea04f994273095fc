"""Sentence-level sentiment annotator.

Behavioral reference: the ``sentiment`` annotator surface
(``pipeline/SentimentAnnotator.java`` — one 5-class label per sentence:
Very negative / Negative / Neutral / Positive / Very positive,
``sentiment/SentimentUtils.java`` class names). DESIGN DELTA, stated
plainly: the reference scores with an RNTN over binarized constituency
trees (``sentiment/SentimentModel.java``); this engine has no constituency
parse (SURVEY §2.2 design-out), so the scorer is a valence-lexicon model
with negation handled by the natlog per-token polarity marks
(``operators/openie.compute_polarity``) and intensifier scaling — the
compositional effects the RNTN learns (negation flip, intensification)
applied through the dependency-side machinery this engine does have. Same
output surface and label inventory; weaker on subtle compositionality.

Narrow per-doc transform (mapInPandas); no shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SENTIMENT_SCHEMA = (
    "doc_id string, sent_idx int, sentiment string, score double"
)

LABELS = ["Very negative", "Negative", "Neutral", "Positive", "Very positive"]

# valence lexicon: word → [-2, 2] (hand-built public-knowledge seed in the
# spirit of published valence lexicons; the RNTN's learned phrase valences
# are out of scope per the design delta above)
VALENCE: dict[str, float] = {
    "good": 1.0, "great": 1.5, "excellent": 2.0, "amazing": 2.0,
    "wonderful": 2.0, "fantastic": 2.0, "awesome": 1.8, "best": 1.8,
    "love": 1.6, "loved": 1.6, "loves": 1.6, "like": 0.8, "likes": 0.8,
    "liked": 0.8, "enjoy": 1.2, "enjoyed": 1.2, "happy": 1.3, "glad": 1.1,
    "brilliant": 1.8, "beautiful": 1.4, "nice": 0.9, "pleasant": 1.0,
    "impressive": 1.3, "win": 1.0, "won": 1.0, "success": 1.2,
    "successful": 1.2, "perfect": 1.8, "delightful": 1.6, "superb": 1.8,
    "strong": 0.7, "clever": 1.0, "charming": 1.2, "fun": 1.1,
    "helpful": 1.0, "recommend": 1.2, "recommended": 1.2, "thrilled": 1.8,
    "bad": -1.0, "terrible": -2.0, "awful": -2.0, "horrible": -2.0,
    "worst": -1.8, "hate": -1.6, "hates": -1.6, "hated": -1.6,
    "dislike": -1.0, "poor": -1.0, "disappointing": -1.4,
    "disappointed": -1.4, "boring": -1.2, "dull": -1.0, "sad": -1.1,
    "unhappy": -1.2, "angry": -1.2, "fail": -1.2, "failed": -1.2,
    "failure": -1.3, "broken": -1.0, "ugly": -1.3, "mess": -1.1,
    "weak": -0.7, "annoying": -1.2, "mediocre": -0.9, "waste": -1.4,
    "wasted": -1.4, "useless": -1.5, "dreadful": -1.8, "atrocious": -2.0,
    "flawed": -0.9, "stupid": -1.4, "wrong": -0.8, "problem": -0.7,
    "problems": -0.7, "slow": -0.6, "buggy": -1.2,
}
INTENSIFIERS = {"very": 1.5, "extremely": 1.8, "really": 1.3, "so": 1.2,
                "incredibly": 1.8, "absolutely": 1.5, "quite": 1.1,
                "totally": 1.4}
DIMINISHERS = {"slightly": 0.6, "somewhat": 0.7, "barely": 0.5,
               "hardly": 0.5, "a": 1.0}
_NEG_WORDS = {"not", "n't", "never", "no", "nothing", "nobody", "neither"}


def score_sentence(words: list[str], polarity: list[str] | None = None) -> float:
    """Valence sum with intensifier scaling and polarity-aware negation:
    a token under downward natlog polarity (or within 3 tokens after a
    negation word, the lexicon fallback) contributes flipped & damped —
    the standard negation treatment the RNTN learns from data."""
    total = 0.0
    lws = [w.lower() for w in words]
    for i, lw in enumerate(lws):
        v = VALENCE.get(lw)
        if v is None:
            continue
        scale = 1.0
        if i > 0:
            prev = lws[i - 1]
            if prev in INTENSIFIERS:
                scale = INTENSIFIERS[prev]
            elif prev in DIMINISHERS and prev != "a":
                scale = DIMINISHERS[prev]
        negated = False
        if polarity is not None and polarity[i] == "down":
            negated = True
        else:
            for k in range(max(0, i - 3), i):
                if lws[k] in _NEG_WORDS:
                    negated = True
                    break
        if negated:
            v = -0.6 * v  # flip + damp: "not great" ≈ mildly negative
        total += v * scale
    return total


def label_of(score: float) -> str:
    if score <= -1.5:
        return LABELS[0]
    if score < -0.3:
        return LABELS[1]
    if score < 0.3:
        return LABELS[2]
    if score < 1.5:
        return LABELS[3]
    return LABELS[4]


def sentiment_docs(df: DataFrame) -> DataFrame:
    """docs → one row per sentence with (sentiment label, raw score).

    Computes natlog polarity marks per sentence when a deps column is
    available in the annotation (the fused kernel recomputes them cheaply);
    without deps the lexicon negation-window fallback applies."""
    from corenlp_spark.operators.openie import _Graph, compute_polarity
    from corenlp_spark.plans.fused import _annotate_one

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sent_idx", "sentiment", "score")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                tokens, sentences, deps, _ = _annotate_one(spans)
                by_sent: dict[int, list] = {}
                for e in deps:
                    by_sent.setdefault(e["sent_idx"], []).append(
                        (e["head"], e["dep"], e["rel"]))
                for s in sentences:
                    a, b = s["start_tok"], s["end_tok"]
                    seg = tokens[a:b]
                    words = [t["word"] for t in seg]
                    pol = None
                    edges = by_sent.get(s["sent_idx"])
                    if edges:
                        g = _Graph(words, [t["lemma"] for t in seg],
                                   edges, a, [t["pos"] for t in seg])
                        pol = compute_polarity(g)
                    sc = round(score_sentence(words, pol), 6)
                    rows["doc_id"].append(doc_id)
                    rows["sent_idx"].append(s["sent_idx"])
                    rows["sentiment"].append(label_of(sc))
                    rows["score"].append(sc)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SENTIMENT_SCHEMA)
