"""KBP evaluation accuracy bookkeeping (re-expressed).

Behavioral reference: ``ie/KBPRelationExtractor.java`` Accuracy inner
class (lines 410-530) — per-relation precision/recall/F1 plus micro and
macro averages, with the ``no_relation`` sentinel stripped before
scoring and the reference's edge conventions (precision of an
unpredicted relation = 1.0; recall of an unseen relation = 0.0)."""

from __future__ import annotations

from collections import Counter

NO_RELATION = "no_relation"

__all__ = ["KBPAccuracy", "NO_RELATION"]


class KBPAccuracy:
    def __init__(self):
        self.correct = Counter()
        self.predicted = Counter()
        self.gold = Counter()
        self.total = Counter()

    def predict(self, predicted_raw: set[str], gold_raw: set[str]) -> None:
        predicted = set(predicted_raw) - {NO_RELATION}
        gold = set(gold_raw) - {NO_RELATION}
        for p in predicted:
            if p in gold:
                self.correct[p] += 1
            self.predicted[p] += 1
        for g in gold:
            self.gold[g] += 1
        for r in predicted | gold:
            self.total[r] += 1

    def precision(self, relation: str) -> float:
        if self.predicted[relation] == 0:
            return 1.0
        return self.correct[relation] / self.predicted[relation]

    def recall(self, relation: str) -> float:
        if self.gold[relation] == 0:
            return 0.0
        return self.correct[relation] / self.gold[relation]

    def f1(self, relation: str) -> float:
        p, r = self.precision(relation), self.recall(relation)
        return 2 * p * r / (p + r) if p + r else 0.0

    def precision_micro(self) -> float:
        tp = sum(self.predicted.values())
        return sum(self.correct.values()) / tp if tp else 1.0

    def recall_micro(self) -> float:
        tg = sum(self.gold.values())
        return sum(self.correct.values()) / tg if tg else 0.0

    def precision_macro(self) -> float:
        rels = list(self.total)
        return sum(self.precision(r) for r in rels) / len(rels) if rels \
            else 1.0

    def recall_macro(self) -> float:
        rels = list(self.total)
        return sum(self.recall(r) for r in rels) / len(rels) if rels else 0.0

    def f1_micro(self) -> float:
        p, r = self.precision_micro(), self.recall_micro()
        return 2 * p * r / (p + r) if p + r else 0.0
