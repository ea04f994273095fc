"""Trained arc-standard transition parser (Chen & Manning 2014 re-expressed).

Behavioral reference:
  - transition system SHIFT / LEFT-ARC(rel) / RIGHT-ARC(rel):
    ``parser/nndep/ArcStandard.java:68-102``;
  - feature positions (stack/buffer words + POS + arc labels of children):
    ``parser/nndep/DependencyParser.java:160-190`` — scored here by an
    averaged perceptron instead of the cube-activation net (same transition
    system, same feature positions, deterministic training);
  - greedy decode: ``DependencyParser.java:941,975``.

Training data is DISTILLED from the engine's deterministic clause parser
over the template grammar + golden sentences (the sandbox has no treebank;
on a cluster the same trainer consumes any CoNLL-U treebank via
sources/conllu.read_conllu). Non-projective trees are filtered (arc-standard
derives only projective trees). The trained model is selectable via
``operators/depparse.parse_sentence(..., model="trained")`` /
``depparse_docs(df, model="trained")`` — the rule parser stays the default
(it is the golden-gated path); the trained model is the drop-in scorer the
stage contract was designed for.
"""

from __future__ import annotations

from collections import defaultdict

from corenlp_spark.models.perceptron import load_weights


def _features(stack: list[int], buffer: list[int], words, pos,
              head_of: dict[int, int], label_of: dict[int, str]) -> list[str]:
    """Chen&Manning-style positions: s1, s2, b1, b2 words+POS, leftmost/
    rightmost child labels of s1/s2."""
    def w(i):
        return words[i].lower() if i is not None else "<null>"

    def p(i):
        return pos[i] if i is not None else "<null>"

    s1 = stack[-1] if len(stack) >= 1 else None
    s2 = stack[-2] if len(stack) >= 2 else None
    b1 = buffer[0] if len(buffer) >= 1 else None
    b2 = buffer[1] if len(buffer) >= 2 else None

    def child_label(h, leftmost: bool):
        if h is None:
            return "<null>"
        kids = [d for d, hh in head_of.items() if hh == h]
        if not kids:
            return "<null>"
        return label_of.get(min(kids) if leftmost else max(kids), "<null>")

    return [
        f"s1w={w(s1)}", f"s1p={p(s1)}", f"s2w={w(s2)}", f"s2p={p(s2)}",
        f"b1w={w(b1)}", f"b1p={p(b1)}", f"b2p={p(b2)}",
        f"s1p+s2p={p(s1)}+{p(s2)}", f"s1p+b1p={p(s1)}+{p(b1)}",
        f"s1w+s2w={w(s1)}+{w(s2)}",
        f"s1lc={child_label(s1, True)}", f"s1rc={child_label(s1, False)}",
        f"s2lc={child_label(s2, True)}", f"s2rc={child_label(s2, False)}",
        "bias",
    ]


def _gold_transitions(n: int, gold_head: dict[int, int],
                      gold_label: dict[int, str]):
    """Static oracle: derive the transition sequence for a projective gold
    tree; returns None if the tree is non-projective/underivable."""
    stack: list[int] = []
    buffer = list(range(n))
    head_of: dict[int, int] = {}
    label_of: dict[int, str] = {}
    out = []
    n_deps = defaultdict(int)
    for d, h in gold_head.items():
        n_deps[h] += 1
    attached = defaultdict(int)
    while buffer or len(stack) > 1:
        s1 = stack[-1] if stack else None
        s2 = stack[-2] if len(stack) >= 2 else None
        act = None
        if s1 is not None and s2 is not None:
            if gold_head.get(s2) == s1:
                act = ("L", gold_label.get(s2, "dep"))
            elif gold_head.get(s1) == s2 and attached[s1] == n_deps[s1]:
                act = ("R", gold_label.get(s1, "dep"))
        if act is None:
            if not buffer:
                return None  # non-projective / broken
            act = ("S", "")
        out.append((list(stack), list(buffer), dict(head_of),
                    dict(label_of), act))
        kind, rel = act
        if kind == "S":
            stack.append(buffer.pop(0))
        elif kind == "L":
            head_of[s2] = s1
            label_of[s2] = rel
            attached[s1] += 1
            stack.pop(-2)
        else:
            head_of[s1] = s2
            label_of[s1] = rel
            attached[s2] += 1
            stack.pop()
    return out


class ArcStandardParser:
    """Averaged-perceptron-scored greedy arc-standard parser."""

    def __init__(self):
        self.weights: dict[str, dict[str, float]] = {}
        self.actions: list[str] = []

    def _score(self, feats):
        sc: dict[str, float] = defaultdict(float)
        for f in feats:
            by = self.weights.get(f)
            if by:
                for a, wt in by.items():
                    sc[a] += wt
        return sc

    def parse(self, words: list[str], pos: list[str]) -> list[tuple[int, int, str]]:
        """→ [(head, dep, rel)] with root head = -1 (greedy decode with
        legality constraints, ArcStandard.canApply)."""
        n = len(words)
        if n == 0:
            return []
        stack: list[int] = []
        buffer = list(range(n))
        head_of: dict[int, int] = {}
        label_of: dict[int, str] = {}
        steps = 0
        while (buffer or len(stack) > 1) and steps < 4 * n + 8:
            steps += 1
            feats = _features(stack, buffer, words, pos, head_of, label_of)
            sc = self._score(feats)
            legal = []
            if buffer:
                legal.append("S|")
            if len(stack) >= 2:
                legal.extend(a for a in self.actions
                             if a[0] in ("L", "R") and a != "S|")
            if not legal:
                break
            act = max(legal, key=lambda a: (sc.get(a, 0.0), a))
            kind, rel = act.split("|", 1)
            if kind == "S":
                stack.append(buffer.pop(0))
            elif kind == "L":
                d = stack[-2]
                head_of[d] = stack[-1]
                label_of[d] = rel
                stack.pop(-2)
            else:
                d = stack[-1]
                head_of[d] = stack[-2]
                label_of[d] = rel
                stack.pop()
        edges = []
        root = stack[0] if stack else 0
        edges.append((-1, root, "root"))
        for d in range(n):
            if d == root:
                continue
            if d in head_of:
                edges.append((head_of[d], d, label_of.get(d, "dep")))
            else:
                edges.append((root, d, "dep"))
        return edges

    def train(self, trees, epochs: int = 6):
        """trees: [(words, pos, edges)] with edges [(head, dep, rel)],
        head -1 = root. Deterministic, averaged."""
        acts = {"S|"}
        derivs = []
        for words, pos, edges in trees:
            gold_head = {d: h for h, d, r in edges if h >= 0}
            gold_label = {d: r for h, d, r in edges if h >= 0}
            for h, d, r in edges:
                if h >= 0:
                    acts.add(f"L|{r}")
                    acts.add(f"R|{r}")
            seq = _gold_transitions(len(words), gold_head, gold_label)
            if seq is not None:
                derivs.append((words, pos, seq))
        self.actions = sorted(acts)
        totals = defaultdict(float)
        stamps = defaultdict(int)
        step = 0

        def upd(f, a, delta):
            key = (f, a)
            cur = self.weights.setdefault(f, {}).get(a, 0.0)
            totals[key] += (step - stamps[key]) * cur
            stamps[key] = step
            self.weights[f][a] = cur + delta

        for _ in range(epochs):
            for words, pos, seq in derivs:
                for stack, buffer, head_of, label_of, (kind, rel) in seq:
                    feats = _features(stack, buffer, words, pos, head_of, label_of)
                    gold_act = f"{kind}|{rel}"
                    sc = self._score(feats)
                    legal = []
                    if buffer:
                        legal.append("S|")
                    if len(stack) >= 2:
                        legal.extend(a for a in self.actions if a[0] != "S")
                    pred = max(legal, key=lambda a: (sc.get(a, 0.0), a))
                    if pred != gold_act:
                        for f in feats:
                            upd(f, gold_act, 1.0)
                            upd(f, pred, -1.0)
                    step += 1
        for f, by in self.weights.items():
            for a in list(by):
                key = (f, a)
                totals[key] += (step - stamps[key]) * by[a]
                by[a] = totals[key] / max(step, 1)

    def to_broadcastable(self):
        return {"weights": {f: dict(t) for f, t in self.weights.items()},
                "actions": list(self.actions)}

    @classmethod
    def from_broadcastable(cls, blob):
        m = cls()
        m.weights = blob["weights"]
        m.actions = blob["actions"]
        return m


_PARSER = None


def get_trained_parser() -> ArcStandardParser:
    global _PARSER
    if _PARSER is None:
        _PARSER = ArcStandardParser.from_broadcastable(load_weights("parser"))
    return _PARSER
