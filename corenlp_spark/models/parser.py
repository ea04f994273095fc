"""Trained arc-standard transition parser (Chen & Manning 2014 re-expressed).

Behavioral reference:
  - transition system SHIFT / LEFT-ARC(rel) / RIGHT-ARC(rel):
    ``parser/nndep/ArcStandard.java:68-102``;
  - feature positions (stack/buffer words + POS + arc labels of children):
    ``parser/nndep/DependencyParser.java:160-190`` — scored here by an
    averaged perceptron instead of the cube-activation net (same transition
    system, same feature positions, deterministic training);
  - greedy decode: ``DependencyParser.java:941,975``.

This model is the DEFAULT depparse path (r3 flipped it). Training signal,
in priority order (scripts/train_models.py):
  1. hand-annotated gold treebank (data/gold_trees.py — authored against
     the public UD guidelines, independent of any parser in this repo);
  2. template-frame trees whose structure is gold BY CONSTRUCTION
     (gold_trees.dep_corpus);
  3. rule-parser anchor trees for the OpenIE regression-suite sentences
     (extraction-validated quasi-gold), deduped against (1).
On a cluster the same trainer consumes any CoNLL-U treebank via
sources/conllu.read_conllu. Non-projective trees are filtered (arc-standard
derives only projective trees). Training uses exploration (Goldberg & Nivre
2012): later epochs follow the model's own greedy path and update against a
dynamic oracle, so the states inference visits are the states training saw.
``nmod:<case>`` subtypes are NOT classifier outputs — they are re-derived
from each nominal's case child after decode (_resubtype_nmod), the same
post-parse collapse the reference applies. The rule clause parser remains
selectable via ``model="rule"`` (distillation teacher / fallback).
"""

from __future__ import annotations

from collections import defaultdict

from corenlp_spark.models.perceptron import load_weights


def _features(stack: list[int], buffer: list[int], words, pos,
              head_of: dict[int, int], label_of: dict[int, str],
              kids_of: dict[int, list[int]] | None = None) -> list[str]:
    """Chen&Manning-style positions (DependencyParser.java:160-190 feature
    set re-expressed as discrete templates): s1..s3 / b1..b3 words+POS,
    leftmost/rightmost child word+POS+label of s1/s2, grandchild labels,
    valence (child counts), s1–s2 distance bucket, and conjunctions.

    ``kids_of`` may be passed in by a caller that maintains it
    incrementally (parse()); derived from ``head_of`` otherwise."""
    def w(i):
        return words[i].lower() if i is not None else "<null>"

    def p(i):
        return pos[i] if i is not None else "<null>"

    s1 = stack[-1] if len(stack) >= 1 else None
    s2 = stack[-2] if len(stack) >= 2 else None
    s3 = stack[-3] if len(stack) >= 3 else None
    b1 = buffer[0] if len(buffer) >= 1 else None
    b2 = buffer[1] if len(buffer) >= 2 else None
    b3 = buffer[2] if len(buffer) >= 3 else None

    if kids_of is None:
        kids_of = {}
        for d, hh in head_of.items():
            kids_of.setdefault(hh, []).append(d)

    def lc(h):
        k = kids_of.get(h)
        return min(k) if k else None

    def rc(h):
        k = kids_of.get(h)
        return max(k) if k else None

    def lab(i):
        return label_of.get(i, "<null>") if i is not None else "<null>"

    s1lc, s1rc, s2lc, s2rc = lc(s1), rc(s1), lc(s2), rc(s2)
    if s1 is not None and s2 is not None:
        dist = min(s1 - s2, 5)
    else:
        dist = 0
    nval1 = len(kids_of.get(s1, ())) if s1 is not None else -1
    nval2 = len(kids_of.get(s2, ())) if s2 is not None else -1

    # each position value computed exactly once (hot path: the per-template
    # w()/p() recalls were ~20% of inference before)
    ws1, ws2, wb1, wb2 = w(s1), w(s2), w(b1), w(b2)
    ps1, ps2, ps3, pb1 = p(s1), p(s2), p(s3), p(b1)
    return [
        f"s1w={ws1}", f"s1p={ps1}", f"s1wp={ws1}+{ps1}",
        f"s2w={ws2}", f"s2p={ps2}", f"s2wp={ws2}+{ps2}",
        f"s3p={ps3}",
        f"b1w={wb1}", f"b1p={pb1}", f"b1wp={wb1}+{pb1}",
        f"b2p={p(b2)}", f"b2w={wb2}", f"b3p={p(b3)}",
        f"s1p+s2p={ps1}+{ps2}", f"s1p+b1p={ps1}+{pb1}",
        f"s1w+s2w={ws1}+{ws2}", f"s1w+s2p={ws1}+{ps2}",
        f"s1p+s2w={ps1}+{ws2}", f"s2p+b1p={ps2}+{pb1}",
        f"s1p+s2p+b1p={ps1}+{ps2}+{pb1}",
        f"s1p+s2p+s3p={ps1}+{ps2}+{ps3}",
        f"s1lcl={lab(s1lc)}", f"s1rcl={lab(s1rc)}",
        f"s2lcl={lab(s2lc)}", f"s2rcl={lab(s2rc)}",
        f"s1lcp={p(s1lc)}", f"s1rcp={p(s1rc)}",
        f"s2lcp={p(s2lc)}", f"s2rcp={p(s2rc)}",
        f"s1lcw={w(s1lc)}", f"s2rcw={w(s2rc)}",
        f"s1lcl2={lab(lc(s1lc))}", f"s1rcl2={lab(rc(s1rc))}",
        f"s2rcl2={lab(rc(s2rc))}",
        f"s1p+s2p+dist={ps1}+{ps2}+{dist}",
        f"s1val={nval1}", f"s2val={nval2}",
        f"s2p+s2val={ps2}+{nval2}",
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
        self._avec = None  # feature → np.ndarray(len(actions)), lazy

    def _score(self, feats):
        sc: dict[str, float] = defaultdict(float)
        for f in feats:
            by = self.weights.get(f)
            if by:
                for a, wt in by.items():
                    sc[a] += wt
        return sc

    def _ensure_action_vectors(self):
        """Inference-time vectorization (training keeps the mutable dict
        path): one weight vector per feature over the action axis, actions
        sorted DESCENDING so np.argmax's first-max rule reproduces the dict
        path's (score, action-string) max tie-break exactly. Per-action
        float adds happen in the same feats order as the dict path, so the
        sums are bitwise identical."""
        if self._avec is not None:
            return
        import numpy as np

        acts = sorted(self.actions, reverse=True)
        self._acts_desc = acts
        aidx = {a: i for i, a in enumerate(acts)}
        A = len(acts)
        vec = {}
        for f, by in self.weights.items():
            arr = np.zeros(A)
            for a, wt in by.items():
                i = aidx.get(a)
                if i is not None:
                    arr[i] += wt
            vec[f] = arr
        self._avec = vec
        self._zero = np.zeros(A)
        # additive legality masks: 0 where legal, -inf where not — one add
        # replaces a boolean where() per step
        arc = np.array([a[0] in ("L", "R") and a != "S|" for a in acts])
        shift = np.array([a == "S|" for a in acts])
        ninf = np.float64("-inf")
        self._pen_arc_only = np.where(arc, 0.0, ninf)
        self._pen_all = np.where(arc | shift, 0.0, ninf)

    def parse(self, words: list[str], pos: list[str]) -> list[tuple[int, int, str]]:
        """→ [(head, dep, rel)] with root head = -1 (greedy decode with
        legality constraints, ArcStandard.canApply)."""
        import numpy as np

        n = len(words)
        if n == 0:
            return []
        self._ensure_action_vectors()
        avec, acts = self._avec, self._acts_desc
        stack: list[int] = []
        buffer = list(range(n))
        head_of: dict[int, int] = {}
        label_of: dict[int, str] = {}
        kids_of: dict[int, list[int]] = {}
        steps = 0
        while (buffer or len(stack) > 1) and steps < 4 * n + 8:
            steps += 1
            if len(stack) < 2:
                # SHIFT is the only legal action — skip scoring entirely
                stack.append(buffer.pop(0))
                continue
            feats = _features(stack, buffer, words, pos, head_of, label_of,
                              kids_of)
            sc = self._zero.copy()
            for f in feats:
                arr = avec.get(f)
                if arr is not None:
                    sc += arr
            sc += self._pen_all if buffer else self._pen_arc_only
            act = acts[int(sc.argmax())]
            kind, rel = act.split("|", 1)
            if kind == "S":
                stack.append(buffer.pop(0))
            elif kind == "L":
                d = stack[-2]
                head_of[d] = stack[-1]
                label_of[d] = rel
                kids_of.setdefault(stack[-1], []).append(d)
                stack.pop(-2)
            else:
                d = stack[-1]
                head_of[d] = stack[-2]
                label_of[d] = rel
                kids_of.setdefault(stack[-2], []).append(d)
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
        return self._resubtype_nmod(words, edges)

    @staticmethod
    def _resubtype_nmod(words, edges):
        """Re-derive ``nmod:<case>`` subtypes from each nominal's actual
        ``case`` child (UniversalEnglishGrammaticalStructure.java:211-268 —
        the collapse is a post-parse rewrite, so the transition classifier
        only learns the base ``nmod`` attachment, never the preposition
        identity it can simply read off the tree)."""
        case_of = {}
        for h, d, r in edges:
            if r == "case" and h >= 0:
                case_of.setdefault(h, d)
        out = []
        for h, d, r in edges:
            if r == "nmod" or (r.startswith("nmod:")
                               and r.split(":", 1)[1] not in ("poss", "tmod")):
                c = case_of.get(d)
                if c is not None:
                    w = words[c].lower()
                    r = "nmod:poss" if w in ("'s", "'") else f"nmod:{w}"
                elif ":" in r:
                    r = "nmod"
            out.append((h, d, r))
        return out

    @staticmethod
    def _oracle_action(stack, buffer, head_of, gold_head, gold_label, n_gold_deps):
        """Dynamic-oracle-style best action from an ARBITRARY state (not just
        states on the gold derivation — Goldberg & Nivre 2012 training-with-
        exploration discipline applied to arc-standard): LEFT/RIGHT when the
        top-two stack items form a gold arc whose dependent has collected all
        its still-reachable gold children; SHIFT otherwise."""
        s1 = stack[-1] if stack else None
        s2 = stack[-2] if len(stack) >= 2 else None
        if s1 is not None and s2 is not None:
            got1 = sum(1 for d, h in head_of.items() if h == s1)
            got2 = sum(1 for d, h in head_of.items() if h == s2)
            if gold_head.get(s2) == s1 and got2 == n_gold_deps.get(s2, 0):
                return ("L", gold_label.get(s2, "dep"))
            if gold_head.get(s1) == s2 and got1 == n_gold_deps.get(s1, 0) \
                    and not any(gold_head.get(b) == s1 for b in buffer):
                return ("R", gold_label.get(s1, "dep"))
        if buffer:
            return ("S", "")
        # terminal fallback: reduce with the gold (or generic) label
        if s1 is not None and s2 is not None:
            if gold_head.get(s2) == s1:
                return ("L", gold_label.get(s2, "dep"))
            return ("R", gold_label.get(s1, "dep"))
        return None

    def train(self, trees, epochs: int = 6, explore_after: int = 2):
        """trees: [(words, pos, edges)] with edges [(head, dep, rel)],
        head -1 = root. Deterministic, averaged.

        Epochs 1..explore_after follow the gold (static-oracle) path; later
        epochs follow the MODEL's greedy predictions and update against the
        dynamic oracle at every visited state — so training sees exactly the
        error states greedy inference will reach (the r2 static-only trainer
        could not fix inference-time drift on long sentences)."""
        acts = {"S|"}
        data = []

        def base(r):
            # collapse case-derived nmod subtypes to the base relation the
            # classifier learns; parse() re-derives the subtype from the tree
            if r.startswith("nmod:") and r.split(":", 1)[1] not in ("poss", "tmod"):
                return "nmod"
            return r

        for words, pos, edges in trees:
            gold_head = {d: h for h, d, r in edges if h >= 0}
            gold_label = {d: base(r) for h, d, r in edges if h >= 0}
            for h, d, r in edges:
                if h >= 0:
                    acts.add(f"L|{base(r)}")
                    acts.add(f"R|{base(r)}")
            if _gold_transitions(len(words), gold_head, gold_label) is None:
                continue  # non-projective: skip
            n_gold_deps = defaultdict(int)
            for d, h in gold_head.items():
                n_gold_deps[h] += 1
            data.append((words, pos, gold_head, gold_label, dict(n_gold_deps)))
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

        for ep in range(epochs):
            follow_model = ep >= explore_after
            for words, pos, gold_head, gold_label, n_gold_deps in data:
                n = len(words)
                stack: list[int] = []
                buffer = list(range(n))
                head_of: dict[int, int] = {}
                label_of: dict[int, str] = {}
                guard = 0
                while (buffer or len(stack) > 1) and guard < 4 * n + 8:
                    guard += 1
                    oracle = self._oracle_action(
                        stack, buffer, head_of, gold_head, gold_label, n_gold_deps)
                    if oracle is None:
                        break
                    gold_act = f"{oracle[0]}|{oracle[1]}"
                    feats = _features(stack, buffer, words, pos, head_of, label_of)
                    sc = self._score(feats)
                    legal = []
                    if buffer:
                        legal.append("S|")
                    if len(stack) >= 2:
                        legal.extend(a for a in self.actions if a[0] != "S")
                    pred = max(legal, key=lambda a: (sc.get(a, 0.0), a)) \
                        if legal else gold_act
                    if pred != gold_act:
                        for f in feats:
                            upd(f, gold_act, 1.0)
                            upd(f, pred, -1.0)
                    step += 1
                    kind, rel = (pred if follow_model else gold_act).split("|", 1)
                    if kind == "S":
                        if not buffer:
                            break
                        stack.append(buffer.pop(0))
                    elif kind == "L":
                        if len(stack) < 2:
                            break
                        d = stack[-2]
                        head_of[d] = stack[-1]
                        label_of[d] = rel
                        stack.pop(-2)
                    else:
                        if len(stack) < 2:
                            break
                        d = stack[-1]
                        head_of[d] = stack[-2]
                        label_of[d] = rel
                        stack.pop()
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
