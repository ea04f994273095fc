"""Coreference evaluation metrics: MUC, B³, CEAF-e, and the CoNLL average.

Published algorithms re-expressed (the reference scores with the same
trio and gates on their average — ``dcoref/SieveCoreferenceSystem`` CoNLL
scorer usage; MUC: Vilain et al. 1995; B³: Bagga & Baldwin 1998; CEAF-e:
Luo 2005 with the φ4 entity-similarity and greedy-optimal alignment via
Hungarian assignment — implemented exactly, the matrices are tiny).

Chains are collections of hashable mention ids; only the partition
structure matters here.
"""

from __future__ import annotations


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r else 0.0


def muc(gold: list[set], pred: list[set]) -> tuple[float, float, float]:
    """Link-based: recall = Σ(|G|−partitions(G,pred)) / Σ(|G|−1)."""
    def score(src, dst):
        num = den = 0
        for chain in src:
            if len(chain) < 2:
                continue
            partitions = {
                next((i for i, d in enumerate(dst) if m in d), ("x", m))
                for m in chain
            }
            num += len(chain) - len(partitions)
            den += len(chain) - 1
        return num / den if den else 0.0

    r = score(gold, pred)
    p = score(pred, gold)
    return p, r, _f1(p, r)


def b_cubed(gold: list[set], pred: list[set]) -> tuple[float, float, float]:
    """Mention-based: per-mention overlap ratio averaged over mentions."""
    def score(src, dst):
        total = n = 0.0
        for chain in src:
            for m in chain:
                other = next((d for d in dst if m in d), {m})
                total += len(chain & other) / len(chain)
                n += 1
        return total / n if n else 0.0

    r = score(gold, pred)
    p = score(pred, gold)
    return p, r, _f1(p, r)


def _hungarian_max(w: list[list[float]]) -> float:
    """Maximum-weight assignment value (O(n³) Jonker-style potentials on
    the negated matrix; exact — chain counts here are single digits)."""
    n = max(len(w), max((len(r) for r in w), default=0))
    INF = float("inf")
    cost = [[-(w[i][j] if i < len(w) and j < len(w[i]) else 0.0)
             for j in range(n)] for i in range(n)]
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            p[j0] = p[way[j0]]
            j0 = way[j0]
    total = 0.0
    for j in range(1, n + 1):
        if p[j]:
            total += w[p[j] - 1][j - 1] if p[j] - 1 < len(w) and j - 1 < len(w[p[j] - 1]) else 0.0
    return total


def ceaf_e(gold: list[set], pred: list[set]) -> tuple[float, float, float]:
    """Entity-based CEAF with φ4(G, P) = 2|G∩P| / (|G|+|P|), optimal
    one-to-one chain alignment."""
    if not gold or not pred:
        return 0.0, 0.0, 0.0
    phi = [[2 * len(g & p) / (len(g) + len(p)) for p in pred] for g in gold]
    best = _hungarian_max(phi)
    p = best / len(pred)
    r = best / len(gold)
    return p, r, _f1(p, r)


def conll_f1(gold: list[set], pred: list[set]) -> float:
    """The CoNLL-2012 official score: mean of MUC, B³, CEAF-e F1s."""
    return (muc(gold, pred)[2] + b_cubed(gold, pred)[2]
            + ceaf_e(gold, pred)[2]) / 3.0
