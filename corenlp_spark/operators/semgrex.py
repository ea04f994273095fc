"""Semgrex subset: dependency-graph patterns compiled to edge-list matchers.

Behavioral reference (re-expressed): ``semgraph/semgrex/SemgrexPattern.java:28-120``
(SURVEY.md §2.3). Supported grammar subset:

  {attr:val; attr:/re/}     node attribute sets (word/lemma/pos/ner)
  {}                        any node
  {$}                       root node
  A >rel B                  B is a direct dependent of A via rel (prefix match
                            on enhanced relations: >nmod matches nmod:of)
  A <rel B                  A's governor is B via rel
  A >> B                    B is a (transitive) dependent of A
  =name                     named node captures

Patterns compile on the driver; matching runs per sentence over the same
edge-list graphs OpenIE uses (tiny per-sentence graphs ⇒ Python match is the
right altitude, SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_NODE = re.compile(r"\{([^}]*)\}(?:=(\w+))?")
_REL = re.compile(r"\s*(>>|<<|>|<)([\w:]*)\s*")


@dataclass
class SNode:
    checks: list[tuple[str, re.Pattern]]
    root: bool = False
    name: str | None = None

    def matches(self, tok: dict, is_root: bool) -> bool:
        if self.root and not is_root:
            return False
        return all(
            rx.fullmatch(str(tok.get(attr, "") or "")) for attr, rx in self.checks
        )


@dataclass
class SemgrexPattern:
    nodes: list[SNode]
    rels: list[tuple[str, str]]  # between nodes[i] and nodes[i+1]


def compile_semgrex(pattern: str) -> SemgrexPattern:
    """Compile a linear chain pattern: {..}=a >rel {..}=b >>rel2 {..}..."""
    nodes: list[SNode] = []
    rels: list[tuple[str, str]] = []
    pos = 0
    while pos < len(pattern):
        m = _NODE.match(pattern, pos)
        if not m:
            if pattern[pos].isspace():
                pos += 1
                continue
            raise ValueError(f"expected node at {pattern[pos:]!r}")
        body, name = m.group(1), m.group(2)
        checks = []
        root = False
        for part in body.split(";"):
            part = part.strip()
            if not part:
                continue
            if part == "$":
                root = True
                continue
            attr, val = part.split(":", 1)
            attr, val = attr.strip(), val.strip()
            if val.startswith("/") and val.endswith("/"):
                rx = re.compile(val[1:-1])
            else:
                rx = re.compile(re.escape(val), re.IGNORECASE)
            checks.append((attr, rx))
        nodes.append(SNode(checks, root, name))
        pos = m.end()
        rm = _REL.match(pattern, pos)
        if rm:
            rels.append((rm.group(1), rm.group(2)))
            pos = rm.end()
        elif pos < len(pattern) and pattern[pos:].strip():
            raise ValueError(f"expected relation at {pattern[pos:]!r}")
    if len(nodes) != len(rels) + 1:
        raise ValueError("pattern must alternate node rel node ...")
    return SemgrexPattern(nodes, rels)


class SentenceGraph:
    """Adjacency view over one sentence's edge list (local token dicts)."""

    def __init__(self, toks: list[dict], edges: list[tuple[int, int, str]], offset: int = 0):
        self.toks = toks
        self.off = offset
        self.children: dict[int, list[tuple[int, str]]] = {}
        self.root = -1
        for h, d, r in edges:
            if h == -1:
                self.root = d
            else:
                self.children.setdefault(h, []).append((d, r))

    def tok(self, i: int) -> dict:
        return self.toks[i - self.off]

    def descendants(self, i: int):
        stack = [i]
        seen = set()
        while stack:
            t = stack.pop()
            for d, _ in self.children.get(t, ()):
                if d not in seen:
                    seen.add(d)
                    yield d
                    stack.append(d)


def _rel_candidates(g: SentenceGraph, t: int, op: str, rel: str):
    if op == ">":
        for d, r in g.children.get(t, ()):
            if not rel or r == rel or r.startswith(rel + ":"):
                yield d
    elif op == ">>":
        yield from g.descendants(t)
    elif op == "<":
        for h, kids in g.children.items():
            for d, r in kids:
                if d == t and (not rel or r == rel or r.startswith(rel + ":")):
                    yield h
    elif op == "<<":
        for h in list(g.children):
            if t in set(g.descendants(h)):
                yield h


def match_semgrex(pat: SemgrexPattern, g: SentenceGraph) -> list[dict[str, int]]:
    """All matches → list of {capture_name: token_idx} (unnamed nodes skipped).

    Strung relations all anchor to the FIRST node (SemgrexPattern semantics:
    "{} >nsubj {} >obj {}" = one node with both an nsubj and an obj child)."""
    out = []
    all_tokens = [g.off + i for i in range(len(g.toks))]

    def bt(ni: int, anchor: int, binding: dict):
        if ni == len(pat.nodes) - 1:
            out.append(dict(binding))
            return
        op, rel = pat.rels[ni]
        nxt = pat.nodes[ni + 1]
        for cand in _rel_candidates(g, anchor, op, rel):
            if nxt.matches(g.tok(cand), cand == g.root):
                b2 = binding
                if nxt.name:
                    b2 = dict(binding)
                    b2[nxt.name] = cand
                bt(ni + 1, anchor, b2)  # anchor stays the first node

    first = pat.nodes[0]
    for t in all_tokens:
        if first.matches(g.tok(t), t == g.root):
            binding = {first.name: t} if first.name else {}
            bt(0, t, binding)
    return out
