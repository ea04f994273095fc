"""Semgrex subset: dependency-graph patterns compiled to edge-list matchers.

Behavioral reference (re-expressed): ``semgraph/semgrex/SemgrexPattern.java:28-120``
(SURVEY.md §2.3). Supported grammar:

  {attr:val; attr:/re/}     node attribute sets (word/lemma/pos/ner)
  {}                        any node
  {$}                       root node
  A >rel B                  B is a direct dependent of A via rel (prefix match
                            on enhanced relations: >nmod matches nmod:of)
  A <rel B                  A's governor is B via rel
  A >> B / A << B           transitive dependent / governor
  A ?>rel B                 optional: bind B when present, match regardless
  A !>rel B                 negation: A has NO such dependent
  A >r1 (B >r2 C)           tree-shaped: parentheses scope constraints to B
                            (without parens every relation constrains A,
                            SemgrexPattern strung-relation semantics)
  =name                     named node captures

Patterns compile on the driver; matching runs per sentence over the same
edge-list graphs OpenIE uses (tiny per-sentence graphs ⇒ Python match is the
right altitude, SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_NODE = re.compile(r"\{([^}]*)\}(?:=(\w+))?")
_REL = re.compile(r"\s*([?!]?)(>>|<<|>|<)([\w:]*)\s*")


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
    """Tree-shaped pattern: a head node plus relation constraints, each
    pointing at a child SemgrexPattern (mod: '' required, '?' optional,
    '!' negated)."""
    node: SNode
    constraints: list[tuple[str, str, str, "SemgrexPattern"]] = field(
        default_factory=list)  # (mod, op, rel, sub)


def _parse_node(pattern: str, pos: int) -> tuple[SNode, int]:
    m = _NODE.match(pattern, pos)
    if not m:
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
    return SNode(checks, root, name), m.end()


def _parse_pattern(pattern: str, pos: int) -> tuple[SemgrexPattern, int]:
    while pos < len(pattern) and pattern[pos].isspace():
        pos += 1
    node, pos = _parse_node(pattern, pos)
    pat = SemgrexPattern(node)
    while pos < len(pattern):
        while pos < len(pattern) and pattern[pos].isspace():
            pos += 1
        if pos >= len(pattern) or pattern[pos] == ")":
            break
        rm = _REL.match(pattern, pos)
        if not rm:
            raise ValueError(f"expected relation at {pattern[pos:]!r}")
        mod, op, rel = rm.group(1), rm.group(2), rm.group(3)
        pos = rm.end()
        while pos < len(pattern) and pattern[pos].isspace():
            pos += 1
        if pos < len(pattern) and pattern[pos] == "(":
            sub, pos = _parse_pattern(pattern, pos + 1)
            while pos < len(pattern) and pattern[pos].isspace():
                pos += 1
            if pos >= len(pattern) or pattern[pos] != ")":
                raise ValueError(f"unclosed group at {pattern[pos:]!r}")
            pos += 1
        else:
            sub_node, pos = _parse_node(pattern, pos)
            sub = SemgrexPattern(sub_node)
        pat.constraints.append((mod, op, rel, sub))
    return pat, pos


def compile_semgrex(pattern: str) -> SemgrexPattern:
    """Compile a (possibly tree-shaped) semgrex pattern."""
    pat, pos = _parse_pattern(pattern, 0)
    if pattern[pos:].strip():
        raise ValueError(f"trailing input at {pattern[pos:]!r}")
    return pat


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


def _match_at(pat: SemgrexPattern, g: SentenceGraph, t: int) -> list[dict[str, int]]:
    """Bindings for ``pat`` anchored at token ``t`` (empty list = no match)."""
    if not pat.node.matches(g.tok(t), t == g.root):
        return []
    base: dict[str, int] = {pat.node.name: t} if pat.node.name else {}
    bindings = [base]
    for mod, op, rel, sub in pat.constraints:
        sub_bindings: list[dict[str, int]] = []
        for cand in _rel_candidates(g, t, op, rel):
            sub_bindings.extend(_match_at(sub, g, cand))
        if mod == "!":
            if sub_bindings:
                return []
            continue
        if not sub_bindings:
            if mod == "?":
                continue  # optional: absent is fine, bindings unchanged
            return []
        bindings = [dict(b, **sb) for b in bindings for sb in sub_bindings]
    return bindings


def match_semgrex(pat: SemgrexPattern, g: SentenceGraph) -> list[dict[str, int]]:
    """All matches → list of {capture_name: token_idx} (unnamed nodes
    skipped). Relations strung on a node all constrain THAT node
    (SemgrexPattern semantics); parenthesized groups shift the constraint
    scope to the inner node — arbitrary tree-shaped patterns."""
    out: list[dict[str, int]] = []
    for i in range(len(g.toks)):
        out.extend(_match_at(pat, g, g.off + i))
    return out
