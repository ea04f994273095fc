"""TokensRegex subset: regex over token *objects* compiled to matchers over
token-attribute arrays.

Behavioral reference (re-expressed): ``ling/tokensregex/TokenSequencePattern.java``
/ ``SequenceMatcher.java`` / ``SequencePattern.java`` (SURVEY.md §2.3).
Supported grammar subset (what the engine's own stages need):

  [word:/re/]  [pos:/re/]  [ner:PERSON]  [lemma:run]   node predicates
  {word:X; pos:/VB.*/}                                  conjunction inside a node
  !{...}                                                node negation
  ([...] [...])                                         sequencing
  (?$name [...] ...)                                    named capture groups
  [...]?  [...]*  [...]+                                greedy quantifiers
  []                                                    any token

Patterns compile once on the driver into an NFA; matching runs inside
Arrow-batched UDFs (the multi-pattern annotator below broadcasts the compiled
rules and gates them with a first-token trigger index, the
``CoreMapNodePatternTrigger.java`` trick).

Scope note: alternation and {n,m} repeats are
supported; QUANTIFIED GROUPS ((…)+ / (…)*) are not — none of the KBP /
regexner rule inventories need them (SURVEY §2.3 subset-by-design).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_ATTRS = {"word", "lemma", "pos", "ner", "nner"}


@dataclass
class NodePred:
    checks: list[tuple[str, re.Pattern, bool]]  # (attr, regex, negated)
    negated: bool = False

    def matches(self, tok: dict) -> bool:
        ok = all(
            bool(rx.fullmatch(str(tok.get(attr, "") or ""))) != neg
            for attr, rx, neg in self.checks
        ) if self.checks else True
        return ok != self.negated


@dataclass
class Elem:
    pred: NodePred
    quant: str = ""          # '', '?', '*', '+', '{n}', '{n,m}'
    group: str | None = None  # capture-group name this elem belongs to

    def bounds(self, remaining: int) -> tuple[int, int]:
        """(min, max) repetitions for this element's quantifier."""
        q = self.quant
        if q == "":
            return 1, 1
        if q == "?":
            return 0, 1
        if q == "*":
            return 0, remaining
        if q == "+":
            return 1, remaining
        body = q[1:-1]
        if "," in body:
            a, b = body.split(",", 1)
            return int(a), int(b)
        return int(body), int(body)


@dataclass
class AltPattern:
    """Top-level / group alternation, expanded at compile time into
    alternative element lists; the longest-matching alternative wins
    (TokensRegex maximal-match semantics)."""
    alts: list[list[Elem]]


_NODE_RE = re.compile(
    r"(!?)\[\s*([^\]]*)\s*\]|(!?)\{\s*([^}]*)\s*\}"
)
_TOKEN_RE = re.compile(
    r"\(\?\$(?P<gopen>\w+)|\(\?:|(?P<gclose>\))"
    r"|(?P<node>!?[\[{][^\]}]*[\]}])"
    r"(?P<quant>[?*+]|\{\d+(?:,\d+)?\})?"
)


def _parse_pred(body: str, negated: bool) -> NodePred:
    checks = []
    if body.strip():
        for part in re.split(r"[;&]", body):
            part = part.strip()
            if not part:
                continue
            neg = part.startswith("!")
            part = part.lstrip("!")
            if ":" not in part:
                raise ValueError(f"bad node predicate: {part!r}")
            attr, val = part.split(":", 1)
            attr, val = attr.strip(), val.strip()
            if attr not in _ATTRS:
                raise ValueError(f"unknown attribute {attr!r}")
            if val.startswith("/") and val.endswith("/"):
                rx = re.compile(val[1:-1])
            else:
                rx = re.compile(re.escape(val.strip('"')), re.IGNORECASE)
            checks.append((attr, rx, neg))
    return NodePred(checks, negated)


def _split_top(pattern: str) -> list[str]:
    """Split on ``|`` at paren depth 0, ignoring bars inside [] / {} nodes."""
    parts, depth, node, cur = [], 0, None, []
    for ch in pattern:
        if node:
            cur.append(ch)
            if ch == node:
                node = None
            continue
        if ch in "[{":
            node = "]" if ch == "[" else "}"
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _expand_alternation(pattern: str, cap: int = 64) -> list[str]:
    """Expand every group containing a top-level ``|`` into alternative
    pattern strings (cross product, bounded by ``cap``)."""
    out, work = [], list(_split_top(pattern))
    while work:
        pat = work.pop(0)
        # innermost-first: at each ')' the innermost open group closes —
        # expanding there handles nested alternation inside-out
        node = None
        stack: list[int] = []
        expanded = False
        for i, ch in enumerate(pat):
            if node:
                if ch == node:
                    node = None
                continue
            if ch in "[{":
                node = "]" if ch == "[" else "}"
            elif ch == "(":
                stack.append(i)
            elif ch == ")" and stack:
                start = stack.pop()
                body = pat[start + 1:i]
                prefix_m = re.match(r"\?\$(\w+)\s*|\?:", body)
                inner = body[prefix_m.end():] if prefix_m else body
                wrap = body[:prefix_m.end()] if prefix_m else ""
                branches = _split_top(inner)
                if len(branches) > 1:
                    for b in branches:
                        work.append(pat[:start] + "(" + wrap + b + ")"
                                    + pat[i + 1:])
                    expanded = True
                    break
        if not expanded:
            out.append(pat)
        if len(out) + len(work) > cap:
            raise ValueError(f"alternation expansion exceeds {cap}: {pattern!r}")
    return out


def compile_pattern(pattern: str):
    """Compile a TokensRegex string; returns an element list, or an
    ``AltPattern`` when the pattern contains alternation."""
    alts = _expand_alternation(pattern)
    if len(alts) > 1:
        return AltPattern([_compile_one(a) for a in alts])
    return _compile_one(alts[0])


def _compile_one(pattern: str) -> list[Elem]:
    """Compile a TokensRegex string into an element list (linear NFA)."""
    elems: list[Elem] = []
    group_stack: list[str] = []
    pos = 0
    for m in _TOKEN_RE.finditer(pattern):
        if m.group("gopen"):
            group_stack.append(m.group("gopen"))
        elif m.group("gclose"):
            if group_stack:
                group_stack.pop()
        elif m.group("node"):
            node = m.group("node")
            negated = node.startswith("!")
            body = node.lstrip("!")[1:-1]
            elems.append(Elem(
                _parse_pred(body, negated),
                m.group("quant") or "",
                group_stack[-1] if group_stack else None,
            ))
        pos = m.end()
    if not elems:
        raise ValueError(f"empty pattern: {pattern!r}")
    return elems


def match_sequence(elems, toks: list[dict], start: int = 0):
    """Greedy backtracking match at ``start`` → (end, {group: (s, e)}) or
    None. Accepts an element list or an ``AltPattern`` (longest alternative
    wins)."""
    if isinstance(elems, AltPattern):
        best = None
        for alt in elems.alts:
            r = match_sequence(alt, toks, start)
            if r and (best is None or r[0] > best[0]):
                best = r
        return best

    def bt(ei: int, ti: int, groups):
        if ei == len(elems):
            return ti, groups
        e = elems[ei]

        def consume(n_min, n_max):
            # the required minimum must actually match ('+' previously
            # accepted its first token unchecked — r3 bug fix)
            for k in range(n_min):
                if ti + k >= len(toks) or not e.pred.matches(toks[ti + k]):
                    return None
            # greedy: longest first
            n = n_min
            while n < n_max and ti + n < len(toks) and e.pred.matches(toks[ti + n]):
                n += 1
            for take in range(n, n_min - 1, -1):
                g2 = groups
                if e.group and take > 0:
                    g2 = dict(groups)
                    s0, _ = g2.get(e.group, (ti, ti))
                    g2[e.group] = (min(s0, ti), ti + take)
                r = bt(ei + 1, ti + take, g2)
                if r:
                    return r
            return None

        if e.quant == "":
            if ti < len(toks) and e.pred.matches(toks[ti]):
                g2 = groups
                if e.group:
                    g2 = dict(groups)
                    s0, _ = g2.get(e.group, (ti, ti))
                    g2[e.group] = (min(s0, ti), ti + 1)
                return bt(ei + 1, ti + 1, g2)
            return None
        lo, hi = e.bounds(len(toks) - ti)
        return consume(lo, hi)

    return bt(0, start, {})


def find_all(elems, toks: list[dict]):
    """Non-overlapping left-to-right matches → [(start, end, groups)]."""
    out = []
    i = 0
    while i < len(toks):
        r = match_sequence(elems, toks, i)
        if r and r[0] > i:
            out.append((i, r[0], r[1]))
            i = r[0]
        else:
            i += 1
    return out


# ---------------------------------------------------------------------------
# TokensRegexNER-style multi-pattern annotator (priority overwrite)
# ---------------------------------------------------------------------------

@dataclass
class NerRule:
    pattern: str
    ner: str
    priority: float = 0.0
    elems: list = field(default_factory=list)


def tokensregex_ner(df: DataFrame, rules: list[tuple[str, str, float]]) -> DataFrame:
    """Overwrite token NER tags by priority rules (TokensRegexNERAnnotator
    semantics, ``pipeline/TokensRegexNERAnnotator.java:91-118``: higher
    priority wins; never overwrites an existing non-O tag of equal class).

    rules: (tokensregex pattern, ner tag, priority).
    """
    compiled = sorted(
        [NerRule(p, t, pr, compile_pattern(p)) for p, t, pr in rules],
        key=lambda r: -r.priority,
    )
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_tokens = []
            for toks in pdf["tokens"]:
                toks = [dict(t) for t in toks]
                claimed = [False] * len(toks)
                for rule in compiled:
                    for s, e, _ in find_all(rule.elems, toks):
                        if any(claimed[k] for k in range(s, e)):
                            continue  # higher-priority rule already owns it
                        for k in range(s, e):
                            toks[k]["ner"] = rule.ner
                            claimed[k] = True
                new_tokens.append(toks)
            pdf = pdf.copy()
            pdf["tokens"] = new_tokens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
