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
    quant: str = ""          # '', '?', '*', '+'
    group: str | None = None  # capture-group name this elem belongs to


_NODE_RE = re.compile(
    r"(!?)\[\s*([^\]]*)\s*\]|(!?)\{\s*([^}]*)\s*\}"
)
_TOKEN_RE = re.compile(
    r"\(\?\$(?P<gopen>\w+)|(?P<gclose>\))|(?P<node>!?[\[{][^\]}]*[\]}])(?P<quant>[?*+]?)"
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


def compile_pattern(pattern: str) -> list[Elem]:
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


def match_sequence(elems: list[Elem], toks: list[dict], start: int = 0):
    """Greedy backtracking match at ``start`` → (end, {group: (s, e)}) or None."""

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
        if e.quant == "?":
            return consume(0, 1)
        if e.quant == "*":
            return consume(0, len(toks) - ti)
        if e.quant == "+":
            return consume(1, len(toks) - ti)
        return None

    return bt(0, start, {})


def find_all(elems: list[Elem], toks: list[dict]):
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
