"""Tregex: tree-regular-expression matching over constituency trees.

Behavioral reference (re-expressed): ``trees/tregex/TregexPattern.java`` /
``TregexParser.jj`` relation semantics, validated against the reference's
own TregexTest golds (scripts/audit_tregex.py). This engine matches over
Penn-bracket trees read by :func:`tree_from_string`; the repo's pipeline
is dependency-based by design (SURVEY §2.2), so trees come from bracketed
input (treebank files, tool output), not from an in-repo constituency
parser.

Supported pattern grammar:

  A, /re/, __, a|b|c        node descriptions (label, regex, any, disjunction)
  A < B / A > B             B child of A / A child of B
  A << B / A >> B           descendant / ancestor
  A <, B  A <- B  A <i B  A <-i B    first / last / i-th / i-th-from-last child
  A >, B  A >- B  A >i B  A >-i B    A is such a child of B
  A <: B / A >: B           only child / A is the only child of B
  A <<, B / A <<- B         leftmost / rightmost descendant (and >>, >>-)
  A <<: B / A >>: B         unary descent chain
  A $ B  $+ $- $++ $--      sisters (immediate / anywhere, left / right)
  A . B  A .. B  A , B  A ,, B       leaf-order precedence / followership
  A == B                    same node
  !rel, ?rel                negated / optional relation
  A [ rel1 | rel2 ]         relation disjunction (& conjunction)
  (B rel2 C) grouping, =name captures, ~name backreferences,
  /(re)/#1%var group links
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["Tree", "tree_from_string", "compile_tregex", "TregexMatcher"]


class Tree:
    __slots__ = ("label", "children", "parent", "_order")

    def __init__(self, label: str, children: list["Tree"] | None = None):
        self.label = label
        self.children = children or []
        self.parent: Tree | None = None
        self._order = -1

    def is_leaf(self) -> bool:
        return not self.children

    def __str__(self) -> str:
        if self.is_leaf():
            return self.label
        return "(" + self.label + " " + " ".join(
            str(c) for c in self.children) + ")"

    def __repr__(self):
        return f"Tree({str(self)!r})"

    def preorder(self):
        yield self
        for c in self.children:
            yield from c.preorder()

    def leaves(self):
        return [n for n in self.preorder() if n.is_leaf()]

    def yield_words(self):
        return [n.label for n in self.leaves()]


def tree_from_string(s: str) -> Tree:
    """Read one Penn-bracket tree: "(ROOT (MWE (N 1) (N 2)))"."""
    toks = re.findall(r"\(|\)|[^\s()]+", s)
    pos = 0

    def parse() -> Tree:
        nonlocal pos
        assert toks[pos] == "("
        pos += 1
        label = ""
        if pos < len(toks) and toks[pos] not in "()":
            label = toks[pos]
            pos += 1
        node = Tree(label)
        while pos < len(toks) and toks[pos] != ")":
            if toks[pos] == "(":
                child = parse()
                child.parent = node
                node.children.append(child)
            else:
                leaf = Tree(toks[pos])
                leaf.parent = node
                node.children.append(leaf)
                pos += 1
        pos += 1  # ')'
        return node

    while toks[pos] != "(":
        pos += 1
    root = parse()
    # collapse the extra layer "( (S ...))" readers produce
    if root.label == "" and len(root.children) == 1:
        root = root.children[0]
        root.parent = None
    for i, n in enumerate(root.preorder()):
        n._order = i
    return root


# --------------------------------------------------------------------------
# node descriptions
# --------------------------------------------------------------------------

@dataclass
class NodeDesc:
    kind: str                  # 'any' | 'literal' | 'regex' | 'backref'
    value: object = None       # str | re.Pattern | name
    negated: bool = False
    name: str | None = None    # =name capture
    link_group: int | None = None   # /(re)/#N%var
    link_var: str | None = None

    def matches(self, node: Tree, binds: dict) -> bool:
        if self.kind == "backref":
            ok = binds.get(self.value) is node
        elif self.kind == "link":
            other = binds.get(self.value)
            ok = other is not None and other.label == node.label
        elif self.kind == "any":
            ok = True
        elif self.kind == "literal":
            ok = (node.parent is None if "_ROOT_" in self.value
                  else node.label in self.value)
        elif self.kind == "basic":
            ok = re.split(r"[-=#|]", node.label, 1)[0] == self.value
        elif self.kind == "basic_re":
            ok = bool(self.value.search(
                re.split(r"[-=#|]", node.label, 1)[0]))
        else:
            ok = bool(self.value.search(node.label))
        return (not ok) if self.negated else ok


@dataclass
class Constraint:
    mod: str                    # '' | '!' | '?'
    rel: str
    arg: int | None             # numeric arg for <i / >i
    targets: list["Pattern"]    # alternation arms for [ ... | ... ]


@dataclass
class Pattern:
    desc: NodeDesc
    groups: list[list[list[Constraint]]] = field(default_factory=list)
    #: ':'-conjoined clauses (must match somewhere, names unify)
    also: list["Pattern"] = field(default_factory=list)


@dataclass
class TopAlt:
    """Top-level pattern disjunction: "A < B | B < C" (first matching
    alternative per node yields)."""
    alts: list[Pattern]


# --------------------------------------------------------------------------
# pattern parser
# --------------------------------------------------------------------------

_REL_RE = re.compile(
    r"\s*(!?\??)\s*"
    r"(<\.\.\.|<<#|>>#|<#|>#|<<<-?\d+|<<<|<=|<-?\d+|>-?\d+"
    r"|<<:|>>:|<<,|<<-|>>,|>>-|<<|>>|<,|<-|<:|>:|>,|>-"
    r"|<\+|>\+|\.\+|,\+"
    r"|\$\+\+|\$--|\$\.\.|\$,,|\$\+|\$-|\$\.|\$,|\$|==|\.\.|,,|<|>|\.|,)"
    r"\s*")
#: sister-relation aliases ($. == $+ etc., TregexPattern relation table)
_REL_ALIAS = {"$.": "$+", "$,": "$-", "$..": "$++", "$,,": "$--"}
_NAME_RE = re.compile(r"=(\w+)")


def _parse_desc(s: str, pos: int) -> tuple[NodeDesc, int]:
    neg = False
    while pos < len(s) and s[pos].isspace():
        pos += 1
    if pos < len(s) and s[pos] == "!":
        neg = True
        pos += 1
    if pos < len(s) and s[pos] in "~=":
        m = re.compile(r"[~=](\w+)").match(s, pos)
        kind = "link" if s[pos] == "~" else "backref"
        d = NodeDesc(kind, m.group(1), neg)
        return _maybe_name(d, s, m.end())
    if s.startswith("__", pos):
        return _maybe_name(NodeDesc("any", None, neg), s, pos + 2)
    if pos < len(s) and s[pos] == "@":
        if pos + 1 < len(s) and s[pos + 1] == "/":
            d, end = _parse_desc(s, pos + 1)
            d.kind = "basic_re"
            return d, end
        m = re.compile(r"@([^\s()\[\]=!~<>,.$|&?]+)").match(s, pos)
        return _maybe_name(NodeDesc("basic", m.group(1), neg), s, m.end())
    if pos < len(s) and s[pos] == "/":
        k = pos + 1
        while k < len(s):
            if s[k] == "\\":
                k += 2
                continue
            if s[k] == "/":
                break
            k += 1
        if k >= len(s):
            raise ValueError(f"unterminated regex in {s!r}")
        rx = re.compile(s[pos + 1:k])
        end = k + 1
        # /(re)/#N%var group link
        lm = re.compile(r"#(\d+)%(\w+)").match(s, end)
        d = NodeDesc("regex", rx, neg)
        if lm:
            d.link_group = int(lm.group(1))
            d.link_var = lm.group(2)
            end = lm.end()
        return _maybe_name(d, s, end)
    m = re.compile(r"[^\s()\[\]=!~<>,.$|&?]+(?:\|[^\s()\[\]=!~<>,.$|&?]+)*"
                   ).match(s, pos)
    if not m:
        raise ValueError(f"expected node description at {s[pos:]!r}")
    labels = set(m.group(0).split("|"))
    return _maybe_name(NodeDesc("literal", labels, neg), s, m.end())


def _maybe_name(d: NodeDesc, s: str, pos: int) -> tuple[NodeDesc, int]:
    m = _NAME_RE.match(s, pos)
    if m:
        d.name = m.group(1)
        return d, m.end()
    return d, pos


def _skip(s: str, pos: int) -> int:
    while pos < len(s) and s[pos].isspace():
        pos += 1
    return pos


def _parse_constraint(s: str, pos: int) -> tuple[Constraint, int]:
    rm = _REL_RE.match(s, pos)
    if not rm:
        raise ValueError(f"expected relation at {s[pos:]!r}")
    mod = rm.group(1).replace("!?", "!")
    rel = _REL_ALIAS.get(rm.group(2), rm.group(2))
    arg = None
    nm = re.fullmatch(r"([<>])(-?\d+)", rel)
    if nm:
        rel, arg = nm.group(1) + "i", int(nm.group(2))
    lm = re.fullmatch(r"<<<(-?\d+)", rel)
    if lm:
        rel, arg = "<<<i", int(lm.group(1))
    pos = _skip(s, rm.end())
    if rel == "<...":
        if pos >= len(s) or s[pos] != "{":
            raise ValueError(f"<... needs {{ seq }} at {s[pos:]!r}")
        seq_pats = []
        pos += 1
        while True:
            sub, pos = _parse_pattern(s, pos)
            seq_pats.append(sub)
            pos = _skip(s, pos)
            if pos < len(s) and s[pos] == ";":
                pos += 1
                continue
            if pos < len(s) and s[pos] == "}":
                pos += 1
                break
            raise ValueError(f"unclosed {{ }} at {s[pos:]!r}")
        return Constraint(mod, "<...", seq_pats, [Pattern(NodeDesc("any"))]), pos
    if rel in ("<+", ">+", ".+", ",+"):
        # chain relation: the parenthesized intermediate pattern
        if pos >= len(s) or s[pos] != "(":
            raise ValueError(f"chain relation needs (pattern) at {s[pos:]!r}")
        via, pos = _parse_pattern(s, pos + 1)
        pos = _skip(s, pos)
        if pos >= len(s) or s[pos] != ")":
            raise ValueError(f"unclosed chain pattern at {s[pos:]!r}")
        pos = _skip(s, pos + 1)
        arg = via  # carried in the numeric-arg slot
    if pos < len(s) and s[pos] == "(":
        sub, pos = _parse_pattern(s, pos + 1)
        pos = _skip(s, pos)
        if pos >= len(s) or s[pos] != ")":
            raise ValueError(f"unclosed group at {s[pos:]!r}")
        return Constraint(mod, rel, arg, [sub]), pos + 1
    d, pos = _parse_desc(s, pos)
    return Constraint(mod, rel, arg, [Pattern(d)]), pos


def _parse_group(s: str, pos: int, close: str
                 ) -> tuple[list[list[Constraint]], int]:
    """Constraint alternation group body up to ``close``."""
    alts: list[list[Constraint]] = []
    while True:
        pos = _skip(s, pos)
        seq: list[Constraint] = []
        while pos < len(s) and s[pos] not in "|" + close:
            if s[pos] == "&":
                pos += 1
                pos = _skip(s, pos)
                continue
            c, pos = _parse_constraint(s, pos)
            seq.append(c)
            pos = _skip(s, pos)
        alts.append(seq)
        if pos < len(s) and s[pos] == "|":
            pos += 1
            continue
        if pos < len(s) and s[pos] == close:
            return alts, pos + 1
        raise ValueError(f"unclosed {close!r} at {s[pos:]!r}")


def _parse_pattern(s: str, pos: int) -> tuple[Pattern, int]:
    pos = _skip(s, pos)
    if pos < len(s) and s[pos] == "(":
        # whole-pattern parenthesization: "(foo << bar)"; an internal
        # "| < C" continues with alternated constraints on the same head
        pat, pos = _parse_pattern(s, pos + 1)
        pos = _skip(s, pos)
        while pos < len(s) and s[pos] == "|":
            pos = _skip(s, pos + 1)
            cont = Pattern(pat.desc)
            while pos < len(s) and s[pos] not in "|)":
                cc, pos = _parse_constraint(s, pos)
                cont.groups.append([[cc]])
                pos = _skip(s, pos)
            pat = Pattern(pat.desc,
                          [[_flatten_constraints(pat),
                            _flatten_constraints(cont)]], pat.also)
        if pos >= len(s) or s[pos] != ")":
            raise ValueError(f"unclosed ( at {s[pos:]!r}")
        return pat, pos + 1
    desc, pos = _parse_desc(s, pos)
    pat = Pattern(desc)
    while pos < len(s):
        pos = _skip(s, pos)
        if pos >= len(s) or s[pos] in ")]|:;}":
            break
        if s[pos] == "(":
            # parenthesized constraint group "( < NN | < NNS )"
            alts2, pos = _parse_group(s, pos + 1, ")")
            pat.groups.append(alts2)
            continue
        if s[pos] == "&":
            pos += 1
            continue
        gmod = ""
        if s[pos] in "!?" and pos + 1 < len(s) \
                and s[_skip(s, pos + 1)] in "[(":
            gmod = s[pos]
            pos = _skip(s, pos + 1)
        if s[pos] == "(" and gmod:
            # modded parenthesized constraint group: "A ?(< B < E)"
            alts2, pos = _parse_group(s, pos + 1, ")")
            inner = Pattern(NodeDesc("any"), [alts2])
            pat.groups.append([[Constraint(gmod, "==", None, [inner])]])
            continue
        if s[pos] == "[":
            alts, pos = _parse_group(s, pos + 1, "]")
            if gmod:
                # modded group: wrap as a single constraint over an
                # anonymous self-anchored pattern via the == relation
                inner = Pattern(NodeDesc("any"), [alts])
                pat.groups.append([[Constraint(gmod, "==", None, [inner])]])
            else:
                pat.groups.append(alts)
            continue
        c, pos = _parse_constraint(s, pos)
        pat.groups.append([[c]])
    return pat, pos


def compile_tregex(pattern: str):
    pat, pos = _parse_pattern(pattern, 0)
    alts = [pat]
    pos = _skip(pattern, pos)
    while pos < len(pattern) and pattern[pos] in "|:=":
        if pattern[pos] == ":":
            clause, pos = _parse_top_operand(pattern, pos + 1)
            alts[-1].also.append(clause)
        elif pattern.startswith("==", pos):
            # anchored equality: the other pattern must match at the SAME
            # node — expressed as an == constraint on the head
            clause, pos = _parse_top_operand(pattern, pos + 2)
            alts[-1].groups.append([[Constraint("", "==", None, [clause])]])
        elif pattern[pos] == "|":
            pos = _skip(pattern, pos + 1)
            if _REL_RE.match(pattern, pos) and not re.match(
                    r"[\w/@_~=!]", pattern[pos]):
                # relation continuation: "A < B | < C" ORs constraint sets
                # over the same head
                head = alts[-1]
                cont = Pattern(head.desc)
                while pos < len(pattern) and pattern[pos] not in "|:)":
                    c, pos = _parse_constraint(pattern, pos)
                    cont.groups.append([[c]])
                    pos = _skip(pattern, pos)
                merged_alts = [
                    _flatten_constraints(head), _flatten_constraints(cont)]
                base = Pattern(head.desc, [merged_alts], head.also)
                alts[-1] = base
            else:
                nxt, pos = _parse_pattern(pattern, pos)
                alts.append(nxt)
        pos = _skip(pattern, pos)
    if pattern[pos:].strip():
        raise ValueError(f"trailing input at {pattern[pos:]!r}")
    if len(alts) == 1:
        return alts[0]
    return TopAlt(alts)


def _flatten_constraints(pat: Pattern) -> list[Constraint]:
    """Single-alternative constraint sequence of a pattern (for merging
    "A < B | < C" into one alternation group)."""
    seq: list[Constraint] = []
    for alts in pat.groups:
        if len(alts) == 1:
            seq.extend(alts[0])
        else:
            # nested alternation: wrap via an anonymous == constraint
            inner = Pattern(NodeDesc("any"), [alts])
            seq.append(Constraint("", "==", None, [inner]))
    return seq


def _parse_top_operand(s: str, pos: int):
    """One operand of a top-level : or == — a parenthesized pattern or a
    plain pattern."""
    pos = _skip(s, pos)
    if pos < len(s) and s[pos] == "(":
        pat, pos = _parse_pattern(s, pos + 1)
        pos = _skip(s, pos)
        if pos >= len(s) or s[pos] != ")":
            raise ValueError(f"unclosed ( at {s[pos:]!r}")
        return pat, pos + 1
    return _parse_pattern(s, pos)


# --------------------------------------------------------------------------
# relation candidate enumeration (order matters: tregex searches in a
# deterministic order so matches enumerate stably)
# --------------------------------------------------------------------------

def _descendants(n: Tree):
    for c in n.children:
        yield c
        yield from _descendants(c)


def _ancestors(n: Tree):
    p = n.parent
    while p is not None:
        yield p
        p = p.parent


def _leftmost_chain(n: Tree):
    c = n
    while c.children:
        c = c.children[0]
        yield c


def _rightmost_chain(n: Tree):
    c = n
    while c.children:
        c = c.children[-1]
        yield c


def _unary_chain_down(n: Tree):
    c = n
    while len(c.children) == 1:
        c = c.children[0]
        yield c


def _sisters(n: Tree):
    if n.parent is None:
        return []
    return [c for c in n.parent.children if c is not n]


def _leaf_span(n: Tree) -> tuple[int, int]:
    leaves = n.leaves()
    return leaves[0]._order, leaves[-1]._order


#: ModCollinsHeadFinder-style head rules (subset: direction + priority
#: label lists; rightdis = right-to-left disjunction). Enough for the
#: phrase types the reference tests exercise; unknown categories default
#: to the last child.
_HEAD_RULES: dict[str, list[tuple[str, list[str]]]] = {
    "NP": [("rightdis", ["NN", "NNP", "NNPS", "NNS", "NX", "POS", "JJR"]),
           ("left", ["NP"]),
           ("rightdis", ["$", "ADJP", "PRN"]),
           ("right", ["CD"]),
           ("rightdis", ["JJ", "JJS", "RB", "QP"])],
    "PP": [("right", ["IN", "TO", "VBG", "VBN", "RP", "FW"])],
    "S": [("left", ["TO", "IN", "VP", "S", "SBAR", "ADJP", "UCP", "NP"])],
    "VP": [("left", ["TO", "VBD", "VBN", "MD", "VBZ", "VB", "VBG", "VBP",
                     "VP", "ADJP", "NN", "NNS", "NP"])],
    "SBAR": [("left", ["WHNP", "WHPP", "WHADVP", "WHADJP", "IN", "DT", "S",
                       "SQ", "SINV", "SBAR", "FRAG"])],
    "ADJP": [("left", ["NNS", "QP", "NN", "$", "ADVP", "JJ", "VBN", "VBG",
                       "ADJP"])],
    "ADVP": [("right", ["RB", "RBR", "RBB", "FW", "ADVP", "TO", "CD"])],
    "QP": [("left", ["$", "IN", "NNS", "NN", "JJ", "RB", "DT", "CD", "QP",
                     "JJR", "JJS"])],
}


def _head_child(node: Tree) -> Tree | None:
    """The head CHILD of a node (Collins-style rules; last child default)."""
    if node.is_leaf():
        return None
    basic = re.split(r"[-=#|]", node.label, 1)[0]
    for direction, labels in _HEAD_RULES.get(basic, []):
        if direction == "left":
            for lab in labels:
                for c in node.children:
                    if re.split(r"[-=#|]", c.label, 1)[0] == lab:
                        return c
        elif direction == "right":
            for lab in labels:
                for c in reversed(node.children):
                    if re.split(r"[-=#|]", c.label, 1)[0] == lab:
                        return c
        else:  # rightdis: rightmost child with ANY of the labels
            for c in reversed(node.children):
                if re.split(r"[-=#|]", c.label, 1)[0] in labels:
                    return c
    return node.children[-1]


def _head_chain(node: Tree):
    c = _head_child(node)
    while c is not None:
        yield c
        c = _head_child(c)


def _candidates(node: Tree, rel: str, arg, root: Tree):
    if rel == "<":
        yield from node.children
    elif rel == ">":
        if node.parent is not None:
            yield node.parent
    elif rel == "<<":
        yield from _descendants(node)
    elif rel == ">>":
        yield from _ancestors(node)
    elif rel == "<,":
        if node.children:
            yield node.children[0]
    elif rel == "<-":
        if node.children:
            yield node.children[-1]
    elif rel == "<i":
        k = arg if arg > 0 else len(node.children) + 1 + arg
        if 1 <= k <= len(node.children):
            yield node.children[k - 1]
    elif rel == ">i":
        p = node.parent
        if p is not None:
            k = arg if arg > 0 else len(p.children) + 1 + arg
            if 1 <= k <= len(p.children) and p.children[k - 1] is node:
                yield p
    elif rel == ">,":
        if node.parent is not None and node.parent.children[0] is node:
            yield node.parent
    elif rel == ">-":
        if node.parent is not None and node.parent.children[-1] is node:
            yield node.parent
    elif rel == "<:":
        if len(node.children) == 1:
            yield node.children[0]
    elif rel == ">:":
        if node.parent is not None and len(node.parent.children) == 1:
            yield node.parent
    elif rel == "<<,":
        yield from _leftmost_chain(node)
    elif rel == "<<-":
        yield from _rightmost_chain(node)
    elif rel == ">>,":
        for a in _ancestors(node):
            if any(x is node for x in _leftmost_chain(a)):
                yield a
    elif rel == ">>-":
        for a in _ancestors(node):
            if any(x is node for x in _rightmost_chain(a)):
                yield a
    elif rel == "<<:":
        yield from _unary_chain_down(node)
    elif rel == ">>:":
        c = node
        while c.parent is not None and len(c.parent.children) == 1:
            c = c.parent
            yield c
    elif rel == "$":
        yield from _sisters(node)
    elif rel == "$+":
        # node is the sister immediately LEFT of the candidate
        p = node.parent
        if p is not None:
            i = next(k for k, c in enumerate(p.children) if c is node)
            if i + 1 < len(p.children):
                yield p.children[i + 1]
    elif rel == "$-":
        p = node.parent
        if p is not None:
            i = next(k for k, c in enumerate(p.children) if c is node)
            if i > 0:
                yield p.children[i - 1]
    elif rel == "$++":
        p = node.parent
        if p is not None:
            i = next(k for k, c in enumerate(p.children) if c is node)
            yield from p.children[i + 1:]
    elif rel == "$--":
        p = node.parent
        if p is not None:
            i = next(k for k, c in enumerate(p.children) if c is node)
            yield from reversed(p.children[:i])
    elif rel in (".", "..", ",", ",,"):
        s0, e0 = _leaf_span(node)
        for cand in root.preorder():
            if cand is node:
                continue
            s1, e1 = _leaf_span(cand)
            if rel == "." and _next_leaf_order(root, e0) == s1:
                yield cand
            elif rel == ".." and e0 < s1:
                yield cand
            elif rel == "," and _next_leaf_order(root, e1) == s0:
                yield cand
            elif rel == ",," and e1 < s0:
                yield cand
    elif rel == "==":
        yield node
    elif rel == "<#":
        hc = _head_child(node)
        if hc is not None:
            yield hc
    elif rel == ">#":
        p = node.parent
        if p is not None and _head_child(p) is node:
            yield p
    elif rel == "<<#":
        yield from _head_chain(node)
    elif rel == ">>#":
        for a in _ancestors(node):
            if any(x is node for x in _head_chain(a)):
                yield a
    elif rel == "<=":
        # "parent equals": the node itself, then its children
        yield node
        yield from node.children
    elif rel == "<<<":
        yield from node.leaves()
    elif rel == "<<<i":
        leaves = node.leaves()
        k = arg - 1 if arg > 0 else arg + len(leaves)
        if 0 <= k < len(leaves):
            yield leaves[k]
    elif rel in ("<+", ">+"):
        # handled in _apply (chain relations with an intermediate pattern)
        return


_LEAF_ORDER_CACHE: dict[int, list[int]] = {}


def _next_leaf_order(root: Tree, order: int) -> int | None:
    leaves = [n._order for n in root.leaves()]
    try:
        i = leaves.index(order)
    except ValueError:
        return None
    return leaves[i + 1] if i + 1 < len(leaves) else None


# --------------------------------------------------------------------------
# matcher
# --------------------------------------------------------------------------

def _match_at(pat: Pattern, node: Tree, root: Tree,
              binds: dict) -> list[dict]:
    if pat.desc.kind == "regex" and pat.desc.link_var is not None:
        m = pat.desc.value.search(node.label)
        ok = bool(m)
        if ok:
            want = binds.get("%" + pat.desc.link_var)
            got = m.group(pat.desc.link_group)
            if want is not None and want != got:
                ok = False
        if pat.desc.negated:
            ok = not ok
        if not ok:
            return []
        base = dict(binds)
        if not pat.desc.negated:
            base["%" + pat.desc.link_var] = m.group(pat.desc.link_group)
    else:
        if not pat.desc.matches(node, binds):
            return []
        base = dict(binds)
    if pat.desc.name:
        base[pat.desc.name] = node
    results = [base]
    del base
    for alts in pat.groups:
        if len(alts) == 1:
            results = _apply_seq(alts[0], node, root, results)
        else:
            # tregex disjunction enumerates EVERY matching arm ("A < B |
            # < C" yields twice when both hold — TregexTest)
            nxt: list[dict] = []
            for seq in alts:
                nxt.extend(_apply_seq(seq, node, root, results))
            results = nxt
        if not results:
            return []
    for clause in pat.also:
        joined: list[dict] = []
        for b in results:
            for anchor in root.preorder():
                for cb in _match_at(clause, anchor, root, b):
                    joined.append(cb)
        results = joined
        if not results:
            return []
    return results


def _chain_candidates(node: Tree, rel: str, via, root: Tree,
                      binds: dict):
    """Candidates for the chain relations A <+(C) B etc.: B reachable from
    A where every INTERMEDIATE node matches the via-pattern C."""
    base = {"<+": "<", ">+": ">", ".+": ".", ",+": ","}[rel]
    seen: set[int] = set()
    frontier = [node]
    while frontier:
        nxt = []
        for f in frontier:
            for cand in _candidates(f, base, None, root):
                if id(cand) in seen:
                    continue
                seen.add(id(cand))
                yield cand
                if _match_at(via, cand, root, binds):
                    nxt.append(cand)
        frontier = nxt


def _apply_seq(seq: list[Constraint], node: Tree, root: Tree,
               results: list[dict]) -> list[dict]:
    for c in seq:
        gathered: list[dict] = []
        for b in results:
            sub_binds: list[dict] = []
            if c.rel == "<...":
                # exact child sequence: each child matches its pattern
                pats = c.arg
                if len(node.children) == len(pats):
                    seqs = [b]
                    for child, cp in zip(node.children, pats):
                        seqs = [dict(sb, **nb) for sb in seqs
                                for nb in _match_at(cp, child, root, sb)]
                        if not seqs:
                            break
                    sub_binds = seqs
                if c.mod == "!":
                    if not sub_binds:
                        gathered.append(b)
                elif c.mod == "?":
                    gathered.extend(sub_binds or [b])
                else:
                    gathered.extend(sub_binds)
                continue
            cands = (_chain_candidates(node, c.rel, c.arg, root, b)
                     if c.rel in ("<+", ">+", ".+", ",+")
                     else _candidates(node, c.rel, c.arg, root))
            for cand in cands:
                for t in c.targets:
                    sub_binds.extend(_match_at(t, cand, root, b))
                    if sub_binds and len(c.targets) > 1:
                        break
            if c.mod == "!":
                if not sub_binds:
                    gathered.append(b)
            elif c.mod == "?":
                gathered.extend(sub_binds or [b])
            else:
                gathered.extend(sub_binds)
        results = gathered
        if not results:
            return []
    return results


class TregexMatcher:
    def __init__(self, pat: Pattern, tree: Tree):
        self.pat = pat
        self.tree = tree
        self._iter = self._gen()
        self._current: tuple[Tree, dict] | None = None

    def _gen(self):
        pats = self.pat.alts if isinstance(self.pat, TopAlt) else [self.pat]
        for node in self.tree.preorder():
            for b in self._node_matches(pats, node):
                yield node, b

    def _node_matches(self, pats, node):
        for p in pats:
            yield from _match_at(p, node, self.tree, {})

    def find(self) -> bool:
        try:
            self._current = next(self._iter)
            return True
        except StopIteration:
            self._current = None
            return False

    def reset(self) -> None:
        self._iter = self._gen()
        self._current = None

    def get_match(self) -> Tree:
        return self._current[0]

    def get_node(self, name: str) -> Tree | None:
        v = self._current[1].get(name)
        return v if isinstance(v, Tree) else None


def find_matches(pattern: str | Pattern, tree: Tree) -> list[Tree]:
    """All matched nodes, in the matcher's enumeration order."""
    pat = compile_tregex(pattern) if isinstance(pattern, str) else pattern
    m = TregexMatcher(pat, tree)
    out = []
    while m.find():
        out.append(m.get_match())
    return out


def tregex_docs(df, pattern: str, trees_col: str = "tree",
                id_col: str = "doc_id"):
    """DataFrame transform: rows with a Penn-bracket ``trees_col`` →
    (doc_id, match) rows, one per tregex match (matched subtree string).

    The pattern compiles once on the driver; matching runs inside
    Arrow-batched ``mapInPandas`` (same altitude as the semgrex/KBP
    per-sentence matchers — tiny per-row trees, no shuffle)."""
    import pandas as pd

    pat = compile_tregex(pattern)

    def run(batches):
        for pdf in batches:
            ids, matches = [], []
            for doc_id, tree_s in zip(pdf[id_col], pdf[trees_col]):
                try:
                    tree = tree_from_string(str(tree_s))
                except Exception:  # noqa: BLE001 — unparseable row → no rows
                    continue
                for m in find_matches(pat, tree):
                    ids.append(doc_id)
                    matches.append(str(m))
            yield pd.DataFrame({id_col: ids, "match": matches})

    return df.mapInPandas(run, schema=f"{id_col} string, match string")
