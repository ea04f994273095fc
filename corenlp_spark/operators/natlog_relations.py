"""Natural-logic relation algebra: the MacCartney relations, join table,
polarity projection, and dependency insertion/deletion relations.

Behavioral reference (re-expressed):
``naturalli/NaturalLogicRelation.java`` (7 relations with fixed indices,
join table lines 94-171, truth-maintenance flags, the dependency-arc
tables at lines 202-527 with nmod:/obl:/conj/advcl prefix fallbacks) and
``naturalli/Polarity.java`` (the monotonicity projection function and
the up/down/flat classification the pipeline's per-token polarity marks
summarize)."""

from __future__ import annotations

from enum import Enum

__all__ = ["NaturalLogicRelation", "Monotonicity", "MonotonicityType",
           "Polarity", "for_dependency_insertion", "for_dependency_deletion"]


class NaturalLogicRelation(Enum):
    EQUIVALENT = 0
    FORWARD_ENTAILMENT = 1
    REVERSE_ENTAILMENT = 2
    NEGATION = 3
    ALTERNATION = 4
    COVER = 5
    INDEPENDENCE = 6

    @property
    def fixed_index(self) -> int:
        return self.value

    @classmethod
    def by_fixed_index(cls, i: int) -> "NaturalLogicRelation":
        return cls(i)

    # truth-maintenance flags (NaturalLogicRelation.java:29-36)
    @property
    def maintains_truth(self) -> bool:
        return self in (NaturalLogicRelation.EQUIVALENT,
                        NaturalLogicRelation.FORWARD_ENTAILMENT)

    @property
    def negates_truth(self) -> bool:
        return self in (NaturalLogicRelation.NEGATION,
                        NaturalLogicRelation.ALTERNATION)

    @property
    def maintains_falsehood(self) -> bool:
        return self in (NaturalLogicRelation.EQUIVALENT,
                        NaturalLogicRelation.REVERSE_ENTAILMENT)

    @property
    def negates_falsehood(self) -> bool:
        return self in (NaturalLogicRelation.NEGATION,
                        NaturalLogicRelation.COVER)

    def join(self, other: "NaturalLogicRelation") -> "NaturalLogicRelation":
        """MacCartney join table (transitivity of chained relations)."""
        R = NaturalLogicRelation
        if self is R.EQUIVALENT:
            return other
        if self is R.INDEPENDENCE or other is R.INDEPENDENCE:
            return R.INDEPENDENCE
        table = {
            R.FORWARD_ENTAILMENT: {
                R.EQUIVALENT: R.FORWARD_ENTAILMENT,
                R.FORWARD_ENTAILMENT: R.FORWARD_ENTAILMENT,
                R.NEGATION: R.COVER, R.ALTERNATION: R.COVER,
                R.REVERSE_ENTAILMENT: R.INDEPENDENCE,
                R.COVER: R.INDEPENDENCE,
            },
            R.REVERSE_ENTAILMENT: {
                R.EQUIVALENT: R.REVERSE_ENTAILMENT,
                R.REVERSE_ENTAILMENT: R.REVERSE_ENTAILMENT,
                R.NEGATION: R.COVER, R.COVER: R.COVER,
                R.FORWARD_ENTAILMENT: R.INDEPENDENCE,
                R.ALTERNATION: R.INDEPENDENCE,
            },
            R.NEGATION: {
                R.EQUIVALENT: R.NEGATION, R.FORWARD_ENTAILMENT: R.COVER,
                R.REVERSE_ENTAILMENT: R.ALTERNATION,
                R.NEGATION: R.EQUIVALENT,
                R.ALTERNATION: R.REVERSE_ENTAILMENT,
                R.COVER: R.FORWARD_ENTAILMENT,
            },
            R.ALTERNATION: {
                R.EQUIVALENT: R.ALTERNATION,
                R.REVERSE_ENTAILMENT: R.ALTERNATION,
                R.NEGATION: R.FORWARD_ENTAILMENT,
                R.COVER: R.FORWARD_ENTAILMENT,
                R.FORWARD_ENTAILMENT: R.INDEPENDENCE,
                R.ALTERNATION: R.INDEPENDENCE,
            },
            R.COVER: {
                R.EQUIVALENT: R.COVER, R.FORWARD_ENTAILMENT: R.COVER,
                R.NEGATION: R.REVERSE_ENTAILMENT,
                R.ALTERNATION: R.REVERSE_ENTAILMENT,
                R.REVERSE_ENTAILMENT: R.INDEPENDENCE,
                R.COVER: R.INDEPENDENCE,
            },
        }
        return table[self][other]


class Monotonicity(Enum):
    MONOTONE = "monotone"
    ANTITONE = "antitone"
    NONMONOTONE = "nonmonotone"
    INVALID = "invalid"


class MonotonicityType(Enum):
    NONE = "none"
    ADDITIVE = "additive"
    MULTIPLICATIVE = "multiplicative"
    BOTH = "both"


def _project_once(rel: NaturalLogicRelation, mono: Monotonicity,
                  mtype: MonotonicityType) -> NaturalLogicRelation:
    """One operator's projection (Polarity.java project switch)."""
    R, M, T = NaturalLogicRelation, Monotonicity, MonotonicityType
    if rel is R.EQUIVALENT:
        return R.EQUIVALENT
    if rel is R.INDEPENDENCE:
        return R.INDEPENDENCE
    if rel is R.FORWARD_ENTAILMENT:
        if mono is M.MONOTONE:
            return R.FORWARD_ENTAILMENT
        if mono is M.ANTITONE:
            return R.REVERSE_ENTAILMENT
        return R.INDEPENDENCE
    if rel is R.REVERSE_ENTAILMENT:
        if mono is M.MONOTONE:
            return R.REVERSE_ENTAILMENT
        if mono is M.ANTITONE:
            return R.FORWARD_ENTAILMENT
        return R.INDEPENDENCE
    if rel is R.NEGATION:
        if mtype is T.NONE:
            return R.INDEPENDENCE
        if mtype is T.ADDITIVE:
            if mono is M.MONOTONE:
                return R.COVER
            if mono is M.ANTITONE:
                return R.ALTERNATION
            return R.INDEPENDENCE
        if mtype is T.MULTIPLICATIVE:
            if mono is M.MONOTONE:
                return R.ALTERNATION
            if mono is M.ANTITONE:
                return R.COVER
            return R.INDEPENDENCE
        return R.NEGATION  # BOTH
    if rel is R.ALTERNATION:
        if mono is M.MONOTONE:
            return R.ALTERNATION if mtype in (T.MULTIPLICATIVE, T.BOTH) \
                else R.INDEPENDENCE
        if mono is M.ANTITONE:
            return R.COVER if mtype in (T.MULTIPLICATIVE, T.BOTH) \
                else R.INDEPENDENCE
        return R.INDEPENDENCE
    # COVER
    if mono is M.MONOTONE:
        return R.COVER if mtype in (T.ADDITIVE, T.BOTH) else R.INDEPENDENCE
    if mono is M.ANTITONE:
        return R.ALTERNATION if mtype in (T.ADDITIVE, T.BOTH) \
            else R.INDEPENDENCE
    return R.INDEPENDENCE


class Polarity:
    """A word's polarity: the composed projection of the quantifiers
    scoping over it, applied in narrowing-scope order."""

    def __init__(self, operators: list[tuple[Monotonicity,
                                             MonotonicityType]]):
        self._table = {}
        for rel in NaturalLogicRelation:
            out = rel
            # innermost operator projects first (Polarity.java:37 iterates
            # the narrowing-scope list in reverse)
            for mono, mtype in reversed(operators):
                out = _project_once(out, mono, mtype)
            self._table[rel] = out

    def project_lexical_relation(self, rel: NaturalLogicRelation
                                 ) -> NaturalLogicRelation:
        return self._table[rel]

    def is_upwards(self) -> bool:
        R = NaturalLogicRelation
        return (self._table[R.FORWARD_ENTAILMENT] is R.FORWARD_ENTAILMENT
                and self._table[R.REVERSE_ENTAILMENT] is R.REVERSE_ENTAILMENT)

    def is_downwards(self) -> bool:
        R = NaturalLogicRelation
        return (self._table[R.FORWARD_ENTAILMENT] is R.REVERSE_ENTAILMENT
                and self._table[R.REVERSE_ENTAILMENT] is R.FORWARD_ENTAILMENT)

    def __str__(self) -> str:
        if self.is_upwards():
            return "up"
        if self.is_downwards():
            return "down"
        return "flat"

    def __eq__(self, other) -> bool:
        if isinstance(other, str):
            # Polarity.java equals(String): "up"/"upwards"/"down"/… aliases
            s = str(self)
            return other in (s, s + "wards", s + "ward")
        if isinstance(other, Polarity):
            return self._table == other._table
        return NotImplemented

    def __hash__(self):
        return hash(tuple(self._table[r].value
                          for r in NaturalLogicRelation))


_R = NaturalLogicRelation
#: dependency label → relation when the arc is INSERTED into a sentence
#: (NaturalLogicRelation.java:202-527; the ~450 nmod:/obl: preposition rows
#: collapse into the prefix fallback below, which maps them all to
#: REVERSE_ENTAILMENT exactly as the explicit rows do)
_INSERT_ARC = {
    "acomp": _R.REVERSE_ENTAILMENT, "advcl": _R.REVERSE_ENTAILMENT,
    "acl": _R.REVERSE_ENTAILMENT, "acl:relcl": _R.REVERSE_ENTAILMENT,
    "advmod": _R.REVERSE_ENTAILMENT, "agent": _R.INDEPENDENCE,
    "amod": _R.REVERSE_ENTAILMENT, "appos": _R.REVERSE_ENTAILMENT,
    "aux": _R.INDEPENDENCE, "aux:pass": _R.INDEPENDENCE,
    "comp": _R.REVERSE_ENTAILMENT, "ccomp": _R.REVERSE_ENTAILMENT,
    "cc": _R.REVERSE_ENTAILMENT, "compound": _R.INDEPENDENCE,
    "flat": _R.INDEPENDENCE, "mwe": _R.INDEPENDENCE,
    "conj:and\\/or": _R.REVERSE_ENTAILMENT,
    "conj:and": _R.REVERSE_ENTAILMENT, "conj:both": _R.REVERSE_ENTAILMENT,
    "conj:but": _R.REVERSE_ENTAILMENT, "conj:nor": _R.FORWARD_ENTAILMENT,
    "conj:or": _R.FORWARD_ENTAILMENT, "conj:plus": _R.FORWARD_ENTAILMENT,
    "conj": _R.REVERSE_ENTAILMENT, "conj_x": _R.REVERSE_ENTAILMENT,
    "cop": _R.INDEPENDENCE, "csubj": _R.REVERSE_ENTAILMENT,
    "csubj:pass": _R.INDEPENDENCE, "dep": _R.REVERSE_ENTAILMENT,
    "det": _R.FORWARD_ENTAILMENT, "discourse": _R.EQUIVALENT,
    "obj": _R.REVERSE_ENTAILMENT, "expl": _R.EQUIVALENT,
    "goeswith": _R.EQUIVALENT, "infmod": _R.REVERSE_ENTAILMENT,
    "iobj": _R.REVERSE_ENTAILMENT, "mark": _R.REVERSE_ENTAILMENT,
    "neg": _R.NEGATION, "nn": _R.INDEPENDENCE,
    "npadvmod": _R.REVERSE_ENTAILMENT, "nsubj": _R.REVERSE_ENTAILMENT,
    "nsubj:pass": _R.INDEPENDENCE, "number": _R.INDEPENDENCE,
    "nummod": _R.INDEPENDENCE, "op": _R.INDEPENDENCE,
    "parataxis": _R.REVERSE_ENTAILMENT, "partmod": _R.REVERSE_ENTAILMENT,
    "pcomp": _R.INDEPENDENCE, "pobj": _R.INDEPENDENCE,
    "possessive": _R.INDEPENDENCE, "poss": _R.FORWARD_ENTAILMENT,
    "nmod:poss": _R.FORWARD_ENTAILMENT, "preconj": _R.INDEPENDENCE,
    "predet": _R.INDEPENDENCE, "case": _R.INDEPENDENCE,
    "nmod": _R.REVERSE_ENTAILMENT, "obl": _R.REVERSE_ENTAILMENT,
    "prt": _R.INDEPENDENCE, "punct": _R.EQUIVALENT,
    "purpcl": _R.REVERSE_ENTAILMENT, "quantmod": _R.FORWARD_ENTAILMENT,
    "ref": _R.REVERSE_ENTAILMENT, "rcmod": _R.REVERSE_ENTAILMENT,
    "root": _R.INDEPENDENCE, "tmod": _R.REVERSE_ENTAILMENT,
    "vmod": _R.REVERSE_ENTAILMENT, "xcomp": _R.REVERSE_ENTAILMENT,
}


def for_dependency_insertion(label: str, is_subject: bool = True,
                             dependent: str | None = None
                             ) -> NaturalLogicRelation:
    """Relation for inserting this arc (forDependencyInsertion)."""
    if not is_subject:
        if label in ("conj:or", "conj:nor"):
            # 'or' in the object position behaves as 'and'
            return for_dependency_insertion("conj:and", False)
        if label == "cc:preconj":
            if dependent is not None and dependent.lower() == "neither":
                return _R.INDEPENDENCE
            return _R.REVERSE_ENTAILMENT
    rel = _INSERT_ARC.get(label.lower())
    if rel is not None:
        return rel
    if label.startswith("nmod:") or label.startswith("obl:") \
            or label.startswith("conj") or label.startswith("advcl"):
        return _R.REVERSE_ENTAILMENT
    return _R.INDEPENDENCE


_INSERT_TO_DELETE = {
    _R.EQUIVALENT: _R.EQUIVALENT,
    _R.FORWARD_ENTAILMENT: _R.REVERSE_ENTAILMENT,
    _R.REVERSE_ENTAILMENT: _R.FORWARD_ENTAILMENT,
    _R.NEGATION: _R.NEGATION,
    _R.ALTERNATION: _R.COVER,
    _R.COVER: _R.ALTERNATION,
    _R.INDEPENDENCE: _R.INDEPENDENCE,
}


def for_dependency_deletion(label: str, is_subject: bool = True,
                            dependent: str | None = None
                            ) -> NaturalLogicRelation:
    """Relation for deleting this arc (forDependencyDeletion — the
    insertion relation's dual)."""
    return _INSERT_TO_DELETE[
        for_dependency_insertion(label, is_subject, dependent)]


def _polarity_truth_methods():
    """Attach truth-composition helpers (Polarity.java maintainsTruth &c:
    project the lexical relation, then read the projected relation's
    truth-maintenance flag)."""
    def maintains_truth(self, rel):
        return self.project_lexical_relation(rel).maintains_truth

    def negates_truth(self, rel):
        return self.project_lexical_relation(rel).negates_truth

    def maintains_falsehood(self, rel):
        return self.project_lexical_relation(rel).maintains_falsehood

    def negates_falsehood(self, rel):
        return self.project_lexical_relation(rel).negates_falsehood

    Polarity.maintains_truth = maintains_truth
    Polarity.negates_truth = negates_truth
    Polarity.maintains_falsehood = maintains_falsehood
    Polarity.negates_falsehood = negates_falsehood


_polarity_truth_methods()
