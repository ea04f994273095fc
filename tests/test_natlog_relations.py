"""PolarityTest.java + NaturalLogicRelationTest.java ported whole —
the MacCartney relation algebra under the pipeline's natlog marks."""

from corenlp_spark.operators.natlog_relations import (
    Monotonicity as M, MonotonicityType as T, NaturalLogicRelation as R,
    Polarity, for_dependency_deletion, for_dependency_insertion,
)

none = Polarity([])
additive = Polarity([(M.MONOTONE, T.ADDITIVE)])
multiplicative = Polarity([(M.MONOTONE, T.MULTIPLICATIVE)])
antimultiplicative = Polarity([(M.MONOTONE, T.ADDITIVE),
                               (M.ANTITONE, T.MULTIPLICATIVE)])
additive_anti_mult = Polarity([(M.MONOTONE, T.ADDITIVE),
                               (M.ANTITONE, T.MULTIPLICATIVE)])
mult_anti_mult = Polarity([(M.MONOTONE, T.MULTIPLICATIVE),
                           (M.ANTITONE, T.MULTIPLICATIVE)])


def test_equals():
    assert multiplicative == Polarity([(M.MONOTONE, T.MULTIPLICATIVE)])
    assert multiplicative == "up"
    assert multiplicative == "upwards"


def test_none_projects_identity():
    for rel in R:
        assert none.project_lexical_relation(rel) is rel


def _check(p, golds):
    for inp, want in golds.items():
        assert p.project_lexical_relation(inp) is want, inp


def test_additive_antimultiplicative_project():
    _check(additive_anti_mult, {
        R.EQUIVALENT: R.EQUIVALENT,
        R.FORWARD_ENTAILMENT: R.REVERSE_ENTAILMENT,
        R.REVERSE_ENTAILMENT: R.FORWARD_ENTAILMENT,
        R.NEGATION: R.COVER, R.ALTERNATION: R.COVER,
        R.COVER: R.INDEPENDENCE, R.INDEPENDENCE: R.INDEPENDENCE})


def test_multiplicative_antimultiplicative_project():
    _check(mult_anti_mult, {
        R.EQUIVALENT: R.EQUIVALENT,
        R.FORWARD_ENTAILMENT: R.REVERSE_ENTAILMENT,
        R.REVERSE_ENTAILMENT: R.FORWARD_ENTAILMENT,
        R.NEGATION: R.INDEPENDENCE, R.ALTERNATION: R.INDEPENDENCE,
        R.COVER: R.INDEPENDENCE, R.INDEPENDENCE: R.INDEPENDENCE})


def test_additive_project():
    _check(additive, {
        R.EQUIVALENT: R.EQUIVALENT,
        R.FORWARD_ENTAILMENT: R.FORWARD_ENTAILMENT,
        R.REVERSE_ENTAILMENT: R.REVERSE_ENTAILMENT,
        R.NEGATION: R.COVER, R.ALTERNATION: R.INDEPENDENCE,
        R.COVER: R.COVER, R.INDEPENDENCE: R.INDEPENDENCE})


def test_antimultiplicative_project():
    _check(antimultiplicative, {
        R.EQUIVALENT: R.EQUIVALENT,
        R.FORWARD_ENTAILMENT: R.REVERSE_ENTAILMENT,
        R.REVERSE_ENTAILMENT: R.FORWARD_ENTAILMENT,
        R.NEGATION: R.COVER, R.ALTERNATION: R.COVER,
        R.COVER: R.INDEPENDENCE, R.INDEPENDENCE: R.INDEPENDENCE})


def test_multiplicative_truth():
    wants = {R.EQUIVALENT: True, R.FORWARD_ENTAILMENT: True}
    for rel in R:
        assert multiplicative.maintains_truth(rel) == wants.get(rel, False)
    negs = {R.NEGATION: True, R.ALTERNATION: True}
    for rel in R:
        assert multiplicative.negates_truth(rel) == negs.get(rel, False)


def test_upward_downward():
    assert multiplicative.is_upwards() and additive.is_upwards()
    assert not antimultiplicative.is_upwards()
    assert not mult_anti_mult.is_upwards()
    assert not additive_anti_mult.is_upwards()
    assert not multiplicative.is_downwards() and not additive.is_downwards()
    assert antimultiplicative.is_downwards()
    assert mult_anti_mult.is_downwards()
    assert additive_anti_mult.is_downwards()


def test_fixed_index_roundtrip():
    for rel in R:
        assert R.by_fixed_index(rel.fixed_index) is rel


def test_join_table():
    assert R.NEGATION.join(R.FORWARD_ENTAILMENT) is R.COVER
    assert R.ALTERNATION.join(R.NEGATION) is R.FORWARD_ENTAILMENT
    assert R.COVER.join(R.ALTERNATION) is R.REVERSE_ENTAILMENT
    assert R.NEGATION.join(R.NEGATION) is R.EQUIVALENT
    for rel in R:
        assert R.EQUIVALENT.join(rel) is rel
        assert R.INDEPENDENCE.join(rel) is R.INDEPENDENCE
        assert rel.join(R.INDEPENDENCE) is R.INDEPENDENCE


def test_entailment_state():
    assert R.EQUIVALENT.maintains_truth
    assert R.FORWARD_ENTAILMENT.maintains_truth
    assert R.NEGATION.negates_truth and R.ALTERNATION.negates_truth
    assert not R.EQUIVALENT.negates_truth
    assert not R.FORWARD_ENTAILMENT.negates_truth
    assert not R.NEGATION.maintains_truth
    assert not R.ALTERNATION.maintains_truth
    assert not R.COVER.maintains_truth and not R.COVER.negates_truth
    assert not R.INDEPENDENCE.maintains_truth
    assert not R.INDEPENDENCE.negates_truth


def test_dependency_insertion_deletion():
    assert for_dependency_insertion("quantmod") is R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("amod") is R.REVERSE_ENTAILMENT
    assert for_dependency_insertion("conj:or") is R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("conj:or", True) is R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("conj:or", False) is R.REVERSE_ENTAILMENT
    assert for_dependency_deletion("quantmod") is R.REVERSE_ENTAILMENT
    assert for_dependency_deletion("amod") is R.FORWARD_ENTAILMENT
