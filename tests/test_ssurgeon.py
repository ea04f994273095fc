"""SsurgeonTest.java tranche ported: the XML rule format, addEdge
execute/iterate, removeEdge, removeNamedEdge, relabelNamedEdge, editNode,
addDep (default-append and -position forms), delete, killNonRooted,
combineMWT — each with the reference's exact expected graphs."""

from corenlp_spark.operators.ssurgeon import SsGraph, Ssurgeon


def _rule(semgrex, *edits):
    esc = lambda x: (x.replace("&", "&amp;").replace("<", "&lt;")
                     .replace(">", "&gt;"))
    doc = ("<ssurgeon-pattern-list><ssurgeon-pattern><uid>1</uid>"
           "<notes>t</notes><semgrex>" + esc(semgrex) + "</semgrex>"
           + "".join(f"<edit-list>{esc(e)}</edit-list>" for e in edits)
           + "</ssurgeon-pattern></ssurgeon-pattern-list>")
    pats = Ssurgeon.read_from_string(doc)
    assert len(pats) == 1
    return pats[0]


def test_add_edge_execute():
    p = _rule("{}=a1 > {}=a2", "addEdge -gov a1 -dep a2 -reln dep -weight 0.5")
    assert len(p.execute(SsGraph.value_of("[A obj> B obj> C]"))) == 2


def test_add_edge_iterate():
    p = _rule("{}=a1 >obj {}=a2",
              "addEdge -gov a1 -dep a2 -reln dep -weight 0.5")
    got = p.iterate(SsGraph.value_of("[A obj> B obj> C nsubj> [D obj> E]]"))
    want = SsGraph.value_of(
        "[A-1 obj> B-2 dep> B-2 obj> C-3 dep> C-3 nsubj> "
        "[D-4 obj> E-5 dep> E-5]]")
    assert got == want


def test_remove_edge_iterate():
    p = _rule("{}=a1 > {}=a2", "removeEdge -gov a1 -dep a2 -reln dep")
    base = "[A-0 obj> B-1 obj> C-2 nsubj> [D-3 obj> E-4]]"
    assert p.iterate(SsGraph.value_of(base)) == SsGraph.value_of(base)
    got = p.iterate(SsGraph.value_of(
        "[A-0 obj> B-1 dep> B-1 obj> C-2 nsubj> [D-3 obj> E-4 dep> E-4]]"))
    assert got == SsGraph.value_of(base)


def test_remove_named_edge():
    p = _rule("{}=a1 >dep=foo {}=a2", "removeNamedEdge -edge foo")
    got = p.iterate(SsGraph.value_of("[A-0 obj> B-1 dep> B-1 obj> C-2]"))
    assert got == SsGraph.value_of("[A-0 obj> B-1 obj> C-2]")


def test_relabel_named_edge():
    p = _rule("{}=a1 >obj=foo {}=a2", "relabelNamedEdge -edge foo -reln dep")
    got = p.iterate(SsGraph.value_of("[A-0 obj> B-1 obj> C-2]"))
    assert got == SsGraph.value_of("[A-0 dep> B-1 dep> C-2]")


def test_edit_node():
    p = _rule("{word:B}=n", "editNode -node n -pos NNP -ner PERSON")
    out = p.iterate(SsGraph.value_of("[A-1 obj> B-2]"))
    assert out.nodes[2].pos == "NNP" and out.nodes[2].ner == "PERSON"


def test_add_dep_appends_at_end():
    """readXMLAddDep: new word lands at the next free index, attached to
    the governor; bomb-proofed semgrex keeps iterate from looping."""
    p = _rule("{word:antennae}=antennae !> {word:blue}",
              "addDep -gov antennae -reln dep -word blue")
    got = p.iterate(SsGraph.value_of(
        "[has-2 nsubj> Jennifer-1 obj> antennae-3]"))
    assert got == SsGraph.value_of(
        "[has-2 nsubj> Jennifer-1 obj> [antennae-3 dep> blue-4]]")
    assert got.nodes[4].word == "blue" and got.nodes[4].pos is None
    p2 = _rule("{word:antennae}=antennae !> {word:blue}",
               "addDep -gov antennae -reln dep -word blue -tag JJ")
    got2 = p2.iterate(SsGraph.value_of(
        "[has-2 nsubj> Jennifer-1 obj> antennae-3]"))
    assert got2.nodes[4].pos == "JJ"


def test_add_dep_position_shifts_indices():
    p = _rule("{word:B}=n !> {word:newword}",
              "addDep -gov n -reln dep -word newword -position -n")
    got = p.iterate(SsGraph.value_of("[A-1 obj> B-2 obj> C-3]"))
    assert sorted((i, n.word) for i, n in got.nodes.items()) == [
        (1, "A"), (2, "B"), (3, "newword"), (4, "C")]
    assert sorted(got.edges) == [(1, 2, "obj"), (1, 4, "obj"),
                                 (2, 3, "dep")]


def test_delete_subtree():
    p = _rule("{word:D}=n", "delete -node n")
    got = p.iterate(SsGraph.value_of(
        "[A-1 obj> B-2 nsubj> [D-3 obj> E-4]]"))
    assert got == SsGraph.value_of("[A-1 obj> B-2]")


def test_kill_non_rooted():
    p = _rule("{}=a1 >dep=foo {}=a2", "removeNamedEdge -edge foo",
              "killNonRooted")
    got = p.iterate(SsGraph.value_of("[A-1 obj> B-2 dep> [C-3 obj> D-4]]"))
    assert got == SsGraph.value_of("[A-1 obj> B-2]")


def test_combine_mwt():
    p = _rule('{}=first . {word:/(?i)n\'t/}=second',
              "CombineMWT -node first -node second")
    got = p.iterate(SsGraph.value_of("[believe-3 nsubj> I-1 advmod> n't-2]"))
    # the token immediately before n't (I-1) combines with it; default
    # MWT text = concatenation (EnglishMWTCombiner's CombineMWT default)
    marked = sorted(i for i, n in got.nodes.items() if n.mwt_text)
    assert marked == [1, 2]
    assert got.nodes[1].mwt_text == got.nodes[2].mwt_text == "In't"
    assert got.nodes[3].mwt_text is None
