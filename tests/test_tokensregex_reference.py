"""TokenSequenceMatcherITest tranche ported (itest/src/edu/stanford/nlp/
ling/tokensregex/TokenSequenceMatcherITest.java:805-985): the reference's
own surface syntaxes ({word:"X"} CoreMap nodes, bare "literal" and /re/
nodes, & conjunction), numbered groups, greedy and reluctant quantified
groups over the Mellitus text, alternation ordering by position."""

from corenlp_spark.operators.tokenize import tokenize_text
from corenlp_spark.operators.tokensregex import compile_pattern, find_all

T1 = ("Mellitus was the first Bishop of London, the third Archbishop of "
      "Canterbury, and a member of the Gregorian mission  sent to England "
      "to convert the Anglo-Saxons. He arrived in 601 AD, and was "
      "consecrated as Bishop of London in 604.")


def _toks():
    return [{"word": t[0]} for t in tokenize_text(T1)]


def _spans(pattern, toks):
    return [" ".join(t["word"] for t in toks[s:e])
            for s, e, _ in find_all(compile_pattern(pattern), toks)]


def _groups(pattern, toks):
    out = []
    for s, e, g in find_all(compile_pattern(pattern), toks):
        row = {"0": " ".join(t["word"] for t in toks[s:e])}
        for k, (gs, ge) in g.items():
            row[k] = " ".join(t["word"] for t in toks[gs:ge])
        out.append(row)
    return out


def test_corem_node_and_literal_syntaxes():
    toks = _toks()
    for pattern in (
        ' [ { word:"Archbishop" } ]  [ { word:"of" } ]  [ { word:"Canterbury" } ]',
        ' [ "Archbishop" ]  [ "of"  ]  [ "Canterbury"  ]',
        "/Archbishop/ /of/ /Canterbury/",
    ):
        assert _spans(pattern, toks) == ["Archbishop of Canterbury"]


def test_alternation_in_position_order():
    toks = _toks()
    assert _spans(' [ "Archbishop"] ["of"] ["Canterbury"] |'
                  '  [ "Bishop" ] [ "of" ]  [ "London" ] ', toks) == [
        "Bishop of London", "Archbishop of Canterbury", "Bishop of London"]


def test_any_node_sequences():
    toks = _toks()
    assert _spans("[ /.*/ ] [ /.*/ ] [/of/] [/.*/]", toks) == [
        "first Bishop of London", "third Archbishop of Canterbury",
        "a member of the", "as Bishop of London"]


def test_numbered_groups():
    toks = _toks()
    got = _groups("([ /.*/ ] [ /.*/ ]) [/of/] ([/.*/])", toks)
    assert [(r["0"], r["1"], r["2"]) for r in got] == [
        ("first Bishop of London", "first Bishop", "London"),
        ("third Archbishop of Canterbury", "third Archbishop", "Canterbury"),
        ("a member of the", "a member", "the"),
        ("as Bishop of London", "as Bishop", "London")]


def test_greedy_quantified_groups():
    toks = _toks()
    got = _groups(" ( [ /[A-Za-z]+/ ]{1,2} )  [ /of/ ] "
                  "( [ /[A-Za-z]+/ ]{1,3} )", toks)
    assert [(r["0"], r["1"], r["2"]) for r in got] == [
        ("first Bishop of London", "first Bishop", "London"),
        ("third Archbishop of Canterbury", "third Archbishop", "Canterbury"),
        ("a member of the Gregorian mission", "a member",
         "the Gregorian mission"),
        ("as Bishop of London in", "as Bishop", "London in")]


def test_reluctant_quantified_groups():
    toks = _toks()
    got = _groups(" ( [ /[A-Za-z]+/ ]{2,2} )  [ /of/ ] "
                  "( [ /[A-Za-z]+/ ]{1,3}? )", toks)
    assert [(r["0"], r["1"], r["2"]) for r in got] == [
        ("first Bishop of London", "first Bishop", "London"),
        ("third Archbishop of Canterbury", "third Archbishop", "Canterbury"),
        ("a member of the", "a member", "the"),
        ("as Bishop of London", "as Bishop", "London")]


def test_star_over_word_runs():
    toks = _toks()
    assert _spans("[ /[A-Za-z]+/ ]*", toks)[:2] == [
        "Mellitus was the first Bishop of London",
        "the third Archbishop of Canterbury"]


def test_conjunction_inside_node():
    toks = [{"word": w, "pos": p} for w, p in
            [("the", "DT"), ("Bill", "NNP"), ("ate", "VBD")]]
    assert [(s, e) for s, e, _ in
            find_all(compile_pattern("[{pos:NNP} & /B.*/]"), toks)] == [(1, 2)]
    assert not find_all(compile_pattern("[{pos:NNP} & /x.*/]"), toks)


def test_backreferences_and_bare_words():
    r"""testTokenSequenceMatcherBackRef: "(/A/+) B \1" — the captured
    token run must repeat verbatim after B; bare words are literals."""
    toks = [{"word": w} for w in
            "A A A A A A A B A A B A C A E A A A A A A A A A A A B A A A"
            .split()]
    ms = find_all(compile_pattern(r"(/A/+) B \1"), toks)
    spans = [" ".join(t["word"] for t in toks[s:e]) for s, e, _ in ms]
    assert spans == ["A A B A A", "A A A B A A A"]
