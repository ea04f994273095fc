"""PhraseTableTest.java ported: the 12-match count over the reference's
own long news text (parsed live from the reference test source) plus
normalized lookup; standalone unit cases keep the gate when the checkout
is absent."""

import os
import re

import pytest

from corenlp_spark.operators.phrase_table import PhraseTable

JAVA = ("/root/reference/test/src/edu/stanford/nlp/ling/tokensregex/"
        "PhraseTableTest.java")


def test_phrase_table_basics():
    pt = PhraseTable(normalize=True, case_insensitive=True)
    pt.add_phrases(["New York", "New York City", "Paris"])
    assert pt.lookup_normalized("new YORK").get_text() == "New York"
    assert "paris" in pt
    ms = pt.find_all_matches("He moved from New York City to Paris .")
    texts = sorted(m.phrase.text for m in ms)
    assert texts == ["New York", "New York City", "Paris"]
    # longest-match non-overlap selection
    nl = pt.find_non_overlapping_phrases("He moved from New York City to Paris .")
    assert [m.phrase.text for m in nl] == ["New York City", "Paris"]
    # possessive split: "Paris's cafes" still matches "Paris"
    assert [m.phrase.text for m in pt.find_all_matches("Paris's cafes")] == ["Paris"]


@pytest.mark.skipif(not os.path.exists(JAVA),
                    reason="reference checkout not available")
def test_phrase_table_reference_golds():
    src = open(JAVA, encoding="utf-8").read()
    text = re.search(r'String testText = "(.*)";', src).group(1)
    text = (text.replace('\\"', '"').replace("\\'", "'")
            .replace("\\\\", "\\"))
    phrases = re.findall(
        r'"((?:[^"\\]|\\.)*)"',
        re.search(r"List<String> phrases = Arrays.asList\((.*?)\);",
                  src, re.DOTALL).group(1))
    pt = PhraseTable(normalize=True, case_insensitive=True)
    pt.add_phrases(phrases)
    assert len(pt.find_all_matches(text)) == 12
    assert pt.lookup_normalized("COL.").get_text() == "Col."
