"""Full-array parity gate against the reference's PTBTokenizerTest.java.

Parses every paired (inputs, gold) array straight out of the reference test
source (so the reference stays the single source of truth) and asserts the
tokenizer reproduces ALL of them under the matching option profile:
ptb3Escaping vs the CoreNLP-4.x UD default (PTBLexer.flex:157-181).

Skips when the reference checkout is absent (the repo itself carries the
inline ported goldens in test_tokenize.py as the standalone gate).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from corenlp_spark.operators.tokenize import ptb2_text, tokenize_text

JAVA = "/root/reference/test/src/edu/stanford/nlp/process/PTBTokenizerTest.java"

pytestmark = pytest.mark.skipif(
    not os.path.exists(JAVA), reason="reference checkout not available"
)

PTB3 = {
    "normalize_quotes": True, "normalize_ellipsis": True,
    "normalize_dashes": True, "normalize_parentheses": True,
    "split_hyphenated": False, "split_forward_slash": False,
    "keep_sgml_tokens": True,
}
UD = {
    "normalize_quotes": False, "normalize_ellipsis": False,
    "normalize_dashes": False, "normalize_parentheses": False,
    "split_hyphenated": True, "split_forward_slash": True,
    "keep_sgml_tokens": True,
}

PAIRS = [
    ("ptbInputs", "ptbGold", PTB3),
    ("moreInputs", "moreGold", PTB3),
    ("mtInputs", "mtGold", PTB3),
    ("emojiInputs", "emojiGold", UD),
    ("tweetInputs", "tweetGold", UD),
    ("hyphenInputs", "hyphenGold", PTB3),
    ("apostropheInputs", "apostropheGold", dict(PTB3, normalize_parentheses=False)),
    ("sgmlInputs", "sgmlGold", UD),
    ("sgmlInputs", "sgmlPerLineGold", dict(UD, tokenize_per_line=True)),
    ("ptbInputs", "ptbGoldSplitHyphenated", dict(UD, ellipses="unicode")),
    ("mtInputs", "mtGoldUD", UD),
    ("moreInputs", "moreGoldUD", UD),
]


@pytest.fixture(scope="module")
def java_src():
    from audit_ptb_goldens import _strip_comments

    return _strip_comments(open(JAVA, encoding="utf-8").read())


@pytest.mark.parametrize("in_name,gold_name,opts", PAIRS,
                         ids=[p[1] for p in PAIRS])
def test_reference_array_parity(java_src, in_name, gold_name, opts):
    from audit_ptb_goldens import parse_array

    inputs = parse_array(java_src, in_name)
    gold = parse_array(java_src, gold_name)
    assert inputs and gold
    fails = []
    for text, want in zip(inputs, gold):
        got = [t[0] for t in tokenize_text(text, opts)]
        if got != want:
            fails.append((text, want, got))
    assert not fails, f"{len(fails)}/{len(gold)} mismatched: {fails[:3]}"


def test_untok_reference_goldens(java_src):
    """PTBTokenizer.ptb2Text golden pairs (PTBTokenizerTest.java:442-468)."""
    from audit_ptb_goldens import parse_array

    inputs = parse_array(java_src, "untokInputs")
    outputs = parse_array(java_src, "untokOutputs")
    assert len(inputs) == len(outputs) > 0
    for ptb, want in zip(inputs, outputs):
        assert ptb2_text(ptb) == want


def test_je_eof_apostrophe_cases(java_src):
    """Clitic handling at end-of-input (testJacobEisensteinApostropheCase)."""
    for text in ("it's", " it's "):
        assert [t[0] for t in tokenize_text(text)] == ["it", "'s"]
