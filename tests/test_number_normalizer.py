"""NumberNormalizerITest.java golds ported (itest/src/edu/stanford/nlp/ie/
NumberNormalizerITest.java:41-186): written-number grammar (group joins via
and/comma only after a scale word, unit-after-unit splits, digit-initial
mixed forms, chained big scales, dozen/score), decimal-precision values,
and compound ordinals."""

from corenlp_spark.operators.ner import numeric_pass
from corenlp_spark.operators.tokenize import tokenize_text


def _values(text, cls):
    toks = [t[0] for t in tokenize_text(text)]
    ner = ["O"] * len(toks)
    nner = [""] * len(toks)
    numeric_pass(toks, ner, nner)
    vals, prev = [], None
    for n_, v in zip(ner, nner):
        if n_ == cls and v != prev:
            vals.append(float(v))
        prev = v if n_ == cls else None
    return vals


NUMBER_GOLDS = [
    ("two dozen", [24.0]),
    (" 405", [405.0]),
    ("six hundred,", [600.0]),
    ("four hundred, and twelve.", [412.0]),
    ("4 million six hundred fifty thousand, two hundred and eleven.",
     [4650211.0]),
    ("6 hundred billion, five million six hundred fifty thousand, "
     "three hundred and seventy six", [600005650376.0]),
    ("5,786,345", [5786345.0]),
    ("twenty-five.", [25.0]),
    ("1.3 million.", [1300000.0]),
    ("one thousand two hundred and twenty four", [1224.0]),
    ("10 thousand million.", [10000000000.0]),
    ("3.625", [3.625]),
    ("zero", [0.0]),
    ("-15", [-15.0]),
    # a unit may not follow a unit: four SEPARATE numbers
    ("one two three four.", [1.0, 2.0, 3.0, 4.0]),
    ("one hundred and fifty five", [155.0]),
    ("a hundred and one", [101.0]),
    ("four score.", [80.0]),
    ("a dozen bagels", [12.0]),
    ("five dozen", [60.0]),
    ("An IQ score of 161.", [161.0]),  # only 161, not 20 for "score"
    ("thirty two", [32.0]),
    ("I am forty-five", [45.0]),
    ("I am fourty-five", [45.0]),  # reference accepts the misspelling
    # "six and three" is NOT a compound (no scale word seen)
    ("It was six and three months.", [6.0, 3.0]),
]

ORDINAL_GOLDS = [
    ("0th, 1st, 2nd, 3rd, 4th, 10th", [0, 1, 2, 3, 4, 10]),
    ("zeroth, first, second, third, tenth", [0, 1, 2, 3, 10]),
    ("11th, 12th, 20th", [11, 12, 20]),
    ("Eleventh, twelfth, thirteenth, twentieth", [11, 12, 13, 20]),
    ("Twenty-first, twenty first, twenty second, twenty fourth",
     [21, 21, 22, 24]),
    ("thirtieth, thirty first, thirty-second", [30, 31, 32]),
    ("fortieth, one hundredth, two hundredth, one hundred and fifty first, "
     "one hundred fifty first", [40, 100, 200, 151, 151]),
]


def test_number_normalizer_golds():
    for text, want in NUMBER_GOLDS:
        assert _values(text, "NUMBER") == want, text


def test_ordinal_normalizer_golds():
    for text, want in ORDINAL_GOLDS:
        assert _values(text, "ORDINAL") == [float(w) for w in want], text


def test_decimal_value_precision():
    """r5 fix: values keep full precision ($5.99 was rounding to $6.0)."""
    toks = "It costs 5.99 dollars , up 3.625 percent .".split()
    ner = ["O"] * len(toks)
    nner = [""] * len(toks)
    numeric_pass(toks, ner, nner)
    assert nner[toks.index("5.99")] == "$5.99"
    assert nner[toks.index("3.625")] == "%3.625"
