"""QuantifiableEntityNormalizerTest.java ported whole (test/src/edu/
stanford/nlp/ie/QuantifiableEntityNormalizerTest.java:13-146) — the
reference's pre-SUTime string normalizer API with its exact output
conventions (yyyymmdd dates, Java-double money, h:mmam times)."""

import pytest

from corenlp_spark.operators.quantifiable import (
    normalized_date_string, normalized_money_string,
    normalized_number_string, normalized_ordinal_string,
    normalized_percent_string, normalized_time_string,
)

DATES = [
    ("February 5, 1923", "19230205"), ("Mar 3", "****0303"),
    ("18 July 2005", "20050718"), ("18 Sep 05", "20050918"),
    ("Jan. 13 , '90", "19900113"), ("Jan. 13", "****0113"),
    ("2009-07-19", "20090719"), ("2007-06-16", "20070616"),
]
PERCENTS = [
    ("one percent", "%1.0"), ("% 8", "%8.0"), ("8 %", "%8.0"),
    ("8.25 %", "%8.25"), ("48 percent", "%48.0"), ("%4.9", "%4.9"),
]
MONEY = [
    ("24 cents", "$0.24"), ("18¢", "$0.18"), ("250 won", "₩250.0"),
    ("£5.40", "£5.4"),
    ("10 thousand million pounds", "£1.0E10"),
    ("10 thousand million dollars", "$1.0E10"),
    ("million dollars", "$1000000.0"), ("four million dollars", "$4000000.0"),
    ("$1m", "$1000000.0"), ("50 million yuan", "元5.0E7"),
    ("50 cents", "$0.5"), ("# 1500", "£1500.0"),
    ("£ 1500", "£1500.0"), ("£ .50", "£0.5"),
    ("# .50", "£0.5"), ("$ 1500", "$1500.0"), ("$1500", "$1500.0"),
    ("$ 1,500", "$1500.0"), ("$1,500", "$1500.0"), ("$48.75", "$48.75"),
    ("$ 57 . 60", "$57.6"), ("2.30", "$2.3"), ("8 million", "$8000000.0"),
    ("$8 thousand", "$8000.0"), ("$42,33", "$42.33"),
]
NUMBERS = [
    ("twenty-five", "25.0"), ("1.3 million", "1300000.0"),
    ("10 thousand million", "1.0E10"), ("3.625", "3.625"),
    ("-15", "-15.0"), ("117-111", "117.0 - 111.0"),
    ("", ""), (" ", " "), ("   ", "   "),
]
ORDINALS = [
    ("twelfth", "12.0"), ("twenty-second", "22.0"), ("0th", "0.0"),
    ("1,000th", "1000.0"),
]
TIMES = [
    ("4:30", "4:30"), ("11:00 pm", "11:00pm"), ("2 am", "2:00am"),
    ("12:29 p.m.", "12:29pm"), ("midnight", "00:00am"),
    ("22:26:48", "22:26:48"),
]


@pytest.mark.parametrize("fn,cases", [
    (normalized_date_string, DATES),
    (normalized_percent_string, PERCENTS),
    (normalized_money_string, MONEY),
    (normalized_number_string, NUMBERS),
    (normalized_ordinal_string, ORDINALS),
    (normalized_time_string, TIMES),
], ids=["dates", "percents", "money", "numbers", "ordinals", "times"])
def test_qen_golds(fn, cases):
    for inp, want in cases:
        assert fn(inp) == want, inp
