"""NER + normalization goldens (FIXTURES.md §5; semantics from
``ie/regexp/NumberSequenceClassifier.java:29-54`` and
``ie/QuantifiableEntityNormalizer.java:42-75``)."""

from corenlp_spark.operators.ner import tag_sentence_ner
from corenlp_spark.operators.tag import pos_tag
from corenlp_spark.operators.tokenize import tokenize_text


def ner(sentence):
    toks = tokenize_text(sentence)
    words = [t[0] for t in toks]
    pos = pos_tag(words, {0})
    tags, norm = tag_sentence_ner(words, pos)
    return list(zip(words, tags, norm))


def spans(sentence):
    return {(w, t) for w, t, _ in ner(sentence) if t != "O"}


def test_person_org_loc():
    got = spans("Barack Obama visited Paris.")
    assert ("Barack", "PERSON") in got and ("Obama", "PERSON") in got
    assert ("Paris", "LOCATION") in got
    got = spans("Chris Manning works for Stanford University.")
    assert ("Stanford", "ORGANIZATION") in got and ("University", "ORGANIZATION") in got


def test_multiword_org():
    got = ner("International Business Machines announced earnings.")
    assert [t for _, t, _ in got[:3]] == ["ORGANIZATION"] * 3
    assert got[3][1] == "O"


def test_date_normalization():
    got = ner("On 21 February 2013 George Boyd joined.")
    by_word = {w: (t, n) for w, t, n in got}
    assert by_word["21"] == ("DATE", "2013-02-21")
    assert by_word["February"] == ("DATE", "2013-02-21")
    assert by_word["2013"] == ("DATE", "2013-02-21")
    assert by_word["George"][0] == "PERSON"


def test_time_normalization():
    got = ner("I said at 4:45pm.")
    by_word = {w: (t, n) for w, t, n in got}
    assert by_word["4:45"] == ("TIME", "T16:45")
    assert by_word["pm"] == ("TIME", "T16:45")


def test_money_ordinal_number():
    by_word = {w: (t, n) for w, t, n in ner("You paid US$170,000?!")}
    assert by_word["US$"] == ("MONEY", "$170000.0")
    assert by_word["170,000"] == ("MONEY", "$170000.0")
    by_word = {w: (t, n) for w, t, n in ner("the 44th of twenty")}
    assert by_word["44th"] == ("ORDINAL", "44.0")
    by_word = {w: (t, n) for w, t, n in ner("Marie Curie discovered polonium in 1898.")}
    assert by_word["1898"] == ("DATE", "1898")


def test_pronouns_not_entities():
    assert spans("He was president.") == set()


def test_url_email_ner():
    """URL/EMAIL entity classes (reference NERTag URL — the org:website
    object signature)."""
    by_word = {w: (t, n) for w, t, n in ner("Visit http://acme.example or mail sue@google.com now.")}
    assert by_word["http://acme.example"] == ("URL", "http://acme.example")
    assert by_word["sue@google.com"] == ("EMAIL", "sue@google.com")


def test_written_number_spans_and_money():
    """QuantifiableEntityNormalizer composition: multi-word written numbers
    form one span with the combined value; a currency unit upgrades the
    span to MONEY; ordinal words and hyphenated compounds normalize."""
    from corenlp_spark.operators.tag import pos_tag

    def run(s):
        w = s.split()
        ner, nner = tag_sentence_ner(w, pos_tag(w, {0}))
        return list(zip(w, ner, nner))

    out = run("He paid two hundred dollars .")
    assert [(x[1], x[2]) for x in out[2:5]] == [("MONEY", "$200.0")] * 3
    out = run("Three million people live there .")
    assert out[0][1:] == ("NUMBER", "3000000.0") and out[1][1:] == ("NUMBER", "3000000.0")
    out = run("two hundred and five cats")
    assert {x[2] for x in out[:4]} == {"205.0"}
    assert run("He is forty-five years old .")[2][1:] == ("NUMBER", "45.0")
    assert run("the fifth time")[1][1:] == ("ORDINAL", "5.0")
    assert run("the twenty-first century")[1][1:] == ("ORDINAL", "21.0")
    assert run("He paid 200 dollars .")[2][1:] == ("MONEY", "$200.0")


def test_percent_class():
    from corenlp_spark.operators.tag import pos_tag

    w = "Revenue rose 40 % and then 12 percent .".split()
    ner, nner = tag_sentence_ner(w, pos_tag(w, {0}))
    assert (ner[2], nner[2]) == ("PERCENT", "%40.0")
    assert (ner[3], nner[3]) == ("PERCENT", "%40.0")
    assert (ner[6], nner[6]) == ("PERCENT", "%12.0")


def test_written_fractions_and_half_scale():
    """QuantifiableEntityNormalizer fraction words: 'two thirds' → 0.6667,
    'three quarters' → 0.75, 'half a million' → 500000."""
    from corenlp_spark.operators.ner import tag_sentence_ner
    from corenlp_spark.operators.tag import pos_tag

    def vals(s):
        w = s.split()
        ner, nner = tag_sentence_ner(w, pos_tag(w, {0}))
        return [(a, c) for a, b, c in zip(w, ner, nner) if b == "NUMBER"]

    assert vals("He spent two thirds of the budget .") == \
        [("two", "0.6667"), ("thirds", "0.6667")]
    assert vals("The firm lost three quarters of its value .") == \
        [("three", "0.75"), ("quarters", "0.75")]
    assert vals("Nearly half a million people attended .") == \
        [("half", "500000.0"), ("a", "500000.0"), ("million", "500000.0")]
    # ordinal 'fourth' is NOT a fraction without a preceding cardinal
    w = "She was fourth .".split()
    ner, _ = tag_sentence_ner(w, pos_tag(w, {0}))
    assert ner[2] == "ORDINAL"


def test_allcaps_acronyms_not_pronoun_pinned():
    """'US'/'UK' in headline case are acronyms, not the pronouns us/it —
    the pronoun force-O pin must exempt multi-char all-uppercase tokens
    (the reference tags 'the US' LOCATION). Lowercase pronouns stay O."""
    from corenlp_spark.operators.ner import tag_sentence_ner
    from corenlp_spark.operators.tag import pos_tag

    def ner_of(s):
        w = s.split()
        ner, _ = tag_sentence_ner(w, pos_tag(w, {0}))
        return dict(zip(w, ner))

    assert ner_of("He moved to the US last year .")["US"] == "LOCATION"
    assert ner_of("Firms in the UK hired us .")["UK"] == "LOCATION"
    m = ner_of("Firms in the UK hired us .")
    assert m["us"] == "O"
    assert ner_of("It is raining .")["It"] == "O"
