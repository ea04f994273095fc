"""RegexNERSequenceClassifierTest.java ported: cased/uncased mapping
files under the default ^(NN|JJ) valid-POS gate, and the 10
overwrite-interaction patterns over pre-NER'd sentences."""

from corenlp_spark.operators.regexner import RegexNERClassifier

WORDS = ["My dog likes to eat sausage : turkey , pork , beef , etc .",
         "I went to Shoreline Park and saw an avocet and some curlews "
         "( shorebirds ) ."]
TAGS = ["PRP$ NN RB VBZ VBG NN : NN , NN , NN , FW .",
        "PRP VBD TO NNP NNP CC VBD DT NN CC DT NNS -LRB- NNP -RRB- ."]
NER = ["O O O O O O O O O O O O O O O",
       "O O O LOCATION LOCATION O O O O O O O O O O O"]

MAPPING = ("sausage\tfood\n"
           "(avocet|curlew)(s?)\tshorebird\n"
           "shoreline park\tpark\n")


def _apply(mapping, ignore_case, sent_ner, valid_pos="^(NN|JJ)"):
    c = RegexNERClassifier(mapping, ignore_case,
                           valid_pos_pattern=valid_pos)
    out = []
    for words, tags, ner in zip(WORDS, TAGS, sent_ner):
        got = c.classify(words.split(), tags.split(), ner.split())
        out.append(" ".join("-" if g == o else g
                            for g, o in zip(got, ner.split())))
    return out


def test_uncased():
    assert _apply(MAPPING, True, ["O " * 15, "O " * 16]) == [
        "- - - - - food - - - - - - - - -",
        "- - - park park - - - shorebird - - shorebird - - - -"]


def test_cased():
    assert _apply(MAPPING, False, ["O " * 15, "O " * 16]) == [
        "- - - - - food - - - - - - - - -",
        "- - - - - - - - shorebird - - shorebird - - - -"]


NER_PATTERNS = [
    ("Shoreline Park\tPARK\n",
     ["- " * 15, "- " * 16]),
    ("Shoreline Park\tPARK\tLOCATION\n",
     ["- " * 15, "- - - PARK PARK - - - - - - - - - - -"]),
    ("Shoreline\tPARK\n",
     ["- " * 15, "- " * 16]),
    ("Shoreline Park and\tPARK\tLOCATION\n",
     ["- " * 15, "- - - PARK PARK PARK - - - - - - - - - -"]),
    ("My\tPOSS\nsausage \\:\tFOO\n",
     ["POSS - - - - FOO FOO - - - - - - - -", "- " * 16]),
    ("My\tPOSS\nsausage :\tFOO\n",
     ["POSS - - - - FOO FOO - - - - - - - -", "- " * 16]),
    ("My\tPOSS\n\\. \\.\tFOO\n",
     ["POSS - - - - - - - - - - - - - -", "- " * 16]),
    ("\\.\tPERIOD\n",
     ["- - - - - - - - - - - - - - PERIOD",
      "- - - - - - - - - - - - - - - PERIOD"]),
    (".\tPERIOD\n",
     ["- - - - - - PERIOD - PERIOD - PERIOD - PERIOD - PERIOD",
      "PERIOD - - - - - - - - - - - PERIOD - PERIOD PERIOD"]),
    ("\\(|\\)\tPAREN\n",
     ["- " * 15, "- - - - - - - - - - - - PAREN - PAREN -"]),
]


def test_ner_overlaps():
    for mapping, expected in NER_PATTERNS:
        c = RegexNERClassifier(mapping, False, valid_pos_pattern=None)
        for words, tags, ner, want in zip(WORDS, TAGS, NER, expected):
            got = c.classify(words.split(), tags.split(), ner.split())
            shown = " ".join("-" if g == o else g
                             for g, o in zip(got, ner.split()))
            assert shown.split() == want.split(), (mapping, words)
