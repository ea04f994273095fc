"""Coref scored with the CoNLL metric trio (MUC + B³ + CEAF-e average) —
the reference's dcoref evaluation protocol (SieveCoreferenceSystem CoNLL
scorer) applied gold-mentions-given: gold chains are hand-labeled over the
engine's detected mention set (keyed by (sent, text)); every unlabeled
mention is a gold singleton. The gate pins a floor so sieve regressions
surface as a score drop, not just changed chain shapes."""

from collections import defaultdict

from corenlp_spark.models.coref_eval import b_cubed, ceaf_e, conll_f1, muc
from corenlp_spark.operators.coref import detect_mentions, run_sieves
from corenlp_spark.operators.ner import tag_sentence_ner
from corenlp_spark.operators.tag import lemmatize, pos_tag
from corenlp_spark.operators.tokenize import annotate_doc

# (text, gold chains as sets of (sent_idx, mention text)) — true coreference,
# including links the current sieves are known to miss (the score < 1.0 is
# the point)
EVAL_DOCS = [
    ("Barack Obama was born in Hawaii. Obama was elected president in 2008. "
     "He moved to Washington.",
     [{(0, "Barack Obama"), (1, "Obama"), (2, "He")}]),
    ("Marie Curie won the Nobel Prize. She worked in Paris. Curie died in 1934.",
     [{(0, "Marie Curie"), (1, "She"), (2, "Curie")}]),
    ("IBM announced a new laboratory. The company will open it in Armonk.",
     [{(0, "IBM"), (1, "The company")}, {(0, "a new laboratory"), (1, "it")}]),
    ('"We will win," said John McCain. McCain later lost the election.',
     [{(0, "John McCain"), (1, "McCain")}]),
    ("The president of Meridian Institute, Hugo Ellison, resigned. "
     "His successor arrived on Monday.",
     [{(0, "The president"), (0, "Hugo Ellison"), (1, "His")}]),
    ('"We will not lose," said Maria Quinn. She smiled.',
     [{(0, "Maria Quinn"), (1, "She")}]),
    # distinct people sharing a surname must NOT merge; the plural pronoun
    # resolves to the coordination NP spanning both conjuncts
    ("John Smith and Mary Smith arrived. They sat down. Mr. Smith spoke first.",
     [{(0, "John Smith"), (2, "Mr. Smith")},
      {(0, "John Smith and Mary Smith"), (1, "They")}]),
    ("Google acquired the startup. Google kept its employees.",
     [{(0, "Google"), (1, "Google"), (1, "its")}]),
    ("The report was finished on Friday. The report cited three studies. "
     "It was long.",
     [{(0, "The report"), (1, "The report"), (2, "It")}]),
    ("Anna Keller met Clara Draper in Berlin. Keller thanked her host.",
     [{(0, "Anna Keller"), (1, "Keller"), (1, "her")}]),
    ("The teacher praised the students. She gave them high marks.",
     [{(0, "The teacher"), (1, "She")}, {(0, "the students"), (1, "them")}]),
    ("Stanford University opened a laboratory. The university funded it fully.",
     [{(0, "Stanford University"), (1, "The university")},
      {(0, "a laboratory"), (1, "it")}]),
    # r4 widening (VERDICT r3 #10): nested mentions, cataphora, reflexive
    # binding, same-gender ambiguity — harder docs at the same ≥0.85 floor
    ("The president of France visited Rome. He praised the city.",
     [{(0, "The president"), (1, "He")},        # nested: France stays apart
      {(0, "Rome"), (1, "the city")}]),
    ("When she arrived in Vienna, Petra Jensen smiled.",
     [{(0, "she"), (0, "Petra Jensen")}]),       # cataphora: a known miss
    ("Grace Foster met Irene Archer. She congratulated Irene.",
     [{(0, "Grace Foster"), (1, "She")},         # subject salience
      {(0, "Irene Archer"), (1, "Irene")}]),
    ("Henry Mercer blamed himself after the loss.",
     [{(0, "Henry Mercer"), (0, "himself")}]),   # reflexive binding
    ("The committee blamed itself for the delay.",
     [{(0, "The committee"), (0, "itself")}]),
    ("After his trial, Marco Ruiz moved to Lima.",
     [{(0, "his"), (0, "Marco Ruiz")}]),         # cataphoric possessive: miss
    # r5 widening (VERDICT r4 #8): decisions only the trained ranker gets
    # right — anaphoric definite NPs, object-pronoun recency, binding
    ("Vertex Systems opened a plant. The company staffed it quickly.",
     [{(0, "Vertex Systems"), (1, "The company")},
      {(0, "a plant"), (1, "it")}]),
    ("Nora Duncan visited Lisbon. The city charmed her.",
     [{(0, "Nora Duncan"), (1, "her")}, {(0, "Lisbon"), (1, "The city")}]),
    ("Tessa Holt hired a gardener. The gardener thanked her.",
     [{(0, "Tessa Holt"), (1, "her")},
      {(0, "a gardener"), (1, "The gardener")}]),
    ("The editors praised the authors. They thanked them.",
     [{(0, "The editors"), (1, "They")}, {(0, "the authors"), (1, "them")}]),
    ("Orion Bank sold a warehouse. The bank kept the land.",
     [{(0, "Orion Bank"), (1, "The bank")}]),
    # r5 widening #2: appositive roles, cross-sentence possessives, two
    # same-type entities with definite-NP disambiguation, quoted speakers
    ("Clara Voss, the museum director, retired. Her deputy took over.",
     [{(0, "Clara Voss"), (0, "the museum director"), (1, "Her")}]),
    ("Zenith Labs sued Cascade Media. The lawsuit surprised nobody.",
     [{(0, "Zenith Labs")}, {(0, "Cascade Media")}]),
    ('"The figures are wrong," said Edwin Hale. He resigned that evening.',
     [{(0, "Edwin Hale"), (1, "He")}]),
    ("The engineer who designed the bridge won an award. "
     "She thanked the jury.",
     [{(0, "The engineer"), (1, "She")}]),
    ("Pinnacle Group hired Dora Flint. The firm promoted her twice.",
     [{(0, "Pinnacle Group"), (1, "The firm")},
      {(0, "Dora Flint"), (1, "her")}]),
    ("Victor Hsu and his wife moved to Oslo. He opened a clinic there.",
     [{(0, "Victor Hsu"), (0, "his"), (1, "He")}]),
]


def _predict(text):
    spans = [{"kind": "text", "text": text, "media_ref": None, "offset": 0}]
    tokens, sentences = annotate_doc(spans)
    words = [t["word"] for t in tokens]
    tags = pos_tag(words, {s["start_tok"] for s in sentences})
    for t, tag in zip(tokens, tags):
        t["pos"] = tag
        t["lemma"] = lemmatize(t["word"], tag)
    for s in sentences:
        a, b = s["start_tok"], s["end_tok"]
        seg = tokens[a:b]
        ner, _ = tag_sentence_ner([t["word"] for t in seg],
                                  [t["pos"] for t in seg])
        for t, x in zip(seg, ner):
            t["ner"] = x
    ms = detect_mentions(tokens, sentences)
    run_sieves(ms, tokens)
    return ms


def _chains():
    gold_all, pred_all = [], []
    for d, (text, gold_spec) in enumerate(EVAL_DOCS):
        ms = _predict(text)
        keys = [(d, m.sent, m.text) for m in ms]
        assert len(set(keys)) == len(keys), f"ambiguous mention keys in doc {d}"
        labeled = set()
        for chain in gold_spec:
            g = {(d, s, t) for s, t in chain}
            missing = g - set(keys)
            assert not missing, f"gold mention not detected: {missing}"
            gold_all.append(g)
            labeled |= g
        for k in keys:
            if k not in labeled:
                gold_all.append({k})
        by_c = defaultdict(set)
        for m, k in zip(ms, keys):
            by_c[(d, m.cluster)].add(k)
        pred_all.extend(by_c.values())
    return gold_all, pred_all


def test_conll_coref_gate():
    gold, pred = _chains()
    m, b, c = muc(gold, pred)[2], b_cubed(gold, pred)[2], ceaf_e(gold, pred)[2]
    score = conll_f1(gold, pred)
    msg = f"MUC={m:.3f} B3={b:.3f} CEAFe={c:.3f} CoNLL={score:.3f}"
    # floor raised r5 (sieves + trained mention ranker measured 0.979 on
    # this 23-doc set); the remaining misses are the two cataphora docs
    assert score >= 0.90, msg
    # and the metric must actually register the known misses (no gaming)
    assert score < 1.0, msg


def test_metric_identities():
    # identical partitions → all ones
    g = [{1, 2, 3}, {4}, {5, 6}]
    assert muc(g, g)[2] == 1.0 and b_cubed(g, g)[2] == 1.0
    assert abs(ceaf_e(g, g)[2] - 1.0) < 1e-9
    # everything-singleton prediction: MUC recall 0
    singles = [{x} for x in (1, 2, 3, 4, 5, 6)]
    assert muc(g, singles)[2] == 0.0
    assert 0 < b_cubed(g, singles)[2] < 1.0
    # Vilain et al. 1995 worked example: gold {A..D} one chain,
    # response two chains {A,B},{C,D} → MUC R = 2/3
    gold = [set("ABCD")]
    resp = [set("AB"), set("CD")]
    assert abs(muc(gold, resp)[1] - 2 / 3) < 1e-9
