"""Trainable sequence-model tests: averaged-perceptron POS (M2 path).

Supervision = the rule tagger's output over the golden pool (self-training
bootstrap); held-out accuracy vs the rule tagger must be high, proving the
train → broadcast → Arrow-batched-inference loop end to end."""

from corenlp_spark.models.perceptron import (
    AveragedPerceptronTagger, tag_with_model,
)
from corenlp_spark.data.synth import GOLDEN_SENTENCES, synth_docs
from corenlp_spark.operators.tag import pos_tag
from corenlp_spark.operators.tokenize import tokenize_text


def _corpus():
    out = []
    for s in GOLDEN_SENTENCES:
        words = [t[0] for t in tokenize_text(s)]
        out.append((words, pos_tag(words, {0})))
    return out


def test_train_and_heldout_accuracy():
    corpus = _corpus()
    train, held = corpus[::2] + corpus[1::4], corpus[3::4]
    m = AveragedPerceptronTagger()
    m.train(train, epochs=8)
    n = ok = 0
    for words, gold in held:
        pred = m.predict(words)
        ok += sum(p == g for p, g in zip(pred, gold))
        n += len(gold)
    assert n > 0
    # honest gate for ~25 training sentences: unseen-word errors dominate;
    # accuracy scales with supervision size (the production path trains on
    # the full corpus distribution — see the Spark agreement test below)
    assert ok / n >= 0.70, f"held-out accuracy {ok/n:.3f}"


def test_training_is_deterministic():
    c = _corpus()
    a = AveragedPerceptronTagger()
    a.train(c, epochs=3)
    b = AveragedPerceptronTagger()
    b.train(c, epochs=3)
    assert a.to_broadcastable() == b.to_broadcastable()


def test_broadcast_inference_on_spark(spark):
    from corenlp_spark.operators.tag import tag_docs
    from corenlp_spark.operators.tokenize import tokenize_docs

    m = AveragedPerceptronTagger()
    m.train(_corpus(), epochs=8)
    ann = tag_docs(tokenize_docs(synth_docs(spark, 20)))
    out = tag_with_model(ann, m.to_broadcastable())
    rows = out.collect()
    n = agree = 0
    for r in rows:
        for t in r["tokens"]:
            n += 1
            agree += t["ppos"] == t["pos"]
    assert n > 0 and agree / n >= 0.95, f"model/rule agreement {agree/n:.3f}"
