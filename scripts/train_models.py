"""Train the POS averaged-perceptron and NER structured-perceptron on the
deterministic template corpora, evaluate on held-out vocabulary, and write
the weights the engine ships (corenlp_spark/models/weights/*.json.gz).

Deterministic end to end: same corpus → same iteration order → identical
weights on every run (the committed files are reproducible artifacts, the
analog of the reference's model files at ``pipeline/DefaultPaths.java``).

Run: python scripts/train_models.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from corenlp_spark.data.kbp_corpus import lr_training_rows  # noqa: E402
from corenlp_spark.data.train_corpus import (  # noqa: E402
    ner_corpus, ner_heldout, pos_corpus, pos_heldout,
)
from corenlp_spark.models.perceptron import (  # noqa: E402
    AveragedPerceptronTagger, RelationClassifier, StructuredPerceptronNER,
    save_weights,
)


def bio_spans(labels: list[str]) -> set[tuple[int, int, str]]:
    spans = set()
    start, typ = None, None
    for i, lab in enumerate(labels + ["O"]):
        if lab.startswith("B-"):
            if start is not None:
                spans.add((start, i, typ))
            start, typ = i, lab[2:]
        elif lab.startswith("I-") and typ == lab[2:]:
            continue
        else:
            if start is not None:
                spans.add((start, i, typ))
            start, typ = None, None
    return spans


def main():
    t0 = time.time()
    # ---- POS ------------------------------------------------------------
    corpus = pos_corpus()
    print(f"POS corpus: {len(corpus)} sentences, "
          f"{sum(len(w) for w, _ in corpus)} tokens")
    tagger = AveragedPerceptronTagger()
    tagger.train(corpus, epochs=8)
    held = pos_heldout()
    right = total = 0
    errs = []
    for words, gold in held:
        pred = tagger.predict(words)
        for w, p, g in zip(words, pred, gold):
            total += 1
            if p == g:
                right += 1
            elif len(errs) < 15:
                errs.append((w, g, p))
    acc = right / max(total, 1)
    print(f"POS held-out accuracy: {acc:.4f} ({right}/{total}) "
          f"on {len(held)} unseen-vocabulary sentences")
    if errs:
        print("  sample errors (word, gold, pred):", errs)
    # gate BEFORE save: a regressed model must never overwrite shipped weights
    assert acc >= 0.90, f"POS held-out accuracy {acc} < 0.90"
    save_weights("pos", tagger.to_broadcastable())

    # ---- NER ------------------------------------------------------------
    ncorpus = ner_corpus()
    print(f"NER corpus: {len(ncorpus)} sentences")
    ner = StructuredPerceptronNER()
    ner.train(ncorpus, epochs=6)
    nheld = ner_heldout()
    tp = fp = fn = 0
    nerrs = []
    for words, pos, gold in nheld:
        pred = ner.decode(words, pos)
        gs, ps = bio_spans(gold), bio_spans(pred)
        tp += len(gs & ps)
        fp += len(ps - gs)
        fn += len(gs - ps)
        if (gs != ps) and len(nerrs) < 6:
            nerrs.append((" ".join(words), sorted(gs), sorted(ps)))
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    print(f"NER held-out (unseen names): P={prec:.4f} R={rec:.4f} F1={f1:.4f} "
          f"on {len(nheld)} sentences")
    for e in nerrs:
        print("  miss:", e)
    assert f1 >= 0.90, f"NER held-out F1 {f1} < 0.90"
    save_weights("ner", ner.to_broadcastable())

    # ---- arc-standard parser (distilled from the clause parser) ---------
    from corenlp_spark.models.parser import ArcStandardParser
    from corenlp_spark.operators.depparse import parse_sentence
    from corenlp_spark.operators.tag import lemmatize

    trees = []
    for words, tags in corpus[:3000]:
        lem = [lemmatize(w, t) for w, t in zip(words, tags)]
        edges = parse_sentence(words, tags, lem, ["O"] * len(words))
        trees.append((words, tags, edges))
    split = int(len(trees) * 0.9)
    ap = ArcStandardParser()
    ap.train(trees[:split], epochs=6)
    # UAS agreement with the teacher parser on held-out trees
    good = total_arcs = 0
    for words, tags, gold_edges in trees[split:]:
        gold = {d: h for h, d, r in gold_edges}
        pred = {d: h for h, d, r in ap.parse(words, tags)}
        for d, h in gold.items():
            total_arcs += 1
            good += pred.get(d) == h
    uas = good / max(total_arcs, 1)
    print(f"arc-standard parser held-out UAS vs teacher: {uas:.4f} "
          f"({len(trees[:split])} training trees)")
    assert uas >= 0.85, f"parser UAS {uas} < 0.85"
    save_weights("parser", ap.to_broadcastable())

    # ---- KBP statistical arm --------------------------------------------
    rows = lr_training_rows()
    rc = RelationClassifier()
    rc.train(rows, epochs=10)
    right = total = 0
    for lemmas, sner, oner, gold in rows:
        pred, _ = rc.predict(lemmas, sner, oner)
        right += pred == gold
        total += 1
    acc_k = right / max(total, 1)
    print(f"KBP classifier training-set accuracy: {acc_k:.4f} "
          f"({len(rc.classes)} classes incl. NONE)")
    assert acc_k >= 0.95, f"KBP classifier accuracy {acc_k} < 0.95"
    save_weights("kbp", rc.to_broadcastable())
    print(f"trained + saved in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
