"""Batched decoders must equal their per-sentence twins exactly.

Round 4 moved the three model kernels (arc-standard parser, POS
perceptron, NER Viterbi) to cross-sentence batched decoding (one numpy
score per step for the whole Arrow batch — SURVEY §2.2 depparse row,
VERDICT r3 #1). These tests pin the bitwise-equality contract: for every
sentence, the batched decode must produce exactly the same output as the
sequential per-sentence path.
"""

from __future__ import annotations

import pytest

from corenlp_spark.data.synth import GOLDEN_SENTENCES, _doc_spans
from corenlp_spark.operators.tag import pos_tag, pos_tag_batch
from corenlp_spark.operators.tokenize import annotate_doc


def _doc_pool():
    pool = [[{"kind": "text", "text": s, "media_ref": None, "offset": 0}]
            for s in GOLDEN_SENTENCES]
    pool += [_doc_spans(f"doc{i:08d}", True) for i in range(120)]
    return pool


@pytest.fixture(scope="module")
def annotated_pool():
    docs = []
    for spans in _doc_pool():
        toks, sents = annotate_doc([s for s in spans if s["kind"] == "text"])
        words = [t["word"] for t in toks]
        starts = {x["start_tok"] for x in sents}
        docs.append((words, starts, sents))
    return docs


def test_pos_batch_equals_sequential(annotated_pool):
    docs = [(w, s) for w, s, _ in annotated_pool]
    seq = [pos_tag(w, s) for w, s in docs]
    assert pos_tag_batch(docs) == seq


def _sentence_segs(annotated_pool):
    segs = []
    for words, starts, sents in annotated_pool:
        tags = pos_tag(words, starts)
        for x in sents:
            a, b = x["start_tok"], x["end_tok"]
            segs.append((words[a:b], tags[a:b]))
    return segs


def test_ner_batch_equals_sequential(annotated_pool):
    from corenlp_spark.operators.ner import tag_ner_batch, tag_sentence_ner

    segs = _sentence_segs(annotated_pool)
    seq = [tag_sentence_ner(w, p) for w, p in segs]
    assert tag_ner_batch(segs) == seq


def test_parse_batch_equals_reference_decode(annotated_pool):
    """parse_batch vs the r3 per-sentence greedy loop, reproduced here
    verbatim from the dict-scored path (models/parser.py history)."""
    from corenlp_spark.models.parser import _features, get_trained_parser

    p = get_trained_parser()
    p._ensure_action_vectors()

    def parse_ref(words, pos):
        n = len(words)
        if n == 0:
            return []
        avec, acts = p._avec, p._acts_desc
        stack, buffer = [], list(range(n))
        head_of, label_of, kids_of = {}, {}, {}
        steps = 0
        while (buffer or len(stack) > 1) and steps < 4 * n + 8:
            steps += 1
            if len(stack) < 2:
                stack.append(buffer.pop(0))
                continue
            feats = _features(stack, buffer, words, pos, head_of, label_of,
                              kids_of)
            sc = p._zero.copy()
            for f in feats:
                arr = avec.get(f)
                if arr is not None:
                    sc += arr
            sc += p._pen_all if buffer else p._pen_arc_only
            act = acts[int(sc.argmax())]
            kind, rel = act.split("|", 1)
            if kind == "S":
                stack.append(buffer.pop(0))
            elif kind == "L":
                d = stack[-2]
                head_of[d] = stack[-1]
                label_of[d] = rel
                kids_of.setdefault(stack[-1], []).append(d)
                stack.pop(-2)
            else:
                d = stack[-1]
                head_of[d] = stack[-2]
                label_of[d] = rel
                kids_of.setdefault(stack[-2], []).append(d)
                stack.pop()
        return p._finalize(words, pos, n, stack, head_of, label_of)

    segs = _sentence_segs(annotated_pool)
    ref = [parse_ref(w, t) for w, t in segs]
    assert p.parse_batch(segs) == ref


def test_annotate_batch_equals_per_doc():
    """The fused batch orchestrator must equal running each doc alone."""
    from corenlp_spark.plans.fused import _annotate_batch

    pool = _doc_pool()[:60]
    batch = _annotate_batch(pool)
    singles = [_annotate_batch([spans])[0] for spans in pool]
    assert batch == singles


def test_parse_batch_flat_state_isolation(annotated_pool):
    """r6 vectorized decode keeps per-token state (child extents, valences,
    arc labels) in flat arrays indexed by per-sentence base offsets — a
    mixed batch must decode every sentence exactly as a singleton batch
    does (catches any cross-sentence offset contamination)."""
    from corenlp_spark.models.parser import get_trained_parser

    p = get_trained_parser()
    segs = _sentence_segs(annotated_pool)
    mixed = p.parse_batch(segs)
    # singleton calls build their own flat arrays from scratch
    singles = [p.parse_batch([s])[0] for s in segs[:150]]
    assert mixed[:150] == singles
    # and a reversed-order batch must not change any result
    rev = p.parse_batch(list(reversed(segs)))
    assert rev == list(reversed(mixed))
