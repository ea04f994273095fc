"""Fused single-pass annotation: all per-doc kernels in ONE ``mapInPandas``.

The staged path (plans/pipeline.py) serializes fat nested token/dep columns
through Arrow between every stage — correct, checkpointable, but 5 transfers.
This path composes the same pure-Python kernels in-process and crosses Arrow
exactly once per batch, emitting either the fully-annotated doc row or the
small triples rows directly. This is the trick the reference plays with its
single mutable Annotation tree (``pipeline/AnnotationPipeline.java:66-83``) —
re-expressed as operator fusion inside one narrow Spark stage, which is what
whole-stage codegen does for JVM operators and we do manually for the Python
kernels.

Identical results to the staged path by construction (same kernels, same
order); tests assert equality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from corenlp_spark.operators.coref import COREF_TYPE, detect_mentions, run_sieves
from corenlp_spark.operators.depparse import DEPS_TYPE
from corenlp_spark.operators.ner import NER_TOKENS_TYPE, tag_ner_batch
from corenlp_spark.operators.openie import TRIPLES_SCHEMA, _Graph, extract_sentence
from corenlp_spark.operators.tag import lemmatize, pos_tag_batch
from corenlp_spark.operators.tokenize import SENTENCES_TYPE, annotate_doc


def _annotate_batch(spans_list) -> list[tuple[list[dict], list[dict],
                                              list[dict], list[dict]]]:
    """Many docs → [(tokens, sentences, deps, coref)] with the three model
    kernels (POS, NER, depparse) BATCHED ACROSS ALL DOCS of the Arrow batch
    — one numpy score per decoding step for the whole batch instead of one
    per sentence (VERDICT r3 #1; SURVEY §2.2 depparse row). Results are
    identical to the per-doc path by construction (the batch decoders are
    bitwise-equal to their per-sentence twins).

    Null-safe: a malformed row (null spans / null span structs) yields empty
    annotations instead of failing the task — one bad record in a 100 TB
    scan must never kill the job."""
    from corenlp_spark.models.parser import get_trained_parser

    n_docs = len(spans_list)
    toks_sents: list[tuple[list[dict], list[dict]]] = []
    for spans in spans_list:
        if spans is None:
            toks_sents.append(([], []))
            continue
        spans = [s for s in spans if s is not None]
        toks_sents.append(annotate_doc(spans))

    # POS for all docs in one batch, then lemmas (dict lookups, per token)
    tag_lists = pos_tag_batch([
        ([t["word"] for t in tokens], {s["start_tok"] for s in sentences})
        for tokens, sentences in toks_sents
    ])
    for (tokens, _), tags in zip(toks_sents, tag_lists):
        for t, tag in zip(tokens, tags):
            t["pos"] = tag
            t["lemma"] = lemmatize(t["word"], tag)

    # sentence segments across the whole batch → batched NER, batched parse
    segs: list[tuple[int, dict, int, int]] = []
    for di, (tokens, sentences) in enumerate(toks_sents):
        for s in sentences:
            segs.append((di, s, s["start_tok"], s["end_tok"]))
    seg_words = []
    seg_pos = []
    for di, s, a, b in segs:
        seg = toks_sents[di][0][a:b]
        seg_words.append([t["word"] for t in seg])
        seg_pos.append([t["pos"] for t in seg])
    ner_out = tag_ner_batch(list(zip(seg_words, seg_pos)))
    for (di, s, a, b), (ner, nner) in zip(segs, ner_out):
        for t, x, y in zip(toks_sents[di][0][a:b], ner, nner):
            t["ner"], t["nner"] = x, y
    parses = get_trained_parser().parse_batch(list(zip(seg_words, seg_pos)))

    deps_by_doc: list[list[dict]] = [[] for _ in range(n_docs)]
    for (di, s, a, b), edges in zip(segs, parses):
        dd = deps_by_doc[di]
        si = s["sent_idx"]
        for h, d, r in edges:
            dd.append({"sent_idx": si, "head": (h + a) if h >= 0 else -1,
                       "dep": d + a, "rel": r})

    out = []
    for di, (tokens, sentences) in enumerate(toks_sents):
        ms = detect_mentions(tokens, sentences)
        run_sieves(ms, tokens)
        best = {}
        for m in ms:
            cur = best.get(m.cluster)
            rank = (m.kind != "pronoun", len(m.text))
            if cur is None or rank > (cur.kind != "pronoun", len(cur.text)):
                best[m.cluster] = m
        coref = [
            {"cluster_id": m.cluster, "sent_idx": m.sent, "start_tok": m.start,
             "end_tok": m.end, "text": m.text, "head": m.head_idx,
             "kind": m.kind, "representative": best[m.cluster] is m}
            for m in ms
        ]
        out.append((tokens, sentences, deps_by_doc[di], coref))
    return out


def _annotate_one(spans) -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """spans → (tokens, sentences, deps, coref) — single-doc view of
    _annotate_batch (kept for the staged path and tests)."""
    return _annotate_batch([spans])[0]


def annotate_fused(df: DataFrame) -> DataFrame:
    """docs → + tokens, sentences, deps, coref in one Arrow pass."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += (f", tokens {NER_TOKENS_TYPE}, sentences {SENTENCES_TYPE}, "
                   f"deps {DEPS_TYPE}, coref {COREF_TYPE}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"tokens": [], "sentences": [], "deps": [], "coref": []}
            for tk, se, de, co in _annotate_batch(list(pdf["spans"])):
                cols["tokens"].append(tk)
                cols["sentences"].append(se)
                cols["deps"].append(de)
                cols["coref"].append(co)
            pdf = pdf.copy()
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_triples_fused(df: DataFrame, canonicalize: bool = True) -> DataFrame:
    """docs → triples in ONE pass: no nested columns ever cross Arrow.

    Includes in-process pronoun canonicalization (the coref-representative
    rewrite of ``naturalli/OpenIE.java:393-437``) so the output equals the
    staged canonicalize_triples(openie, coref) join, minus the shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sent_idx", "subj", "pred", "obj",
                                    "confidence", "subj_head", "obj_head")}
            ann = _annotate_batch(list(pdf["spans"]))
            for doc_id, (tokens, sentences, deps, coref) in zip(
                    pdf["doc_id"], ann):
                by_sent: dict[int, list] = {}
                for e in deps:
                    by_sent.setdefault(e["sent_idx"], []).append(
                        (e["head"], e["dep"], e["rel"]))
                # pronoun → representative text map (doc-local)
                rep_of: dict[int, str] = {}
                if canonicalize:
                    reps = {m["cluster_id"]: m["text"] for m in coref
                            if m["representative"] and m["kind"] != "pronoun"}
                    for m in coref:
                        if m["kind"] == "pronoun" and m["cluster_id"] in reps:
                            for t in range(m["start_tok"], m["end_tok"]):
                                rep_of[t] = reps[m["cluster_id"]]
                for s in sentences:
                    edges = by_sent.get(s["sent_idx"], [])
                    if not edges:
                        continue
                    a, b = s["start_tok"], s["end_tok"]
                    seg = tokens[a:b]
                    g = _Graph([t["word"] for t in seg],
                               [t["lemma"] for t in seg], edges, a,
                               [t["pos"] for t in seg])
                    best: dict[tuple, tuple] = {}
                    for subj, pred, obj, conf, sh, oh in extract_sentence(g):
                        subj = rep_of.get(sh, subj)
                        key = (subj.lower(), pred.lower(), obj.lower())
                        if key not in best or best[key][3] < conf:
                            best[key] = (subj, pred, obj, conf, sh, oh)
                    for subj, pred, obj, conf, sh, oh in best.values():
                        rows["doc_id"].append(doc_id)
                        rows["sent_idx"].append(s["sent_idx"])
                        rows["subj"].append(subj)
                        rows["pred"].append(pred)
                        rows["obj"].append(obj)
                        rows["confidence"].append(conf)
                        rows["subj_head"].append(sh)
                        rows["obj_head"].append(oh)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=TRIPLES_SCHEMA)
