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
from corenlp_spark.operators.depparse import DEPS_TYPE, parse_sentence
from corenlp_spark.operators.ner import NER_TOKENS_TYPE, tag_sentence_ner
from corenlp_spark.operators.openie import TRIPLES_SCHEMA, _Graph, extract_sentence
from corenlp_spark.operators.tag import lemmatize, pos_tag
from corenlp_spark.operators.tokenize import SENTENCES_TYPE, annotate_doc


def _annotate_one(spans) -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """spans → (tokens, sentences, deps, coref) — the whole per-doc pipeline.

    Null-safe: a malformed row (null spans / null span structs) yields empty
    annotations instead of failing the task — one bad record in a 100 TB
    scan must never kill the job."""
    if spans is None:
        return [], [], [], []
    spans = [s for s in spans if s is not None]
    tokens, sentences = annotate_doc(spans)
    words = [t["word"] for t in tokens]
    starts = {s["start_tok"] for s in sentences}
    tags = pos_tag(words, starts)
    for t, tag in zip(tokens, tags):
        t["pos"] = tag
        t["lemma"] = lemmatize(t["word"], tag)
    deps: list[dict] = []
    for s in sentences:
        a, b = s["start_tok"], s["end_tok"]
        seg = tokens[a:b]
        ner, nner = tag_sentence_ner([t["word"] for t in seg], [t["pos"] for t in seg])
        for t, x, y in zip(seg, ner, nner):
            t["ner"], t["nner"] = x, y
        edges = parse_sentence(
            [t["word"] for t in seg], [t["pos"] for t in seg],
            [t["lemma"] for t in seg], ner,
        )
        for h, d, r in edges:
            deps.append({"sent_idx": s["sent_idx"], "head": (h + a) if h >= 0 else -1,
                         "dep": d + a, "rel": r})
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
         "end_tok": m.end, "text": m.text, "head": m.head_idx, "kind": m.kind,
         "representative": best[m.cluster] is m}
        for m in ms
    ]
    return tokens, sentences, deps, coref


def annotate_fused(df: DataFrame) -> DataFrame:
    """docs → + tokens, sentences, deps, coref in one Arrow pass."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += (f", tokens {NER_TOKENS_TYPE}, sentences {SENTENCES_TYPE}, "
                   f"deps {DEPS_TYPE}, coref {COREF_TYPE}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {"tokens": [], "sentences": [], "deps": [], "coref": []}
            for spans in pdf["spans"]:
                tk, se, de, co = _annotate_one(spans)
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
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                tokens, sentences, deps, coref = _annotate_one(spans)
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
