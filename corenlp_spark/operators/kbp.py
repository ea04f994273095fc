"""KBP slot-filling relations over entity-mention pairs.

Behavioral reference (re-expressed):
  - relation taxonomy + type signatures ``ie/KBPRelationExtractor.java:114-160``
    (``per:*`` require PERSON subject, ``org:*`` ORGANIZATION subject; object
    NER gated per relation);
  - candidate generation = subject × object mentions within a sentence
    (``pipeline/KBPAnnotator.java:460+``) — realized as the relational
    self-join SURVEY.md §2.4 describes;
  - pattern ensemble (``ie/KBPTokensregexExtractor.java`` /
    ``KBPSemgrexExtractor.java``) — realized by matching the already-extracted
    OpenIE predicates against a broadcast pattern table and taking the
    highest-confidence hit (``ie/KBPEnsembleExtractor.java`` coalesce
    semantics).

Spark shape: triples ⋈ mentions (subject head) ⋈ mentions (object head) with
a broadcast pattern/type-signature table. The mention join keys are
(doc_id, sent_idx) + span containment — an equi-join plus predicate, never a
cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (pred_lemma_pattern, subj_ner, obj_ner, relation) — broadcast pattern table
KBP_PATTERNS: list[tuple[str, str, str, str]] = [
    ("born in", "PERSON", "LOCATION", "per:city_of_birth"),
    ("born in", "PERSON", "DATE", "per:date_of_birth"),
    ("works for", "PERSON", "ORGANIZATION", "per:employee_of"),
    ("worked for", "PERSON", "ORGANIZATION", "per:employee_of"),
    ("works at", "PERSON", "ORGANIZATION", "per:employee_of"),
    ("employee of", "PERSON", "ORGANIZATION", "per:employee_of"),
    ("headquartered in", "ORGANIZATION", "LOCATION", "org:city_of_headquarters"),
    ("located in", "ORGANIZATION", "LOCATION", "org:city_of_headquarters"),
    ("president of", "PERSON", "ORGANIZATION", "per:employee_of"),
    ("president of", "PERSON", "LOCATION", "per:origin"),
    ("acquired", "ORGANIZATION", "ORGANIZATION", "org:subsidiaries"),
    ("founded", "PERSON", "ORGANIZATION", "org:founded_by"),
    ("member of", "PERSON", "ORGANIZATION", "org:top_members_employees"),
    ("spouse of", "PERSON", "PERSON", "per:spouse"),
    ("married", "PERSON", "PERSON", "per:spouse"),
    ("died in", "PERSON", "LOCATION", "per:city_of_death"),
    ("died in", "PERSON", "DATE", "per:date_of_death"),
    ("attended", "PERSON", "ORGANIZATION", "per:schools_attended"),
    ("studied at", "PERSON", "ORGANIZATION", "per:schools_attended"),
    ("graduate of", "PERSON", "ORGANIZATION", "per:schools_attended"),
    ("is graduate of", "PERSON", "ORGANIZATION", "per:schools_attended"),
    ("capital of", "LOCATION", "LOCATION", "org:country_of_headquarters"),
    ("subsidiary of", "ORGANIZATION", "ORGANIZATION", "org:parents"),
    ("parent of", "PERSON", "PERSON", "per:children"),
    ("child of", "PERSON", "PERSON", "per:parents"),
    ("sister of", "PERSON", "PERSON", "per:siblings"),
    ("brother of", "PERSON", "PERSON", "per:siblings"),
    ("citizen of", "PERSON", "LOCATION", "per:origin"),
    ("moved to", "PERSON", "LOCATION", "per:cities_of_residence"),
    ("lives in", "PERSON", "LOCATION", "per:cities_of_residence"),
    ("lived in", "PERSON", "LOCATION", "per:cities_of_residence"),
]


def pattern_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        KBP_PATTERNS, "pattern string, subj_ner string, obj_ner string, relation string"
    )


# semgrex extractor rules: (semgrex, subj capture, obj capture, subj ner,
# obj ner, relation) — the KBPSemgrexExtractor path of the ensemble
KBP_SEMGREX: list[tuple[str, str, str, str, str]] = [
    ("{lemma:bear} >nsubj {ner:PERSON}=s >nmod:in {ner:LOCATION}=o",
     "PERSON", "LOCATION", "per:city_of_birth", "semgrex"),
    ("{lemma:bear} >nsubj {ner:PERSON}=s >nmod:in {ner:DATE}=o",
     "PERSON", "DATE", "per:date_of_birth", "semgrex"),
    ("{lemma:work} >nsubj {ner:PERSON}=s >nmod:for {ner:ORGANIZATION}=o",
     "PERSON", "ORGANIZATION", "per:employee_of", "semgrex"),
    ("{lemma:headquarter} >nsubj {ner:ORGANIZATION}=s >nmod:in {ner:LOCATION}=o",
     "ORGANIZATION", "LOCATION", "org:city_of_headquarters", "semgrex"),
    ("{lemma:acquire} >nsubj {ner:ORGANIZATION}=s >obj {ner:ORGANIZATION}=o",
     "ORGANIZATION", "ORGANIZATION", "org:subsidiaries", "semgrex"),
    ("{lemma:locate} >nsubj {ner:ORGANIZATION}=s >nmod:in {ner:LOCATION}=o",
     "ORGANIZATION", "LOCATION", "org:city_of_headquarters", "semgrex"),
]


def kbp_semgrex_relations(annotated: DataFrame) -> DataFrame:
    """Semgrex-extractor arm of the KBP ensemble: run the broadcast semgrex
    rule set over each sentence's dependency graph (KBPSemgrexExtractor
    semantics, ``ie/KBPSemgrexExtractor.java``). Returns the same shape as
    ``kbp_relations`` with confidence 0.9 (patterns beat the statistical arm,
    lose to tokensregex — KBPEnsembleExtractor priority)."""
    from typing import Iterator

    import pandas as pd

    from corenlp_spark.operators.semgrex import (
        SentenceGraph, compile_semgrex, match_semgrex,
    )

    compiled = [(compile_semgrex(p), rel) for p, _, _, rel, _ in KBP_SEMGREX]
    schema = ("doc_id string, sent_idx int, subj string, relation string, "
              "obj string, confidence double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sent_idx", "subj", "relation",
                                    "obj", "confidence")}
            for doc_id, toks, sents, deps in zip(
                pdf["doc_id"], pdf["tokens"], pdf["sentences"], pdf["deps"]
            ):
                by_sent: dict[int, list] = {}
                for e in deps:
                    by_sent.setdefault(e["sent_idx"], []).append(
                        (e["head"], e["dep"], e["rel"]))
                for s in sents:
                    edges = by_sent.get(s["sent_idx"])
                    if not edges:
                        continue
                    a, b = s["start_tok"], s["end_tok"]
                    g = SentenceGraph([dict(t) for t in toks[a:b]], edges, a)

                    def span_text(head):
                        # expand over contiguous same-NER run around the head
                        ner = toks[head]["ner"]
                        lo = head
                        while lo - 1 >= a and toks[lo - 1]["ner"] == ner:
                            lo -= 1
                        hi = head
                        while hi + 1 < b and toks[hi + 1]["ner"] == ner:
                            hi += 1
                        return " ".join(toks[k]["word"] for k in range(lo, hi + 1))

                    for pat, rel in compiled:
                        for m in match_semgrex(pat, g):
                            if "s" in m and "o" in m:
                                rows["doc_id"].append(doc_id)
                                rows["sent_idx"].append(s["sent_idx"])
                                rows["subj"].append(span_text(m["s"]))
                                rows["relation"].append(rel)
                                rows["obj"].append(span_text(m["o"]))
                                rows["confidence"].append(0.9)
            yield pd.DataFrame(rows)

    return annotated.mapInPandas(run, schema=schema)


# statistical arm: logistic-regression scorer over bag-of-lemma + type
# features (KBPStatisticalExtractor shape, ``ie/KBPStatisticalExtractor.java:
# 190-664``). Weights are a broadcast dict; deterministic hand-set values
# stand in for trained ones (the stage contract — featurize → dot → sigmoid
# → threshold — is the real thing; a trained table drops in unchanged).
LR_WEIGHTS: dict[tuple[str, str], dict[str, float]] = {
    ("PERSON", "LOCATION"): {
        "bear": 2.2, "in": 0.4, "bias": -2.5, "_rel": "per:city_of_birth"},
    ("PERSON", "ORGANIZATION"): {
        "work": 2.0, "for": 0.6, "employee": 1.5, "bias": -2.4,
        "_rel": "per:employee_of"},
    ("ORGANIZATION", "LOCATION"): {
        "headquarter": 2.5, "locate": 2.0, "in": 0.4, "bias": -2.6,
        "_rel": "org:city_of_headquarters"},
    ("ORGANIZATION", "ORGANIZATION"): {
        "acquire": 2.3, "buy": 2.0, "bias": -2.5, "_rel": "org:subsidiaries"},
}


def kbp_statistical_relations(annotated: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LR arm: score each within-sentence mention pair by sigmoid(w·f) where
    f = lemma counts between/around the pair; emit above-threshold relations
    with the sigmoid as confidence (capped at 0.85 — the ensemble prefers
    pattern arms, KBPEnsembleExtractor priority)."""
    import math
    from typing import Iterator

    import pandas as pd

    schema = ("doc_id string, sent_idx int, subj string, relation string, "
              "obj string, confidence double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sent_idx", "subj", "relation",
                                    "obj", "confidence")}
            for doc_id, toks, sents in zip(pdf["doc_id"], pdf["tokens"], pdf["sentences"]):
                for s in sents:
                    a, b = s["start_tok"], s["end_tok"]
                    seg = [dict(t) for t in toks[a:b]]
                    # mention runs inside the sentence
                    runs = []
                    i = 0
                    while i < len(seg):
                        ner = seg[i]["ner"]
                        if ner not in ("O", "", "NUMBER", "ORDINAL", "MONEY",
                                       "TIME", "DURATION"):
                            j = i
                            while j < len(seg) and seg[j]["ner"] == ner:
                                j += 1
                            runs.append((i, j, ner))
                            i = j
                        else:
                            i += 1
                    lemmas = [t["lemma"] for t in seg]
                    for si, (s0, s1, sner) in enumerate(runs):
                        for oi, (o0, o1, oner) in enumerate(runs):
                            if si == oi:
                                continue
                            w = LR_WEIGHTS.get((sner, oner))
                            if not w:
                                continue
                            z = w.get("bias", 0.0)
                            for lem in lemmas:
                                z += w.get(lem, 0.0)
                            p = 1.0 / (1.0 + math.exp(-z))
                            if p >= threshold:
                                rows["doc_id"].append(doc_id)
                                rows["sent_idx"].append(s["sent_idx"])
                                rows["subj"].append(" ".join(t["word"] for t in seg[s0:s1]))
                                rows["relation"].append(w["_rel"])
                                rows["obj"].append(" ".join(t["word"] for t in seg[o0:o1]))
                                rows["confidence"].append(min(round(p, 4), 0.85))
            yield pd.DataFrame(rows)

    return annotated.mapInPandas(run, schema=schema)


def kbp_ensemble(*arms: DataFrame) -> DataFrame:
    """Ensemble vote: per (doc, sent, subj, obj) keep the highest-confidence
    relation across arms (KBPEnsembleExtractor coalesce semantics; arm
    priority is encoded in confidence ranges: tokensregex/triple 1.0 >
    semgrex 0.9 > statistical ≤0.85)."""
    cols = ["doc_id", "sent_idx", "subj", "relation", "obj", "confidence"]
    both = arms[0].select(*cols)
    for arm in arms[1:]:
        both = both.unionByName(arm.select(*cols))
    return (
        both.groupBy("doc_id", "sent_idx", "subj", "obj")
        .agg(F.max(F.struct("confidence", "relation")).alias("best"),
             F.count("*").alias("n_votes"))
        .select("doc_id", "sent_idx", "subj",
                F.col("best.relation").alias("relation"), "obj",
                F.col("best.confidence").alias("confidence"), "n_votes")
    )


def kbp_relations(triples: DataFrame, mentions: DataFrame, patterns: DataFrame) -> DataFrame:
    """triples + mentions → (doc_id, sent_idx, subj, relation, obj, confidence).

    Join discipline: mentions are joined twice on (doc_id, sent_idx) with
    span-containment on the triple's subj/obj head tokens; the pattern/type
    table is broadcast. Everything stays as one equi-join pipeline Catalyst
    can reorder; AQE handles any residual skew.
    """
    sm = mentions.select(
        F.col("doc_id").alias("s_doc"), F.col("sent_idx").alias("s_sent"),
        F.col("start_tok").alias("s_start"), F.col("end_tok").alias("s_end"),
        F.col("ner").alias("subj_ner"), F.col("text").alias("subj_text"),
    )
    om = mentions.select(
        F.col("doc_id").alias("o_doc"), F.col("sent_idx").alias("o_sent"),
        F.col("start_tok").alias("o_start"), F.col("end_tok").alias("o_end"),
        F.col("ner").alias("obj_ner"), F.col("text").alias("obj_text"),
    )
    cand = (
        triples.join(
            sm,
            (triples.doc_id == sm.s_doc) & (triples.sent_idx == sm.s_sent)
            & (triples.subj_head >= sm.s_start) & (triples.subj_head < sm.s_end),
        )
        .join(
            om,
            (triples.doc_id == om.o_doc) & (triples.sent_idx == om.o_sent)
            & (triples.obj_head >= om.o_start) & (triples.obj_head < om.o_end),
        )
    )
    # ensemble: first (highest-priority) pattern whose lemma string is
    # contained in the OpenIE predicate and whose type signature matches
    pat = patterns.select(
        F.col("pattern"), F.col("relation"),
        F.col("subj_ner").alias("p_subj_ner"), F.col("obj_ner").alias("p_obj_ner"),
    )
    hit = cand.join(
        F.broadcast(pat),
        F.col("pred").contains(F.col("pattern"))
        & (F.col("subj_ner") == F.col("p_subj_ner"))
        & (F.col("obj_ner") == F.col("p_obj_ner")),
        "inner",
    )
    return (
        hit.groupBy("doc_id", "sent_idx", "subj_text", "relation", "obj_text")
        .agg(F.max("confidence").alias("confidence"))
        .withColumnRenamed("subj_text", "subj")
        .withColumnRenamed("obj_text", "obj")
    )
