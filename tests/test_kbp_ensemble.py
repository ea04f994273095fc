"""KBP 3-arm ensemble tests (tokensregex/triple + semgrex + statistical)."""

import pandas as pd

from corenlp_spark.data.synth import DOCS_SCHEMA
from corenlp_spark.operators.kbp import (
    kbp_ensemble, kbp_semgrex_relations,
    kbp_statistical_relations, kbp_tokensregex_relations,
)
from corenlp_spark.operators.mentions import mention_rows
from corenlp_spark.plans.fused import annotate_fused
from corenlp_spark.plans.pipeline import triples_of


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [f"d{i}" for i in range(len(texts))],
            "spans": [[{"kind": "text", "text": t, "media_ref": None, "offset": 0}]
                      for t in texts],
        }),
        schema=DOCS_SCHEMA,
    )


TEXTS = [
    "Barack Obama was born in Hawaii.",
    "Chris Manning works for Stanford University.",
    "IBM is headquartered in Armonk.",
    "IBM acquired the startup.",  # obj not ORG mention → stat arm negative
]


def test_semgrex_arm(spark):
    ann = annotate_fused(_docs(spark, TEXTS))
    got = {(r.subj, r.relation, r.obj) for r in kbp_semgrex_relations(ann).collect()}
    assert ("Barack Obama", "per:city_of_birth", "Hawaii") in got
    assert ("Chris Manning", "per:employee_of", "Stanford University") in got
    assert ("IBM", "org:city_of_headquarters", "Armonk") in got


def test_statistical_arm_scores_and_thresholds(spark):
    ann = annotate_fused(_docs(spark, TEXTS))
    rows = kbp_statistical_relations(ann).collect()
    got = {(r.subj, r.relation, r.obj): r.confidence for r in rows}
    assert ("Barack Obama", "per:city_of_birth", "Hawaii") in got
    assert all(0.5 <= c <= 0.85 for c in got.values())
    # negative: "Obama visited Paris" has no birth/employ lemma → no relation
    ann2 = annotate_fused(_docs(spark, ["Obama visited Paris."]))
    assert kbp_statistical_relations(ann2).count() == 0


def test_ensemble_prefers_pattern_arm(spark):
    ann = annotate_fused(_docs(spark, TEXTS))
    arm1 = kbp_tokensregex_relations(ann)
    arm2 = kbp_semgrex_relations(ann)
    arm3 = kbp_statistical_relations(ann)
    ens = kbp_ensemble(arm1, arm2, arm3).collect()
    by = {(r.subj, r.obj): r for r in ens}
    r = by[("Barack Obama", "Hawaii")]
    assert r.relation == "per:city_of_birth"
    assert r.confidence == 1.0      # triple-pattern arm outranks the others
    assert r.n_votes >= 2           # multiple arms agreed


def test_tokensregex_arm_rejects_substring_false_positive(spark):
    """VERDICT r2 #3: the old arm matched trigger strings as SUBSTRINGS of
    the OpenIE predicate gloss, so the per:age trigger 'is' fired inside
    'is worth'. The token-sequence arm (ie/KBPTokensregexExtractor.java
    semantics) requires the literal trigger token adjacent to the typed
    object capture — 'is worth 30 million' is rejected, 'is 34' fires."""
    ann = annotate_fused(_docs(spark, [
        "Anna Keller is worth 30 million dollars.",
        "Anna Keller is 34.",
    ])).cache()
    got = {(r.subj, r.relation, r.obj)
           for r in kbp_tokensregex_relations(ann).collect()}
    assert ("Anna Keller", "per:age", "34") in got
    assert not any(rel == "per:age" and "30" in obj for _, rel, obj in got), got


def test_dep_path_builder():
    """dep_path renders the SentenceAlgorithms.dependencyPathBetween shape:
    up-edges '<-rel-', down-edges '-rel->', lemmas between (r5, VERDICT r4
    #3)."""
    from corenlp_spark.operators.kbp import dep_path, span_head

    # "Anna works for Acme" : works(1) root; Anna(0)<-nsubj; for(2)<-case
    # under Acme(3); Acme(3)<-obl- works
    parent = {0: (1, "nsubj"), 2: (3, "case"), 3: (1, "obl"), 1: (-1, "root")}
    lem = ["Anna", "work", "for", "Acme"]
    assert dep_path(parent, lem, 0, 3) == \
        ["Anna", "<-nsubj-", "work", "-obl->", "Acme"]
    assert dep_path(parent, lem, 3, 0) == \
        ["Acme", "<-obl-", "work", "-nsubj->", "Anna"]
    assert span_head(parent, 0, 1) == 0
    assert span_head(parent, 2, 4) == 3  # governed from outside the span


def test_dep_features_templates():
    """Feature frames after KBPStatisticalExtractor.dependencyFeatures:
    distance bucket, tag/ner-anchored inner path, words/edges/chunks."""
    from corenlp_spark.models.perceptron import RelationClassifier

    dep = {"path": ["Anna", "<-nsubj-", "work", "-obl->", "Acme"],
           "spos": "NNP", "opos": "NNP", "obj_head": "acme"}
    feats = set(RelationClassifier.dep_features(dep, "PERSON", "ORGANIZATION"))
    assert "pdist=<=5" in feats
    assert "deppath_w/tag=NNP<-nsubj-work-obl->NNP" in feats
    assert "deppath_w/ner=PERSON<-nsubj-work-obl->ORGANIZATION" in feats
    assert "deppath_word=work" in feats
    assert "deppath_edge=<-nsubj-work" in feats
    assert "deppath_chunk=Anna<-nsubj-work" in feats
    # regexner-typed object head lemma fires only for those classes
    assert "object_head=acme" not in feats
    feats2 = set(RelationClassifier.dep_features(dep, "PERSON", "RELIGION"))
    assert "object_head=acme" in feats2


def test_statistical_arm_long_range_via_dep_path(spark):
    """A relative clause stretches the surface gap between the mentions —
    the lemma-between features get noisy, but the dependency path stays
    short, which is exactly what the reference's dep-path features buy
    (KBPStatisticalExtractor.java:363-425)."""
    ann = annotate_fused(_docs(spark, [
        "Dana Whitfield , who had recently visited Bruges , works for Atlas Dynamics .",
    ]))
    got = {(r.subj, r.relation, r.obj)
           for r in kbp_statistical_relations(ann).collect()}
    assert ("Dana Whitfield", "per:employee_of", "Atlas Dynamics") in got
