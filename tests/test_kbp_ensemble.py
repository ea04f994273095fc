"""KBP 3-arm ensemble tests (tokensregex/triple + semgrex + statistical)."""

import pandas as pd

from corenlp_spark.data.synth import DOCS_SCHEMA
from corenlp_spark.operators.kbp import (
    kbp_ensemble, kbp_relations, kbp_semgrex_relations,
    kbp_statistical_relations, pattern_table,
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
    arm1 = kbp_relations(triples_of(ann), mention_rows(ann), pattern_table(spark))
    arm2 = kbp_semgrex_relations(ann)
    arm3 = kbp_statistical_relations(ann)
    ens = kbp_ensemble(arm1, arm2, arm3).collect()
    by = {(r.subj, r.obj): r for r in ens}
    r = by[("Barack Obama", "Hawaii")]
    assert r.relation == "per:city_of_birth"
    assert r.confidence == 1.0      # triple-pattern arm outranks the others
    assert r.n_votes >= 2           # multiple arms agreed
