"""Fused single-pass pipeline must equal the staged pipeline exactly."""

from pyspark.sql import functions as F

from corenlp_spark.data.synth import synth_docs
from corenlp_spark.operators.graph import (
    canonicalize_triples, coref_chains_rows,
)
from corenlp_spark.plans.fused import annotate_fused, extract_triples_fused
from corenlp_spark.plans.pipeline import annotate, triples_of


def _keys(df):
    return {
        r[0]
        for r in df.select(
            F.concat_ws("|", "doc_id", F.col("sent_idx").cast("string"),
                        F.lower("subj"), F.lower("pred"), F.lower("obj"))
        ).collect()
    }


def test_fused_triples_equal_staged(spark):
    docs = synth_docs(spark, 100)
    ann = annotate(docs, upto="coref")
    staged = canonicalize_triples(triples_of(ann), coref_chains_rows(ann))
    fused = extract_triples_fused(docs)
    assert _keys(staged) == _keys(fused)


def test_fused_annotate_equal_staged(spark):
    docs = synth_docs(spark, 60)
    a = annotate(docs, upto="coref").select(
        "doc_id", F.sha2(F.to_json(F.struct("tokens", "sentences", "deps", "coref")), 256).alias("h")
    )
    b = annotate_fused(docs).select(
        "doc_id", F.sha2(F.to_json(F.struct("tokens", "sentences", "deps", "coref")), 256).alias("h")
    )
    assert a.alias("a").join(b.alias("b"), "doc_id").filter("a.h <> b.h").count() == 0


def test_fused_is_single_narrow_stage(spark):
    plan = extract_triples_fused(synth_docs(spark, 5))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # exactly one annotation crossing (+1 for the synth generator itself)
    assert plan.count("MapInPandas") == 2
