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
]


def pattern_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        KBP_PATTERNS, "pattern string, subj_ner string, obj_ner string, relation string"
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
