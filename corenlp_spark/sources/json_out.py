"""JSON outputter: annotated docs → CoreNLP-JSON-shaped documents.

Behavioral reference (re-expressed): ``pipeline/JSONOutputter.java`` —
document JSON with ``sentences[] → {index, tokens[] → {index, word,
originalText, characterOffsetBegin/End, pos, lemma, ner, normalizedNER,
timex{type,value} on temporal tokens},
basicDependencies[]}`` plus doc-level ``corefs``.

Pure column algebra: the nested structure is built with ``F.struct`` /
``F.transform`` / ``F.filter`` and serialized by ``F.to_json`` — JVM-side,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_corenlp_json(annotated: DataFrame) -> DataFrame:
    """(doc_id, tokens, sentences, deps, [coref]) → (doc_id, json)."""
    tok_json = lambda t: F.struct(
        t["idx"].alias("index"),
        t["word"].alias("word"),
        t["original"].alias("originalText"),
        t["begin"].alias("characterOffsetBegin"),
        t["end"].alias("characterOffsetEnd"),
        t["pos"].alias("pos"),
        t["lemma"].alias("lemma"),
        t["ner"].alias("ner"),
        t["nner"].alias("normalizedNER"),
        # JSONOutputter emits a timex object {type, value} on temporal
        # tokens; |MOD suffix stripped to the clean TIMEX3 value
        F.when(
            t["ner"].isin("DATE", "TIME", "DURATION", "SET")
            & t["nner"].isNotNull(),
            F.struct(
                t["ner"].alias("type"),
                F.split(t["nner"], r"\|")[0].alias("value"),
            ),
        ).alias("timex"),
    )
    sent_json = lambda s: F.struct(
        s["sent_idx"].alias("index"),
        F.transform(
            F.filter("tokens", lambda t: t["sent"] == s["sent_idx"]),
            tok_json,
        ).alias("tokens"),
        F.transform(
            F.filter("deps", lambda e: e["sent_idx"] == s["sent_idx"]),
            lambda e: F.struct(
                e["rel"].alias("dep"),
                e["head"].alias("governor"),
                e["dep"].alias("dependent"),
            ),
        ).alias("basicDependencies"),
    )
    doc = F.struct(
        F.col("doc_id").alias("docId"),
        F.transform("sentences", sent_json).alias("sentences"),
        *([
            F.transform(
                "coref",
                lambda m: F.struct(
                    m["cluster_id"].alias("clusterId"),
                    m["sent_idx"].alias("sentNum"),
                    m["start_tok"].alias("startIndex"),
                    m["end_tok"].alias("endIndex"),
                    m["text"].alias("text"),
                    m["representative"].alias("isRepresentativeMention"),
                ),
            ).alias("corefs")
        ] if "coref" in annotated.columns else []),
    )
    return annotated.select("doc_id", F.to_json(doc).alias("json"))
