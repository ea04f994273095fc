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

# words that mark a temporal span as deictically resolved (anchored to the
# document creation time): any token of the span matching one of these ⇒
# the whole same-value span gets anchorTimeID="t0"
_DEICTIC = ("yesterday", "today", "tomorrow", "tonight", "now", "ago",
            "last", "next", "this", "coming", "past")


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
        # JSONOutputter emits a timex object {type, value[, mod,
        # anchorTimeID]} on temporal tokens; the engine's |MOD value
        # suffix is split back into the separate TIMEX3 mod attribute,
        # and deictically-resolved DATE/TIME spans (yesterday, last week,
        # two days ago, …) carry anchorTimeID="t0" — the document creation
        # time, as SUTime anchors relative expressions to the DCT
        F.when(
            t["ner"].isin("DATE", "TIME", "DURATION", "SET")
            & t["nner"].isNotNull(),
            F.struct(
                t["ner"].alias("type"),
                F.split(t["nner"], r"\|")[0].alias("value"),
                F.when(F.size(F.split(t["nner"], r"\|")) > 1,
                       F.split(t["nner"], r"\|")[1]).alias("mod"),
                F.when(
                    t["ner"].isin("DATE", "TIME")
                    & F.exists(
                        F.col("tokens"),
                        lambda x: (x["nner"] == t["nner"])
                        & F.lower(x["word"]).isin(*_DEICTIC)),
                    F.lit("t0"),
                ).alias("anchorTimeID"),
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
