"""Additional outputters: CoNLL, TSV, plain text, XML.

Behavioral reference (re-expressed): ``pipeline/CoNLLOutputter.java``
(token-per-line columns IDX WORD LEMMA POS NER, blank line between
sentences), ``pipeline/TextOutputter.java`` (human-readable sentence dump),
``pipeline/XMLOutputter.java`` (document→sentences→tokens XML tree).

All four are pure ``pyspark.sql.functions`` column algebra — JVM-side,
whole-stage-codegen'd, no UDF. Each returns (doc_id, <payload string>) so
``df.write.text``/``csv`` lands the reference's file-per-format shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sent_tokens(s):
    return F.filter("tokens", lambda t: t["sent"] == s["sent_idx"])


def to_conll(annotated: DataFrame,
             columns: list[str] | None = None) -> DataFrame:
    """CoNLL column format (CoNLLOutputter.java): default columns
    idx/word/lemma/pos/ner/headidx/deprel, one token per line, "_" for
    unavailable fields, SENTENCE-LOCAL 1-based ids, blank line after each
    sentence. ``columns`` mirrors the reference's output.columns option
    (e.g. ["word", "pos"])."""
    cols = columns or ["idx", "word", "lemma", "pos", "ner",
                       "headidx", "deprel"]

    def field(t, s, name):
        if name == "idx":
            return (t["idx"] - s["start_tok"] + 1).cast("string")
        if name in ("headidx", "deprel"):
            return F.lit("_")  # carried by the CoNLL-U outputter when parsed
        v = t[name] if name in ("word", "lemma", "pos", "ner") else F.lit(None)
        return F.coalesce(v.cast("string"), F.lit("_"))

    def block(s):
        line = lambda t: F.concat_ws("\t", *[field(t, s, c) for c in cols])
        return F.concat(
            F.array_join(F.transform(_sent_tokens(s), line), "\n"),
            F.lit("\n"))

    doc = F.array_join(F.transform("sentences", block), "\n")
    return annotated.select("doc_id", doc.alias("conll"))


def to_tsv(annotated: DataFrame) -> DataFrame:
    """Flat token TSV (doc_id, sent, idx, word, lemma, pos, ner, nner) —
    one row per token, the shape downstream SQL engines ingest directly."""
    t = F.explode("tokens").alias("t")
    flat = annotated.select("doc_id", t).select(
        "doc_id",
        F.col("t.sent").alias("sent"),
        F.col("t.idx").alias("idx"),
        F.col("t.word").alias("word"),
        F.col("t.lemma").alias("lemma"),
        F.col("t.pos").alias("pos"),
        F.col("t.ner").alias("ner"),
        F.col("t.nner").alias("nner"),
    )
    return flat.withColumn(
        "tsv",
        F.concat_ws("\t", "doc_id", F.col("sent").cast("string"),
                    F.col("idx").cast("string"), "word", "lemma", "pos",
                    "ner", "nner"),
    )


def to_text(annotated: DataFrame) -> DataFrame:
    """Human-readable dump (TextOutputter.java shape): per sentence a header
    plus the token listing ``[Text=word POS=tag NER=tag]``."""
    tok = lambda t: F.concat(
        F.lit("[Text="), t["word"], F.lit(" POS="), t["pos"],
        F.lit(" NER="), t["ner"], F.lit("]"),
    )
    block = lambda s: F.concat(
        F.lit("Sentence #"), (s["sent_idx"] + 1).cast("string"),
        F.lit(" ("), F.size(_sent_tokens(s)).cast("string"),
        F.lit(" tokens):\n"),
        F.array_join(F.transform(_sent_tokens(s), lambda t: t["original"]), " "),
        F.lit("\n"),
        F.array_join(F.transform(_sent_tokens(s), tok), " "),
    )
    doc = F.array_join(F.transform("sentences", block), "\n\n")
    return annotated.select("doc_id", doc.alias("text"))


def _xml_escape(c: Column) -> Column:
    # order matters: & first, then < and >
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def to_xml(annotated: DataFrame) -> DataFrame:
    """XMLOutputter.java shape: <document><sentences><sentence id=..>
    <tokens><token id=..><word/><lemma/><POS/><NER/></token>…"""
    tok = lambda t: F.concat(
        F.lit('<token id="'), (t["idx"] + 1).cast("string"), F.lit('">'),
        F.lit("<word>"), _xml_escape(t["word"]), F.lit("</word>"),
        F.lit("<lemma>"), _xml_escape(t["lemma"]), F.lit("</lemma>"),
        F.lit("<POS>"), t["pos"], F.lit("</POS>"),
        F.lit("<NER>"), t["ner"], F.lit("</NER>"),
        F.lit("</token>"),
    )
    sent = lambda s: F.concat(
        F.lit('<sentence id="'), (s["sent_idx"] + 1).cast("string"),
        F.lit('"><tokens>'),
        F.array_join(F.transform(_sent_tokens(s), tok), ""),
        F.lit("</tokens></sentence>"),
    )
    doc = F.concat(
        F.lit('<document docId="'), _xml_escape(F.col("doc_id")),
        F.lit('"><sentences>'),
        F.array_join(F.transform("sentences", sent), ""),
        F.lit("</sentences></document>"),
    )
    return annotated.select("doc_id", doc.alias("xml"))
