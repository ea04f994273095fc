"""Entity-mention chunking: contiguous same-NER token runs → mention spans.

Behavioral reference: ``pipeline/EntityMentionsAnnotator.java:257-352`` via
``pipeline/LabeledChunkIdentifier.java`` (BIO-style run chunking).

Pure Spark SQL — **no UDF**: posexplode the token array, mark change points
with ``lag`` over a (doc_id, sent) window, turn them into run ids with a
running ``sum``, and group each run into one mention row. Catalyst handles
the whole stage JVM-side (whole-stage codegen); the only exchange is the
window/groupBy shuffle on (doc_id), which at cluster scale is co-partitioned
with the ingest partitioning so AQE coalesces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mention_rows(df: DataFrame) -> DataFrame:
    """docs(doc_id, tokens, ...) → mentions(doc_id, sent_idx, start_tok,
    end_tok, text, ner, nner)."""
    tok = (
        df.select("doc_id", F.posexplode("tokens").alias("p", "t"))
        .select(
            "doc_id",
            F.col("t.idx").alias("idx"),
            F.col("t.sent").alias("sent_idx"),
            F.col("t.word").alias("word"),
            F.col("t.ner").alias("ner"),
            F.col("t.nner").alias("nner"),
        )
    )
    w = Window.partitionBy("doc_id", "sent_idx").orderBy("idx")
    runs = (
        tok.withColumn("prev_ner", F.lag("ner").over(w))
        .withColumn(
            "chg",
            (F.col("prev_ner").isNull() | (F.col("prev_ner") != F.col("ner"))).cast("int"),
        )
        .withColumn("run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        runs.filter(F.col("ner") != "O")
        .groupBy("doc_id", "sent_idx", "run_id", "ner")
        .agg(
            F.min("idx").alias("start_tok"),
            (F.max("idx") + 1).alias("end_tok"),
            # collect_list has no intra-group order guarantee → sort by idx
            F.array_sort(F.collect_list(F.struct("idx", "word"))).alias("_ws"),
            F.max("nner").alias("nner"),
        )
        .withColumn("text", F.concat_ws(" ", F.transform("_ws", lambda s: s["word"])))
        .drop("run_id", "_ws")
    )
