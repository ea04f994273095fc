"""Entity-mention chunking: contiguous same-NER token runs → mention spans.

Behavioral reference: ``pipeline/EntityMentionsAnnotator.java:257-352`` via
``pipeline/LabeledChunkIdentifier.java`` (BIO-style run chunking).

Two implementations with identical semantics (tests assert equality):

  - ``mention_rows`` (DEFAULT): chunk inside the same Arrow pass that holds
    the tokens — narrow, ZERO shuffle. Chunking is doc-local, so exploding
    every token and windowing over (doc_id, sent) would be the largest
    shuffle in the system at 100 TB for no reason (VERDICT r1 #5).
  - ``mention_rows_sql``: the pure-SQL window variant (posexplode + lag →
    run ids → groupBy), kept as the engine-independent oracle twin — DuckDB
    replays the same algebra over materialized annotations
    (``kg_mentions_oracle`` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MENTIONS_SCHEMA = ("doc_id string, sent_idx int, ner string, start_tok int, "
                   "end_tok int, nner string, text string")


def chunk_mentions(tokens) -> list[dict]:
    """LabeledChunkIdentifier over one doc's token list (pure function,
    shared by the fused batch path and the streaming path)."""
    out: list[dict] = []
    i, n = 0, len(tokens)
    while i < n:
        t = tokens[i]
        ner = t["ner"]
        if ner not in ("O", "", None):
            j = i
            while j < n and tokens[j]["ner"] == ner \
                    and tokens[j]["sent"] == t["sent"]:
                j += 1
            out.append({
                "sent_idx": t["sent"],
                "ner": ner,
                "start_tok": t["idx"],
                "end_tok": tokens[j - 1]["idx"] + 1,
                "nner": max((tokens[k]["nner"] or "") for k in range(i, j)),
                "text": " ".join(tokens[k]["word"] for k in range(i, j)),
            })
            i = j
        else:
            i += 1
    return out


def mention_rows(df: DataFrame) -> DataFrame:
    """docs(doc_id, tokens, ...) → mentions(doc_id, sent_idx, ner, start_tok,
    end_tok, nner, text) — chunked in-pass, zero shuffle."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sent_idx", "ner", "start_tok",
                                    "end_tok", "nner", "text")}
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                for m in chunk_mentions(list(toks)):
                    rows["doc_id"].append(doc_id)
                    for k, v in m.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=MENTIONS_SCHEMA)


def mention_rows_sql(df: DataFrame) -> DataFrame:
    """SQL-window twin of ``mention_rows`` (oracle/verification path)."""
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
