"""Structured Streaming surface: incremental KG construction.

The reference is batch-only (plus an HTTP server, SURVEY.md §1.3); this
engine adds the streaming path a 10^12-doc ingest actually needs: new doc
files land → the same narrow annotation transforms run incrementally →
triples append to the sink; watermarked windowed aggregation gives the
per-window extraction metrics. Every annotation stage is reused verbatim —
they are pure DataFrame transforms, so they bind to ``readStream`` unchanged
(the whole point of keeping stages narrow and declarative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corenlp_spark.data.synth import DOCS_SCHEMA
from corenlp_spark.plans.pipeline import annotate, triples_of


def stream_docs(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_triples(docs_stream: DataFrame) -> DataFrame:
    """Incremental triples: the same narrow stages, no watermark needed
    (stateless per-doc transforms)."""
    return triples_of(annotate(docs_stream, upto="coref"))


def run_stream_to_memory(spark: SparkSession, in_path: str, name: str = "triples_stream"):
    q = (
        stream_triples(stream_docs(spark, in_path))
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    return q


def windowed_event_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked windowed aggregation over the events table (late-data
    handling demo; the pattern used for per-window extraction metrics)."""
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )
