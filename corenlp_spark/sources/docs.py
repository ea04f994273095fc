"""Document sources.

  - ``docs_from_documents``: adapt a plain text table (doc_id, text) — e.g.
    ``/root/testdata/sf*/documents.parquet`` — into the engine's interleaved
    span shape (one text span per doc). The analog of raw-text ingest
    (``pipeline/StanfordCoreNLP.java:791``).
  - ``read_docs``: parquet/Iceberg reader for already-shaped span tables,
    with the doc_id range partitioning applied at ingest (north rule).

Iceberg note: ``write_table``/``read_table`` use the Iceberg catalog when
``spark.sql.catalog.*`` is configured (jars on the classpath); otherwise they
fall back to parquet paths with identical semantics for this engine
(snapshot-per-stage checkpointing is directory-per-stage in the fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet(doc_id, text, …) → (doc_id, spans) interleaved shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(span).alias("spans"),
    )


def read_docs(spark: SparkSession, path: str, partitions: int | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if partitions:
        df = df.repartition(partitions, "doc_id")
    return df


def iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None))
    except Exception:
        return False


def write_table(df: DataFrame, spark: SparkSession, name_or_path: str) -> None:
    """Iceberg table when a catalog is configured; parquet path otherwise."""
    if iceberg_available(spark) and "/" not in name_or_path:
        df.writeTo(name_or_path).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(name_or_path)
