"""Structured Streaming tests: incremental KG triples, windowed event aggs."""

from pyspark.sql import functions as F

from corenlp_spark.data.synth import synth_docs
from corenlp_spark.streaming.stream import (
    run_stream_to_memory, windowed_event_counts,
)


def test_incremental_triples(spark, tmp_path):
    path = str(tmp_path / "docs")
    synth_docs(spark, 40).write.mode("overwrite").parquet(path)
    q = run_stream_to_memory(spark, path, name="t_inc")
    q.awaitTermination(180)
    n1 = spark.sql("select count(*) from t_inc").first()[0]
    assert n1 > 0
    # late-arriving batch: new files are picked up incrementally
    synth_docs(spark, 20).selectExpr("concat(doc_id, '-b2') as doc_id", "spans") \
        .write.mode("append").parquet(path)
    q2 = run_stream_to_memory(spark, path, name="t_inc2")
    q2.awaitTermination(180)
    n2 = spark.sql("select count(*) from t_inc2").first()[0]
    assert n2 > n1


def test_windowed_event_counts(spark, tmp_path):
    # streaming file sources require a directory — stage the single file
    import shutil

    d = tmp_path / "events"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    agg = windowed_event_counts(spark, str(d))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("ev_win").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from ev_win").collect()
    assert rows
    # matches the batch equivalent
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .count()
    )
    assert len(rows) == batch.count()
