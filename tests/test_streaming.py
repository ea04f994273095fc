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


def test_stateful_entity_counts(spark, tmp_path):
    from corenlp_spark.streaming.stream import (
        stream_docs, streaming_entity_counts,
    )

    path = str(tmp_path / "docs")
    synth_docs(spark, 30).write.mode("overwrite").parquet(path)
    q = (streaming_entity_counts(stream_docs(spark, path, max_files=2))
         .writeStream.outputMode("update").format("memory").queryName("t_state")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql(
        "select * from t_state where surface='obama' order by total_mentions"
    ).collect()
    assert rows and rows[-1].ner == "PERSON"
    # state accumulates monotonically across micro-batches
    totals = [r.total_mentions for r in rows]
    assert totals == sorted(totals) and totals[-1] >= totals[0]


def test_ivf_ann_full_recall_on_clustered_vectors(spark):
    from corenlp_spark.functions.similarity import ivf_ann_pairs, pairwise_topk

    emb = spark.createDataFrame(
        [(i, [1.0 if j == i % 4 else 0.05 for j in range(16)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    exact = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
             for r in pairwise_topk(emb, k=1).filter("score >= 0.9").collect()}
    ivf = {(r.id_a, r.id_b) for r in ivf_ann_pairs(emb, dim=16, threshold=0.9).collect()}
    assert exact <= ivf  # identical-direction vectors always share a cell


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
