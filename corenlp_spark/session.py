"""SparkSession factory with scale-oriented defaults.

Local testing uses ``local[N]``; on a real cluster the same configs apply
(AQE, Arrow, adaptive skew-join). ``spark.sql.shuffle.partitions`` is sized to
cores locally; at 100 TB you would set it to ~2-3x total executor cores or
rely on AQE coalescing, which is enabled here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "corenlp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; keeps every shuffle stage fully parallel w/o tiny tasks
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate turns every explode(<array expr>) into a
        # pushable Filter(size(<array expr>) > 0) that RE-EVALUATES the full
        # array expression — for our tokenize/shingle/minhash trees that is
        # an interpreted higher-order-function forest, evaluated once in the
        # filter and again in the Generate. Worse, the filter pushes below
        # the _spread repartition down to the single-split parquet scan,
        # serializing minutes of interpreted work onto one task (observed:
        # minhash band posting stuck >280 s single-threaded at sf1.0; the
        # same double-eval cost exists on a real cluster). Our exploded
        # arrays are never empty-heavy, so the rule's row-pruning benefit is
        # nil — exclude it (guide §4.4 discusses the same
        # duplicated-evaluation family for Python UDFs).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
