"""Bucketed-table layout: exchange-free co-located joins at 100 TB.

The canonical scale move for repeated joins on a stable key (doc_id,
entity_key): write both sides ``bucketBy(n, key)`` + ``sortBy(key)`` into
the warehouse once, and every subsequent equi-join on that key plans as a
SortMergeJoin with NO Exchange on either side — the shuffle is paid once
at write time instead of per query. This is the Spark-native equivalent of
the co-partitioned table layouts OLAP engines maintain.

``save_bucketed`` / ``load_table`` wrap the saveAsTable/table calls (the
bucketed layout only exists through the catalog, not bare parquet paths);
``tests/test_plans.py::test_bucketed_join_is_exchange_free`` pins the plan
property this file exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, name: str, key: str, n_buckets: int = 8,
                  mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed+sorted managed table on ``key``.

    n_buckets should be sized so each bucket file lands in the 128 MB -
    1 GB band at the target scale (bucket count is fixed at write time —
    plan for the full corpus, not the sample)."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(name))


def load_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def colocated_join(spark: SparkSession, left: str, right: str, key: str,
                   how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits a
    SortMergeJoin with zero Exchange when bucket specs line up."""
    return load_table(spark, left).join(load_table(spark, right), key, how)
