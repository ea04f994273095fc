"""Benchmark decontamination: find training documents that overlap an
evaluation/benchmark set on any exact n-gram (the standard n=8,
whitespace-token definition used by large-corpus pipelines).

Scale shape: the benchmark side is small by construction (eval suites are
KBs, the corpus is TBs) — its distinct n-grams are collected into a
broadcast equi-join, so the corpus side stays a single narrow pass:
tokenize → explode n-grams → hash-join against the broadcast set →
per-doc aggregate. No shuffle of corpus text; the only wide exchange is
the final per-doc count aggregation over matching rows (proportional to
contamination incidence, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corenlp_spark.functions.textstats import tokens


def _ngrams(col, n: int) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contaminated_docs(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bench_id, n_hits): documents sharing ≥1 exact ``n``-gram
    with a benchmark item — the contamination report a pipeline uses to
    drop or flag training docs before a model sees eval data.

    ``benchmark`` is (bench_id, text); its distinct n-grams are broadcast.
    """
    from corenlp_spark.functions.dedup import _shingle_mhs_kernel

    bench = benchmark.select(
        F.col("bench_id"),
        F.explode(F.array_distinct(_ngrams(F.col("text"), n))).alias("gram"),
    )
    # corpus-side n-grams via the row-local Arrow kernel (r6 — same
    # distinct n-gram set and tokenization as the column expression, built
    # in one pass instead of the interpreted transform/concat_ws tree);
    # NOTE the kernel emits the all-tokens gram for docs shorter than n
    # (concat_ws-skips-missing semantics) while _ngrams emits none — the
    # join result is identical because the benchmark side only carries
    # full n-grams, but we filter short docs' grams to keep the exploded
    # row set itself identical to the expression form.
    kernel, schema = _shingle_mhs_kernel(
        0, n, with_sh=True,
        id_type=docs.schema[id_col].dataType.simpleString())
    corpus = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInPandas(kernel, schema=schema)
        .select("doc_id", F.explode("sh").alias("gram"))
        .filter(F.size(F.split("gram", " ")) == n)
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_hits"))
    )
