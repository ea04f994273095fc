"""Similarity search over embedding columns (``array<float>``).

  - brute-force cosine top-k: exact baseline, pure ``F.aggregate``/``zip_with``
    arithmetic (JVM-side, codegen'd — no Python in the hot path);
  - LSH-bucketed ANN: random-hyperplane signs (deterministic seeded planes)
    bucket the vectors; candidates meet in an equi-join on (band, sig) and
    are re-scored exactly. The scale path: bucket join replaces the O(n²)
    cross product; per-bucket skew is AQE-splittable.

Design for 100 TB: the query side is tiny (broadcast); the corpus side
streams. Scores are rounded to 1e-6 for engine-portable comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    # multiply in float64: float32 products drift past the 1e-6 rounding used
    # for engine-portable comparison (DuckDB accumulates in double)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    # square in float64 like _dot: float32 squares round before the sum and
    # can flip a 1e-6-rounded score vs the DuckDB DOUBLE[] oracle
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    ))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a single query vector (query broadcast as a
    literal array — no join at all)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def pairwise_topk(
    emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per vector (small-N baseline; the ANN path below
    is the scale version of this)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine("v_a", "v_b"), 6).alias("score"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("score"), F.col("id_b"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — reproducible anywhere)."""
    out = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in row)) or 1.0
        out.append([x / n for x in row])
    return out


def ivf_ann_pairs(
    emb: DataFrame, dim: int, n_cells: int = 16, threshold: float = 0.7,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign each vector to its nearest deterministic
    centroid (coarse quantizer), generate candidates within a cell, verify
    exactly. The centroids are seeded unit vectors (a trained k-means table
    drops in via the same broadcast literal array). Scale path: the per-cell
    equi-join replaces the O(n²) cross product; cell skew is AQE-splittable."""
    cents = _planes(dim, n_cells)  # deterministic unit centroids

    def cell_expr(v):
        pairs = [
            F.struct(_dot(v, F.array(*[F.lit(x) for x in c])).alias("s"),
                     F.lit(i).alias("c"))
            for i, c in enumerate(cents)
        ]
        return F.array_max(F.array(*pairs)).getField("c")

    celed = emb.withColumn("cell", cell_expr(F.col(vec_col)))
    a = celed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "cell")
    b = celed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "cell")
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine("v_a", "v_b"), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def lsh_ann_pairs(
    emb: DataFrame, dim: int, n_bands: int = 4, band_bits: int = 8,
    threshold: float = 0.7, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-neighbor pairs: random-hyperplane LSH bucketing + exact
    cosine verification. (doc_a, doc_b, score), id_a < id_b."""
    planes = _planes(dim, n_bands * band_bits)
    sig_structs = []
    for band in range(n_bands):
        bits = []
        for j in range(band_bits):
            p = planes[band * band_bits + j]
            pcol = F.array(*[F.lit(x) for x in p])
            bits.append(F.when(_dot(F.col(vec_col), pcol) >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** j))
        sig_structs.append(
            F.struct(F.lit(band).alias("band"),
                     sum(bits[1:], bits[0]).alias("sig"))
        )
    sig = emb.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*sig_structs)).alias("x")
    ).select(F.col(id_col), F.col(vec_col), F.col("x.band").alias("band"), F.col("x.sig").alias("sig"))
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "band", "sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b")
        .distinct()
    )
    return (
        cand.select("id_a", "id_b", F.round(cosine("v_a", "v_b"), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )
