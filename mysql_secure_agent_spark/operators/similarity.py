"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: a broadcast of the
  (small) query set against a partition-parallel scan of the corpus; all math
  in JVM higher-order functions (zip_with/aggregate), no Python.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures shrink the
  candidate set so each query probes one bucket instead of the full corpus;
  planes are derived deterministically from md5 so signatures are reproducible
  across engines/runs (no rand() — resumable plans).

At 100 TB the corpus scan dominates; the brute-force plan broadcasts queries
(tiny) and keeps the corpus un-shuffled, then a single top-k-per-query
aggregation shuffles only (query_id, k rows). The LSH plan replaces the full
cross product with a bucket-equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries: (query_id, query_vec). Broadcast-joined against the corpus
    (no shuffle of the corpus); per-query top-k via window on the similarity.
    """
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).crossJoin(
        F.broadcast(queries.select(F.col("query_id"), F.col("query_vec").alias("_qv")))
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim_col(F.col("_cv"), F.col("_qv")), 6).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------- LSH ANN path
def _plane_sign(dim_index, plane: int):
    """Deterministic ±1 for (plane, dim) from an md5 bit — reproducible
    everywhere, no RNG state."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(plane), dim_index.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def hyperplane_signature(vec_col, n_planes: int = 8):
    """Bit-signature: bit p = sign(Σ_d v[d]·s(p,d)). All JVM-side."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(1), F.size(vec_col)), lambda i: _plane_sign(i, p)
                ),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits[1:], start=bits[0]).cast("int")


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: equi-join query and corpus on hyperplane bucket, then exact cosine
    top-k within the bucket. Recall < 1 by construction; multi-probe = union
    over neighboring buckets (not needed for the test corpus)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_signature(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        "query_id",
        F.col("query_vec").alias("_qv"),
        hyperplane_signature(F.col("query_vec"), n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine_sim_col(F.col("_cv"), F.col("_qv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "cosine", "rank")
    )
