"""Similarity search over embedding columns (``array<float>``).

- ``cosine`` / ``dot``: ``zip_with`` + left-to-right ``aggregate`` — pure
  JVM expressions, deterministic summation order (matters for the DuckDB
  oracle: both engines fold the list sequentially in double precision).
- ``brute_force_topk``: broadcast the (small) query set against all vectors;
  one narrow pass + per-query top-k window. The baseline.
- ``lsh_topk``: random-hyperplane (signed projection) bucketing — the scale
  path: candidates share a bucket key, rescored exactly. Hyperplanes are
  *hash-derived* (deterministic, no RNG state to ship).
- ``ivf_topk``: IVF-style coarse quantization using k deterministic seed
  centroids (sampled by id hash) — probe the nearest ``n_probe`` cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10, *,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     q_vec_col: str = "embedding", q_id_col: str = "query_id"
                     ) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries is broadcast (must be driver-small); the scan side stays
    partitioned — one narrow pass over the corpus, then a top-k window
    partitioned by query (shuffle keyed by query id — uniform)."""
    q = F.broadcast(queries.select(F.col(q_id_col).alias("query_id"),
                                   F.col(q_vec_col).alias("q_vec")))
    scored = (emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
              .crossJoin(q)
              .withColumn("cos", cosine(F.col("vec"), F.col("q_vec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank"))


def hyperplane_bucket(vec: Column, n_planes: int = 12, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket id (int): bit p = sign(Σ_j v_j · r_pj)
    with r_pj = ±1 derived from xxhash64(seed, p, j) — fully deterministic.
    """
    def plane_sign(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, j: v.cast("double") *
                (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), j), F.lit(2)) * 2 - 1)),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + plane_sign(p)
    return bucket


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 10, *,
             n_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id", q_vec_col: str = "embedding",
             q_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: bucket-join on the hyperplane signature, exact
    cosine rescoring inside the bucket. Recall grows with fewer planes /
    multiple probes; the join key is uniform by construction."""
    e = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"),
                   hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"))
    q = F.broadcast(queries.select(
        F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(q_vec_col), n_planes).alias("bucket")))
    scored = (e.join(q, "bucket")
              .withColumn("cos", cosine(F.col("vec"), F.col("q_vec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank"))


def ivf_assign(emb: DataFrame, n_cells: int = 16, *, vec_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, DataFrame]:
    """IVF coarse index: centroids = the n_cells vectors with smallest
    xxhash64(id) (a deterministic pseudo-random sample), assignment = argmax
    cosine. Returns (centroids, assigned)."""
    cents = (emb.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
             .withColumn("hk", F.xxhash64(F.col("cent_id")))
             .orderBy("hk").limit(n_cells).drop("hk"))
    e = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cos", cosine(F.col("vec"), F.col("cent_vec")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    assigned = (scored.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .select("vec_id", "vec", F.col("cent_id").alias("cell")))
    return cents, assigned
