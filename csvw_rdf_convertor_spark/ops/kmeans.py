"""Quantized Lloyd's k-means over embedding columns — integer-exact.

Corpus clustering (topic balancing, IVF index training, diversity
sampling) needs k-means, but float Lloyd's is irreproducible across
engines: summation order changes ulps, ulps change assignments. This
implementation quantizes each component to an integer grid first
(``round(x · scale)`` — standard int8/int16 embedding quantization, just
wider), after which EVERY step is integer arithmetic with one canonical
answer: squared distances are exact bigints, centroid updates are
truncate-toward-zero integer division (Spark ``div`` ≡ DuckDB ``//``), and
the DuckDB oracle (gate ``kmeans_quantized``) replays whole iterations
bit-for-bit — a property float k-means cannot have.

Structure per iteration (the MLlib pattern, scale-checked):
- centroids live on the DRIVER as ``k × dim`` integer literals (metadata-
  sized by construction — the same "literal plane matrix" posture as
  ops/similarity.py LSH); assignment is ONE narrow pass, an argmin fold
  over the k literal arrays, no join, no shuffle keyed by vector id;
- the update is ONE algebraic groupBy(cluster) with per-component sums
  (map-side combine absorbs any cluster-size skew), collecting exactly k
  rows back to the driver;
- empty clusters keep their previous centroid (replayed identically in
  the oracle's COALESCE).

Seeds are the ``k`` vectors with the smallest portable 60-bit hash of
their id — a deterministic pseudo-random sample (functions/phash.py), the
same idiom ops/similarity.ivf_assign uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

from ..functions.phash import phash60

SCALE = 1_000_000


def quantize_vec(vec: Column, scale: int = SCALE) -> Column:
    """array<long>: round(component · scale) — float→double cast first so
    the product is IEEE-double in every engine (DuckDB FLOAT*INT would
    multiply in single precision)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (Python ``//`` floors)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _sq_dist(q: Column, cent: list[int]) -> Column:
    lit_cent = F.array(*[F.lit(int(v)).cast("long") for v in cent])
    return F.aggregate(
        F.zip_with(q, lit_cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign(eq: DataFrame, cents: list[list[int]]) -> DataFrame:
    """(vec_id, q, cluster, dist_q): argmin of exact squared distance over
    the k driver-literal centroids, ties to the smaller cluster id."""
    best = F.array_min(F.array(*[
        F.struct(_sq_dist(F.col("q"), c).alias("d"),
                 F.lit(j).cast("int").alias("c"))
        for j, c in enumerate(cents)]))
    return (eq.withColumn("_best", best)
            .select("vec_id", "q",
                    F.col("_best.c").alias("cluster"),
                    F.col("_best.d").alias("dist_q")))


def kmeans_quantized(emb: DataFrame, *, k: int = 4, n_iter: int = 2,
                     scale: int = SCALE, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the hash-seeded start, then
    return the final assignment ``(vec_id, cluster, dist_q)``."""
    eq = emb.select(F.col(id_col).alias("vec_id"),
                    quantize_vec(F.col(vec_col), scale).alias("q"))
    seed_rows = (eq
                 .withColumn("_hk", phash60(F.col("vec_id").cast("string")))
                 .orderBy("_hk", "vec_id").limit(k)
                 .select("q").collect())
    cents = [list(r.q) for r in seed_rows]
    if len(cents) < k:
        raise ValueError(f"need at least {k} vectors, got {len(cents)}")
    dim = len(cents[0])

    for _ in range(n_iter):
        assigned = _assign(eq, cents)
        stats = (assigned.groupBy("cluster")
                 .agg(F.count("*").alias("n"),
                      *[F.sum(F.get(F.col("q"), i)).alias(f"s{i}")
                        for i in range(dim)])
                 .collect())
        by_cluster = {r.cluster: r for r in stats}
        cents = [
            [_trunc_div(r[f"s{i}"], r["n"]) for i in range(dim)]
            if (r := by_cluster.get(j)) is not None else cents[j]
            for j in range(k)]

    return _assign(eq, cents).select(
        "vec_id", F.col("cluster").cast("long").alias("cluster"), "dist_q")


def sql_kmeans_quantized(table: str = "embeddings", *, k: int = 4,
                         n_iter: int = 2, dim: int = 64, scale: int = SCALE,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> str:
    """DuckDB oracle twin: the same seeds, iterations, truncating updates
    and tie-breaks as :func:`kmeans_quantized`, unrolled as a CTE chain.
    DuckDB ``//`` truncates toward zero on integers (verified), matching
    Spark ``div`` / the driver's ``_trunc_div``; windowed/grouped SUMs are
    HUGEINT and are cast back before arithmetic."""
    sums = ", ".join(
        f"CAST(SUM(e.q[{i + 1}]) AS BIGINT) // COUNT(*) AS s{i}"
        for i in range(dim))
    arr = "[" + ", ".join(f"u.s{i}" for i in range(dim)) + "]"
    parts = [rf"""
WITH eq AS MATERIALIZED (
  SELECT {id_col} AS vec_id,
         list_transform({vec_col},
           x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
  FROM {table}),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY
           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
           vec_id) - 1 AS cluster, q AS cent
  FROM eq
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
           vec_id
  LIMIT {k})"""]
    dist = ("CAST(list_sum(list_transform(range(1, {d} + 1), "
            "i -> (e.q[i] - c.cent[i]) * (e.q[i] - c.cent[i]))) AS BIGINT)"
            ).format(d=dim)
    for it in range(n_iter):
        parts.append(f""",
a{it} AS (
  SELECT vec_id, q, cluster, dist_q FROM (
    SELECT e.vec_id, e.q, c.cluster, {dist} AS dist_q,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {dist}, c.cluster) AS rn
    FROM eq e CROSS JOIN c{it} c)
  WHERE rn = 1),
u{it} AS (
  SELECT e.cluster, {sums}
  FROM a{it} e GROUP BY e.cluster),
c{it + 1} AS (
  -- a missing u row yields a list of NULLs, not NULL: test the join key
  SELECT p.cluster,
         CASE WHEN u.cluster IS NULL THEN p.cent ELSE {arr} END AS cent
  FROM c{it} p LEFT JOIN u{it} u ON p.cluster = u.cluster)""")
    parts.append(f"""
SELECT vec_id, cluster, dist_q FROM (
  SELECT e.vec_id, c.cluster, {dist} AS dist_q,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {dist}, c.cluster) AS rn
  FROM eq e CROSS JOIN c{n_iter} c)
WHERE rn = 1""")
    return "".join(parts)
