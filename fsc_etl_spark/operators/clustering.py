"""Deterministic distributed K-Means over integer-quantized vectors.

The iterative-ML pattern done the way this engine does everything:
exact arithmetic, bounded driver state, and a SQL oracle that can
reproduce the result bit-for-bit.

- Vectors quantize to integers (``floor(x * 127)``) so every distance
  and every centroid update is EXACT int64 arithmetic — no float-sum
  accumulation order to drift between partitionings or engines.
- Centroids are the only driver-side state: k × d integers collected
  per Lloyd round and re-entering the plan as literals (the classic
  broadcast-the-model shape; at 100 TB assignments stay a map-side
  projection over the scan, the update is one partial-agg shuffle of
  (cluster, dim) sums).
- Init = the quantized vectors of the k lowest ids (deterministic, no
  RNG); centroid update = per-dim floor-div mean; empty clusters keep
  their previous centroid; assignment ties break on lowest cluster id.

Lloyd's algorithm is public-domain textbook material (Lloyd 1982,
"Least squares quantization in PCM").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, scale: int = 127) -> Column:
    """float array -> exact int64 array: floor(x * scale). One float
    multiply + floor — both correctly-rounded IEEE ops, so identical
    across engines."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def _dist_to(vec: Column, centroid: list[int]) -> Column:
    """Exact squared L2 distance between an int64 array column and an
    integer centroid literal — a fold over zip_with, all int64."""
    c = F.lit(centroid)
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_clusters(vectors: DataFrame, centroids: list[list[int]], vec_col: str = "q") -> DataFrame:
    """Map-side assignment: argmin over the centroid literals with a
    lowest-id tie-break. Adds ``cluster`` and ``dist`` columns."""
    dists = [_dist_to(F.col(vec_col), c) for c in centroids]
    best_cluster = F.lit(0)
    best_dist = dists[0]
    for i, d in enumerate(dists[1:], start=1):
        better = d < best_dist
        best_cluster = F.when(better, F.lit(i)).otherwise(best_cluster)
        best_dist = F.when(better, d).otherwise(best_dist)
    return vectors.withColumn("cluster", best_cluster).withColumn("dist", best_dist)


def update_centroids(
    assigned: DataFrame, prev: list[list[int]], vec_col: str = "q"
) -> list[list[int]]:
    """One partial-agg shuffle of (cluster, dim) integer sums, then
    floor-div means collected as the next k x d literal state. Empty
    clusters keep their previous centroid."""
    k, d = len(prev), len(prev[0])
    per_dim = (
        assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.expr("sum(val) div count(1)").alias("m"))
    )
    nxt = [list(c) for c in prev]
    for row in per_dim.collect():  # bounded: k*d rows
        nxt[row["cluster"]][row["dim"]] = row["m"]
    return nxt


def kmeans_exact(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd K-Means; returns per-cluster
    (cluster_id, n_members, total_dist) after ``iters`` update rounds
    plus a final assignment — all exact integers."""
    q = emb.select(F.col(id_col), quantize(F.col(vec_col)).alias("q"))
    init = (
        q.orderBy(id_col).limit(k).collect()
    )  # k lowest ids — bounded, deterministic
    centroids = [list(r["q"]) for r in init]
    for _ in range(iters):
        assigned = assign_clusters(q, centroids)
        centroids = update_centroids(assigned, centroids)
    final = assign_clusters(q, centroids)
    return (
        final.groupBy(F.col("cluster").cast("bigint").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("total_dist"),
        )
    )
