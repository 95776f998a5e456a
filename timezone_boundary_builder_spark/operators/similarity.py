"""Similarity search over embedding columns (driver spec: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

Brute-force: broadcast the (small) query set, score with JVM-side
F.zip_with / F.aggregate — no Python, no shuffle until the final top-k
window. Scale path: random-hyperplane LSH signatures bucket the vectors;
probing only matching buckets turns the all-pairs scan into an equi-join.
At 10^12 rows the broadcast-query pattern is the right shape: the scan is
map-side; only k rows per query survive to the shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query id (subset of the table), the k
    nearest OTHER vectors. Query side is broadcast; scoring is codegen'd
    array math; row_number window takes the top k."""
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    q = v.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = v.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    sim = _dot(F.col("vec"), F.col("qvec")) / (
        _norm(F.col("vec")) * _norm(F.col("qvec"))
    )
    scored = scored.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_ann(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_stride: int = 25,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    Build: centroids are a deterministic stratified sample of the table
    (``vec_id % centroid_stride == 0`` — no RNG, so Spark and the SQL
    oracle agree bit-for-bit); every vector is assigned to its
    nearest-by-cosine centroid (ties -> smallest centroid id). That
    assignment is the inverted file: a broadcast join + windowed argmax,
    one pass over the table.

    Query: each query probes its ``nprobe`` nearest centroids and exact
    cosine re-ranks only the vectors in those lists. At 10^12 rows the
    inverted file is a partitioned table keyed by centroid_id; probing is
    partition pruning — the scan touches nprobe/N_centroids of the data.
    """
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    cents = v.where(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
    )
    sim_c = _dot(F.col("vec"), F.col("cvec")) / (
        _norm(F.col("vec")) * _norm(F.col("cvec"))
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.desc("c_cos"), F.asc("centroid_id")
    )
    inverted = (
        v.crossJoin(F.broadcast(cents))
        .select(id_col, "vec", "centroid_id", F.round(sim_c, 9).alias("c_cos"))
        .withColumn("crank", F.row_number().over(w_assign))
        .where(F.col("crank") <= nprobe)
    )
    # rows: each vector listed under its own top-1 centroid (the file);
    # queries keep top-nprobe centroids (the probe set)
    file_side = inverted.where(F.col("crank") == 1).select(
        F.col(id_col), F.col("vec"), F.col("centroid_id")
    )
    probe_side = inverted.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("centroid_id"),
    )
    cand = file_side.join(F.broadcast(probe_side), "centroid_id").where(
        F.col(id_col) != F.col("query_id")
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (
        _norm(F.col("vec")) * _norm(F.col("qvec"))
    )
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 6).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket_ann(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH ANN: signature = sign bits against n_planes
    fixed random hyperplanes (seeded — deterministic); candidates = rows
    sharing the query's bucket; exact cosine re-rank inside the bucket.

    The hyperplanes are literal arrays baked into the plan (no UDF). At
    scale, bucketing replaces the full scan with an equi-join on an
    8-bit key; recall is tunable via n_planes / multi-probe.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dp = _dot(F.col("vec"), lit_plane)
        sig = sig + F.when(dp > 0, F.lit(1 << p).cast("long")).otherwise(0)
    bucketed = v.withColumn("bucket", sig)
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).where(F.col(id_col) != F.col("query_id"))
    sim = _dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec")) * _norm(F.col("qvec")))
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
