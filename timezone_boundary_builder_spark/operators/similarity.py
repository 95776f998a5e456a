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
    oracle agree bit-for-bit). The coarse quantizer is DRIVER-KNOWN by
    construction (a real IVF trains its centroids on a sample and pins
    them), so nearest-centroid assignment is computed MAP-SIDE: the
    centroid vectors are baked into the plan as literal arrays and each
    row sorts its per-centroid cosines with ``array_sort`` over
    (-cos, centroid_id) structs — identical arithmetic and tie-break to
    a windowed argmax, but the shuffle carries nothing: the old
    crossJoin + Window.partitionBy(vec_id) shape moved rows x
    n_centroids through a full exchange just to pick each vector's
    nearest centroid, which at 10^12 vectors is n_centroids x the corpus
    over the wire. (Beyond O(10^3) centroids the same map-side argmax
    moves into the existing vectorized pandas-UDF surface as one numpy
    matmul per Arrow batch — plan literals are the right shape for a
    coarse quantizer's typical list count, not for a fine codebook.)

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
    cent_rows = sorted(cents.collect(), key=lambda r: r["centroid_id"])
    if not cent_rows:
        return vectors.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )

    def _cent_struct(row):
        cvec = [float(x) for x in row["cvec"]]
        lit = F.array(*[F.lit(x) for x in cvec])
        # the norm is a left-fold sum of squares, computed here in Python
        # with the same fold order as F.aggregate -> bit-identical to the
        # old Spark-side _norm(cvec)
        acc = 0.0
        for x in cvec:
            acc += x * x
        c_cos = F.round(
            _dot(F.col("vec"), lit) / (_norm(F.col("vec")) * F.lit(acc**0.5)), 9
        )
        # NaN cosine (zero-norm vector/centroid) must sort FIRST like the
        # old Window.orderBy(desc) did (NaN > everything in Spark/DuckDB
        # ordering): map it to -inf in the negated sort key — plain
        # negation would leave NaN, which array_sort puts LAST
        neg = F.when(F.isnan(c_cos), F.lit(float("-inf"))).otherwise(-c_cos)
        return F.struct(
            neg.alias("neg_cos"),
            F.lit(int(row["centroid_id"])).cast("long").alias("centroid_id"),
        )

    # ascending struct sort == (cosine DESC, centroid_id ASC): exactly
    # the old window's ordering, ties included
    top_cents = F.slice(
        F.array_sort(F.array(*[_cent_struct(r) for r in cent_rows])), 1, nprobe
    )
    assigned = v.withColumn("top_cents", top_cents)
    # rows: each vector listed under its own top-1 centroid (the file);
    # queries keep top-nprobe centroids (the probe set)
    file_side = assigned.select(
        F.col(id_col),
        F.col("vec"),
        F.col("top_cents")[0]["centroid_id"].alias("centroid_id"),
    )
    probe_side = assigned.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.explode(
            F.transform("top_cents", lambda s: s["centroid_id"])
        ).alias("centroid_id"),
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
