"""B8 skew-handling gate (round-4 verdict item 3): feed an actually
skewed workload — one dense-urban cell holding ~30% of all pages — to
the per-cell top-k operator and assert

1. correctness: the salted two-phase plan returns exactly the single-
   window result (selection is distributive over the salt partitions);
2. balance: the rows entering the final per-cell stage are bounded by
   salt_buckets x k for EVERY cell — including the hot one — while the
   raw hot-cell population is >= 25% of the corpus (i.e. the workload
   really is skewed and the salt really did flatten it);
3. plan: the unsalted variant carries Spark's partial WindowGroupLimit
   pushdown (each map task forwards <= k rows per cell before the
   exchange), so a regression to a non-pushdown shape is caught.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from timezone_boundary_builder_spark.operators.tiles import (
    _cell_encode_col,
    page_topk_per_cell,
)

N = 20_000
K = 3
SALT = 8
RES = 5


@pytest.fixture(scope="module")
def skewed_points(spark):
    """~30% of urls at one urban location (one res-5 cell), the rest
    spread world-wide — the north_rule's dense-urban-polygon case."""
    ids = spark.range(N)
    hot = F.col("id") % 10 < 3
    lon = F.when(hot, F.lit(2.35)).otherwise(
        (F.col("id") % 3600) / F.lit(10.0) - F.lit(180.0)
    )
    lat = F.when(hot, F.lit(48.85)).otherwise(
        (F.expr("id div 7") % 1700) / F.lit(10.0) - F.lit(85.0)
    )
    return ids.select(
        F.col("id").cast("string").alias("url"), lon.alias("lon"), lat.alias("lat")
    )


def test_salted_equals_unsalted(spark, skewed_points):
    plain = page_topk_per_cell(skewed_points, res=RES, k=K).collect()
    salted = page_topk_per_cell(
        skewed_points, res=RES, k=K, salt_buckets=SALT
    ).collect()
    key = lambda r: (r.cell_id, r.rank)
    assert sorted(salted, key=key) == sorted(plain, key=key)
    assert len(plain) > 0


def test_hot_cell_flattened_by_salt(spark, skewed_points):
    """Arithmetic balance bound: the salted partial stage emits <=
    SALT x K rows per cell, so the final window's largest task input is
    24 rows — versus the ~6000-row hot cell a single-window plan would
    hand one task."""
    pts = skewed_points.withColumn(
        "cell_id", _cell_encode_col(RES, F.col("lon"), F.col("lat"))
    )
    raw_counts = pts.groupBy("cell_id").count()
    hot_rows, total = (
        raw_counts.agg(F.max("count"), F.sum("count")).first()
    )
    assert hot_rows >= 0.25 * total  # the workload IS skewed

    # replicate the operator's partial stage and measure its output
    order = [F.md5(F.col("url")).asc(), F.col("url").asc()]
    wp = W.partitionBy("cell_id", "__salt").orderBy(*order)
    partial = (
        pts.withColumn("__salt", F.pmod(F.xxhash64("url"), F.lit(SALT)))
        .withColumn("__pr", F.row_number().over(wp))
        .where(F.col("__pr") <= K)
    )
    per_cell_into_final = partial.groupBy("cell_id").count()
    max_into_final = per_cell_into_final.agg(F.max("count")).first()[0]
    assert max_into_final <= SALT * K
    # and the bound is much smaller than the hot cell's raw population
    assert max_into_final * 50 < hot_rows


def test_salted_equals_unsalted_random_workloads(spark):
    """Property over randomized workloads (seeded): salted two-phase
    top-k equals the single-window result for varying k, salt_buckets,
    and point distributions — selection distributivity isn't specific
    to the zipf fixture."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    for k, salt in [(1, 2), (2, 16), (5, 3)]:
        n = 3000
        hot_frac = rng.uniform(0.1, 0.5)
        hot = rng.random(n) < hot_frac
        lon = np.where(hot, 2.35, rng.uniform(-180, 180, n))
        lat = np.where(hot, 48.85, rng.uniform(-85, 85, n))
        pts = spark.createDataFrame(
            pd.DataFrame(
                {"url": [f"u{i}" for i in range(n)], "lon": lon, "lat": lat}
            )
        )
        key = lambda r: (r.cell_id, r.rank)
        plain = sorted(page_topk_per_cell(pts, res=4, k=k).collect(), key=key)
        salted = sorted(
            page_topk_per_cell(pts, res=4, k=k, salt_buckets=salt).collect(),
            key=key,
        )
        assert salted == plain and plain, (k, salt)


def test_unsalted_plan_has_partial_window_group_limit(spark, skewed_points):
    df = page_topk_per_cell(skewed_points, res=RES, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    # the pushdown runs once BEFORE the exchange (partial) and once after
    # (final): two occurrences prove the map-side limit exists
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_jvm_cell_encode_matches_numpy_kernel(spark):
    """Round 7: the JVM bit-arithmetic cell encode (_cell_encode_col)
    must agree with cellindex.encode_points for every point, including
    the clamp edges (lon=±180, lat=±90) and out-of-range coords."""
    import numpy as np

    from timezone_boundary_builder_spark.geom.cellindex import encode_points

    ids = spark.range(5000)
    lon = (F.col("id") % 3700) / F.lit(10.0) - F.lit(185.0)  # -185..185
    lat = (F.expr("id div 11") % 1900) / F.lit(10.0) - F.lit(95.0)  # -95..95
    for res in (1, 5, 9):
        df = ids.select(lon.alias("lon"), lat.alias("lat")).withColumn(
            "cell", _cell_encode_col(res, F.col("lon"), F.col("lat"))
        )
        rows = df.collect()
        got = np.array([r.cell for r in rows], dtype=np.int64)
        exp = encode_points(
            np.array([r.lon for r in rows]), np.array([r.lat for r in rows]), res
        ).astype(np.int64)
        assert (got == exp).all()
