"""Pairwise overlap validation (reference validateTimezoneBoundaries,
index.js:1045-1202).

Semantics mirrored exactly:
- candidate pairs: all tzid pairs a < b (the reference nested-loops
  C(419,2)=87,571 of them, index.js:1066-1070); the engine prunes with a
  bbox range self-join first (index.js has no prefilter here — the engine
  adds it because at 419 zones the exact check dominates);
- a pair is examined when the intersection's PLANAR area > 1e-4 deg2
  (index.js:1092 — square degrees, not meters);
- each overlap polygon with GEODESIC area > 10 m2 (index.js:1141) must
  bbox-fit inside one of the pair's allowed bounds from the
  expected-overlaps table (index.js:1142-1147), probed under both key
  orders (index.js:1075);
- any unmatched overlap => violation (the reference throws
  'Zone validation unsuccessful', index.js:1192-1199).

Spark shape: self-join on bbox range predicate -> applyInPandas exact
check per pair -> broadcast join to expected overlaps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.boolean import intersection
from ..geom.codec import from_geojson, from_rings, to_geojson
from ..geom.kernels import bbox as bbox_of
from ..geom.kernels import geodesic_area_m2, planar_area, ring_area_sq_meters

MIN_SIGNIFICANT_DEG2 = 1e-4  # reference index.js:1092
MIN_POLY_M2 = 10.0  # reference index.js:1141

OVERLAP_SCHEMA = (
    "tz_a string, tz_b string, overlap_area_deg2 double, "
    "poly_min_x double, poly_min_y double, poly_max_x double, poly_max_y double, "
    "poly_area_m2 double, poly_geometry string"
)


def _pair_overlaps(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (tz_a, tz_b) group -> one row per significant overlap polygon."""
    out = []
    for row in pdf.itertuples():
        ga = from_geojson(row.geom_a)
        gb = from_geojson(row.geom_b)
        inter = intersection(ga, gb)
        if inter.is_empty():
            continue
        area = planar_area(inter)
        if area <= MIN_SIGNIFICANT_DEG2:
            continue  # 'Ignoring small overlap' (index.js:1096)
        for j in range(inter.n_polys):
            rings = inter.poly_rings(j)
            m2 = ring_area_sq_meters(rings[0]) - sum(
                ring_area_sq_meters(h) for h in rings[1:]
            )
            if m2 <= MIN_POLY_M2:
                continue
            import numpy as np

            coords = np.concatenate(rings, axis=0)
            mnx, mny, mxx, mxy = bbox_of(coords)
            out.append(
                {
                    "tz_a": row.tz_a,
                    "tz_b": row.tz_b,
                    "overlap_area_deg2": area,
                    "poly_min_x": mnx,
                    "poly_min_y": mny,
                    "poly_max_x": mxx,
                    "poly_max_y": mxy,
                    "poly_area_m2": m2,
                    "poly_geometry": to_geojson(from_rings([rings]), as_string=True),
                }
            )
    if not out:
        return pd.DataFrame(
            columns=[
                "tz_a",
                "tz_b",
                "overlap_area_deg2",
                "poly_min_x",
                "poly_min_y",
                "poly_max_x",
                "poly_max_y",
                "poly_area_m2",
                "poly_geometry",
            ]
        )
    return pd.DataFrame(out)


def find_overlaps(spark: SparkSession, zones: DataFrame) -> DataFrame:
    """Self-join with bbox range prefilter -> exact overlap polygons."""
    a = zones.select(
        F.col("tzid").alias("tz_a"),
        F.col("geometry").alias("geom_a"),
        F.col("min_x").alias("a_min_x"),
        F.col("min_y").alias("a_min_y"),
        F.col("max_x").alias("a_max_x"),
        F.col("max_y").alias("a_max_y"),
    )
    b = zones.select(
        F.col("tzid").alias("tz_b"),
        F.col("geometry").alias("geom_b"),
        F.col("min_x").alias("b_min_x"),
        F.col("min_y").alias("b_min_y"),
        F.col("max_x").alias("b_max_x"),
        F.col("max_y").alias("b_max_y"),
    )
    pairs = a.join(
        b,
        (F.col("tz_a") < F.col("tz_b"))
        & (F.col("a_min_x") <= F.col("b_max_x"))
        & (F.col("a_max_x") >= F.col("b_min_x"))
        & (F.col("a_min_y") <= F.col("b_max_y"))
        & (F.col("a_max_y") >= F.col("b_min_y")),
    )
    return pairs.select("tz_a", "tz_b", "geom_a", "geom_b").groupBy(
        "tz_a", "tz_b"
    ).applyInPandas(_pair_overlaps, OVERLAP_SCHEMA)


def validate_overlaps(
    spark: SparkSession, zones: DataFrame, expected: DataFrame
) -> DataFrame:
    """-> (tz_a, tz_b, overlap_area_deg2, allowed) with allowed=false rows
    being validation violations (engine correctness gate)."""
    return _validate_polys(find_overlaps(spark, zones), expected)


def _validate_polys(overlaps: DataFrame, expected: DataFrame) -> DataFrame:
    joined = _allowed_join(overlaps, expected)
    return (
        joined.groupBy("tz_a", "tz_b")
        .agg(
            F.round(F.max("overlap_area_deg2"), 6).alias("overlap_area_deg2"),
            F.min(F.col("poly_allowed").cast("int")).cast("boolean").alias("allowed"),
        )
        .orderBy("tz_a", "tz_b")
    )


def _allowed_join(overlaps: DataFrame, expected: DataFrame) -> DataFrame:
    """One row per overlap polygon with its allowed flag (and geometry,
    for the debug artifacts)."""
    # probe both key orders (reference index.js:1075)
    exp = expected.select("tz_a", "tz_b", "min_x", "min_y", "max_x", "max_y")
    exp_both = exp.unionByName(
        exp.select(
            F.col("tz_b").alias("tz_a"),
            F.col("tz_a").alias("tz_b"),
            "min_x",
            "min_y",
            "max_x",
            "max_y",
        )
    )
    joined = overlaps.join(
        F.broadcast(exp_both),
        on=(overlaps.tz_a == exp_both.tz_a)
        & (overlaps.tz_b == exp_both.tz_b)
        & (F.col("poly_min_x") >= exp_both.min_x)
        & (F.col("poly_min_y") >= exp_both.min_y)
        & (F.col("poly_max_x") <= exp_both.max_x)
        & (F.col("poly_max_y") <= exp_both.max_y),
        how="left",
    ).select(
        overlaps.tz_a,
        overlaps.tz_b,
        "overlap_area_deg2",
        "poly_min_x",
        "poly_geometry",
        exp_both.min_x.isNotNull().alias("poly_allowed"),
    )
    return joined


def assert_valid(
    spark: SparkSession,
    zones: DataFrame,
    expected: DataFrame,
    debug_dir: str | None = None,
) -> None:
    """Raises like the reference (index.js:1192-1199) when any overlap
    polygon is outside every allowed bound. With debug_dir set, each
    failing pair's disallowed polygons are written as
    `{tzA}-{tzB}-overlap.json` FeatureCollections before raising — the
    reference's human-review artifacts (index.js:1159-1171, '/' -> '-'
    in filenames)."""
    import json
    import os

    joined = _allowed_join(find_overlaps(spark, zones), expected)
    bad_polys = joined.where(~F.col("poly_allowed")).select(
        "tz_a", "tz_b", "poly_geometry"
    )
    rows = bad_polys.collect()
    if not rows:
        return
    if debug_dir:
        os.makedirs(debug_dir, exist_ok=True)
        by_pair: dict[tuple, list] = {}
        for r in rows:
            by_pair.setdefault((r.tz_a, r.tz_b), []).append(
                json.loads(r.poly_geometry)
            )
        for (a, b), geoms in sorted(by_pair.items()):
            fn = f"{a.replace('/', '-')}-{b.replace('/', '-')}-overlap.json"
            with open(os.path.join(debug_dir, fn), "w") as f:
                json.dump(
                    {
                        "type": "FeatureCollection",
                        "features": [
                            {"type": "Feature", "properties": {}, "geometry": g}
                            for g in geoms
                        ],
                    },
                    f,
                )
    n_pairs = len({(r.tz_a, r.tz_b) for r in rows})
    raise ValueError(f"Zone validation unsuccessful: {n_pairs} disallowed overlaps")
