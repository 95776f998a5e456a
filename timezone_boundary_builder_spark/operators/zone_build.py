"""Zone boundary build: the per-tzid ordered op-fold.

Engine re-expression of the reference's makeTimezoneBoundaries
(index.js:791-867): for each tzid, fold its ordered op list —
init / union / difference / difference-reverse-order / intersect
(index.js:829-854) — over source geometries, then post-process
(index.js:733-784): snap to the 1e-6 grid, drop polygons with geodesic
area < 1 m2, drop holes with area <= 1 m2.

Spark shape: zones_config LEFT JOIN sources (broadcast — the source table
is small), then groupBy(tzid).applyInPandas(fold). Zones parallelize
across partitions; the fold inside one zone is sequential (op lists are
<= 4 entries in the reference config). At 100 TB scale the heavy side is
never this stage (419 zones); it is the pages join, which consumes this
stage's output via a broadcast cover map — so a plain shuffle on tzid
here is fine at any scale.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.boolean import boolean_op, dissolve
from ..geom.codec import PackedGeometry, from_geojson, to_geojson
from ..geom.kernels import (
    bbox,
    geodesic_area_m2,
    geom_hash,
    planar_area,
    ring_area_sq_meters,
    snap,
)

ZONE_SCHEMA = (
    "tzid string, geometry string, min_x double, min_y double, "
    "max_x double, max_y double, area_deg2 double, area_m2 double, "
    "geom_hash string"
)

# post-process thresholds (reference index.js:749,763: geodesic m2)
MIN_POLY_AREA_M2 = 1.0
MIN_HOLE_AREA_M2 = 1.0


def post_process(geom: PackedGeometry) -> PackedGeometry:
    """Reference postProcessZone (index.js:733-784): precision-reduce,
    drop tiny polygons, strip tiny holes (shell ring always kept)."""
    if geom.is_empty():
        return geom
    geom = PackedGeometry(snap(geom.coords), geom.ring_offsets, geom.poly_offsets)
    from ..geom.codec import from_rings

    polys = []
    for j in range(geom.n_polys):
        rings = geom.poly_rings(j)
        shell = rings[0]
        if ring_area_sq_meters(shell) < MIN_POLY_AREA_M2:
            continue
        kept = [shell]
        for hole in rings[1:]:
            if ring_area_sq_meters(hole) > MIN_HOLE_AREA_M2:
                kept.append(hole)
        polys.append(kept)
    return from_rings(polys)


def fold_zone_ops(ops: list[dict]) -> PackedGeometry:
    """Sequential op fold for one zone (reference index.js:829-854).
    Each op dict: {op, geometry(geojson str)} already source-resolved."""
    geo = None
    for op in sorted(ops, key=lambda o: o["op_seq"]):
        src = from_geojson(op["geometry"])
        kind = op["op"]
        if kind == "init":
            geo = src
        elif kind == "union":
            geo = boolean_op(geo, src, "union")
        elif kind == "difference":
            geo = boolean_op(geo, src, "difference")
        elif kind == "difference-reverse-order":
            geo = boolean_op(src, geo, "difference")
        elif kind == "intersect":
            geo = boolean_op(geo, src, "intersection")
        else:
            raise ValueError(f"unknown op {kind}")
    return geo if geo is not None else from_geojson('{"type":"MultiPolygon","coordinates":[]}')


def zone_row(tzid: str, geom: PackedGeometry) -> dict:
    mn_x, mn_y, mx_x, mx_y = bbox(geom.coords)
    return {
        "tzid": tzid,
        "geometry": to_geojson(geom, as_string=True),
        "min_x": mn_x,
        "min_y": mn_y,
        "max_x": mx_x,
        "max_y": mx_y,
        "area_deg2": planar_area(geom),
        "area_m2": geodesic_area_m2(geom),
        "geom_hash": geom_hash(geom),
    }


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    tzid = pdf["tzid"].iloc[0]
    ops = pdf.to_dict("records")
    geom = post_process(fold_zone_ops(ops))
    return pd.DataFrame([zone_row(tzid, geom)])


def with_zone_columns(df: DataFrame) -> DataFrame:
    """(tzid, geometry) -> full zones_final shape (bbox, areas, geom_hash).
    Re-derives the computed columns for externally-loaded zone tables —
    e.g. a previous release read back from its published artifact, the
    reference's downloadLastRelease path (index.js:1407-1457)."""

    def _rows(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [
                    zone_row(t, from_geojson(g))
                    for t, g in zip(pdf["tzid"], pdf["geometry"])
                ]
            )

    return df.select("tzid", "geometry").mapInPandas(_rows, ZONE_SCHEMA)


def build_zones(
    spark: SparkSession, zones_config: DataFrame, sources: DataFrame
) -> DataFrame:
    """zones_config(tzid, op_seq, op, source, source_id, geometry) x
    sources(source_id, geometry) -> zones_final(tzid, geometry, bbox cols,
    areas, geom_hash).

    The sources table is broadcast (411 rows in the reference config); the
    only shuffle is the groupBy(tzid), keyed by the natural build unit.
    """
    resolved = (
        zones_config.alias("z")
        .join(
            F.broadcast(sources.select("source_id", F.col("geometry").alias("src_geometry"))),
            on="source_id",
            how="left",
        )
        .withColumn("geometry", F.coalesce(F.col("z.geometry"), F.col("src_geometry")))
        .select("tzid", "op_seq", "op", "geometry")
    )
    return resolved.groupBy("tzid").applyInPandas(_fold_group, ZONE_SCHEMA)


def apply_zone_filters(
    zones_config: DataFrame,
    included_zones: list[str] | None = None,
    excluded_zones: list[str] | None = None,
) -> DataFrame:
    """CLI include/exclude pruning (SURVEY R13 — reference --included_zones
    / --excluded_zones, index.js:264-323): a semi/anti filter on tzid."""
    out = zones_config
    if included_zones:
        out = out.filter(F.col("tzid").isin(list(included_zones)))
    if excluded_zones:
        out = out.filter(~F.col("tzid").isin(list(excluded_zones)))
    return out


def prune_sources(sources: DataFrame, zones_config: DataFrame) -> DataFrame:
    """Drop sources no surviving zone op references (the reference prunes
    its download list the same way, index.js:312-323) — a broadcast
    left-semi join on the small config table, so the source scan never
    materializes unused geometries downstream."""
    used = zones_config.select("source_id").where(
        F.col("source_id").isNotNull()
    ).distinct()
    return sources.join(F.broadcast(used), "source_id", "left_semi")


def dissolve_group(pdf: pd.DataFrame, key_col: str, out_tzid: str | None = None) -> pd.DataFrame:
    """Cascaded union of a group of zone geometries (reference group-merge,
    index.js:869-939). Used by derived 1970/now zone products."""
    geoms = [from_geojson(g) for g in pdf["geometry"]]
    merged = dissolve(geoms)
    tz = out_tzid if out_tzid is not None else pdf[key_col].iloc[0]
    return pd.DataFrame([zone_row(tz, merged)])
