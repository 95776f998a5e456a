"""Raster <-> vector tile materialization at fixed cell resolutions
(north_star: "raster<->vector tile materialization at fixed H3
resolutions"). No reference counterpart (the reference only builds the
polygon set); semantics defined by the spec:

- raster tiles: for every cell at resolution R intersecting a zone, one
  row (cell_id, res, tzid, coverage) where coverage is 'full' (cell
  entirely inside the zone) or 'partial' (boundary cell). A cell can carry
  several partial rows (one per overlapping zone); exact assignment within
  the cell is stage-2 PIP territory by design.
- vector tiles: the zone geometry clipped to the cell rect (G2 kernel) —
  the per-tile payload a map renderer would fetch.

Spark shape: zones -> applyInPandas(cover at res R) for the raster set;
vector tiles clip per (zone, cell) pair. The output is partitioned /
range-partitioned by cell prefix so tile servers prune by key range, and
because cell ids are Morton codes, range partitioning is spatial locality
(B8: skewed dense-urban cells split by salting the aggregation key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.boolean import clip_to_box
from ..geom.cellindex import cell_bounds, cell_parent, cell_res, cover_polygon
from ..geom.codec import from_geojson, to_geojson

RASTER_SCHEMA = "cell_id long, res int, tzid string, coverage string"
VECTOR_SCHEMA = "cell_id long, res int, tzid string, geometry string"


def _raster_fn(res: int):
    def _tiles(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples():
            geom = from_geojson(row.geometry)
            cells, full = cover_polygon(geom, max_res=res)
            if len(cells) == 0:
                continue
            # expand coarse full cells down to resolution R so the raster
            # is uniform-resolution (a tile server's keyspace)
            r = cell_res(cells)
            expand = []
            cover = []
            for c, f, cr in zip(cells, full, r):
                if cr == res:
                    expand.append(int(c))
                    cover.append("full" if f else "partial")
                else:
                    # descendants of a full coarse cell at res R
                    steps = res - int(cr)
                    base = (int(c) & ((1 << 58) - 1)) << (2 * steps)
                    hdr = res << 58
                    for k in range(1 << (2 * steps)):
                        expand.append(hdr | (base | k))
                        cover.append("full")
            out.append(
                pd.DataFrame(
                    {
                        "cell_id": np.array(expand, dtype=np.int64),
                        "res": np.int32(res),
                        "tzid": row.tzid,
                        "coverage": cover,
                    }
                )
            )
        if not out:
            return pd.DataFrame(columns=["cell_id", "res", "tzid", "coverage"])
        return pd.concat(out, ignore_index=True)

    return _tiles


def raster_tiles(zones: DataFrame, res: int) -> DataFrame:
    """zones -> uniform-resolution raster tile memberships."""
    return zones.select("tzid", "geometry").groupBy("tzid").applyInPandas(
        _raster_fn(res), RASTER_SCHEMA
    )


def _vector_fn(res: int):
    def _tiles(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples():
            geom = from_geojson(row.geometry)
            cells, full = cover_polygon(geom, max_res=res)
            recs = []
            r = cell_res(cells)
            for c, f, cr in zip(cells, full, r):
                if int(cr) != res and f:
                    continue  # coarse full cells: payload is the cell rect itself
                b = cell_bounds(int(c))
                if f:
                    clipped_gj = to_geojson(clip_to_box(geom, *_rect(b)), as_string=True)
                else:
                    clipped = clip_to_box(geom, b[0], b[1], b[2], b[3])
                    if clipped.is_empty():
                        continue
                    clipped_gj = to_geojson(clipped, as_string=True)
                recs.append((int(c), res, row.tzid, clipped_gj))
            if recs:
                out.append(
                    pd.DataFrame(recs, columns=["cell_id", "res", "tzid", "geometry"])
                )
        if not out:
            return pd.DataFrame(columns=["cell_id", "res", "tzid", "geometry"])
        return pd.concat(out, ignore_index=True)

    return _tiles


def _rect(b):
    return b[0], b[1], b[2], b[3]


def vector_tiles(zones: DataFrame, res: int) -> DataFrame:
    """zones -> per-cell clipped geometry payloads at resolution res
    (boundary cells only carry non-trivial clips; full cells clip to the
    cell rect)."""
    return zones.select("tzid", "geometry").groupBy("tzid").applyInPandas(
        _vector_fn(res), VECTOR_SCHEMA
    )


def raster_tile_summary(tiles: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """Aggregation over tiles grouped by cell — the shuffle-bearing stage
    where dense-urban cell skew shows up (north_rule B8).

    salt_buckets > 0 enables two-phase salted aggregation: partial
    aggregate on (cell_id, salt) — spreading a hot cell over N reducers —
    then final combine on cell_id. With salt_buckets == 0 Catalyst's
    partial aggregation + AQE skew splitting already handle moderate skew;
    the explicit salt is for pathological keys.
    """
    if salt_buckets <= 0:
        return tiles.groupBy("cell_id", "res").agg(
            F.count(F.lit(1)).alias("n_zones"),
            F.sum(F.when(F.col("coverage") == "full", 1).otherwise(0)).alias("n_full"),
            F.min("tzid").alias("first_tzid"),
        )
    salted = tiles.withColumn(
        "salt", F.pmod(F.hash("tzid"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("cell_id", "res", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.when(F.col("coverage") == "full", 1).otherwise(0)).alias("pf"),
        F.min("tzid").alias("pt"),
    )
    return partial.groupBy("cell_id", "res").agg(
        F.sum("pc").alias("n_zones"),
        F.sum("pf").alias("n_full"),
        F.min("pt").alias("first_tzid"),
    )


def write_tiles_partitioned(tiles: DataFrame, path: str, prefix_res: int = 3) -> None:
    """Range-partition by cell prefix (Morton locality) and write parquet
    partitioned by the prefix — tile servers prune by key range."""
    with_prefix = tiles.withColumn(
        "cell_prefix",
        F.shiftright(
            F.col("cell_id").bitwiseAND(F.lit((1 << 58) - 1)),
            2 * (int(tiles.selectExpr("max(res)").first()[0]) - prefix_res),
        ),
    )
    (
        with_prefix.repartitionByRange(F.col("cell_prefix"), F.col("cell_id"))
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )
