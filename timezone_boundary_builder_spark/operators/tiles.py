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
from ..geom.kernels import make_box, planar_area

RASTER_SCHEMA = "cell_id long, res int, tzid string, coverage string"
VECTOR_SCHEMA = "cell_id long, res int, tzid string, geometry string"


def raster_rows_for_geom(geom, res: int) -> tuple[np.ndarray, list[str]]:
    """Uniform-resolution raster expansion of one zone's compact cover:
    coarse full cells expand to their res-R descendants. Shared by the
    Spark applyInPandas stage and the local golden-oracle builder."""
    cells, full = cover_polygon(geom, max_res=res)
    r = cell_res(cells)
    expand: list[int] = []
    cover: list[str] = []
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
    return np.array(expand, dtype=np.int64), cover


def _raster_fn(res: int):
    def _tiles(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples():
            expand, cover = raster_rows_for_geom(from_geojson(row.geometry), res)
            if len(expand) == 0:
                continue
            out.append(
                pd.DataFrame(
                    {
                        "cell_id": expand,
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
                b = cell_bounds(int(c))
                if f:
                    # full cells (any res): the payload IS the cell rect —
                    # no clipping needed, interior tiles are pure rectangles
                    clipped_gj = to_geojson(
                        make_box(b[0], b[1], b[2], b[3]), as_string=True
                    )
                else:
                    clipped = clip_to_box(geom, b[0], b[1], b[2], b[3])
                    if clipped.is_empty():
                        continue
                    clipped_gj = to_geojson(clipped, as_string=True)
                recs.append((int(c), int(cr), row.tzid, clipped_gj))
            if recs:
                out.append(
                    pd.DataFrame(recs, columns=["cell_id", "res", "tzid", "geometry"])
                )
        if not out:
            return pd.DataFrame(columns=["cell_id", "res", "tzid", "geometry"])
        return pd.concat(out, ignore_index=True)

    return _tiles


def vector_tiles(zones: DataFrame, res: int) -> DataFrame:
    """zones -> per-cell geometry payloads at max resolution ``res``.

    Full cells (including compacted coarse interior cells — their res is
    recorded in the ``res`` column and in the cell_id's header bits) carry
    the cell rect; boundary cells carry the zone clipped to the cell rect.
    The payloads of one zone PARTITION the zone exactly: sum(planar area)
    over its tiles equals the zone's area (tested; the conservation oracle
    in __spark_entry__ checks it against the zone-area goldens)."""
    return zones.select("tzid", "geometry").groupBy("tzid").applyInPandas(
        _vector_fn(res), VECTOR_SCHEMA
    )


def vector_tile_areas(tiles: DataFrame) -> DataFrame:
    """Per-zone planar-area sum over vector-tile payloads. Because a zone's
    tiles partition it exactly, this must reproduce the zone-area goldens —
    the conservation oracle for the whole cover->clip path."""

    def _areas(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tzid": pdf["tzid"],
                    "tile_area": [
                        planar_area(from_geojson(g)) for g in pdf["geometry"]
                    ],
                }
            )

    per_tile = tiles.mapInPandas(_areas, "tzid string, tile_area double")
    return per_tile.groupBy("tzid").agg(
        F.round(F.sum("tile_area"), 6).alias("area_deg2_r")
    )


SERVE_SCHEMA = "url string, tzid string"


def serve_points_from_tiles(
    points: DataFrame,
    tiles: DataFrame,
    zones_pdf: pd.DataFrame,
    ocean_bands: list[dict],
    res: int,
) -> DataFrame:
    """Tile-serving join: assign tzid to points FROM a materialized
    uniform-resolution raster-tile table (the alternative hot path to the
    broadcast CellMap of spatial_join.assign_tzid — here the coarse index
    is a *table*, so the probe is a JVM broadcast hash equi-join on
    cell_id, the shape a tile server / Iceberg-backed lookup uses).

    Stage 1: encode each point's cell id (vectorized bit ops, mapInPandas)
    and broadcast-join the per-cell candidate tzid lists (tiny agg of the
    tiles table; the points side never shuffles).
    Stage 2: exact ray-casting PIP against only the candidate zones;
    smallest passing tzid wins; no candidates -> Etc/GMT ocean band by
    longitude (reference index.js:107-133 semantics). Exact PIP runs for
    full-coverage candidates too so edge-of-cell points agree row-for-row
    with the pure-PIP oracle.
    """
    from ..geom.cellindex import encode_points

    spark = points.sparkSession
    cands_by_cell = tiles.groupBy("cell_id").agg(
        F.sort_array(F.collect_set("tzid")).alias("cand_tzids")
    )

    def _encode(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["cell_id"] = encode_points(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), res
            ).astype(np.int64)
            yield pdf

    pts = points.select("url", "lon", "lat").mapInPandas(
        _encode, "url string, lon double, lat double, cell_id long"
    )
    # candidate-list length computed JVM-side so the resolver's pair
    # expansion is pure numpy (no per-row len() walk in Python)
    joined = pts.join(F.broadcast(cands_by_cell), "cell_id", "left").withColumn(
        "n_cands", F.coalesce(F.size("cand_tzids"), F.lit(0))
    )

    bc_zones = spark.sparkContext.broadcast(
        dict(zip(zones_pdf["tzid"], zones_pdf["geometry"]))
    )
    band_lefts = np.array([b["left"] for b in ocean_bands], dtype=np.float64)
    band_tzids = np.array([b["tzid"] for b in ocean_bands], dtype=object)

    def _resolve(batches):
        geom_cache: dict = {}

        def _geom(tzid):
            g = geom_cache.get(tzid)
            if g is None:
                g = geom_cache[tzid] = from_geojson(bc_zones.value[tzid])
            return g

        from ..geom.kernels import points_in_packed

        for pdf in batches:
            n = len(pdf)
            out = np.empty(n, dtype=object)
            unassigned = np.ones(n, dtype=bool)
            pts_xy = np.column_stack(
                [pdf["lon"].to_numpy(), pdf["lat"].to_numpy()]
            )
            # vectorized pair expansion (the repeat/cumsum shape
            # spatial_join uses): flatten the ragged candidate lists into
            # one (row, tzid) pair array, then group per tzid with a
            # stable argsort — no per-row Python loop, each PIP call is
            # still one batch per zone
            lens = np.maximum(pdf["n_cands"].to_numpy().astype(np.int64), 0)
            if lens.sum() > 0:
                row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
                flat = np.concatenate(
                    pdf["cand_tzids"].to_numpy()[lens > 0].tolist()
                ).astype(object)
                order = np.argsort(flat, kind="stable")
                sorted_t = flat[order]
                sorted_rows = row_idx[order]
                bounds = np.flatnonzero(
                    np.r_[True, sorted_t[1:] != sorted_t[:-1], True]
                )
                # visit tzids in ascending order, fill each row at most
                # once -> smallest passing tzid wins (same semantics as
                # the old sorted-dict walk)
                for k in range(len(bounds) - 1):
                    seg = sorted_rows[bounds[k] : bounds[k + 1]]
                    idx = seg[unassigned[seg]]
                    if len(idx) == 0:
                        continue
                    t = sorted_t[bounds[k]]
                    inside = points_in_packed(pts_xy[idx], _geom(t))
                    hit = idx[inside]
                    out[hit] = t
                    unassigned[hit] = False
            # residue -> ocean band by longitude
            if unassigned.any():
                lons = pts_xy[unassigned, 0]
                bi = np.clip(
                    np.searchsorted(band_lefts, lons, side="right") - 1,
                    0,
                    len(band_lefts) - 1,
                )
                out[unassigned] = band_tzids[bi]
            yield pd.DataFrame({"url": pdf["url"], "tzid": out})

    return joined.mapInPandas(_resolve, SERVE_SCHEMA)


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
    partitioned by the prefix — tile servers prune by key range.

    The prefix is each cell's ancestor Morton code at ``prefix_res``,
    computed from the row's OWN ``res`` (cell ids store their resolution
    in the header bits and their Morton code at that resolution in the low
    bits — a uniform shift keyed to max(res) would over-shift compacted
    coarse interior cells to prefix 0, destroying locality for exactly the
    cells tile servers prune hardest). Cells at or below ``prefix_res``
    are their own prefix."""
    mask = (1 << 58) - 1
    with_prefix = tiles.withColumn(
        "cell_prefix",
        F.expr(
            f"shiftright(cell_id & {mask}, "
            f"greatest(0, 2 * (res - {int(prefix_res)})))"
        ),
    )
    (
        with_prefix.repartitionByRange(F.col("cell_prefix"), F.col("cell_id"))
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )


PAGE_COUNT_SCHEMA = "cell_id long, res int, tzid string, n_pages long"


def page_tile_counts(points: DataFrame, res: int) -> DataFrame:
    """Page-density rollup: assigned points (lon, lat, tzid) ->
    (cell_id, res, tzid, n_pages) at a fixed cell resolution. The cell
    encode is pure JVM bit arithmetic (round 7 — no Arrow boundary);
    the count aggregates map-side first, so the shuffle carries one row
    per live (cell, tzid), never per page — the 10^12-row-safe shape."""
    return (
        points.where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .withColumn("cell_id", _cell_encode_col(res, F.col("lon"), F.col("lat")))
        .groupBy("cell_id", "tzid")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select("cell_id", F.lit(res).cast("int").alias("res"), "tzid", "n_pages")
    )


def page_topk_per_cell(
    points: DataFrame, res: int, k: int = 3, salt_buckets: int = 0
) -> DataFrame:
    """Deterministic k-page sample per tile cell (the preview pages a
    tile server shows): rank pages inside each cell by md5(url) — a
    deterministic, tie-free shuffle order — and keep the first k.

    This is the B8 skew shape that partial aggregation can NOT fix by
    itself: a window over cell_id needs every row of the cell in one
    task, and a dense-urban cell holding 30% of a 10^12-row corpus is a
    straggler (or an OOM) on any cluster size. Two defenses, both here:

    - salt_buckets == 0: a bare row_number window. Spark >= 3.5 inserts
      a PARTIAL WindowGroupLimit before the exchange, so each map task
      forwards at most k rows per cell — the hot cell ships
      #map_tasks x k rows, not its full population. The plan gate
      (tests/test_plan_quality.py) asserts the partial node exists so a
      regression (e.g. switching to rank with ties or an agg that
      defeats the pushdown) is caught.
    - salt_buckets > 0: explicit two-phase top-k for engines/operators
      without the pushdown and as the driver-verified path: partial
      top-k per (cell_id, salt) — the hot cell spreads over N reducers,
      each emitting <= k candidates — then final top-k per cell over
      <= N x k rows. Selection is distributive (global top-k is inside
      the union of per-salt top-ks), so the result is exactly equal;
      tests/test_tiles_skew.py asserts the bound arithmetically on a
      zipf-hot input.
    """
    from pyspark.sql import Window as W

    from ..plans.spread import spread_small_scan

    # spread (round 7): on a single-row-group test scan the cell encode,
    # md5 sort keys and the PARTIAL window stage would all run in one
    # task; no-op on real multi-split inputs
    pts = spread_small_scan(
        points.where(F.col("lon").isNotNull() & F.col("lat").isNotNull()),
        "url",
    ).withColumn("cell_id", _cell_encode_col(res, F.col("lon"), F.col("lat")))
    order = [F.md5(F.col("url")).asc(), F.col("url").asc()]
    if salt_buckets > 0:
        wp = W.partitionBy("cell_id", "__salt").orderBy(*order)
        pts = (
            pts.withColumn(
                "__salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
            )
            .withColumn("__pr", F.row_number().over(wp))
            .where(F.col("__pr") <= k)
            .drop("__salt", "__pr")
        )
    wf = W.partitionBy("cell_id").orderBy(*order)
    return (
        pts.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select("cell_id", "rank", "url")
    )


def _cell_encode_col(res: int, lon, lat):
    """(lon, lat) -> Morton cell id at `res` as PURE JVM bit arithmetic
    (round 7, guide §4.1): the identical scale/floor/clamp/interleave
    formula cellindex.encode_points runs in numpy (and the SQL oracle
    mirrors), previously evaluated through a scalar pandas UDF — an
    Arrow round trip per point for three multiplies and some shifts.
    Same IEEE doubles: (coord + off) / span * n evaluated left-to-right,
    floor, clamp to [0, n-1], bit-interleave, res header."""
    n = 1 << res
    x = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    code = F.lit(res << 58).cast("long")
    for b in range(res):
        code = (
            code
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return code


def merge_tile_counts(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Incremental rollup maintenance: fold a new increment's counts into
    the maintained table. Union + re-aggregate on the grouping keys —
    additive counts make the merge exact, so incrementally-maintained
    tiles equal a from-scratch recompute over the full corpus (tested).
    At scale both sides are cell-prefix-partitioned parquet and the
    shuffle is proportional to LIVE cells, not corpus rows; this is the
    maintenance loop assign_pages --incremental increments feed."""
    if existing is None:
        return delta
    return (
        existing.unionByName(delta)
        .groupBy("cell_id", "res", "tzid")
        .agg(F.sum("n_pages").alias("n_pages"))
    )
