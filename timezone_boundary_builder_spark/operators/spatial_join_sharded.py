"""Sharded two-stage spatial join: the next gear past the broadcast
CellMap, for worlds whose GEOMETRY no longer fits a broadcast.

The broadcast path (spatial_join.py) ships every zone's ring coordinates
to every executor inside the CellMap. That design has a measured
ceiling: the 10^5-zone frontier world broadcasts 77 MB, and real-world
zones (reference-grade coastline rings, thousands of edges each) are
dominated by ring data — one more decade of zones, or one notch of ring
fidelity, and the broadcast stops fitting. This module removes the
ceiling by splitting the map:

  broadcast   CellMap.slim() — interval probe + kNN grid + tzids ONLY.
              Grows with the budget-capped cover (auto_cover_res holds
              it ~<200 MB for ANY world), never with ring complexity.
  DataFrame   zone_edges_frame — one row per zone (shard, zone_id,
              x1[], y1[], x2[], y2[]), co-partitioned by shard.

  stage 1     mapInPandas with the slim index: FULL-cell points resolve
              map-side exactly as before (the ~87% majority never
              shuffles); boundary points emit (point, candidate-zone)
              pair rows.
  stage 2     pairs cogroup zone-edges by SHARD (zone_id % n_shards —
              a few hundred groups, never per-zone pandas groups, the
              dense-regime lesson from the cover build): each group
              rebuilds a local CSR edge soup and runs the SAME
              pair-vectorized ray-cast / distance kernels as the
              broadcast path, so the per-pair results are bit-identical.
  winners     plain DataFrame aggregation — PIP: min containing zone
              (pre-filtered to z < full-hit zone, the overlap rule);
              kNN: smallest zone within 1e-9 m of the per-point min
              distance (the _fold_knn_winners rule), then the 1852 m
              gate and the ocean-band fallback computed map-side.

Cost model at 100 TB: the broadcast path is shuffle-free; this path
shuffles ONLY the boundary/offshore residue (pairs ~ a few % of rows x
small fan-out) plus each zone's edges ONCE per job — O(boundary pairs +
total ring data), independent of total row count, and every stage stays
in vectorized numpy over Arrow batches. Keep the broadcast path while
the map fits (it is strictly cheaper); switch here when it doesn't.

Semantics parity (pytest-gated, tests/test_sharded_join.py): identical
winner rules, same kernels, same overlap tie-break, same ocean/none
fallbacks — the two paths return row-identical assignments.

Reference semantics: same as spatial_join.py (reference index.js
1241-1247 ocean bands; README.md:234 1852 m rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.codec import from_geojson
from ..geom.kernels import EARTH_RADIUS_M, _boundary_segments, pair_edge_d2
from .spatial_join import (
    KNN_MAX_METERS,
    M_CELL,
    M_KNN,
    M_NONE,
    M_OCEAN,
    M_PIP,
    METHOD_NAMES,
    _band_edges,
    _iter_pair_slices,
)

# stage-1/kNN-probe row kinds (one unified Arrow schema per pass)
K_FINAL, K_POINT, K_PAIR = 0, 1, 2

S1_SCHEMA = "pt_id long, kind tinyint, lon double, lat double, code int, method tinyint"
KNN_SCHEMA = S1_SCHEMA + ", seam boolean"
PIP_EVAL_SCHEMA = "pt_id long, zone_id int"
KNN_EVAL_SCHEMA = "pt_id long, zone_id int, dist double"

DEFAULT_SHARDS = 64
BIG = np.iinfo(np.int32).max


def zone_edges_frame(
    zones: DataFrame, tzids_bc, n_shards: int = DEFAULT_SHARDS
) -> DataFrame:
    """zones(tzid, geometry) -> (shard, zone_id, x1[], y1[], x2[], y2[]),
    one row per zone with >0 edges, built map-only (the geometry never
    touches the driver). zone_id = rank of tzid in the sorted tzid list
    (tzids_bc — the same ordering CellMap uses, so indices agree with
    the slim index's candidate arrays)."""

    def _edges(batches):
        idx = None
        for pdf in batches:
            if not len(pdf):
                continue
            if idx is None:
                idx = {t: i for i, t in enumerate(tzids_bc.value)}
            rows = {"shard": [], "zone_id": [], "x1": [], "y1": [], "x2": [], "y2": []}
            for tzid, gj in zip(pdf["tzid"], pdf["geometry"]):
                zi = idx.get(tzid)
                if zi is None:
                    continue
                a, b = _boundary_segments(from_geojson(gj))
                if not len(a):
                    continue
                rows["shard"].append(zi % n_shards)
                rows["zone_id"].append(zi)
                rows["x1"].append(a[:, 0])
                rows["y1"].append(a[:, 1])
                rows["x2"].append(b[:, 0])
                rows["y2"].append(b[:, 1])
            yield pd.DataFrame(rows)

    schema = (
        "shard int, zone_id int, x1 array<double>, y1 array<double>, "
        "x2 array<double>, y2 array<double>"
    )
    return zones.select("tzid", "geometry").mapInPandas(_edges, schema)


def _local_soup(edges_pdf: pd.DataFrame):
    """One shard's edge rows -> (sorted zone ids, local CSR soup)."""
    order = np.argsort(edges_pdf["zone_id"].to_numpy())
    zvals = edges_pdf["zone_id"].to_numpy()[order]
    xs1 = [np.asarray(edges_pdf["x1"].iloc[i], dtype=np.float64) for i in order]
    ys1 = [np.asarray(edges_pdf["y1"].iloc[i], dtype=np.float64) for i in order]
    xs2 = [np.asarray(edges_pdf["x2"].iloc[i], dtype=np.float64) for i in order]
    ys2 = [np.asarray(edges_pdf["y2"].iloc[i], dtype=np.float64) for i in order]
    eoff = np.zeros(len(zvals) + 1, dtype=np.int64)
    eoff[1:] = np.cumsum([len(a) for a in xs1])
    return zvals, (
        np.concatenate(xs1) if xs1 else np.zeros(0),
        np.concatenate(ys1) if ys1 else np.zeros(0),
        np.concatenate(xs2) if xs2 else np.zeros(0),
        np.concatenate(ys2) if ys2 else np.zeros(0),
        eoff,
    )


def _pair_local(pairs_pdf: pd.DataFrame, zvals: np.ndarray):
    """Map pair rows onto a shard's local zone indexing; drops pairs whose
    zone has no edge row (zero-edge zones — same as the broadcast pair
    path's nzm mask)."""
    pz_global = pairs_pdf["code"].to_numpy(dtype=np.int64)
    li = np.searchsorted(zvals, pz_global)
    ok = (li < len(zvals)) & (zvals[np.minimum(li, len(zvals) - 1)] == pz_global)
    return pz_global, li, ok


def _pip_eval(pairs_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
    """(point, zone) pairs x one shard's edges -> rows for pairs whose
    point lies INSIDE the zone. Identical even-odd arithmetic to the
    broadcast pair-vectorized PIP (spatial_join.py stage 2), slice for
    slice, so the inside flags are bit-identical."""
    empty = pd.DataFrame({"pt_id": pd.Series(dtype="int64"), "zone_id": pd.Series(dtype="int32")})
    if not len(pairs_pdf) or not len(edges_pdf):
        return empty
    zvals, (ex1, ey1, ex2, ey2, eoff) = _local_soup(edges_pdf)
    pz_global, li, ok = _pair_local(pairs_pdf, zvals)
    if not ok.any():
        return empty
    px = pairs_pdf["lon"].to_numpy(dtype=np.float64)[ok]
    py = pairs_pdf["lat"].to_numpy(dtype=np.float64)[ok]
    pid = pairs_pdf["pt_id"].to_numpy(dtype=np.int64)[ok]
    pzg = pz_global[ok]
    pzl = li[ok]
    pec = eoff[pzl + 1] - eoff[pzl]
    out_pt, out_z = [], []
    for sl, sec, sstart, eidx in _iter_pair_slices(eoff, pzl, pec):
        pxe = np.repeat(px[sl], sec)
        pye = np.repeat(py[sl], sec)
        y1g, y2g = ey1[eidx], ey2[eidx]
        straddle = (y1g > pye) != (y2g > pye)
        x1g = ex1[eidx]
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1g + (pye - y1g) * (ex2[eidx] - x1g) / (y2g - y1g)
        hit = straddle & (pxe < xint)
        cross = np.add.reduceat(hit.astype(np.int64), sstart)
        inside = (cross & 1).astype(bool)
        out_pt.append(pid[sl][inside])
        out_z.append(pzg[sl][inside])
    return pd.DataFrame(
        {
            "pt_id": np.concatenate(out_pt) if out_pt else np.zeros(0, np.int64),
            "zone_id": (np.concatenate(out_z) if out_z else np.zeros(0)).astype(
                np.int32
            ),
        }
    )


def _knn_eval(pairs_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
    """(point, zone) kNN pairs x one shard's edges -> per-pair boundary
    distance in meters, with the antimeridian wrap pass on seam points —
    the same pair_edge_d2 expansion as _knn_pairs_vectorized, so the
    distances (and therefore the winner fold downstream) are
    bit-identical to the broadcast path."""
    empty = pd.DataFrame(
        {
            "pt_id": pd.Series(dtype="int64"),
            "zone_id": pd.Series(dtype="int32"),
            "dist": pd.Series(dtype="float64"),
        }
    )
    if not len(pairs_pdf) or not len(edges_pdf):
        return empty
    zvals, (ex1, ey1, ex2, ey2, eoff) = _local_soup(edges_pdf)
    pz_global, li, ok = _pair_local(pairs_pdf, zvals)
    if not ok.any():
        return empty
    px = pairs_pdf["lon"].to_numpy(dtype=np.float64)[ok]
    py = pairs_pdf["lat"].to_numpy(dtype=np.float64)[ok]
    pid = pairs_pdf["pt_id"].to_numpy(dtype=np.int64)[ok]
    seam = pairs_pdf["seam"].to_numpy(dtype=bool)[ok]
    pzg = pz_global[ok]
    pzl = li[ok]
    pec = eoff[pzl + 1] - eoff[pzl]
    d_pair = np.empty(len(pid))
    for sl, sec, sstart, eidx in _iter_pair_slices(eoff, pzl, pec):
        pxe = np.repeat(px[sl], sec)
        pye = np.repeat(py[sl], sec)
        d2 = pair_edge_d2(pxe, pye, ex1[eidx], ey1[eidx], ex2[eidx], ey2[eidx])
        d = np.sqrt(np.minimum.reduceat(d2, sstart)) * EARTH_RADIUS_M
        sw = seam[sl]
        if sw.any():
            swe = np.repeat(sw, sec)
            pxw = pxe[swe]
            d2w = pair_edge_d2(
                pxw - np.sign(pxw) * 360.0,
                pye[swe],
                ex1[eidx[swe]],
                ey1[eidx[swe]],
                ex2[eidx[swe]],
                ey2[eidx[swe]],
            )
            sec_w = sec[sw]
            dw = (
                np.sqrt(np.minimum.reduceat(d2w, np.cumsum(sec_w) - sec_w))
                * EARTH_RADIUS_M
            )
            d[sw] = np.minimum(d[sw], dw)
        d_pair[sl] = d
    return pd.DataFrame({"pt_id": pid, "zone_id": pzg.astype(np.int32), "dist": d_pair})


def _make_stage1_fn(slim_bc):
    """Stage-1 mapInPandas: resolve FULL-cell / no-coord points map-side,
    emit K_POINT + K_PAIR rows for boundary residue. Pair pre-filter is
    the broadcast path's overlap rule: only candidates with
    zone < full-hit zone survive, so any inside winner beats the cell
    hit by construction."""

    def _fn(batches):
        cm = slim_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            pid = pdf["pt_id"].to_numpy(dtype=np.int64)
            lon = pdf["lon"].to_numpy(dtype=np.float64, na_value=np.nan)
            lat = pdf["lat"].to_numpy(dtype=np.float64, na_value=np.nan)
            n = len(pid)
            has = ~(np.isnan(lon) | np.isnan(lat))
            cols = {k: [] for k in ("pt_id", "kind", "lon", "lat", "code", "method")}

            def emit(p, k, lo, la, c, m):
                cols["pt_id"].append(p)
                cols["kind"].append(np.full(len(p), k, dtype=np.int8))
                cols["lon"].append(lo)
                cols["lat"].append(la)
                cols["code"].append(c.astype(np.int32))
                cols["method"].append(m)

            if (~has).any():
                k = int((~has).sum())
                emit(
                    pid[~has],
                    K_FINAL,
                    lon[~has],
                    lat[~has],
                    np.full(k, -1),
                    np.full(k, M_NONE, dtype=np.int8),
                )
            if has.any():
                hp, hl, ha = pid[has], lon[has], lat[has]
                full_tz, seg = cm.probe(hl, ha)
                apt = np.where(full_tz == BIG, -1, full_tz).astype(np.int64)
                off = cm.ivl_cand_off
                czs = cm.ivl_cand_tz
                cnt = off[seg + 1] - off[seg]
                # expand candidates, keep only those beating the full hit
                p_idx = np.nonzero(cnt > 0)[0]
                pair_pt = np.zeros(0, dtype=np.int64)
                pair_z = np.zeros(0, dtype=np.int64)
                if len(p_idx):
                    p_cnt = cnt[p_idx]
                    total = int(p_cnt.sum())
                    pair_pt = np.repeat(p_idx, p_cnt)
                    intra = np.arange(total, dtype=np.int64) - np.repeat(
                        np.cumsum(p_cnt) - p_cnt, p_cnt
                    )
                    pair_z = czs[np.repeat(off[seg[p_idx]], p_cnt) + intra].astype(
                        np.int64
                    )
                    a_pt = apt[pair_pt]
                    keep = (a_pt < 0) | (pair_z < a_pt)
                    pair_pt, pair_z = pair_pt[keep], pair_z[keep]
                unresolved = np.zeros(len(hp), dtype=bool)
                unresolved[pair_pt] = True
                unresolved |= apt < 0  # cell miss: must reach the kNN stage
                res = ~unresolved  # full hit, no surviving candidates
                if res.any():
                    k = int(res.sum())
                    emit(
                        hp[res],
                        K_FINAL,
                        hl[res],
                        ha[res],
                        apt[res],
                        np.full(k, M_CELL, dtype=np.int8),
                    )
                if unresolved.any():
                    k = int(unresolved.sum())
                    emit(
                        hp[unresolved],
                        K_POINT,
                        hl[unresolved],
                        ha[unresolved],
                        apt[unresolved],
                        np.full(k, -1, dtype=np.int8),
                    )
                if len(pair_pt):
                    emit(
                        hp[pair_pt],
                        K_PAIR,
                        hl[pair_pt],
                        ha[pair_pt],
                        pair_z,
                        np.full(len(pair_pt), -1, dtype=np.int8),
                    )
            yield pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})

    return _fn


def _make_knn_probe_fn(slim_bc, band_edges: np.ndarray, n_bands: int, knn_max_m: float):
    """kNN probe over PIP-missed points: emits the candidate pairs plus,
    per point, the precomputed ocean/none fallback (band by longitude —
    map-side, no join needed) and the antimeridian seam flag."""
    m_per_deg = np.radians(1.0) * 6378137.0

    def _fn(batches):
        cm = slim_bc.value
        n_zones = len(cm.tzids)
        for pdf in batches:
            if not len(pdf):
                continue
            pid = pdf["pt_id"].to_numpy(dtype=np.int64)
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            if n_bands:
                band = np.clip(
                    np.searchsorted(band_edges, lon, side="right") - 1, 0, n_bands - 1
                )
                ocean_code = (n_zones + band).astype(np.int64)
                ocean_m = np.full(len(pid), M_OCEAN, dtype=np.int8)
            else:
                ocean_code = np.full(len(pid), -1, dtype=np.int64)
                ocean_m = np.full(len(pid), M_NONE, dtype=np.int8)
            seam = (180.0 - np.abs(lon)) * np.cos(np.radians(lat)) * m_per_deg <= (
                knn_max_m * 1.05
            )
            k0, k1 = cm.knn_candidates(lon, lat)
            kcnt = k1 - k0
            kp = np.nonzero(kcnt > 0)[0]
            cols = {
                "pt_id": [],
                "kind": [],
                "lon": [],
                "lat": [],
                "code": [],
                "method": [],
                "seam": [],
            }

            def emit(p, k, lo, la, c, m, s):
                cols["pt_id"].append(p)
                cols["kind"].append(np.full(len(p), k, dtype=np.int8))
                cols["lon"].append(lo)
                cols["lat"].append(la)
                cols["code"].append(c.astype(np.int32))
                cols["method"].append(m)
                cols["seam"].append(s)

            nocand = np.ones(len(pid), dtype=bool)
            nocand[kp] = False
            if nocand.any():
                emit(
                    pid[nocand],
                    K_FINAL,
                    lon[nocand],
                    lat[nocand],
                    ocean_code[nocand],
                    ocean_m[nocand],
                    seam[nocand],
                )
            if len(kp):
                emit(
                    pid[kp],
                    K_POINT,
                    lon[kp],
                    lat[kp],
                    ocean_code[kp],
                    ocean_m[kp],
                    seam[kp],
                )
                p_cnt = kcnt[kp]
                total = int(p_cnt.sum())
                pair_pt = np.repeat(kp, p_cnt)
                intra = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(p_cnt) - p_cnt, p_cnt
                )
                pair_z = cm.knn_grid_tz[np.repeat(k0[kp], p_cnt) + intra].astype(
                    np.int64
                )
                emit(
                    pid[pair_pt],
                    K_PAIR,
                    lon[pair_pt],
                    lat[pair_pt],
                    pair_z,
                    np.full(len(pair_pt), -1, dtype=np.int8),
                    seam[pair_pt],
                )
            yield pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})

    return _fn


def assign_tzid_sharded(
    pages_with_coords: DataFrame,
    slim_bc,
    edges_df: DataFrame,
    ocean_bands: list[dict],
    knn_max_m: float = KNN_MAX_METERS,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """pages(..., lon, lat) -> all input columns + (tzid, method),
    row-identical to assign_tzid (pytest-gated), with NO geometry
    broadcast: slim_bc = sc.broadcast(cellmap.slim()), edges_df =
    zone_edges_frame(...). Extra input columns (warc_ts, url, text...)
    ride through untouched — the resolution joins key on an internal
    row id. n_shards must match the edges frame's shard column."""
    from pyspark import StorageLevel

    spark = pages_with_coords.sparkSession
    band_edges = _band_edges(ocean_bands)
    band_tzids = [b["tzid"] for b in ocean_bands]
    cm = slim_bc.value
    n_zones = len(cm.tzids)

    pts = pages_with_coords.withColumn(
        "pt_id", F.monotonically_increasing_id()
    ).persist(StorageLevel.MEMORY_AND_DISK)

    s1 = (
        pts.select("pt_id", "lon", "lat")
        .mapInPandas(_make_stage1_fn(slim_bc), S1_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    finals1 = s1.filter(F.col("kind") == K_FINAL).select("pt_id", "code", "method")
    pip_pts = s1.filter(F.col("kind") == K_POINT)
    pip_pairs = s1.filter(F.col("kind") == K_PAIR).withColumn(
        "shard", F.col("code") % n_shards
    )

    pip_win = (
        pip_pairs.groupby("shard")
        .cogroup(edges_df.groupby("shard"))
        .applyInPandas(_pip_eval, PIP_EVAL_SCHEMA)
        .groupBy("pt_id")
        .agg(F.min("zone_id").alias("zwin"))
    )
    r2 = pip_pts.join(pip_win, "pt_id", "left").select(
        "pt_id",
        "lon",
        "lat",
        F.coalesce("zwin", F.when(F.col("code") >= 0, F.col("code"))).alias("code"),
        F.when(F.col("zwin").isNotNull(), F.lit(M_PIP))
        .when(F.col("code") >= 0, F.lit(M_CELL))
        .alias("method"),
    )
    finals2 = r2.filter(F.col("code").isNotNull()).select("pt_id", "code", "method")
    missed = r2.filter(F.col("code").isNull()).select("pt_id", "lon", "lat")

    knn1 = missed.mapInPandas(
        _make_knn_probe_fn(slim_bc, band_edges, len(band_tzids), knn_max_m),
        KNN_SCHEMA,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    finals3 = knn1.filter(F.col("kind") == K_FINAL).select("pt_id", "code", "method")
    knn_pts = knn1.filter(F.col("kind") == K_POINT)
    knn_pairs = knn1.filter(F.col("kind") == K_PAIR).withColumn(
        "shard", F.col("code") % n_shards
    )

    from pyspark.sql import Window

    ev = (
        knn_pairs.groupby("shard")
        .cogroup(edges_df.groupby("shard"))
        .applyInPandas(_knn_eval, KNN_EVAL_SCHEMA)
        .withColumn("dmin", F.min("dist").over(Window.partitionBy("pt_id")))
    )
    knn_win = (
        # winner rule shared with _fold_knn_winners: smallest zone within
        # 1e-9 m of the per-point minimum distance
        ev.filter(F.col("dist") <= F.col("dmin") + F.lit(1e-9))
        .groupBy("pt_id")
        .agg(F.min("zone_id").alias("kz"), F.first("dmin").alias("dmin"))
    )
    finals4 = knn_pts.join(knn_win, "pt_id", "left").select(
        "pt_id",
        F.when(F.col("dmin") <= F.lit(knn_max_m), F.col("kz"))
        .otherwise(F.when(F.col("code") >= 0, F.col("code")))
        .alias("code"),
        F.when(F.col("dmin") <= F.lit(knn_max_m), F.lit(M_KNN))
        .otherwise(F.col("method"))
        .alias("method"),
    )

    def _norm(df):
        return df.select(
            "pt_id",
            F.col("code").cast("int").alias("code"),
            F.col("method").cast("int").alias("method"),
        )

    codes = (
        _norm(finals1)
        .unionByName(_norm(finals2))
        .unionByName(_norm(finals3))
        .unionByName(_norm(finals4))
    )
    # Arrow-path createDataFrame: at 10^6 zones a row-tuple upload would
    # be a driver wall of its own; a pandas frame ships in one batch
    ids = spark.createDataFrame(
        pd.DataFrame(
            {
                "code": np.arange(n_zones + len(band_tzids), dtype=np.int32),
                "tzid": list(cm.tzids) + band_tzids,
            }
        )
    )
    methods = spark.createDataFrame(
        [(i, m) for i, m in enumerate(METHOD_NAMES)], "method int, mname string"
    )
    out = (
        codes.join(F.broadcast(methods), "method", "left")
        .join(ids, "code", "left")
        .join(pts, "pt_id")
        .select(
            *[c for c in pages_with_coords.columns],
            F.col("tzid"),
            F.col("mname").alias("method"),
        )
    )
    return out
