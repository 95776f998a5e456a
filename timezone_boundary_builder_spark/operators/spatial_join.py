"""Two-stage spatial join: broadcast cell-cover probe + exact vectorized
ray-casting PIP, with kNN / ocean-band fallback (north_star hot path).

One mapInPandas pass over the pages table:

  stage 1  point -> cell ids (bit ops) -> np.searchsorted into the
           broadcast CellMap; FULL hit assigns immediately
  stage 2  BOUNDARY hits -> exact PIP against only the candidate zones,
           points grouped per candidate zone so each PIP call is one
           vectorized batch
  fallback no hit -> kNN: distance to the boundaries of bbox-nearby zones;
           <= 1852 m (one nautical mile — territorial waters, reference
           README.md:234 semantics) -> nearest land tzid, else the
           Etc/GMT+-N ocean band by longitude (reference index.js:107-133,
           1241-1247)

No shuffle: the pages scan is embarrassingly parallel; the polygon side is
broadcast. This is what makes the join viable at 10^12 rows — per-partition
work is O(rows x log cells) + PIP only on boundary-cell residue.

Overlap rule: where zones legitimately overlap (expectedZoneOverlaps), the
lexicographically smallest tzid wins (deterministic; mirrored by the test
oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geom.kernels import min_distance_to_boundary_m, points_in_packed

KNN_MAX_METERS = 1852.0  # 1 nautical mile
# candidate prefilter for kNN: inflate zone bboxes by ~2x the max distance
# in degrees at the equator (1852 m ~ 0.0167 deg); generous to stay correct
# at high latitude
KNN_BBOX_PAD_DEG = 0.1

ASSIGN_SCHEMA = "url string, lon double, lat double, tzid string, method string"
ASSIGN_SCHEMA_SLIM = "url string, tzid string, method string"


def make_assign_fn(
    cellmap_bc,
    ocean_bands: list[dict],
    knn_max_m: float = KNN_MAX_METERS,
    slim: bool = False,
):
    """Returns a mapInPandas function closing over the broadcast CellMap and
    the (tiny) ocean band table."""
    band_edges = np.array([b["left"] for b in ocean_bands] + [ocean_bands[-1]["right"]])
    band_tzids = np.array([b["tzid"] for b in ocean_bands], dtype=object)

    def _ocean_tz(lon: np.ndarray) -> np.ndarray:
        idx = np.clip(np.searchsorted(band_edges, lon, side="right") - 1, 0, len(band_tzids) - 1)
        return band_tzids[idx]

    def _assign(batches):
        cm = cellmap_bc.value
        geoms = cm.geoms()
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lon = pdf["lon"].to_numpy(dtype=np.float64, na_value=np.nan)
            lat = pdf["lat"].to_numpy(dtype=np.float64, na_value=np.nan)
            tz = np.full(n, None, dtype=object)
            method = np.full(n, "none", dtype=object)
            has = ~(np.isnan(lon) | np.isnan(lat))
            if has.any():
                hl, ha = lon[has], lat[has]
                assigned, cand = cm.lookup(hl, ha)
                sub_method = np.where(assigned >= 0, "cell", "").astype(object)
                # stage 2: exact PIP on boundary candidates, grouped by zone
                by_zone: dict[int, list[int]] = {}
                for i, c in enumerate(cand):
                    if c is None:
                        continue
                    cut = c if assigned[i] < 0 else c[c < assigned[i]]
                    for z in np.unique(cut):
                        by_zone.setdefault(int(z), []).append(i)
                pip_best = np.full(len(hl), np.iinfo(np.int32).max, dtype=np.int64)
                for z, idxs in sorted(by_zone.items()):
                    idxs = np.asarray(idxs)
                    pts = np.column_stack([hl[idxs], ha[idxs]])
                    inside = points_in_packed(pts, geoms[z])
                    win = idxs[inside]
                    pip_best[win] = np.minimum(pip_best[win], z)
                pip_hit = pip_best < np.iinfo(np.int32).max
                use_pip = pip_hit & (pip_best < np.where(assigned < 0, np.iinfo(np.int32).max, assigned))
                final = np.where(use_pip, pip_best, assigned).astype(np.int64)
                sub_method = np.where(use_pip, "pip", sub_method)
                # fallback: kNN within 1852 m, else ocean band
                miss = final < 0
                if miss.any():
                    ml, ma = hl[miss], ha[miss]
                    best_d = np.full(len(ml), np.inf)
                    best_z = np.full(len(ml), -1, dtype=np.int64)
                    zb = cm.zone_bbox
                    for z in range(len(geoms)):
                        near = (
                            (ml >= zb[z, 0] - KNN_BBOX_PAD_DEG)
                            & (ma >= zb[z, 1] - KNN_BBOX_PAD_DEG)
                            & (ml <= zb[z, 2] + KNN_BBOX_PAD_DEG)
                            & (ma <= zb[z, 3] + KNN_BBOX_PAD_DEG)
                        )
                        if not near.any():
                            continue
                        pts = np.column_stack([ml[near], ma[near]])
                        d = min_distance_to_boundary_m(pts, geoms[z])
                        sel = np.nonzero(near)[0]
                        # strictly-better distance wins; ties -> smaller tzid
                        better = d < best_d[sel] - 1e-9
                        tie = (np.abs(d - best_d[sel]) <= 1e-9) & (z < best_z[sel])
                        upd = better | tie
                        best_d[sel[upd]] = d[upd]
                        best_z[sel[upd]] = z
                    knn_ok = best_d <= knn_max_m
                    miss_idx = np.nonzero(miss)[0]
                    final[miss_idx[knn_ok]] = best_z[knn_ok]
                    sub_method[miss_idx[knn_ok]] = "knn"
                    ocean_idx = miss_idx[~knn_ok]
                    sub_method[ocean_idx] = "ocean"
                sub_tz = np.full(len(hl), None, dtype=object)
                ok = final >= 0
                tz_arr = np.asarray(cm.tzids, dtype=object)
                sub_tz[ok] = tz_arr[final[ok]]
                if (~ok).any():
                    sub_tz[~ok] = _ocean_tz(hl[~ok])
                tz[has] = sub_tz
                method[has] = sub_method
            if slim:
                # hot-path shape: don't ship the coordinates back through
                # Arrow — the caller can re-join them by url if needed
                yield pd.DataFrame(
                    {"url": pdf["url"].to_numpy(), "tzid": tz, "method": method}
                )
            else:
                yield pd.DataFrame(
                    {
                        "url": pdf["url"].to_numpy(),
                        "lon": lon,
                        "lat": lat,
                        "tzid": tz,
                        "method": method,
                    }
                )

    return _assign


def assign_tzid(
    pages_with_coords: DataFrame,
    cellmap_bc,
    ocean_bands: list[dict],
    knn_max_m: float = KNN_MAX_METERS,
    slim: bool = False,
) -> DataFrame:
    """pages(url, lon, lat, ...) -> assignments(url[, lon, lat], tzid, method).

    method: cell (full-cell hit) | pip (boundary cell + exact test) |
    knn (offshore <= 1852 m) | ocean (Etc band) | none (no coordinate).
    slim=True drops the coordinate echo from the Arrow return path (the
    10^12-row hot-path shape).
    """
    fn = make_assign_fn(cellmap_bc, ocean_bands, knn_max_m, slim=slim)
    schema = ASSIGN_SCHEMA_SLIM if slim else ASSIGN_SCHEMA
    return pages_with_coords.select("url", "lon", "lat").mapInPandas(fn, schema)
