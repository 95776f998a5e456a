"""Cell covers + the broadcast sorted-array map (north_star: "batched H3/S2
covering of every timezone polygon (compact cell covers as the coarse
index, stored as a broadcast sorted-array map)").

Stage 1 of the two-stage spatial join. The reference has no lookup layer
(README.md:125-156) — this is the engine's scale path:

- `build_cell_covers`: zones DataFrame -> (tzid, cell_id, full) rows, one
  applyInPandas over zones (each zone covers independently; zones is tiny
  relative to pages, so this stage is never the bottleneck).
- `CellMap`: the collected cover as sorted uint64 arrays + the zone
  polygon set, broadcast once; per-point lookup is np.searchsorted — the
  10^12-row pages join becomes map-side only, no shuffle.

FULL cells resolve a point immediately; BOUNDARY cells carry candidate
tzids that stage 2 (exact PIP) disambiguates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geom.cellindex import cell_parent, cell_res, cover_polygon, encode_points
from ..geom.codec import from_geojson

COVER_SCHEMA = "tzid string, cell_id long, full boolean, res int"

DEFAULT_COVER_RES = 7  # ~2.8 deg cells at res 7 on the synthetic world


def make_cover_fn(max_res: int = DEFAULT_COVER_RES):
    def _cover(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            geom = from_geojson(row["geometry"])
            cells, full = cover_polygon(geom, max_res=max_res)
            out.append(
                pd.DataFrame(
                    {
                        "tzid": row["tzid"],
                        "cell_id": cells.astype(np.int64),  # spark long
                        "full": full,
                        "res": (cells >> np.uint64(58)).astype(np.int32),
                    }
                )
            )
        if not out:
            return pd.DataFrame(columns=["tzid", "cell_id", "full", "res"])
        return pd.concat(out, ignore_index=True)

    return _cover


def build_cell_covers(zones: DataFrame, max_res: int = DEFAULT_COVER_RES) -> DataFrame:
    """zones(tzid, geometry, ...) -> covers(tzid, cell_id, full, res).

    Map-only: each zone row covers independently (zone tables are one row
    per tzid), so mapInPandas over a spread of the (tiny) zone table.
    The earlier groupBy(tzid).applyInPandas shape paid per-GROUP pandas
    overhead — measured ~100 s for a 10,000-zone world at local[32] vs
    ~15 s map-only — and its shuffle bought nothing the repartition here
    doesn't (both move only the small zone side, never points)."""
    src = zones.select("tzid", "geometry")
    n = src.sparkSession.sparkContext.defaultParallelism
    fn = make_cover_fn(max_res)

    def _cover_batches(batches):
        for pdf in batches:
            if len(pdf):
                yield fn(pdf)

    return src.repartition(n).mapInPandas(_cover_batches, COVER_SCHEMA)


def auto_cover_res(
    zones_pdf: pd.DataFrame,
    cells_per_axis: float = 5.0,
    min_res: int = 4,
    max_res: int = 11,
    max_cells: float = 2_000_000,
) -> int:
    """Pick the cover resolution from the zone-size distribution.

    A fixed max_res is wrong at scale: the synthetic 8-zone world wants
    res ~6-7, the 419-zone world res ~8-9, and a 10^4-zone dense world
    res 9+ — with cells much bigger than a typical zone, almost every
    point lands in a boundary cell and stage 2 (exact PIP) does the
    work the index should. Rule: the MEDIAN zone bbox should span
    ~`cells_per_axis` cells on each axis, so typical interiors compact
    into FULL cells (immediate index hits). The default target is
    MEASURED, not guessed: on the 10k-zone dense world the 3-cells/axis
    target picked res 8 (9.26M pages/s, all-quiet probes) where pinned
    res 9 holds 10.36-10.55M — the extra full-cell hit rate at ~5
    cells/axis is worth ~12% throughput, and the max_cells budget guard
    below still bounds the broadcast on huge worlds (the 10^5-zone
    world's median wants res 11 but lands at 10). Clamped: finer than res 11
    inflates the broadcast (cover cells grow with perimeter/cell_size)
    for no hit-rate gain, and coarser than 4 degenerates to a global
    scan. Assignments are resolution-INVARIANT (resolution only moves
    work between the cell and pip stages), so this is purely a
    performance knob — mechanically safe to auto-pick.
    """
    if all(c in zones_pdf.columns for c in ("min_x", "min_y", "max_x", "max_y")):
        w = (zones_pdf["max_x"] - zones_pdf["min_x"]).to_numpy(dtype=np.float64)
        h = (zones_pdf["max_y"] - zones_pdf["min_y"]).to_numpy(dtype=np.float64)
    else:
        ws, hs = [], []
        for gj in zones_pdf["geometry"]:
            g = from_geojson(gj)
            if len(g.coords) == 0:
                continue
            xs, ys = g.coords[:, 0], g.coords[:, 1]
            ws.append(float(xs.max() - xs.min()))
            hs.append(float(ys.max() - ys.min()))
        w, h = np.array(ws), np.array(hs)
    ok = np.isfinite(w) & np.isfinite(h) & (w > 0) & (h > 0)
    if not ok.any():
        return DEFAULT_COVER_RES
    med_w = float(np.median(w[ok]))
    med_h = float(np.median(h[ok]))
    r_w = int(np.ceil(np.log2(360.0 * cells_per_axis / med_w)))
    r_h = int(np.ceil(np.log2(180.0 * cells_per_axis / med_h)))
    res = int(np.clip(max(r_w, r_h), min_res, max_res))
    # total-size guard for bimodal worlds: the median alone can drive res
    # to the cap while a few continental zones dominate the TOTAL
    # perimeter — boundary cells grow as perimeter/cell_size, so coarsen
    # until the estimated cover (bbox-perimeter proxy) fits the
    # broadcast budget instead of ballooning the driver-side build
    # per-axis cell sizes (round-5 ADVICE): a cell is 360/2^res wide but
    # only 180/2^res tall, so horizontal edge length divides by the cell
    # WIDTH and vertical edge length by the cell HEIGHT — folding both
    # through the width undercounted lat-dominated perimeters up to 2x
    sum_w = float(w[ok].sum())
    sum_h = float(h[ok].sum())

    def _est_cells(r: int) -> float:
        return 2.0 * (sum_w / (360.0 / (1 << r)) + sum_h / (180.0 / (1 << r)))

    while res > min_res and _est_cells(res) > max_cells:
        res -= 1
    return res


def cellmap_from_zones_pdf(
    zones_pdf: pd.DataFrame, max_res: int = DEFAULT_COVER_RES
) -> "CellMap":
    """(tzid, geometry[, bbox...]) pandas table -> broadcastable CellMap.
    Bboxes are derived from the geometry when absent, so any published
    zone artifact (a build_all product parquet, a prior release) can feed
    the serving layer directly."""
    zp = zones_pdf.sort_values("tzid").reset_index(drop=True)
    if not all(c in zp.columns for c in ("min_x", "min_y", "max_x", "max_y")):
        # the full quartet or re-derive: a PARTIAL bbox column set
        # (e.g. an artifact carrying min_* only) would KeyError inside
        # CellMap otherwise
        zp = zp.drop(
            columns=[c for c in ("min_x", "min_y", "max_x", "max_y") if c in zp.columns]
        )
        boxes = []
        for gj in zp["geometry"]:
            g = from_geojson(gj)
            if len(g.coords) == 0:
                # empty op-fold results are writable artifacts (zone_row
                # stores NaN bounds for them) — mirror that, don't crash
                boxes.append((np.nan, np.nan, np.nan, np.nan))
                continue
            xs, ys = g.coords[:, 0], g.coords[:, 1]
            boxes.append((xs.min(), ys.min(), xs.max(), ys.max()))
        zp = zp.assign(
            min_x=[b[0] for b in boxes],
            min_y=[b[1] for b in boxes],
            max_x=[b[2] for b in boxes],
            max_y=[b[3] for b in boxes],
        )
    covers = []
    for r in zp.itertuples():
        cells, full = cover_polygon(from_geojson(r.geometry), max_res=max_res)
        covers.append(
            pd.DataFrame(
                {"tzid": r.tzid, "cell_id": cells.astype(np.int64), "full": full}
            )
        )
    return CellMap(pd.concat(covers, ignore_index=True), zp)


class CellMap:
    """Broadcastable compact cover: sorted arrays per kind.

    full_cells   : uint64[] sorted       -> full_tz int32[] (zone index)
    bnd_cells    : uint64[] sorted (dup cell ids allowed, grouped)
    bnd_tz       : int32[] parallel to bnd_cells
    levels       : sorted list of resolutions present (for ancestor probes)
    tzids        : zone name list; geoms: GeoJSON strings (decoded lazily
                   on each executor, cached per process)
    """

    def __init__(self, covers_pdf: pd.DataFrame, zones_pdf: pd.DataFrame):
        # sort zones by tzid: in legitimately-overlapping regions (expected
        # overlaps, reference expectedZoneOverlaps.json) the smallest tzid
        # wins deterministically — engine and oracle share this rule
        zones_pdf = zones_pdf.sort_values("tzid").reset_index(drop=True)
        self.tzids = list(zones_pdf["tzid"])
        self._tz_index = {t: i for i, t in enumerate(self.tzids)}
        self.geojson = list(zones_pdf["geometry"])
        self.zone_bbox = zones_pdf[["min_x", "min_y", "max_x", "max_y"]].to_numpy(
            dtype=np.float64
        )

        cells = covers_pdf["cell_id"].to_numpy().astype(np.uint64)
        tz = covers_pdf["tzid"].map(self._tz_index).to_numpy(dtype=np.int32)
        full = covers_pdf["full"].to_numpy(dtype=bool)

        fc = cells[full]
        ft = tz[full]
        o = np.argsort(fc, kind="stable")
        self.full_cells = fc[o]
        self.full_tz = ft[o]

        bc = cells[~full]
        bt = tz[~full]
        o = np.argsort(bc, kind="stable")
        self.bnd_cells = bc[o]
        self.bnd_tz = bt[o]

        self.levels = sorted(set(int(r) for r in cell_res(cells))) if len(cells) else []
        self._geom_cache = None
        self._build_intervals()
        self._build_knn_boxes()

    def _build_knn_boxes(self) -> None:
        """Per-POLYGON bboxes for the kNN prefilter. A whole-zone bbox is
        useless for antimeridian multipolygons (it spans the world, so every
        offshore point pays a distance computation); per-polygon boxes stay
        tight. The grid registration pads these boxes with a lat-dependent
        lon pad (see _build_knn_grid), so they are valid at all latitudes."""
        boxes = []
        zone_of = []
        for zi, gj in enumerate(self.geojson):
            g = from_geojson(gj)
            for j in range(g.n_polys):
                shell = g.ring(int(g.poly_offsets[j]))
                boxes.append(
                    [
                        shell[:, 0].min(),
                        shell[:, 1].min(),
                        shell[:, 0].max(),
                        shell[:, 1].max(),
                    ]
                )
                zone_of.append(zi)
        self.knn_boxes = (
            np.asarray(boxes, dtype=np.float64)
            if boxes
            else np.zeros((0, 4), dtype=np.float64)
        )
        self.knn_box_zone = np.asarray(zone_of, dtype=np.int32)
        self._build_knn_grid()

    KNN_GRID_PAD_DEG = 0.1  # ~6x the 1852 m lat pad; lon pad scales by 1/cos

    def _build_knn_grid(self) -> None:
        """1-degree lat-lon grid -> candidate-zone CSR for the kNN
        prefilter. A per-zone bbox loop is O(zones x offshore points) —
        it collapsed kernel throughput 12x at the reference's 419-zone
        scale — whereas the grid probe is O(points) + a gather: cell =
        (floor(lon)+180)*180 + floor(lat)+90, candidates =
        knn_grid_tz[off[cell]:off[cell+1]]. The grid cells COVER each
        padded polygon box, so the candidate set is a superset of the
        padded-bbox set: any zone within 1852 m of a point is always a
        candidate; extra candidates only cost a distance computation.

        The LATITUDE pad is a constant 0.1 deg (11 km — 6x the 1852 m
        rule everywhere on the sphere). The LONGITUDE pad must grow as
        1/cos(lat): a degree of longitude shrinks toward the poles, so a
        fixed 0.1 deg stops covering 1852 m beyond ~|lat| 80 (1852 m at
        84 deg is already 0.16 deg of lon). Each box gets
        pad/cos(max |lat| of the padded box), keeping the same 6x safety
        margin at every latitude; boxes whose pad reaches the pole (or
        spans the globe) register every lon column — near the pole all
        longitudes really are within 1852 m of each other."""
        pad = self.KNN_GRID_PAD_DEG
        ncell = 360 * 180
        lists: dict[int, list[int]] = {}
        for (x0, y0, x1, y1), zi in zip(self.knn_boxes, self.knn_box_zone):
            # lon columns WRAP at the antimeridian: a box touching +-180
            # must also register candidates on the far side, else a point
            # 100 m west of the seam never sees land 100 m east of it
            # (GeoJSON geometries are split at +-180, so only the pad —
            # never the box itself — crosses)
            max_abs_lat = min(max(abs(y0), abs(y1)) + pad, 90.0)
            cos_lat = np.cos(np.radians(max_abs_lat))
            lon_pad = pad / cos_lat if cos_lat > 1e-6 else 360.0
            if lon_pad >= 180.0 or (x1 - x0) + 2 * lon_pad >= 360.0:
                gx0, gx1 = 0, 359
            else:
                gx0 = int(np.floor(x0 - lon_pad)) + 180
                gx1 = int(np.floor(x1 + lon_pad)) + 180
            gy0 = max(int(np.floor(y0 - pad)) + 90, 0)
            gy1 = min(int(np.floor(y1 + pad)) + 90, 179)
            for gx in range(gx0, gx1 + 1):
                base = (gx % 360) * 180
                for gy in range(gy0, gy1 + 1):
                    lists.setdefault(base + gy, []).append(int(zi))
        off = np.zeros(ncell + 1, dtype=np.int64)
        flat: list[int] = []
        for c in range(ncell):
            zs = lists.get(c)
            if zs:
                flat.extend(sorted(set(zs)))
            off[c + 1] = len(flat)
        self.knn_grid_off = off
        self.knn_grid_tz = np.asarray(flat, dtype=np.int32)

    def knn_candidates(self, lon: np.ndarray, lat: np.ndarray):
        """Grid probe: returns (cand_start, cand_end) CSR ranges into
        knn_grid_tz for each point."""
        gx = np.clip(np.floor(lon).astype(np.int64) + 180, 0, 359)
        gy = np.clip(np.floor(lat).astype(np.int64) + 90, 0, 179)
        cell = gx * 180 + gy
        return self.knn_grid_off[cell], self.knn_grid_off[cell + 1]

    _BIG = np.iinfo(np.int32).max

    def _build_intervals(self) -> None:
        """Flatten the multi-resolution cover into DISJOINT Morton intervals
        at the finest resolution. A cell (res r, code c) covers the finest-
        level Morton range [c << 2(R-r), (c+1) << 2(R-r)) — children are
        contiguous in Morton order — so the whole cover becomes one sorted
        boundary array + per-interval payloads:

          ivl_pos      uint64[nseg+1]  elementary boundaries (0 .. 4^R)
          ivl_full_tz  int32[nseg]     min full-cell zone covering it (BIG=none)
          ivl_cand_*   CSR int32       unique boundary-candidate zones

        Probe cost per point: ONE searchsorted + two gathers, replacing a
        (2 searches x 2 tables x n_levels) probe and a per-point Python
        candidate list. Built once driver-side; broadcast with the map.
        """
        BIG = self._BIG
        if not self.levels:
            self.finest = 0
            self.ivl_pos = np.array([0, 1], dtype=np.uint64)
            self.ivl_full_tz = np.array([BIG], dtype=np.int32)
            self.ivl_cand_off = np.array([0, 0], dtype=np.int64)
            self.ivl_cand_tz = np.zeros(0, dtype=np.int32)
            return
        R = self.levels[-1]
        self.finest = R
        mask = np.uint64((1 << 58) - 1)

        def spans(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            r = (cells >> np.uint64(58)).astype(np.int64)
            code = cells & mask
            shift = (2 * (R - r)).astype(np.uint64)
            return code << shift, (code + np.uint64(1)) << shift

        fs, fe = spans(self.full_cells)
        bs, be = spans(self.bnd_cells)
        domain = np.array([0, 1 << (2 * R)], dtype=np.uint64)
        pos = np.unique(np.concatenate([fs, fe, bs, be, domain]))
        nseg = len(pos) - 1
        full_min = np.full(nseg, BIG, dtype=np.int32)
        for s, e, t in zip(fs, fe, self.full_tz):
            i0 = int(np.searchsorted(pos, s))
            i1 = int(np.searchsorted(pos, e))
            np.minimum(full_min[i0:i1], t, out=full_min[i0:i1])
        cand_lists: list[list[int]] = [[] for _ in range(nseg)]
        for s, e, t in zip(bs, be, self.bnd_tz):
            i0 = int(np.searchsorted(pos, s))
            i1 = int(np.searchsorted(pos, e))
            for k in range(i0, i1):
                cand_lists[k].append(int(t))
        counts = np.zeros(nseg, dtype=np.int64)
        flat: list[int] = []
        for k, lst in enumerate(cand_lists):
            u = sorted(set(lst))
            counts[k] = len(u)
            flat.extend(u)
        self.ivl_pos = pos
        self.ivl_full_tz = full_min
        self.ivl_cand_off = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(counts)]
        )
        self.ivl_cand_tz = np.asarray(flat, dtype=np.int32)

    def slim(self):
        """Index-only copy for the sharded stage-2 path
        (spatial_join_sharded): keeps the interval probe, kNN grid,
        per-polygon boxes, bboxes and tzids; drops the zone geometries
        and every lazy edge cache. On synthetic quad worlds the saving
        is modest (geometry is 4 edges/zone), but for real-world zones
        the geometry payload IS the broadcast — the real 419-zone
        config is dominated by ring coordinates, not index arrays —
        and its absence is what removes the zone-count ceiling: the
        slim index grows only with the budget-capped cover and the
        per-polygon box grid, never with ring complexity."""
        import copy

        s = copy.copy(self)
        s.geojson = None
        s._geom_cache = None
        for attr in (
            "_edge_cache",
            "_edge_csr_cache",
            "_edge_count_cache",
            # derivable in one reduceat per process — keep it out of the
            # shipped bytes
            "_seg_min_cache",
        ):
            if hasattr(s, attr):
                setattr(s, attr, None)
        return s

    def seg_min_candidates(self) -> np.ndarray:
        """Per-interval-segment MIN candidate zone index (BIG for empty
        segments), lazily built and cached per process. Lets the sharded
        stage-1 decide `any candidate < full-hit zone` with one gather
        instead of materializing the pair expansion twice (once to flag
        residue, once to emit pairs)."""
        if getattr(self, "_seg_min_cache", None) is None:
            off = self.ivl_cand_off
            seg_min = np.full(len(off) - 1, self._BIG, dtype=np.int64)
            nonempty = off[1:] > off[:-1]
            if nonempty.any():
                seg_min[nonempty] = np.minimum.reduceat(
                    self.ivl_cand_tz, off[:-1][nonempty]
                )
            self._seg_min_cache = seg_min
        return self._seg_min_cache

    def probe(self, lon: np.ndarray, lat: np.ndarray):
        """Interval probe: returns (full_tz int32 [BIG = no full hit],
        seg int64) per point. Candidates for point i live at
        ivl_cand_tz[ivl_cand_off[seg[i]] : ivl_cand_off[seg[i]+1]]."""
        code = encode_points(lon, lat, self.finest) & np.uint64((1 << 58) - 1)
        seg = np.searchsorted(self.ivl_pos, code, side="right") - 1
        return self.ivl_full_tz[seg], seg

    # -- executor-side ---------------------------------------------------
    def geoms(self):
        if self._geom_cache is None:
            self._geom_cache = [from_geojson(g) for g in self.geojson]
        return self._geom_cache

    def zone_edges(self):
        """Per-zone cached edge arrays (x1, y1, x2, y2): building them on
        every PIP/distance call costs a per-ring Python loop + allocations
        that dominate when hundreds of zones are probed per batch."""
        if getattr(self, "_edge_cache", None) is None:
            from ..geom.kernels import _boundary_segments

            cache = []
            for g in self.geoms():
                a, b = _boundary_segments(g)
                cache.append((a[:, 0].copy(), a[:, 1].copy(), b[:, 0].copy(), b[:, 1].copy()))
            self._edge_cache = cache
        return self._edge_cache

    def zone_edge_counts(self) -> np.ndarray:
        """Per-zone edge counts (int64) — the regime test for the
        pair-vectorized PIP path needs only these, never the flat soup,
        so the per-zone branch must not pay edge_csr's full duplication
        of the edge cache."""
        if getattr(self, "_edge_count_cache", None) is None:
            self._edge_count_cache = np.array(
                [len(e[0]) for e in self.zone_edges()], dtype=np.int64
            )
        return self._edge_count_cache

    def edge_csr(self):
        """zone_edges flattened to one CSR edge soup (x1, y1, x2, y2,
        offsets): the pair-vectorized PIP path indexes edges of many
        zones in one numpy expression instead of one call per zone —
        the dense-world regime (10^4+ zones, few candidate points per
        zone per batch) where per-zone call overhead dominates."""
        if getattr(self, "_edge_csr_cache", None) is None:
            edges = self.zone_edges()
            off = np.zeros(len(edges) + 1, dtype=np.int64)
            off[1:] = np.cumsum([len(e[0]) for e in edges])
            self._edge_csr_cache = (
                np.concatenate([e[0] for e in edges]) if edges else np.zeros(0),
                np.concatenate([e[1] for e in edges]) if edges else np.zeros(0),
                np.concatenate([e[2] for e in edges]) if edges else np.zeros(0),
                np.concatenate([e[3] for e in edges]) if edges else np.zeros(0),
                off,
            )
        return self._edge_csr_cache

    def lookup(self, lon: np.ndarray, lat: np.ndarray):
        """Vectorized probe. Returns:
        assigned int32[] — zone index from a FULL cell hit, -1 otherwise
        cand_lists       — list (per point) of candidate zone-index arrays
                           from BOUNDARY cell hits (empty list -> no hit)
        """
        n = len(lon)
        big = np.iinfo(np.int32).max
        assigned = np.full(n, big, dtype=np.int32)
        cand: list = [None] * n
        if not self.levels:
            assigned[:] = -1
            return assigned, cand
        # encode once at the finest level; coarser ids are bit-shifts
        # (cheap int ops instead of re-projecting floats per level)
        finest = self.levels[-1]
        finest_ids = encode_points(lon, lat, finest)
        for lv in self.levels:
            ids = finest_ids if lv == finest else cell_parent(finest_ids, finest - lv)
            # full-cell matches: take the MIN zone index across all levels
            # (overlapping zones can both claim a point via nested full
            # cells; min = smallest tzid rule)
            if len(self.full_cells):
                lo = np.searchsorted(self.full_cells, ids, side="left")
                hi = np.searchsorted(self.full_cells, ids, side="right")
                multi = hi > lo
                one = multi & (hi - lo == 1)
                assigned[one] = np.minimum(assigned[one], self.full_tz[lo[one]])
                for i in np.nonzero(multi & ~one)[0]:
                    assigned[i] = min(assigned[i], int(self.full_tz[lo[i] : hi[i]].min()))
            # boundary-cell matches (may be several tzids per cell)
            if len(self.bnd_cells):
                lo = np.searchsorted(self.bnd_cells, ids, side="left")
                hi = np.searchsorted(self.bnd_cells, ids, side="right")
                multi = hi > lo
                for i in np.nonzero(multi)[0]:
                    ext = self.bnd_tz[lo[i] : hi[i]]
                    cand[i] = ext if cand[i] is None else np.concatenate([cand[i], ext])
        assigned[assigned == big] = -1
        return assigned, cand


def collect_cell_map(covers: DataFrame, zones: DataFrame) -> CellMap:
    """Driver-side: collect the (small) cover + zone tables and build the
    CellMap for sc.broadcast(). The cover is compact — O(zones x boundary
    cells), never O(pages)."""
    covers_pdf = covers.toPandas()
    zones_pdf = zones.select(
        "tzid", "geometry", "min_x", "min_y", "max_x", "max_y"
    ).toPandas()
    return CellMap(covers_pdf, zones_pdf)
