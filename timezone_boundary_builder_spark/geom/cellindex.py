"""Uint64 quadkey cell index (H3/S2-style, pure numpy).

The sandbox has no h3/s2 bindings, so the engine defines its own
hierarchical cell grid over WGS84 lon-lat:

- resolution r splits the world into 2^r x 2^r cells (equirectangular);
- cell id = (r << 58) | morton_interleave(cx, cy) — ids at different
  resolutions never collide, and the id of a point's cell at any coarser
  resolution is derivable with bit ops only;
- polygon covering (north_star: "batched H3/S2 covering ... compact cell
  covers") classifies cells as FULL (entirely inside) or BOUNDARY
  (intersecting the outline), recursing only on boundary cells, which
  yields a compacted cover directly;
- the cover is served as a broadcast sorted-array map: lookup is
  np.searchsorted per resolution level — no join, no shuffle.

Antimeridian: callers split geometries at +-180 (GeoJSON convention, which
the reference's config data already follows); the grid itself has an exact
cell boundary at lon 0 wrapping x index mod 2^r.
"""

from __future__ import annotations

import numpy as np

from .codec import PackedGeometry
from .kernels import points_in_packed

MAX_RES = 26  # 2 bits per level, 26*2 = 52 bits + 5 res bits < 64

__all__ = [
    "encode_points",
    "cell_res",
    "cell_parent",
    "cell_children",
    "cell_bounds",
    "cover_polygon",
    "compact_cells",
    "cell_to_ancestors",
]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions
    (constant 5-step magic-mask sequence — O(1) array passes independent of
    resolution, vs one pass per bit)."""
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _interleave_bits(x: np.ndarray, y: np.ndarray, r: int) -> np.ndarray:
    """Morton-interleave r-bit ints x (even bits) and y (odd bits)."""
    return _spread_bits(x.astype(np.uint64)) | (
        _spread_bits(y.astype(np.uint64)) << np.uint64(1)
    )


def encode_points(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Cell ids (uint64) of points at a resolution. Vectorized."""
    n = 1 << res
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    x = np.clip(x, 0, n - 1)
    y = np.clip(y, 0, n - 1)
    code = _interleave_bits(x, y, res)
    return code | (np.uint64(res) << np.uint64(58))


def cell_res(cell: np.ndarray | int):
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(58)).astype(np.int64)


def cell_parent(cell: np.ndarray | int, steps: int = 1):
    c = np.asarray(cell, dtype=np.uint64)
    r = cell_res(c)
    code = c & np.uint64((1 << 58) - 1)
    code = code >> (np.uint64(2) * np.asarray(steps, dtype=np.uint64))
    return code | ((r - steps).astype(np.uint64) << np.uint64(58))


def cell_children(cell: int) -> np.ndarray:
    c = np.uint64(cell)
    r = int(cell_res(c))
    code = int(c & np.uint64((1 << 58) - 1)) << 2
    base = np.uint64((r + 1) << 58)
    return np.array([base | np.uint64(code | k) for k in range(4)], dtype=np.uint64)


def _deinterleave(code: int, r: int) -> tuple[int, int]:
    x = y = 0
    for i in range(r):
        x |= ((code >> (2 * i)) & 1) << i
        y |= ((code >> (2 * i + 1)) & 1) << i
    return x, y


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) of a cell."""
    c = int(cell)
    r = c >> 58
    code = c & ((1 << 58) - 1)
    x, y = _deinterleave(code, r)
    n = 1 << r
    w = 360.0 / n
    h = 180.0 / n
    return (-180.0 + x * w, -90.0 + y * h, -180.0 + (x + 1) * w, -90.0 + (y + 1) * h)


def cell_to_ancestors(cells: np.ndarray, levels: list[int]) -> dict[int, np.ndarray]:
    """For each requested coarser level, the ancestor ids of `cells`."""
    r = cell_res(cells)
    out = {}
    for lv in levels:
        out[lv] = cell_parent(cells, r - lv)
    return out


# ------------------------------------------------------------- covering


def _bbox_disjoint(b1, b2) -> bool:
    return b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]


def _edge_intersects_box(geom_edges, box) -> bool:
    """Any polygon edge intersects the box rectangle (separating-axis on
    segment vs axis-aligned box, vectorized)."""
    x1, y1, x2, y2 = geom_edges
    bx0, by0, bx1, by1 = box
    # quick reject: edge bbox vs box
    emn_x = np.minimum(x1, x2)
    emx_x = np.maximum(x1, x2)
    emn_y = np.minimum(y1, y2)
    emx_y = np.maximum(y1, y2)
    cand = ~((emx_x < bx0) | (emn_x > bx1) | (emx_y < by0) | (emn_y > by1))
    if not cand.any():
        return False
    x1, y1, x2, y2 = x1[cand], y1[cand], x2[cand], y2[cand]
    # line side test: all 4 box corners strictly same side -> no intersection
    dx = x2 - x1
    dy = y2 - y1
    corners = np.array([[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]])
    s = np.stack([dx * (cy - y1) - dy * (cx - x1) for cx, cy in corners], axis=0)
    same_side = (s > 0).all(axis=0) | (s < 0).all(axis=0)
    return bool((~same_side).any())


def cover_polygon(
    geom: PackedGeometry, max_res: int, min_res: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Compact cell cover of a polygon.

    Returns (cells uint64[], full bool[]): FULL cells are entirely inside
    the polygon (emitted at the coarsest resolution where that holds — the
    cover is compact by construction); BOUNDARY cells are max_res cells
    that intersect the polygon outline (or contain part of it).
    """
    if geom.is_empty():
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=bool)
    # edge soup once
    coords = geom.coords
    ro = geom.ring_offsets
    ends = np.empty_like(coords)
    for i in range(geom.n_rings):
        a, b = ro[i], ro[i + 1]
        ends[a : b - 1] = coords[a + 1 : b]
        ends[b - 1] = coords[a]
    edges = (coords[:, 0], coords[:, 1], ends[:, 0], ends[:, 1])
    gb = (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )

    cells_out = []
    full_out = []
    stack = [int(c) for c in encode_points(np.array([-90.0, 90.0, -90.0, 90.0]),
                                           np.array([-45.0, -45.0, 45.0, 45.0]), 1)]
    seen = set(stack)
    while stack:
        cell = stack.pop()
        cb = cell_bounds(cell)
        if _bbox_disjoint(cb, gb):
            continue
        r = cell >> 58
        crosses = _edge_intersects_box(edges, cb)
        if not crosses:
            # either fully inside, fully outside, or polygon strictly inside cell
            center = np.array([[(cb[0] + cb[2]) / 2.0, (cb[1] + cb[3]) / 2.0]])
            inside = bool(points_in_packed(center, geom)[0])
            poly_inside_cell = (
                gb[0] >= cb[0] and gb[1] >= cb[1] and gb[2] <= cb[2] and gb[3] <= cb[3]
            )
            if inside and not poly_inside_cell and r >= min_res:
                cells_out.append(cell)
                full_out.append(True)
                continue
            if not inside and not poly_inside_cell:
                continue
            # polygon nested inside this cell -> must recurse
        if r >= max_res:
            cells_out.append(cell)
            full_out.append(False)
            continue
        for ch in cell_children(cell):
            ich = int(ch)
            if ich not in seen:
                seen.add(ich)
                stack.append(ich)
    return np.array(cells_out, dtype=np.uint64), np.array(full_out, dtype=bool)


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """Merge any 4 sibling cells into their parent, repeatedly (for covers
    built cell-by-cell rather than by recursive descent)."""
    cells = set(int(c) for c in cells)
    changed = True
    while changed:
        changed = False
        by_parent = {}
        for c in cells:
            r = c >> 58
            if r == 0:
                continue
            p = ((c & ((1 << 58) - 1)) >> 2) | ((r - 1) << 58)
            by_parent.setdefault(p, []).append(c)
        for p, kids in by_parent.items():
            if len(kids) == 4:
                for k in kids:
                    cells.discard(k)
                cells.add(p)
                changed = True
    return np.array(sorted(cells), dtype=np.uint64)
