"""Vectorized geometry kernels (pure numpy).

These are the engine's equivalents of the reference's jsts/turf calls
(reference index.js:325-445, 733-784, 1035-1043) plus the point-in-polygon
and distance kernels the serving layer needs (the reference delegates
lookup to downstream libraries, README.md:125-156). Everything operates on
flat numpy arrays so a single call processes an entire Arrow batch.
"""

from __future__ import annotations

import numpy as np

from .codec import PackedGeometry, from_rings

# mapbox/geojson-area uses the WGS84 semi-major axis as a sphere radius
# (reference consumes it at index.js:747,760,1139 for m2 thresholds).
EARTH_RADIUS_M = 6378137.0
# Reference precision model: 1e6 fixed grid == 6 decimal places
# (reference index.js:327-328).
PRECISION_DECIMALS = 6

__all__ = [
    "snap",
    "bbox",
    "ring_signed_area_planar",
    "planar_area",
    "ring_area_sq_meters",
    "geodesic_area_m2",
    "points_in_rings",
    "points_in_packed",
    "point_segment_distance_m",
    "min_distance_to_boundary_m",
    "ring_interior_point",
    "geom_hash",
]


def snap(coords: np.ndarray, decimals: int = PRECISION_DECIMALS) -> np.ndarray:
    """Precision reduction: snap coordinates to the 1e-6 degree grid — the
    engine's GeometryPrecisionReducer (reference index.js:327-328, 356-359)."""
    return np.round(coords, decimals)


def bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(min_x, min_y, max_x, max_y) over a vertex array."""
    if len(coords) == 0:
        return (np.nan, np.nan, np.nan, np.nan)
    mn = coords.min(axis=0)
    mx = coords.max(axis=0)
    return (float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1]))


# ---------------------------------------------------------------- areas


def ring_signed_area_planar(ring: np.ndarray) -> float:
    """Shoelace signed area in square DEGREES on raw lon-lat (CCW positive).

    The reference keeps two area units alive: planar deg2 from
    jsts getArea() for significance thresholds (index.js:1090-1092) and
    geodesic m2 for size filters (index.js:747,760). This is the deg2 one.
    """
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def planar_area(geom: PackedGeometry) -> float:
    """Total planar area in deg2: sum |shell| - sum |holes| per polygon."""
    total = 0.0
    for j in range(geom.n_polys):
        rings = geom.poly_rings(j)
        total += abs(ring_signed_area_planar(rings[0]))
        for h in rings[1:]:
            total -= abs(ring_signed_area_planar(h))
    return total


def ring_area_sq_meters(ring: np.ndarray) -> float:
    """Unsigned spherical ring area in m2 (Chamberlain & Duquette 2007,
    'Some algorithms for polygons on a sphere' — the same formula the
    reference consumes through @mapbox/geojson-area)."""
    if len(ring) < 3:
        return 0.0
    lam = np.radians(ring[:, 0])
    phi = np.radians(ring[:, 1])
    lam2 = np.roll(lam, -1)
    phi2 = np.roll(phi, -1)
    s = np.sum((lam2 - lam) * (2.0 + np.sin(phi) + np.sin(phi2)))
    return abs(s * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)


def geodesic_area_m2(geom: PackedGeometry) -> float:
    """Total spherical area in m2: shell minus holes per polygon."""
    total = 0.0
    for j in range(geom.n_polys):
        rings = geom.poly_rings(j)
        total += ring_area_sq_meters(rings[0])
        for h in rings[1:]:
            total -= ring_area_sq_meters(h)
    return total


# ------------------------------------------------- point-in-polygon (PIP)

# Cap the edges x points broadcast at ~8M float64 (64 MB) per chunk.
_PIP_CHUNK_BUDGET = 8_000_000


def _crossings(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Ray-casting crossing counts for points (px,py) against edge set.
    Rays go toward +x; an edge is crossed when it straddles py and the
    intersection x is strictly right of px. Vectorized points x edges."""
    px = px[:, None]
    py = py[:, None]
    straddle = (y1 > py) != (y2 > py)
    # x of edge at height py (safe where straddle; garbage elsewhere, masked)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hit = straddle & (px < xint)
    return hit.sum(axis=1)


def points_in_rings(points: np.ndarray, coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon over a ring soup.

    Global even-odd parity across ALL edges of ALL rings: for a valid
    (multi)polygon whose polygons are disjoint and whose holes nest inside
    shells, a point is inside iff its total crossing parity is odd — holes
    flip parity, sibling polygons contribute even counts. One vectorized
    pass over the whole edge soup.
    """
    m = len(points)
    if m == 0:
        return np.zeros(0, dtype=bool)
    n_rings = len(ring_offsets) - 1
    if n_rings == 0 or len(coords) == 0:
        return np.zeros(m, dtype=bool)
    # Build edge arrays once: for each ring, edges (i -> i+1, wrap last -> first).
    starts = coords
    ends = np.empty_like(coords)
    for i in range(n_rings):
        a, b = ring_offsets[i], ring_offsets[i + 1]
        ends[a : b - 1] = coords[a + 1 : b]
        ends[b - 1] = coords[a]
    x1, y1 = starts[:, 0], starts[:, 1]
    x2, y2 = ends[:, 0], ends[:, 1]
    px, py = points[:, 0], points[:, 1]
    n_edges = len(x1)
    chunk = max(1, _PIP_CHUNK_BUDGET // max(n_edges, 1))
    parity = np.empty(m, dtype=np.int64)
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        parity[s:e] = _crossings(px[s:e], py[s:e], x1, y1, x2, y2)
    return (parity & 1).astype(bool)


def points_in_packed(points: np.ndarray, geom: PackedGeometry) -> np.ndarray:
    return points_in_rings(points, geom.coords, geom.ring_offsets)


def points_in_edges(
    px: np.ndarray, py: np.ndarray, x1: np.ndarray, y1: np.ndarray,
    x2: np.ndarray, y2: np.ndarray,
) -> np.ndarray:
    """Even-odd PIP against a prebuilt edge soup (see CellMap.zone_edges —
    skips the per-call edge-array construction of points_in_rings)."""
    m = len(px)
    if m == 0 or len(x1) == 0:
        return np.zeros(m, dtype=bool)
    chunk = max(1, _PIP_CHUNK_BUDGET // max(len(x1), 1))
    parity = np.empty(m, dtype=np.int64)
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        parity[s:e] = _crossings(px[s:e], py[s:e], x1, y1, x2, y2)
    return (parity & 1).astype(bool)


def pair_edge_d2(pxe, pye, ax, ay, bx, by):
    """Squared equirectangular point-to-segment distance, elementwise
    (broadcast-compatible). OP-FOR-OP the same arithmetic as
    min_distance_edges_m's loop body — the spatial join's pair-vectorized
    kNN path relies on the two producing bit-identical values, so any
    precision change here must land in both (and the pair-vs-loop
    equality tests in tests/test_cover_scale.py will catch a drift)."""
    plam = np.radians(pxe)
    pphi = np.radians(pye)
    cosphi = np.cos(pphi)
    axp = (np.radians(ax) - plam) * cosphi
    ayp = np.radians(ay) - pphi
    bxp = (np.radians(bx) - plam) * cosphi
    byp = np.radians(by) - pphi
    dx = bxp - axp
    dy = byp - ayp
    seg_len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -(axp * dx + ayp * dy) / seg_len2
    t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
    cx = axp + t * dx
    cy = ayp + t * dy
    return cx * cx + cy * cy


def min_distance_edges_m(
    px: np.ndarray, py: np.ndarray, ax: np.ndarray, ay: np.ndarray,
    bx: np.ndarray, by: np.ndarray,
) -> np.ndarray:
    """min_distance_to_boundary_m against a prebuilt edge soup (1D arrays;
    no per-call segment-array construction)."""
    m = len(px)
    if m == 0:
        return np.zeros(0)
    n = len(ax)
    if n == 0:
        return np.full(m, np.inf)
    plam = np.radians(px)[:, None]
    pphi = np.radians(py)[:, None]
    cosphi = np.cos(pphi)
    out = np.empty(m)
    chunk = max(1, _PIP_CHUNK_BUDGET // n)
    alam = np.radians(ax)[None, :]
    aphi = np.radians(ay)[None, :]
    blam = np.radians(bx)[None, :]
    bphi = np.radians(by)[None, :]
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        axp = (alam - plam[s:e]) * cosphi[s:e]
        ayp = aphi - pphi[s:e]
        bxp = (blam - plam[s:e]) * cosphi[s:e]
        byp = bphi - pphi[s:e]
        dx = bxp - axp
        dy = byp - ayp
        seg_len2 = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = -(axp * dx + ayp * dy) / seg_len2
        t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
        cx = axp + t * dx
        cy = ayp + t * dy
        out[s:e] = np.sqrt((cx * cx + cy * cy).min(axis=1))
    return out * EARTH_RADIUS_M


# --------------------------------------------------------- distances (m)


def point_segment_distance_m(points: np.ndarray, seg_a: np.ndarray, seg_b: np.ndarray) -> np.ndarray:
    """Min distance in meters from each point to ANY segment (a[i], b[i]).

    Local equirectangular projection centered per point latitude — exact
    enough at the 1852 m territorial-waters scale (north_star; reference
    states the semantics at README.md:234 but has no kernel).
    Returns float64[n_points].
    """
    m = len(points)
    if m == 0:
        return np.zeros(0)
    n = len(seg_a)
    if n == 0:
        return np.full(m, np.inf)
    plam = np.radians(points[:, 0])[:, None]
    pphi = np.radians(points[:, 1])[:, None]
    alam = np.radians(seg_a[:, 0])[None, :]
    aphi = np.radians(seg_a[:, 1])[None, :]
    blam = np.radians(seg_b[:, 0])[None, :]
    bphi = np.radians(seg_b[:, 1])[None, :]
    cosphi = np.cos(pphi)
    # project into meters around each point
    ax = (alam - plam) * cosphi
    ay = aphi - pphi
    bx = (blam - plam) * cosphi
    by = bphi - pphi
    dx = bx - ax
    dy = by - ay
    seg_len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -(ax * dx + ay * dy) / seg_len2
    t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = cx * cx + cy * cy
    return np.sqrt(d2.min(axis=1)) * EARTH_RADIUS_M


def _boundary_segments(geom: PackedGeometry) -> tuple[np.ndarray, np.ndarray]:
    coords = geom.coords
    ends = np.empty_like(coords)
    ro = geom.ring_offsets
    for i in range(geom.n_rings):
        a, b = ro[i], ro[i + 1]
        ends[a : b - 1] = coords[a + 1 : b]
        ends[b - 1] = coords[a]
    return coords, ends


def min_distance_to_boundary_m(points: np.ndarray, geom: PackedGeometry) -> np.ndarray:
    """Distance in meters from each point to the polygon boundary (0 is NOT
    special-cased for interior points — callers PIP-test first)."""
    a, b = _boundary_segments(geom)
    m = len(points)
    if m == 0:
        return np.zeros(0)
    # chunk points to bound the points x segments broadcast
    n = max(len(a), 1)
    chunk = max(1, _PIP_CHUNK_BUDGET // n)
    out = np.empty(m)
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        out[s:e] = point_segment_distance_m(points[s:e], a, b)
    return out


# ----------------------------------------------------------- ring utils


def ring_interior_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly inside a simple ring: cast a horizontal line at the
    mid-height of the ring, take the midpoint of the two leftmost crossings."""
    ys = ring[:, 1]
    ymid = (ys.min() + ys.max()) / 2.0
    # avoid passing exactly through a vertex
    if np.any(ys == ymid):
        uniq = np.unique(ys)
        above = uniq[uniq > ymid]
        ymid = (ymid + (above[0] if len(above) else ys.max())) / 2.0
        if np.any(ys == ymid):  # pathological; nudge by epsilon
            ymid += (ys.max() - ys.min()) * 1e-9 + 1e-12
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    straddle = (y1 > ymid) != (y2 > ymid)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (ymid - y1) * (x2 - x1) / (y2 - y1)
    xs = np.sort(xint[straddle])
    if len(xs) < 2:
        # degenerate ring; fall back to centroid
        return ring.mean(axis=0)
    return np.array([(xs[0] + xs[1]) / 2.0, ymid])


def geom_hash(geom: PackedGeometry) -> str:
    """Canonical content hash of a geometry: md5 over snapped, canonically
    ordered ring bytes (engine analog of the reference's memoized zone-geom
    hash, index.js:1035-1043, and equality guard, index.js:1592)."""
    import hashlib

    h = hashlib.md5()
    rings = []
    for i in range(geom.n_rings):
        r = snap(geom.ring(i))
        # rotate ring to start at lexicographically smallest vertex
        if len(r):
            k = np.lexsort((r[:, 1], r[:, 0]))[0]
            r = np.roll(r, -k, axis=0)
        rings.append(r.tobytes())
    for b in sorted(rings):
        h.update(b)
    return h.hexdigest()


def make_box(min_x: float, min_y: float, max_x: float, max_y: float) -> PackedGeometry:
    """Rectangle constructor (engine analog of the reference's ocean band
    rectangles, index.js:1241-1247). CCW shell."""
    ring = np.array(
        [[min_x, min_y], [max_x, min_y], [max_x, max_y], [min_x, max_y]], dtype=np.float64
    )
    return from_rings([[ring]])
