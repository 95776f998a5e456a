"""Boolean polygon operations (union / intersection / difference) in pure
numpy+python — the engine's replacement for the reference's JSTS overlay ops
(reference index.js:347-407: union/intersection/difference dispatch with a
TopologyException repair ladder).

Algorithm: vertical slab decomposition.

1. Snap both operands to the 1e-6 degree grid (the reference's fixed
   precision model, index.js:327-328) — this alone removes most of the
   degeneracy JSTS needs its repair ladder for.
2. Slab boundaries = every vertex x of either operand + every x where an
   edge of A properly crosses an edge of B. Inside one slab no two edges
   cross, so the slab is a stack of "gap" regions between edges sorted by
   their y at the slab midline.
3. Walk the sorted edges accumulating even-odd parity separately for A and
   B; each gap region knows (insideA, insideB); the boolean predicate picks
   gaps; maximal runs of kept gaps become trapezoids.
4. Reassemble: trapezoid boundary edges are emitted CCW; opposite directed
   edges cancel (exact-match for slab-internal edges, elementary-interval
   arithmetic for the vertical slab walls shared between adjacent slabs);
   the survivors chain into rings; even-odd containment depth classifies
   shells vs holes.

Properties: deterministic, handles shared edges / collinear overlaps /
holes / multipolygons; even-odd fill semantics. Output may split regions
that merely touch at an edge into separate polygons of one multipolygon —
semantically identical under even-odd PIP and area, and tests compare via
those semantics, not ring-by-ring.
"""

from __future__ import annotations

import numpy as np

from .codec import EMPTY, PackedGeometry, from_rings
from .kernels import (
    points_in_rings,
    ring_interior_point,
    ring_signed_area_planar,
    snap,
)

__all__ = ["boolean_op", "union", "intersection", "difference", "dissolve", "clip_to_box"]

_EPS_X = 1e-9  # slab dedupe tolerance, degrees (~0.1 mm)
_NODE_DECIMALS = 9  # node key rounding for edge cancellation / chaining


def _edges_of(geom: PackedGeometry) -> np.ndarray:
    """(n, 4) array of edges x1,y1,x2,y2 over all rings, zero-length dropped."""
    if geom.is_empty():
        return np.zeros((0, 4))
    segs = []
    for i in range(geom.n_rings):
        r = geom.ring(i)
        nxt = np.roll(r, -1, axis=0)
        seg = np.concatenate([r, nxt], axis=1)
        segs.append(seg)
    e = np.concatenate(segs, axis=0)
    keep = (e[:, 0] != e[:, 2]) | (e[:, 1] != e[:, 3])
    return e[keep]


def _crossing_xs(ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """x coordinates of proper interior crossings between edge sets."""
    if len(ea) == 0 or len(eb) == 0:
        return np.zeros(0)
    a1x = ea[:, 0][:, None]
    a1y = ea[:, 1][:, None]
    rx = (ea[:, 2] - ea[:, 0])[:, None]
    ry = (ea[:, 3] - ea[:, 1])[:, None]
    b1x = eb[:, 0][None, :]
    b1y = eb[:, 1][None, :]
    sx = (eb[:, 2] - eb[:, 0])[None, :]
    sy = (eb[:, 3] - eb[:, 1])[None, :]
    denom = rx * sy - ry * sx
    qpx = b1x - a1x
    qpy = b1y - a1y
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * sy - qpy * sx) / denom
        u = (qpx * ry - qpy * rx) / denom
        ok = (denom != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
        xint = a1x + t * rx
    return xint[ok]


def _slab_trapezoids(ea: np.ndarray, eb: np.ndarray, op: str) -> list:
    """Decompose the plane into slabs and emit kept trapezoids
    (xl, xr, ylb, yrb, ylt, yrt)."""
    all_edges = np.concatenate([ea, eb], axis=0)
    owner_b = np.zeros(len(all_edges), dtype=bool)
    owner_b[len(ea) :] = True

    xs = np.concatenate(
        [all_edges[:, 0], all_edges[:, 2], _crossing_xs(ea, eb)]
    )
    xs = np.unique(xs)
    if len(xs) > 1:
        # merge near-identical breaks
        keep = np.concatenate([[True], np.diff(xs) > _EPS_X])
        xs = xs[keep]
    if len(xs) < 2:
        return []

    ex_min = np.minimum(all_edges[:, 0], all_edges[:, 2])
    ex_max = np.maximum(all_edges[:, 0], all_edges[:, 2])
    non_vert = all_edges[:, 0] != all_edges[:, 2]

    traps = []
    for si in range(len(xs) - 1):
        xl, xr = xs[si], xs[si + 1]
        if xr - xl <= _EPS_X:
            continue
        sel = non_vert & (ex_min <= xl + _EPS_X) & (ex_max >= xr - _EPS_X)
        if not sel.any():
            continue
        e = all_edges[sel]
        ob = owner_b[sel]
        x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        slope = (y2 - y1) / (x2 - x1)
        yl = y1 + (xl - x1) * slope
        yr = y1 + (xr - x1) * slope
        ym = 0.5 * (yl + yr)
        order = np.lexsort((yl, ym))
        yl, yr, ob = yl[order], yr[order], ob[order]
        in_a = np.cumsum(~ob) & 1
        in_b = np.cumsum(ob) & 1
        if op == "union":
            keep_gap = (in_a | in_b).astype(bool)
        elif op == "intersection":
            keep_gap = (in_a & in_b).astype(bool)
        elif op == "difference":
            keep_gap = in_a.astype(bool) & ~in_b.astype(bool)
        else:  # pragma: no cover
            raise ValueError(op)
        keep_gap = keep_gap[:-1]  # gap i sits between edge i and edge i+1
        i = 0
        n = len(keep_gap)
        while i < n:
            if keep_gap[i]:
                j = i
                while j + 1 < n and keep_gap[j + 1]:
                    j += 1
                ylb, yrb = yl[i], yr[i]
                ylt, yrt = yl[j + 1], yr[j + 1]
                if (ylt - ylb) + (yrt - yrb) > 0:
                    traps.append((xl, xr, ylb, yrb, ylt, yrt))
                i = j + 1
            i += 1
    return traps


def _key(x: float, y: float) -> tuple:
    return (round(x, _NODE_DECIMALS), round(y, _NODE_DECIMALS))


def _reassemble(traps: list) -> PackedGeometry:
    """Cancel opposite directed edges, chain survivors into rings, classify
    shells/holes by even-odd containment depth."""
    if not traps:
        return EMPTY

    # --- collect directed edges ---------------------------------------
    # verticals: per x wall, signed elementary intervals
    from collections import defaultdict

    wall = defaultdict(list)  # xkey -> list of (ylow, yhigh, sign)  sign +1 = upward
    edges = []  # non-vertical directed edges as (p_from, p_to)

    for xl, xr, ylb, yrb, ylt, yrt in traps:
        xlk = round(xl, _NODE_DECIMALS)
        xrk = round(xr, _NODE_DECIMALS)
        # CCW: bottom L->R, right up, top R->L, left down
        edges.append(((xl, ylb), (xr, yrb)))
        wall[xrk].append((round(yrb, _NODE_DECIMALS), round(yrt, _NODE_DECIMALS), +1))
        edges.append(((xr, yrt), (xl, ylt)))
        wall[xlk].append((round(ylt, _NODE_DECIMALS), round(ylb, _NODE_DECIMALS), -1))

    # --- cancel exact-match opposite non-vertical edges ----------------
    seen = {}
    for p, q in edges:
        kp, kq = _key(*p), _key(*q)
        if (kq, kp) in seen and seen[(kq, kp)]:
            seen[(kq, kp)] -= 1
        else:
            seen[(kp, kq)] = seen.get((kp, kq), 0) + 1
    directed = []
    for (kp, kq), cnt in seen.items():
        for _ in range(cnt):
            directed.append((kp, kq))

    # --- vertical walls: net coverage over elementary intervals --------
    for xk, intervals in wall.items():
        ys = sorted({y for lo, hi, _ in intervals for y in (lo, hi)})
        if len(ys) < 2:
            continue
        norm = [(min(lo, hi), max(lo, hi), s) for lo, hi, s in intervals]
        for k in range(len(ys) - 1):
            lo, hi = ys[k], ys[k + 1]
            if hi <= lo:
                continue
            mid = 0.5 * (lo + hi)
            net = sum(s for nlo, nhi, s in norm if nlo < mid < nhi)
            if net > 0:
                for _ in range(net):
                    directed.append(((xk, lo), (xk, hi)))
            elif net < 0:
                for _ in range(-net):
                    directed.append(((xk, hi), (xk, lo)))

    if not directed:
        return EMPTY

    # --- chain directed edges into rings --------------------------------
    out_map = defaultdict(list)
    for idx, (p, q) in enumerate(directed):
        out_map[p].append(idx)
    used = np.zeros(len(directed), dtype=bool)
    rings = []
    for start_idx in range(len(directed)):
        if used[start_idx]:
            continue
        ring = []
        idx = start_idx
        p0 = directed[idx][0]
        guard = 0
        while True:
            used[idx] = True
            p, q = directed[idx]
            ring.append(p)
            if q == p0:
                break
            cands = [i for i in out_map[q] if not used[i]]
            if not cands:
                ring = []  # broken chain — drop (degenerate cancellation residue)
                break
            if len(cands) == 1:
                idx = cands[0]
            else:
                # planar face walk: take the most counterclockwise turn
                vin = (p[0] - q[0], p[1] - q[1])  # reversed incoming
                ain = np.arctan2(vin[1], vin[0])

                def turn(i):
                    r = directed[i][1]
                    a = np.arctan2(r[1] - q[1], r[0] - q[0])
                    d = a - ain
                    while d <= 0:
                        d += 2 * np.pi
                    return d

                idx = min(cands, key=turn)
            guard += 1
            if guard > len(directed) + 1:
                ring = []
                break
        if len(ring) >= 3:
            arr = np.asarray(ring, dtype=np.float64)
            arr = _drop_collinear(arr)
            if len(arr) >= 3 and abs(ring_signed_area_planar(arr)) > 0:
                rings.append(arr)

    if not rings:
        return EMPTY

    # --- classify shells/holes by even-odd ring-nesting depth -----------
    # Ring A contains ring B iff a point of B that is NOT on A's boundary is
    # inside A (result rings never cross, they can only nest or touch).
    areas = [abs(ring_signed_area_planar(r)) for r in rings]
    nr = len(rings)
    contains = np.zeros((nr, nr), dtype=bool)  # contains[a, b]
    for a in range(nr):
        ra = rings[a]
        offs = np.array([0, len(ra)], dtype=np.int64)
        for b in range(nr):
            if a == b or areas[a] < areas[b]:
                continue
            pt = _probe_point_off_ring(rings[b], ra)
            if pt is not None:
                contains[a, b] = points_in_rings(pt[None, :], ra, offs)[0]
    depth = contains.sum(axis=0)
    shells = []  # list of [shell, hole, ...]
    shell_of = {}
    for oi in np.argsort(areas)[::-1]:
        ring = rings[oi]
        if depth[oi] % 2 == 0:
            if ring_signed_area_planar(ring) < 0:
                ring = ring[::-1]
            shell_of[oi] = len(shells)
            shells.append([ring])
        else:
            if ring_signed_area_planar(ring) > 0:
                ring = ring[::-1]
            # innermost containing shell = containing shell with min area
            parents = [a for a in range(nr) if contains[a, oi] and depth[a] % 2 == 0]
            if parents:
                parent = min(parents, key=lambda a: areas[a])
                shells[shell_of[parent]].append(ring)
            elif shells:
                shells[0].append(ring)
    return from_rings(shells)


def _probe_point_off_ring(ring_b: np.ndarray, ring_a: np.ndarray):
    """A point of ring_b that does not lie on ring_a's boundary (vertices
    first, then edge midpoints, then the enclosed-region interior point)."""
    candidates = list(ring_b[: min(len(ring_b), 8)])
    mids = 0.5 * (ring_b + np.roll(ring_b, -1, axis=0))
    candidates += list(mids[: min(len(mids), 8)])
    for pt in candidates:
        if not _on_ring(pt, ring_a):
            return np.asarray(pt, dtype=np.float64)
    pt = ring_interior_point(ring_b)
    return None if _on_ring(pt, ring_a) else pt


def _on_ring(pt, ring: np.ndarray, eps: float = 1e-9) -> bool:
    """Planar distance from pt to any ring edge < eps (degrees)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    d = b - a
    ap = np.asarray(pt)[None, :] - a
    len2 = (d * d).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ap * d).sum(axis=1) / len2
    t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
    closest = a + t[:, None] * d
    diff = np.asarray(pt)[None, :] - closest
    return bool((np.sqrt((diff * diff).sum(axis=1)) < eps).any())


def _drop_collinear(ring: np.ndarray) -> np.ndarray:
    """Remove vertices collinear with their neighbours (removes the Steiner
    points the slab split introduced along original edges)."""
    n = len(ring)
    if n < 3:
        return ring
    prv = np.roll(ring, 1, axis=0)
    nxt = np.roll(ring, -1, axis=0)
    cross = (ring[:, 0] - prv[:, 0]) * (nxt[:, 1] - prv[:, 1]) - (
        ring[:, 1] - prv[:, 1]
    ) * (nxt[:, 0] - prv[:, 0])
    v1 = ring - prv
    v2 = nxt - prv
    scale = np.maximum(
        np.abs(v1).sum(axis=1) * np.abs(v2).sum(axis=1), 1e-30
    )
    keep = np.abs(cross) / scale > 1e-9
    out = ring[keep]
    return out if len(out) >= 3 else ring


def boolean_op(a: PackedGeometry, b: PackedGeometry, op: str) -> PackedGeometry:
    """union | intersection | difference (a minus b), even-odd semantics."""
    if op == "difference-reverse-order":
        # reference index.js:840-841 — swap operands
        return boolean_op(b, a, "difference")
    if a.is_empty():
        return b if op == "union" else EMPTY
    if b.is_empty():
        return EMPTY if op == "intersection" else a
    a = PackedGeometry(snap(a.coords), a.ring_offsets, a.poly_offsets)
    b = PackedGeometry(snap(b.coords), b.ring_offsets, b.poly_offsets)
    # bbox fast paths (engine analog of the reference's envelope prefilter,
    # index.js:1252-1258)
    amn = a.coords.min(axis=0)
    amx = a.coords.max(axis=0)
    bmn = b.coords.min(axis=0)
    bmx = b.coords.max(axis=0)
    disjoint = (amx[0] < bmn[0]) | (bmx[0] < amn[0]) | (amx[1] < bmn[1]) | (bmx[1] < amn[1])
    if disjoint:
        if op == "union":
            from .codec import merge

            return merge([a, b])
        if op == "intersection":
            return EMPTY
        return a
    traps = _slab_trapezoids(_edges_of(a), _edges_of(b), op)
    return _reassemble(traps)


def union(a, b):
    return boolean_op(a, b, "union")


def intersection(a, b):
    return boolean_op(a, b, "intersection")


def difference(a, b):
    return boolean_op(a, b, "difference")


def dissolve(parts: list) -> PackedGeometry:
    """Cascaded union of many geometries (engine analog of the reference's
    per-source union fold, index.js:530-586). Pairwise tree fold to keep
    intermediate results small."""
    parts = [p for p in parts if p is not None and not p.is_empty()]
    if not parts:
        return EMPTY
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts), 2):
            if i + 1 < len(parts):
                nxt.append(union(parts[i], parts[i + 1]))
            else:
                nxt.append(parts[i])
        parts = nxt
    return parts[0]


def clip_to_box(geom: PackedGeometry, min_x, min_y, max_x, max_y) -> PackedGeometry:
    from .kernels import make_box

    return intersection(geom, make_box(min_x, min_y, max_x, max_y))


def buffer_slop(geom: PackedGeometry, d: float) -> PackedGeometry:
    """Small positive buffer (engine analog of the reference's
    geom.buffer(0.01) slop used to speed release diffs, index.js:1584-1589,
    and the repair ladder's last resort, index.js:385-386).

    Implemented as the union of the polygon with per-edge normal quads and
    per-vertex squares — a conservative superset of the true Minkowski
    disk sum adequate for its only use: swallowing boundary slivers before
    a difference. Not a general-purpose offset."""
    if geom.is_empty() or d <= 0:
        return geom
    parts = [geom]
    for i in range(geom.n_rings):
        ring = geom.ring(i)
        nxt = np.roll(ring, -1, axis=0)
        ex = nxt[:, 0] - ring[:, 0]
        ey = nxt[:, 1] - ring[:, 1]
        ln = np.hypot(ex, ey)
        ok = ln > 0
        nx = np.where(ok, -ey / np.where(ok, ln, 1), 0.0) * d
        ny = np.where(ok, ex / np.where(ok, ln, 1), 0.0) * d
        for j in range(len(ring)):
            if not ok[j]:
                continue
            p1, p2 = ring[j], nxt[j]
            quad = np.array(
                [
                    [p1[0] + nx[j], p1[1] + ny[j]],
                    [p2[0] + nx[j], p2[1] + ny[j]],
                    [p2[0] - nx[j], p2[1] - ny[j]],
                    [p1[0] - nx[j], p1[1] - ny[j]],
                ]
            )
            parts.append(from_rings([[quad]]))
            vx, vy = ring[j]
            parts.append(
                from_rings(
                    [[np.array([[vx - d, vy - d], [vx + d, vy - d], [vx + d, vy + d], [vx - d, vy + d]])]]
                )
            )
    return dissolve(parts)
