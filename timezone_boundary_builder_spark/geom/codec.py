"""GeoJSON <-> packed numpy ring-array codec.

The engine never materializes per-row geometry *objects* inside Spark
workers: geometry travels between stages as GeoJSON strings in DataFrame
columns and is decoded inside pandas/Arrow UDFs into flat numpy arrays
(`coords float64[n,2]` + ring/polygon offset arrays), mirroring how the
reference round-trips geometries through jsts.io.GeoJSONReader/Writer
(reference index.js:325-326, 429-445) but in columnar form.

Rings are stored OPEN (the GeoJSON closing vertex, which repeats the first
vertex, is dropped on decode and re-added on encode).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

__all__ = ["PackedGeometry", "from_geojson", "to_geojson", "from_rings"]


@dataclass
class PackedGeometry:
    """A MultiPolygon as flat numpy arrays.

    coords       : float64[N, 2]  lon-lat vertex soup, rings concatenated
    ring_offsets : int64[R + 1]   coords[ring_offsets[i]:ring_offsets[i+1]] = ring i
    poly_offsets : int64[P + 1]   rings[poly_offsets[j]:poly_offsets[j+1]] = polygon j
                                  (first ring of each polygon is the shell,
                                  the rest are holes)
    """

    coords: np.ndarray
    ring_offsets: np.ndarray
    poly_offsets: np.ndarray

    @property
    def n_rings(self) -> int:
        return len(self.ring_offsets) - 1

    @property
    def n_polys(self) -> int:
        return len(self.poly_offsets) - 1

    def is_empty(self) -> bool:
        return self.n_polys == 0 or len(self.coords) == 0

    def ring(self, i: int) -> np.ndarray:
        return self.coords[self.ring_offsets[i] : self.ring_offsets[i + 1]]

    def poly_rings(self, j: int):
        return [self.ring(i) for i in range(self.poly_offsets[j], self.poly_offsets[j + 1])]

    def rings(self):
        return [self.ring(i) for i in range(self.n_rings)]


EMPTY = PackedGeometry(
    coords=np.zeros((0, 2), dtype=np.float64),
    ring_offsets=np.zeros(1, dtype=np.int64),
    poly_offsets=np.zeros(1, dtype=np.int64),
)


def _close_ring_array(ring: np.ndarray) -> list:
    pts = ring.tolist()
    pts.append(pts[0])
    return pts


def _open_ring(coords_list) -> np.ndarray:
    arr = np.asarray(coords_list, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] < 2:
        raise ValueError(f"bad ring shape {arr.shape}")
    arr = arr[:, :2]
    if len(arr) >= 2 and np.array_equal(arr[0], arr[-1]):
        arr = arr[:-1]
    return arr


def from_rings(polys: list) -> PackedGeometry:
    """Build from nested lists: polys = [[shell, hole, ...], ...] where each
    ring is an (n, 2) array-like of lon-lat pairs (open or closed)."""
    coords, ring_offsets, poly_offsets = [], [0], [0]
    n = 0
    for rings in polys:
        kept = 0
        for ring in rings:
            arr = _open_ring(ring)
            if len(arr) < 3:
                continue
            coords.append(arr)
            n += len(arr)
            ring_offsets.append(n)
            kept += 1
        if kept:
            poly_offsets.append(poly_offsets[-1] + kept)
    if not coords:
        return EMPTY
    return PackedGeometry(
        coords=np.concatenate(coords, axis=0),
        ring_offsets=np.asarray(ring_offsets, dtype=np.int64),
        poly_offsets=np.asarray(poly_offsets, dtype=np.int64),
    )


def from_geojson(obj) -> PackedGeometry:
    """Decode a GeoJSON geometry / Feature / FeatureCollection (dict or JSON
    string) into a PackedGeometry. Polygon is normalized to MultiPolygon;
    GeometryCollections are flattened (reference handles the same trio when
    decomposing overlaps, index.js:1102-1134)."""
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    t = obj.get("type")
    if t == "Feature":
        return from_geojson(obj["geometry"])
    if t == "FeatureCollection":
        parts = [from_geojson(f) for f in obj["features"]]
        return merge(parts)
    if t == "GeometryCollection":
        parts = [from_geojson(g) for g in obj["geometries"]]
        return merge(parts)
    if t == "Polygon":
        return from_rings([obj["coordinates"]])
    if t == "MultiPolygon":
        return from_rings(obj["coordinates"])
    if t in (None,) or obj.get("coordinates") in ([], None):
        return EMPTY
    raise ValueError(f"unsupported GeoJSON type: {t}")


def merge(parts: list) -> PackedGeometry:
    """Concatenate several PackedGeometries into one MultiPolygon (no
    dissolve — polygons are kept as-is)."""
    parts = [p for p in parts if not p.is_empty()]
    if not parts:
        return EMPTY
    if len(parts) == 1:
        return parts[0]
    coords = np.concatenate([p.coords for p in parts], axis=0)
    ring_offsets = [np.zeros(1, dtype=np.int64)]
    poly_offsets = [np.zeros(1, dtype=np.int64)]
    c_base = 0
    r_base = 0
    for p in parts:
        ring_offsets.append(p.ring_offsets[1:] + c_base)
        poly_offsets.append(p.poly_offsets[1:] + r_base)
        c_base += len(p.coords)
        r_base += p.n_rings
    return PackedGeometry(
        coords=coords,
        ring_offsets=np.concatenate(ring_offsets),
        poly_offsets=np.concatenate(poly_offsets),
    )


def to_geojson(geom: PackedGeometry, as_string: bool = False):
    """Encode as GeoJSON: Polygon when single-polygon, else MultiPolygon
    (matching the reference's jsts writer behaviour of emitting the
    narrowest type)."""
    if geom.is_empty():
        obj = {"type": "MultiPolygon", "coordinates": []}
    else:
        polys = []
        for j in range(geom.n_polys):
            polys.append([_close_ring_array(r) for r in geom.poly_rings(j)])
        if len(polys) == 1:
            obj = {"type": "Polygon", "coordinates": polys[0]}
        else:
            obj = {"type": "MultiPolygon", "coordinates": polys}
    return json.dumps(obj, separators=(",", ":")) if as_string else obj
