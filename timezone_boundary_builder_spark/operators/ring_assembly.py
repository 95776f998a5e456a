"""OSM relation-way -> closed-ring assembly (SURVEY.md S2).

The reference delegates this to the `osmtogeojson` dependency (one call,
reference index.js:504): OSM relations arrive as bags of member *ways*
(open polylines, arbitrary order and direction); the assembler chains
ways whose endpoints meet into closed rings, then classifies rings as
outer shells vs inner holes by containment nesting.

Engine version: `groupBy(relation_id).applyInPandas(assemble)` — each
relation's ways are tiny (<= a few hundred polylines), relations
parallelize across partitions, and there is exactly ONE shuffle (the
groupBy on relation_id). At 10^12-row scale the relation table is the
small side of the pipeline (millions of relations, not trillions), so
this stage is never the bottleneck; the hash partitioning on relation_id
is uniform because relation ids are arbitrary keys.

Pure-numpy chaining + the existing ray-casting kernels for nesting; no
per-row Python objects beyond the per-relation ring lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geom.codec import EMPTY, PackedGeometry, from_rings, to_geojson
from ..geom.kernels import planar_area, points_in_rings, ring_signed_area_planar

RELATION_SCHEMA = (
    "relation_id string, geometry string, n_polys int, n_rings int, "
    "n_dropped_ways int, area_deg2 double"
)

# 0.2 x 0.2 deg placeholder at null island — the reference writes exactly
# this square when a per-tz boundary download fails (index.js:643-660)
NULL_ISLAND_GJ = (
    '{"type":"Polygon","coordinates":[[[-0.1,-0.1],[0.1,-0.1],'
    "[0.1,0.1],[-0.1,0.1],[-0.1,-0.1]]]}"
)


def chain_ways(ways: list[np.ndarray]) -> tuple[list[np.ndarray], int]:
    """Chain open polylines into closed rings by endpoint matching.

    Ways may appear in any order and either direction (OSM gives no
    guarantee; osmtogeojson normalizes the same way). Returns (rings,
    n_dropped) where rings are OPEN (n,2) arrays and n_dropped counts
    ways left in chains that never closed (broken relations are dropped,
    not fatal — mirroring osmtogeojson's tolerance).
    """
    pending = [np.asarray(w, dtype=np.float64) for w in ways]
    pending = [w for w in pending if len(w) >= 2]
    rings: list[np.ndarray] = []
    dropped = 0
    while pending:
        chain = pending.pop(0)
        progressed = True
        while progressed and not np.array_equal(chain[0], chain[-1]):
            progressed = False
            for i, w in enumerate(pending):
                if np.array_equal(w[0], chain[-1]):
                    chain = np.concatenate([chain, w[1:]])
                elif np.array_equal(w[-1], chain[-1]):
                    chain = np.concatenate([chain, w[::-1][1:]])
                elif np.array_equal(w[-1], chain[0]):
                    chain = np.concatenate([w, chain[1:]])
                elif np.array_equal(w[0], chain[0]):
                    chain = np.concatenate([w[::-1], chain[1:]])
                else:
                    continue
                pending.pop(i)
                progressed = True
                break
        if len(chain) >= 4 and np.array_equal(chain[0], chain[-1]):
            rings.append(chain[:-1])
        else:
            dropped += 1
    return rings, dropped


def nest_rings(rings: list[np.ndarray]) -> PackedGeometry:
    """Classify rings into shells and holes by even-odd containment depth
    and assemble a valid MultiPolygon.

    depth(r) = number of OTHER rings containing r's interior point. Even
    depth -> shell; odd depth -> hole of the deepest shell containing it.
    Winding is normalized (shell CCW, hole CW) per the GeoJSON spec —
    the engine's parity PIP doesn't care, but downstream consumers might.
    """
    rings = [r for r in rings if len(r) >= 3 and abs(ring_signed_area_planar(r)) > 0]
    if not rings:
        return EMPTY
    n = len(rings)
    # contains[j, i]: ring j contains ring i. Valid OSM rings never cross,
    # so containment = majority of ring i's vertices inside ring j (a probe
    # point could land inside a deeper nested ring; vertices cannot —
    # majority absorbs the odd vertex that touches ring j's boundary).
    contains = np.zeros((n, n), dtype=bool)
    for j, rj in enumerate(rings):
        offs = np.array([0, len(rj)], dtype=np.int64)
        for i, ri in enumerate(rings):
            if i == j:
                continue
            inside = points_in_rings(ri, rj, offs)
            contains[j, i] = inside.mean() > 0.5
    depth = contains.sum(axis=0)
    shells = [i for i in range(n) if depth[i] % 2 == 0]
    polys: dict[int, list[np.ndarray]] = {}
    for i in shells:
        s = rings[i]
        if ring_signed_area_planar(s) < 0:
            s = s[::-1]
        polys[i] = [s]
    for i in range(n):
        if depth[i] % 2 == 0:
            continue
        # parent = the containing shell of maximal depth (immediate parent)
        cand = [j for j in shells if contains[j, i]]
        if not cand:
            continue
        parent = max(cand, key=lambda j: depth[j])
        h = rings[i]
        if ring_signed_area_planar(h) > 0:
            h = h[::-1]
        polys[parent].append(h)
    return from_rings([polys[i] for i in sorted(polys)])


def assemble_multipolygon(ways: list[np.ndarray]) -> tuple[PackedGeometry, int]:
    rings, dropped = chain_ways(ways)
    return nest_rings(rings), dropped


def assemble_relations(ways_df: DataFrame, null_island_fallback: bool = False) -> DataFrame:
    """ways(relation_id string, way_id long, seq int,
    coords array<array<double>>) -> one geometry row per relation.

    Engine analog of `osmtogeojson(data)` + ring classification
    (reference index.js:504); the later boundary-filter + union step is
    `source_union` (SURVEY S3). With null_island_fallback, a relation
    whose ways produce no closed ring yields the reference's 0.2-degree
    placeholder square at (0,0) instead of an empty geometry
    (S6, index.js:643-660)."""

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq", kind="stable")
        ways = [np.asarray([list(p) for p in c], dtype=np.float64) for c in pdf["coords"]]
        geom, dropped = assemble_multipolygon(ways)
        if geom.is_empty() and null_island_fallback:
            from ..geom.codec import from_geojson

            geom = from_geojson(NULL_ISLAND_GJ)
        return pd.DataFrame(
            {
                "relation_id": [pdf["relation_id"].iloc[0]],
                "geometry": [to_geojson(geom, as_string=True)],
                "n_polys": [geom.n_polys],
                "n_rings": [geom.n_rings],
                "n_dropped_ways": [dropped],
                "area_deg2": [planar_area(geom)],
            }
        )

    return ways_df.groupBy("relation_id").applyInPandas(_assemble, RELATION_SCHEMA)
