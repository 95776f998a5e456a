"""Structural GeoJSON lint (SURVEY G16 — engine analog of the reference's
geojsonhint pass over every Overpass result, index.js:543-554, and the
empty-result hard error, index.js:522-527).

`lint_features` annotates each feature row with (lint_ok, lint_error)
via mapInPandas — the checks run next to the data, never on the driver —
so ingest pipelines can `filter(lint_ok)` and route rejects to a
quarantine sink. At scale this is a pure map stage: no shuffle, pushes
down behind whatever scan produced the features.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame

_ALLOWED_TYPES = {"Polygon", "MultiPolygon", "LineString", "Point", "MultiLineString"}


def _ring_self_intersects(ring) -> bool:
    """Proper (interior) crossing between any two non-adjacent edges of a
    ring — a self-intersecting ring is garbage-in for the boolean kernels
    (the reference hits the same class as JSTS TopologyExceptions and
    repairs; the engine quarantines at ingest instead). O(E^2) vectorized;
    ingest features have small rings."""
    import numpy as np

    pts = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(pts) >= 2 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    n = len(pts)
    if n < 4:  # a triangle cannot properly self-intersect
        return False
    a = pts
    b = np.roll(pts, -1, axis=0)
    # pairwise orientation tests: edge i = (a[i], b[i]) vs edge j
    ax, ay = a[:, 0][:, None], a[:, 1][:, None]
    bx, by = b[:, 0][:, None], b[:, 1][:, None]
    cx, cy = a[:, 0][None, :], a[:, 1][None, :]
    dx, dy = b[:, 0][None, :], b[:, 1][None, :]

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(ax, ay, bx, by, cx, cy)
    d2 = orient(ax, ay, bx, by, dx, dy)
    d3 = orient(cx, cy, dx, dy, ax, ay)
    d4 = orient(cx, cy, dx, dy, bx, by)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    # mask self and adjacent edge pairs (they share endpoints)
    idx = np.arange(n)
    adj = (
        (idx[:, None] == idx[None, :])
        | ((idx[:, None] + 1) % n == idx[None, :])
        | ((idx[None, :] + 1) % n == idx[:, None])
    )
    return bool((proper & ~adj).any())


def _rings_properly_cross(r1, r2) -> bool:
    """Any PROPER edge crossing between two rings (touching at vertices or
    along edges is tolerated — common in real OSM data)."""
    import numpy as np

    def edges(r):
        p = np.asarray(r, dtype=np.float64)[:, :2]
        if len(p) >= 2 and np.array_equal(p[0], p[-1]):
            p = p[:-1]
        return p, np.roll(p, -1, axis=0)

    a, b = edges(r1)
    c, d = edges(r2)
    ax, ay = a[:, 0][:, None], a[:, 1][:, None]
    bx, by = b[:, 0][:, None], b[:, 1][:, None]
    cx, cy = c[:, 0][None, :], c[:, 1][None, :]
    dx, dy = d[:, 0][None, :], d[:, 1][None, :]

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(ax, ay, bx, by, cx, cy)
    d2 = orient(ax, ay, bx, by, dx, dy)
    d3 = orient(cx, cy, dx, dy, ax, ay)
    d4 = orient(cx, cy, dx, dy, bx, by)
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def _point_strictly_in_ring(pt, ring) -> bool:
    """Ray-casting parity for one point against one ring (strict: points
    on the boundary count as outside for lint purposes)."""
    import numpy as np

    p = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(p) >= 2 and np.array_equal(p[0], p[-1]):
        p = p[:-1]
    x, y = float(pt[0]), float(pt[1])
    a = p
    b = np.roll(p, -1, axis=0)
    cond = (a[:, 1] > y) != (b[:, 1] > y)
    with_span = cond & (
        x < (b[:, 0] - a[:, 0]) * (y - a[:, 1]) / np.where(cond, b[:, 1] - a[:, 1], 1.0)
        + a[:, 0]
    )
    return bool(with_span.sum() % 2 == 1)


def _invalid_ring_nesting(rings) -> str | None:
    """Inter-ring topology within ONE polygon: holes must not properly
    cross the shell or each other, and no hole may sit inside another
    hole (overlapping/nested holes make boolean results undefined — the
    class of input the reference's JSTS throws TopologyException on)."""
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            if _rings_properly_cross(rings[i], rings[j]):
                return "crossing rings"
    for i in range(1, len(rings)):
        for j in range(1, len(rings)):
            if i != j and _point_strictly_in_ring(rings[j][0], rings[i]):
                return "hole inside hole"
    return None


def lint_geojson(gj: str | None, declared_type: str | None = None) -> str | None:
    """Returns None when valid, else a short error string. Checks mirror
    what geojsonhint catches on the reference's inputs: parseable JSON, a
    known geometry type matching the declared one, closed >=4-point rings
    for areal types, and coordinates inside the WGS84 domain."""
    if gj is None or gj == "":
        return "empty geometry"
    try:
        obj = json.loads(gj)
    except (ValueError, TypeError):
        return "unparseable JSON"
    t = obj.get("type")
    if t not in _ALLOWED_TYPES:
        return f"unknown type {t!r}"
    if declared_type and t != declared_type:
        return f"declared {declared_type!r} but payload is {t!r}"
    coords = obj.get("coordinates")
    if coords in (None, []):
        return "missing coordinates"
    if t in ("Polygon", "MultiPolygon"):
        polys = [coords] if t == "Polygon" else coords
        for rings in polys:
            for ring in rings:
                if len(ring) < 4:
                    return "ring with <4 points"
                if ring[0] != ring[-1]:
                    return "unclosed ring"
                for pt in ring:
                    if not (
                        isinstance(pt, (list, tuple))
                        and len(pt) >= 2
                        and -180.0 <= pt[0] <= 180.0
                        and -90.0 <= pt[1] <= 90.0
                    ):
                        return f"coordinate out of range: {pt!r}"
                if _ring_self_intersects(ring):
                    return "self-intersecting ring"
            if len(rings) > 1:
                nest_err = _invalid_ring_nesting(rings)
                if nest_err:
                    return nest_err
    return None


def lint_features(features: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Adds lint_ok / lint_error columns. Declared type is taken from a
    geom_type column when present (the fixture/overpass shape)."""
    cols = features.columns
    has_declared = "geom_type" in cols

    def _lint(batches):
        for pdf in batches:
            errs = [
                lint_geojson(g, d)
                for g, d in zip(
                    pdf[geometry_col],
                    pdf["geom_type"] if has_declared else [None] * len(pdf),
                )
            ]
            out = pdf.copy()
            out["lint_ok"] = [e is None for e in errs]
            out["lint_error"] = pd.array(errs, dtype=object)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in features.schema.fields
    )
    return features.mapInPandas(_lint, schema + ", lint_ok boolean, lint_error string")


def lint_config(
    zones_config: DataFrame,
    sources: DataFrame,
    expected_overlaps: DataFrame,
) -> DataFrame:
    """Config lint — the reference's `npm test` gate (lint-json.js:12-49)
    as a relation of (kind, detail) error rows, empty when clean:

    - missing_source:  an overpass op references no sources entry
    - missing_description: a manual-* op with description absent/<3 chars
    - unused_source:   a sources entry no overpass op references
    - overlap_missing_description: an expected-overlap bound without one

    All four checks are anti-joins/filters over the (tiny) config tables —
    broadcast by Catalyst, no UDFs."""
    from pyspark.sql import functions as F

    overpass_ops = zones_config.where(F.col("source") == "overpass")
    src_ids = sources.select("source_id").distinct()
    missing_source = (
        overpass_ops.join(src_ids, "source_id", "left_anti")
        .select(
            F.lit("missing_source").alias("kind"),
            F.concat_ws(
                ":", F.col("tzid"), F.col("op_seq").cast("string"), F.col("source_id")
            ).alias("detail"),
        )
    )
    bad_desc = (
        zones_config.where(
            F.col("source").contains("manual")
            & (F.col("description").isNull() | (F.length("description") < 3))
        )
        .select(
            F.lit("missing_description").alias("kind"),
            F.concat_ws(":", F.col("tzid"), F.col("op_seq").cast("string")).alias(
                "detail"
            ),
        )
    )
    unused = (
        src_ids.join(
            overpass_ops.select("source_id").distinct(), "source_id", "left_anti"
        )
        .select(F.lit("unused_source").alias("kind"), F.col("source_id").alias("detail"))
    )
    bad_overlap = (
        expected_overlaps.where(
            F.col("description").isNull() | (F.length("description") < 3)
        )
        .select(
            F.lit("overlap_missing_description").alias("kind"),
            F.concat_ws(":", F.col("tz_a"), F.col("tz_b")).alias("detail"),
        )
    )
    return missing_source.unionByName(bad_desc).unionByName(unused).unionByName(
        bad_overlap
    )
