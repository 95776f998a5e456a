"""S10: ESRI shapefile sink, pure Python (reference `makeShapefile`,
index.js:1479-1539, which shells out to `ogr2ogr -f "ESRI Shapefile"` per
combined GeoJSON and zips the sidecar set with `zip -j`).

The sandbox has no GDAL, so the writer emits the format directly from the
public ESRI Shapefile Technical Description (July 1998): a fixed 100-byte
header + sequential records in `.shp`, the record index in `.shx`, a
dBASE-III attribute table in `.dbf` (single `tzid` character field — the
only attribute in the whole reference schema, index.js:1320-1324), plus
the `.prj` WGS84 WKT and `.cpg` UTF-8 sidecars ogr2ogr would produce.

Ring winding follows the spec, which is OPPOSITE to GeoJSON: shapefile
outer rings are clockwise and holes counter-clockwise, so every ring's
shoelace orientation is normalized on write. MultiPolygons flatten into
one Polygon (type 5) record whose parts are all rings of all polygons —
exactly how ogr2ogr maps GeoJSON MultiPolygon to shapefile.

Like the FeatureCollection sink (outputs.py), this converts the
already-combined per-product artifact: the zone table is <=hundreds of
rows by construction (the reference pins all 419 in memory,
index.js:1011-1016), and the shapefile format itself is a sequential
single-file layout, so a driver-side write is the correct scale shape.
"""

from __future__ import annotations

import json
import os
import struct
import zipfile

_SHAPE_NULL = 0
_SHAPE_POLYGON = 5

# The ESRI WKT ogr2ogr writes for EPSG:4326 GeoJSON input.
WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)

TZID_FIELD_WIDTH = 80  # ogr2ogr's default string width for the tzid field

# deterministic dBASE "last update" stamp (content-only outputs — no
# wall-clock, same rule as the stage fingerprints, SURVEY.md §7 #5)
_DBF_STAMP = (126, 1, 1)  # 2026-01-01, year as offset from 1900


def _shoelace2(ring: list[list[float]]) -> float:
    """Twice the signed area; > 0 = counter-clockwise."""
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s


def _geojson_rings(geom: dict) -> list[tuple[list[list[float]], bool]]:
    """(ring, is_outer) pairs in part order; MultiPolygon flattens."""
    if geom["type"] == "Polygon":
        polys = [geom["coordinates"]]
    elif geom["type"] == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        raise ValueError(f"unsupported geometry type {geom['type']}")
    out = []
    for rings in polys:
        for j, ring in enumerate(rings):
            out.append((ring, j == 0))
    return out


def _record_content(geom: dict) -> bytes:
    """One Polygon record's content: type, bbox, parts, points.

    An empty geometry ({"type":"MultiPolygon","coordinates":[]} — a
    legitimate codec output for empty zones) becomes a Null Shape
    (type 0) record, which is what ogr2ogr writes for empty features;
    it must not abort the whole product's shapefile stage."""
    rings = _geojson_rings(geom)
    if not rings:
        return struct.pack("<i", _SHAPE_NULL)
    parts: list[int] = []
    pts: list[tuple[float, float]] = []
    for ring, is_outer in rings:
        ccw = _shoelace2(ring) > 0
        # spec winding: outer CW, holes CCW
        oriented = ring[::-1] if (is_outer and ccw) or (not is_outer and not ccw) else ring
        parts.append(len(pts))
        pts.extend((float(x), float(y)) for x, y in oriented)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    buf = struct.pack("<i4d", _SHAPE_POLYGON, min(xs), min(ys), max(xs), max(ys))
    buf += struct.pack("<2i", len(parts), len(pts))
    buf += struct.pack(f"<{len(parts)}i", *parts)
    buf += b"".join(struct.pack("<2d", x, y) for x, y in pts)
    return buf


def _main_header(file_bytes: int, bbox: tuple[float, float, float, float]) -> bytes:
    """100-byte .shp/.shx header: file code 9994 + length (16-bit words,
    big-endian), version + shape type (little-endian), 8-double bbox."""
    return (
        struct.pack(">7i", 9994, 0, 0, 0, 0, 0, file_bytes // 2)
        + struct.pack("<2i", 1000, _SHAPE_POLYGON)
        + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0.0, 0.0, 0.0, 0.0)
    )


def _write_dbf(path: str, tzids: list[str]) -> None:
    nrec = len(tzids)
    header_size = 32 + 32 + 1  # table header + one field descriptor + 0x0D
    record_size = 1 + TZID_FIELD_WIDTH
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                "<4B i 2H 20x",
                0x03,
                _DBF_STAMP[0],
                _DBF_STAMP[1],
                _DBF_STAMP[2],
                nrec,
                header_size,
                record_size,
            )
        )
        f.write(struct.pack("<11s c 4x B B 14x", b"tzid", b"C", TZID_FIELD_WIDTH, 0))
        f.write(b"\x0d")
        for t in tzids:
            enc = t.encode("utf-8")[:TZID_FIELD_WIDTH]
            f.write(b" " + enc.ljust(TZID_FIELD_WIDTH, b" "))
        f.write(b"\x1a")


def write_shapefile(features: list[tuple[str, dict]], shp_base: str) -> int:
    """features: ordered (tzid, geojson geometry dict) pairs ->
    `{shp_base}.{shp,shx,dbf,prj,cpg}`. Returns the record count."""
    records = [(tzid, _record_content(geom)) for tzid, geom in features]
    # global bbox from record bboxes (bytes 4..36 of each content block);
    # Null Shape records (4 bytes, empty geometries) carry no bbox
    boxes = [
        struct.unpack_from("<4d", c, 4) for _, c in records if len(c) >= 36
    ]
    if boxes:
        bbox = (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    shp_len = 100 + sum(8 + len(c) for _, c in records)
    shx_len = 100 + 8 * len(records)
    with open(shp_base + ".shp", "wb") as shp, open(shp_base + ".shx", "wb") as shx:
        shp.write(_main_header(shp_len, bbox))
        shx.write(_main_header(shx_len, bbox))
        offset = 100
        for i, (_, content) in enumerate(records):
            words = len(content) // 2
            shp.write(struct.pack(">2i", i + 1, words))
            shp.write(content)
            shx.write(struct.pack(">2i", offset // 2, words))
            offset += 8 + len(content)
    _write_dbf(shp_base + ".dbf", [t for t, _ in records])
    with open(shp_base + ".prj", "w") as f:
        f.write(WGS84_PRJ)
    with open(shp_base + ".cpg", "w") as f:
        f.write("UTF-8")
    return len(records)


SIDE_CARS = (".shp", ".shx", ".dbf", ".prj", ".cpg")


def geojson_to_shapefile(json_path: str, shp_base: str, zip_path: str | None = None) -> int:
    """The reference's makeShapefile contract (index.js:1479-1491):
    combined FeatureCollection -> shapefile sidecar set -> flat zip."""
    with open(json_path) as f:
        fc = json.load(f)
    feats = [(ft["properties"]["tzid"], ft["geometry"]) for ft in fc["features"]]
    n = write_shapefile(feats, shp_base)
    if zip_path:
        with zipfile.ZipFile(zip_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for ext in SIDE_CARS:
                zf.write(shp_base + ext, arcname=os.path.basename(shp_base) + ext)
    return n


# (product geojson, working shapefile base, dist zip) name map — the six
# configs of makeShapefiles, index.js:1493-1536, keyed by this engine's
# product file names
SHAPEFILE_CONFIGS = [
    ("comprehensive.geojson", "combined-shapefile", "timezones.shapefile.zip"),
    (
        "comprehensive-with-oceans.geojson",
        "combined-shapefile-with-oceans",
        "timezones-with-oceans.shapefile.zip",
    ),
    ("1970.geojson", "combined-shapefile-1970", "timezones-1970.shapefile.zip"),
    (
        "1970-with-oceans.geojson",
        "combined-shapefile-with-oceans-1970",
        "timezones-with-oceans-1970.shapefile.zip",
    ),
    ("now.geojson", "combined-shapefile-now", "timezones-now.shapefile.zip"),
    (
        "now-with-oceans.geojson",
        "combined-shapefile-with-oceans-now",
        "timezones-with-oceans-now.shapefile.zip",
    ),
]


def write_product_shapefiles(
    out_dir: str, work_dir: str, include: set[str] | None = None
) -> dict[str, int]:
    """Convert combined product GeoJSONs to their shapefile zips.

    `include` is the set of product file names THIS run actually wrote —
    the conversion list is driven by the active products, mirroring the
    reference's skip-flag-conditional config list (index.js:1502-1528),
    NOT by directory contents: a stale now.geojson left in out_dir by an
    earlier run without --skip-now-zones must not be re-reported as a
    fresh output. With include=None every present product converts."""
    counts = {}
    for json_name, base_name, zip_name in SHAPEFILE_CONFIGS:
        src = os.path.join(out_dir, json_name)
        if include is not None and json_name not in include:
            continue
        if not os.path.exists(src):
            continue
        counts[zip_name] = geojson_to_shapefile(
            src,
            os.path.join(work_dir, base_name),
            os.path.join(out_dir, zip_name),
        )
    return counts
