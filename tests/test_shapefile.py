"""S10 ESRI shapefile sink: byte-structure validation of the pure-Python
writer against the public format spec — headers, record framing, .shx
index, dBASE table, winding — plus geometry round-trip and the
per-product zip contract (reference makeShapefiles, index.js:1479-1539)."""

import json
import os
import struct
import zipfile

from timezone_boundary_builder_spark.operators.shapefile import (
    SIDE_CARS,
    TZID_FIELD_WIDTH,
    WGS84_PRJ,
    geojson_to_shapefile,
    write_product_shapefiles,
    write_shapefile,
)

SQUARE = {
    "type": "Polygon",
    "coordinates": [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]],
}
# MultiPolygon: one part with a hole + one disjoint part
MULTI = {
    "type": "MultiPolygon",
    "coordinates": [
        [
            [[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 14.0], [10.0, 10.0]],
            [[11.0, 11.0], [12.0, 11.0], [12.0, 12.0], [11.0, 12.0], [11.0, 11.0]],
        ],
        [[[20.0, -5.0], [21.0, -5.0], [21.0, -4.0], [20.0, -4.0], [20.0, -5.0]]],
    ],
}


def _shoelace2(ring):
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s


def _parse_shp(path):
    """Minimal spec-conformant reader used as the structural oracle."""
    raw = open(path, "rb").read()
    code, flen = struct.unpack_from(">i", raw, 0)[0], struct.unpack_from(">i", raw, 24)[0]
    version, shp_type = struct.unpack_from("<2i", raw, 28)
    bbox = struct.unpack_from("<4d", raw, 36)
    assert code == 9994 and version == 1000
    assert flen * 2 == len(raw)
    records = []
    off = 100
    while off < len(raw):
        recno, words = struct.unpack_from(">2i", raw, off)
        content = raw[off + 8 : off + 8 + words * 2]
        (stype,) = struct.unpack_from("<i", content, 0)
        rbbox = struct.unpack_from("<4d", content, 4)
        nparts, npts = struct.unpack_from("<2i", content, 36)
        parts = struct.unpack_from(f"<{nparts}i", content, 44)
        pts = struct.unpack_from(f"<{2 * npts}d", content, 44 + 4 * nparts)
        coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(npts)]
        rings = [
            coords[parts[j] : (parts[j + 1] if j + 1 < nparts else npts)]
            for j in range(nparts)
        ]
        records.append(
            {"recno": recno, "type": stype, "bbox": rbbox, "rings": rings, "off": off}
        )
        off += 8 + words * 2
    return shp_type, bbox, records


def _parse_dbf(path):
    raw = open(path, "rb").read()
    nrec, hsize, rsize = struct.unpack_from("<i2H", raw, 4)
    assert raw[0] == 0x03 and raw[hsize - 1 : hsize] != b""
    # field descriptor layout: name[11] type[1] reserved[4] len[1] dec[1]
    name = raw[32:43].rstrip(b"\x00").decode()
    ftype = chr(raw[43])
    flen = raw[48]
    assert raw[64:65] == b"\x0d" and raw[-1:] == b"\x1a"
    vals = []
    for i in range(nrec):
        rec = raw[hsize + i * rsize : hsize + (i + 1) * rsize]
        assert rec[:1] == b" "
        vals.append(rec[1:].decode("utf-8").rstrip(" "))
    return name, ftype, flen, rsize, vals


def test_shp_structure_and_winding(tmp_path):
    base = str(tmp_path / "tz")
    n = write_shapefile([("A/Square", SQUARE), ("B/Multi", MULTI)], base)
    assert n == 2
    for ext in SIDE_CARS:
        assert os.path.exists(base + ext)

    shp_type, bbox, recs = _parse_shp(base + ".shp")
    assert shp_type == 5
    assert bbox == (0.0, -5.0, 21.0, 14.0)
    assert [r["recno"] for r in recs] == [1, 2]
    assert recs[0]["bbox"] == (0.0, 0.0, 2.0, 2.0)
    assert recs[1]["bbox"] == (10.0, -5.0, 21.0, 14.0)
    # one ring; outer must be CLOCKWISE (negative shoelace) per spec
    assert len(recs[0]["rings"]) == 1
    assert _shoelace2(recs[0]["rings"][0]) < 0
    # MultiPolygon flattens to 3 parts: outer CW, hole CCW, outer CW
    ws = [_shoelace2(r) for r in recs[1]["rings"]]
    assert len(ws) == 3 and ws[0] < 0 and ws[1] > 0 and ws[2] < 0
    # rings stay closed and preserve the vertex set
    for rings, src in ((recs[0]["rings"], SQUARE["coordinates"]),):
        for got, want in zip(rings, src):
            assert got[0] == got[-1]
            assert {tuple(p) for p in got} == {tuple(p) for p in want}

    # .shx: one 8-byte entry per record, offsets pointing at .shp records
    shx = open(base + ".shx", "rb").read()
    assert struct.unpack_from(">i", shx, 24)[0] * 2 == len(shx) == 100 + 8 * n
    for i, rec in enumerate(recs):
        off_w, words = struct.unpack_from(">2i", shx, 100 + 8 * i)
        assert off_w * 2 == rec["off"]

    name, ftype, flen, rsize, vals = _parse_dbf(base + ".dbf")
    assert (name, ftype, flen) == ("tzid", "C", TZID_FIELD_WIDTH)
    assert rsize == 1 + TZID_FIELD_WIDTH
    assert vals == ["A/Square", "B/Multi"]
    assert open(base + ".prj").read() == WGS84_PRJ
    assert open(base + ".cpg").read() == "UTF-8"


def test_empty_geometry_writes_null_shape(tmp_path):
    """Regression (ADVICE r2): an empty zone geometry
    ({"type":"MultiPolygon","coordinates":[]} — a legitimate codec
    output) must write a Null Shape (type 0) record, like ogr2ogr,
    instead of aborting the whole product's shapefile stage."""
    base = str(tmp_path / "tz")
    empty = {"type": "MultiPolygon", "coordinates": []}
    n = write_shapefile([("A/Square", SQUARE), ("B/Empty", empty)], base)
    assert n == 2
    raw = open(base + ".shp", "rb").read()
    # file length word count must account for the 4-byte null content
    assert struct.unpack_from(">i", raw, 24)[0] * 2 == len(raw)
    # walk to record 2 and check it is a Null Shape
    off = 100
    recno, words = struct.unpack_from(">2i", raw, off)
    off += 8 + words * 2
    recno2, words2 = struct.unpack_from(">2i", raw, off)
    assert (recno2, words2) == (2, 2)  # 4 bytes of content = 2 words
    assert struct.unpack_from("<i", raw, off + 8)[0] == 0  # type 0
    # attribute table still carries both tzids, aligned by record order
    _, _, _, _, vals = _parse_dbf(base + ".dbf")
    assert vals == ["A/Square", "B/Empty"]
    # global bbox comes from the non-empty records only
    shp_bbox = struct.unpack_from("<4d", raw, 36)
    assert shp_bbox == (0.0, 0.0, 2.0, 2.0)
    # an all-empty product degrades to the zero bbox, not a crash
    base2 = str(tmp_path / "tz_empty")
    assert write_shapefile([("B/Empty", empty)], base2) == 1
    raw2 = open(base2 + ".shp", "rb").read()
    assert struct.unpack_from("<4d", raw2, 36) == (0.0, 0.0, 0.0, 0.0)


def test_geojson_roundtrip_and_zip(tmp_path):
    src = tmp_path / "combined.json"
    src.write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {"type": "Feature", "properties": {"tzid": "Z/One"}, "geometry": MULTI},
                ],
            }
        )
    )
    base = str(tmp_path / "combined-shapefile")
    zpath = str(tmp_path / "tz.shapefile.zip")
    assert geojson_to_shapefile(str(src), base, zpath) == 1
    with zipfile.ZipFile(zpath) as zf:
        assert sorted(zf.namelist()) == sorted(
            "combined-shapefile" + ext for ext in SIDE_CARS
        )
    # geometry area is conserved through the winding flip: |outer|-|holes|
    _, _, recs = _parse_shp(base + ".shp")
    area = sum(_shoelace2(r) for r in recs[0]["rings"]) / -2.0  # CW outer => negative
    assert abs(area - (16.0 - 1.0 + 1.0)) < 1e-12


def test_write_product_shapefiles_maps_products(tmp_path):
    out = tmp_path / "dist"
    work = tmp_path / "work"
    out.mkdir()
    work.mkdir()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"tzid": "A/A"}, "geometry": SQUARE}
        ],
    }
    (out / "comprehensive.geojson").write_text(json.dumps(fc))
    (out / "1970.geojson").write_text(json.dumps(fc))
    counts = write_product_shapefiles(str(out), str(work))
    # present products converted, absent ones (now, with-oceans) skipped
    assert counts == {"timezones.shapefile.zip": 1, "timezones-1970.shapefile.zip": 1}
    assert (out / "timezones.shapefile.zip").exists()
    assert (work / "combined-shapefile-1970.shp").exists()
    assert not (out / "timezones-now.shapefile.zip").exists()


def test_shapefile_bytes_deterministic(tmp_path):
    """Same features -> byte-identical sidecars (content-only outputs: no
    wall-clock in the dBASE stamp, no float formatting drift)."""
    b1 = str(tmp_path / "a")
    b2 = str(tmp_path / "b")
    write_shapefile([("A/Square", SQUARE), ("B/Multi", MULTI)], b1)
    write_shapefile([("A/Square", SQUARE), ("B/Multi", MULTI)], b2)
    for ext in SIDE_CARS:
        assert open(b1 + ext, "rb").read() == open(b2 + ext, "rb").read(), ext


def test_include_filter_skips_stale_products(tmp_path):
    """A stale product GeoJSON left by a previous run must not convert
    when this run's active-product set excludes it."""
    out = tmp_path / "dist"
    work = tmp_path / "work"
    out.mkdir()
    work.mkdir()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"tzid": "A/A"}, "geometry": SQUARE}
        ],
    }
    (out / "comprehensive.geojson").write_text(json.dumps(fc))
    (out / "now.geojson").write_text(json.dumps(fc))  # stale leftover
    counts = write_product_shapefiles(
        str(out), str(work), include={"comprehensive.geojson"}
    )
    assert counts == {"timezones.shapefile.zip": 1}
    assert not (out / "timezones-now.shapefile.zip").exists()


def test_random_polygons_roundtrip_property():
    """Property test: random axis-aligned multipolygon worlds round-trip
    through the writer — vertex sets preserved per ring, winding per
    spec, record framing self-consistent, total area conserved."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    boxes = st.lists(
        st.tuples(
            st.floats(-179, 178, allow_nan=False),
            st.floats(-89, 88, allow_nan=False),
            st.floats(0.125, 1.5, allow_nan=False),
            st.floats(0.125, 1.5, allow_nan=False),
        ),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=40, deadline=None)
    @given(boxes=boxes)
    def run(boxes):
        import tempfile

        polys = []
        for x, y, w, h in boxes:
            ring = [[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]]
            polys.append([ring])
        geom = {"type": "MultiPolygon", "coordinates": polys}
        with tempfile.TemporaryDirectory() as d:
            base = os.path.join(d, "t")
            assert write_shapefile([("Z/Test", geom)], base) == 1
            shp_type, bbox, recs = _parse_shp(base + ".shp")
        assert shp_type == 5
        rings = recs[0]["rings"]
        assert len(rings) == len(boxes)
        for got, src in zip(rings, polys):
            assert got[0] == got[-1]
            assert {tuple(p) for p in got} == {tuple(map(float, p)) for p in src[0]}
            assert _shoelace2(got) < 0  # outer rings clockwise
        want_area = sum(w * h for _, _, w, h in boxes)
        got_area = sum(-_shoelace2(r) / 2.0 for r in rings)
        assert abs(got_area - want_area) < 1e-6 * max(1.0, want_area)

    run()
