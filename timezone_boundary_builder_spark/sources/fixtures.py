"""Deterministic synthetic test world (FIXTURES.md §§1-6).

Mirrors the reference's config/data model — timezones.json op lists,
osmBoundarySources.json source geometries, expectedZoneOverlaps.json
tolerance bboxes, the hard-coded ocean band table (reference
index.js:107-133) — on an 8-zone synthetic planet that exercises every op
kind: plain init, union exclave, difference hole, intersect clip, a
4-op chain, an antimeridian multipolygon, a non-axis-aligned triangle,
and a shared 'disputed' source that makes two zones legitimately overlap
(like the China-Bhutan disputed area, osmBoundarySources.json:910).

The reference downloads sources from Overpass (index.js:465-587); the
engine has no network, so source geometries are inline constants here.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd


def _box_gj(x0, y0, x1, y1) -> str:
    return json.dumps(
        {
            "type": "Polygon",
            "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
        },
        separators=(",", ":"),
    )


TRIANGLE_GJ = json.dumps(
    {"type": "Polygon", "coordinates": [[[100, 10], [130, 10], [115, 35], [100, 10]]]},
    separators=(",", ":"),
)

FOXTROT_GJ = json.dumps(
    {
        "type": "MultiPolygon",
        "coordinates": [
            [[[170, 40], [180, 40], [180, 60], [170, 60], [170, 40]]],
            [[[-180, 40], [-170, 40], [-170, 60], [-180, 60], [-180, 40]]],
        ],
    },
    separators=(",", ":"),
)

# source_id -> (query_kind, geojson)  [mirror of osmBoundarySources.json]
SOURCES = {
    "alpha": ("timezone", _box_gj(0, 0, 30, 30)),
    "hotel": ("timezone", _box_gj(0, 30, 30, 50)),
    # shared by two zones; right edge exactly touches Test/Bravo (zero-area
    # contact, below the 1e-4 deg2 significance threshold)
    "disputed": ("boundary", _box_gj(20, 25, 30, 35)),
    "bravo": ("timezone", _box_gj(30, 0, 60, 30)),
    "charlie": ("timezone", _box_gj(0, -40, 40, -10)),
    "delta": ("timezone", _box_gj(-60, 0, -20, 40)),
    "echo": ("timezone", _box_gj(-60, -50, -20, -20)),
}

# tzid -> ordered op list [mirror of timezones.json; ops per index.js:829-854]
ZONES = {
    "Test/Alpha": [
        {"op": "init", "source": "overpass", "source_id": "alpha"},
        {"op": "union", "source": "overpass", "source_id": "disputed"},
    ],
    "Test/Hotel": [
        {"op": "init", "source": "overpass", "source_id": "hotel"},
        {"op": "union", "source": "overpass", "source_id": "disputed"},
    ],
    "Test/Bravo": [
        {"op": "init", "source": "overpass", "source_id": "bravo"},
        {
            "op": "union",
            "source": "manual-polygon",
            "geometry": _box_gj(70, 5, 75, 10),
            "description": "exclave east of bravo",
        },
    ],
    "Test/Charlie": [
        {"op": "init", "source": "overpass", "source_id": "charlie"},
        {
            "op": "difference",
            "source": "manual-polygon",
            "geometry": _box_gj(10, -30, 20, -20),
            "description": "enclave hole",
        },
    ],
    "Test/Delta": [
        {"op": "init", "source": "overpass", "source_id": "delta"},
        {
            "op": "intersect",
            "source": "manual-polygon",
            "geometry": _box_gj(-50, -10, -30, 30),
            "description": "clip to western half",
        },
    ],
    "Test/Echo": [
        {"op": "init", "source": "overpass", "source_id": "echo"},
        {
            "op": "union",
            "source": "manual-polygon",
            "geometry": _box_gj(-20, -50, -10, -20),
            "description": "adjacent extension",
        },
        {
            "op": "difference",
            "source": "manual-polygon",
            "geometry": _box_gj(-15, -45, -12, -25),
            "description": "carved hole",
        },
        {
            "op": "intersect",
            "source": "manual-polygon",
            "geometry": _box_gj(-60, -50, -11, -20),
            "description": "clip eastern sliver",
        },
    ],
    "Test/Foxtrot": [
        {
            "op": "init",
            "source": "manual-multipolygon",
            "geometry": FOXTROT_GJ,
            "description": "antimeridian zone",
        },
    ],
    "Test/Golf": [
        {
            "op": "init",
            "source": "manual-polygon",
            "geometry": TRIANGLE_GJ,
            "description": "triangle zone",
        },
    ],
}

# allowed overlap bboxes [mirror of expectedZoneOverlaps.json]
EXPECTED_OVERLAPS = [
    {
        "tz_a": "Test/Alpha",
        "tz_b": "Test/Hotel",
        "min_x": 20.0,
        "min_y": 25.0,
        "max_x": 30.0,
        "max_y": 35.0,
        "description": "shared disputed source",
    },
]

# 4 x 90-degree bands [mirror of the reference's 25 x 15-degree table,
# index.js:107-133: tzid Etc/GMT+N west of Greenwich, -N east]
OCEAN_BANDS = [
    {"tzid": "Etc/GMT+9", "left": -180.0, "right": -90.0},
    {"tzid": "Etc/GMT+3", "left": -90.0, "right": 0.0},
    {"tzid": "Etc/GMT-3", "left": 0.0, "right": 90.0},
    {"tzid": "Etc/GMT-9", "left": 90.0, "right": 180.0},
]

# derived-zone grouping config (FIXTURES.md §6; mirror of
# getZoneCfgSinceTime output, reference index.js:169-245): Alpha+Hotel keep
# the same clocks since 1970 with Alpha the more populous representative.
ZONE_GROUPS = [
    {"strategy": "1970", "rep_tzid": "Test/Alpha", "member_tzid": "Test/Alpha", "population": 1000000},
    {"strategy": "1970", "rep_tzid": "Test/Alpha", "member_tzid": "Test/Hotel", "population": 20000},
    {"strategy": "1970", "rep_tzid": "Test/Bravo", "member_tzid": "Test/Bravo", "population": 500000},
    {"strategy": "now", "rep_tzid": "Test/Alpha", "member_tzid": "Test/Alpha", "population": 1000000},
    {"strategy": "now", "rep_tzid": "Test/Alpha", "member_tzid": "Test/Hotel", "population": 20000},
    {"strategy": "now", "rep_tzid": "Test/Alpha", "member_tzid": "Test/Charlie", "population": 90000},
]


def zones_config_pdf(include_invalid_overlap: bool = False) -> pd.DataFrame:
    rows = []
    zones = dict(ZONES)
    if include_invalid_overlap:
        # an overlap with Bravo that is NOT in EXPECTED_OVERLAPS -> the
        # validation stage must flag it (reference index.js:1159-1171)
        zones = {
            **zones,
            "Test/Juliett": [
                {
                    "op": "init",
                    "source": "manual-polygon",
                    "geometry": _box_gj(55, 5, 65, 15),
                    "description": "illegally overlaps bravo",
                }
            ],
        }
    for tzid, ops in zones.items():
        for i, op in enumerate(ops):
            rows.append(
                {
                    "tzid": tzid,
                    "op_seq": i,
                    "op": op["op"],
                    "source": op["source"],
                    "source_id": op.get("source_id"),
                    "geometry": op.get("geometry"),
                    "description": op.get("description"),
                }
            )
    return pd.DataFrame(rows)


def sources_pdf() -> pd.DataFrame:
    rows = []
    for sid, (kind, gj) in SOURCES.items():
        rows.append(
            {
                "source_id": sid,
                "query_kind": kind,
                "geometry": gj,
                "content_hash": hashlib.md5(gj.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def expected_overlaps_pdf() -> pd.DataFrame:
    return pd.DataFrame(EXPECTED_OVERLAPS)


def ocean_bands_pdf() -> pd.DataFrame:
    return pd.DataFrame(OCEAN_BANDS)


def zone_groups_pdf() -> pd.DataFrame:
    return pd.DataFrame(ZONE_GROUPS)


# ------------------------------------------------------------ pages table


_WORDS = (
    "the quick brown fox jumps over a lazy dog near the old harbor "
    "where ships anchor and merchants trade spices wool and tea"
).split()

# land sampling targets: (tzid, sampler) — rectangles sample uniformly,
# the triangle via barycentric coords, charlie rejects its hole
_LAND_RECTS = [
    ("Test/Alpha", (0, 0, 30, 30)),
    ("Test/Hotel", (0, 30, 30, 50)),
    ("Test/Bravo", (30, 0, 60, 30)),
    ("Test/Charlie", (0, -40, 40, -10)),
    ("Test/Delta", (-50, 0, -30, 30)),
    ("Test/Echo", (-60, -50, -20, -20)),
    ("Test/Foxtrot", (170, 40, 180, 60)),
    ("Test/Foxtrot", (-180, 40, -170, 60)),
]

URBAN_CENTER = (10.0, 10.0)  # dense 'urban' hotspot inside Test/Alpha


def synthetic_pages(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    """Deterministic Common-Crawl-style pages table (FIXTURES.md §1):
    url, warc_ts, html(binary), text, lang — ~80% land coords of which
    >=30% in the urban hotspot (skew), ~5% offshore within 1852 m of
    Test/Alpha's west edge, ~5% deep ocean, ~10% no coordinate.
    """
    rng = np.random.default_rng(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    kinds = []
    for i in range(n):
        u = rng.random()
        lat = lon = None
        if u < 0.50:  # land, uniform zone
            tz, (x0, y0, x1, y1) = _LAND_RECTS[int(rng.integers(len(_LAND_RECTS)))]
            lon = rng.uniform(x0 + 0.05, x1 - 0.05)
            lat = rng.uniform(y0 + 0.05, y1 - 0.05)
            if tz == "Test/Charlie":  # stay out of the hole
                while 10 < lon < 20 and -30 < lat < -20:
                    lon = rng.uniform(x0 + 0.05, x1 - 0.05)
                    lat = rng.uniform(y0 + 0.05, y1 - 0.05)
            kind = "land"
        elif u < 0.80:  # urban hotspot (skewed cell)
            lon = URBAN_CENTER[0] + rng.uniform(-0.5, 0.5)
            lat = URBAN_CENTER[1] + rng.uniform(-0.5, 0.5)
            kind = "urban"
        elif u < 0.85:  # offshore < 1852 m west of Test/Alpha's x=0 edge
            lon = -rng.uniform(0.002, 0.015)
            lat = rng.uniform(5.0, 25.0)
            kind = "offshore"
        elif u < 0.90:  # deep ocean -> Etc/GMT+9 band
            lon = rng.uniform(-170.0, -100.0)
            lat = rng.uniform(-80.0, -60.0)
            kind = "deep_ocean"
        else:
            kind = "none"
        words = " ".join(rng.choice(_WORDS, size=int(rng.integers(8, 24))))
        if lat is not None:
            lat = round(float(lat), 6)
            lon = round(float(lon), 6)
            if rng.random() < 0.5:
                coord = f"geo:{lat},{lon}"
            else:
                coord = f"@({lat}, {lon})"
            pos = int(rng.integers(0, 3))
            parts = words.split(" ")
            parts.insert(min(pos * 5, len(parts)), coord)
            text = " ".join(parts)
        else:
            text = words
        url = f"https://example.org/{seed}/{i:07d}"
        urls.append(url)
        tss.append(pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=int(rng.integers(0, 10_000_000))))
        htmls.append(f"<html><body>{text}</body></html>".encode())
        texts.append(text)
        langs.append(str(rng.choice(["en", "de", "fr", "es", "zh"])))
        kinds.append(kind)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": texts,
            "lang": langs,
            "kind": kinds,  # generator ground-truth hint (tests only; dropped in pipelines)
        }
    )
