"""S6 (null-island fallback), G16 (GeoJSON lint), R13 (include/exclude
zone pruning + source pruning) — the ingest-side guard rails."""

import numpy as np
import pandas as pd

from timezone_boundary_builder_spark.operators.lint import lint_features, lint_geojson
from timezone_boundary_builder_spark.operators.ring_assembly import (
    NULL_ISLAND_GJ,
    assemble_relations,
)
from timezone_boundary_builder_spark.operators.zone_build import (
    apply_zone_filters,
    build_zones,
    prune_sources,
)
from timezone_boundary_builder_spark.sources.fixtures import (
    osm_features_pdf,
    sources_pdf,
    zones_config_pdf,
)

WAYS_SCHEMA = "relation_id string, way_id long, seq long, coords array<array<double>>"


def test_null_island_fallback(spark):
    # one broken relation (never closes) + one good square
    rows = [
        {"relation_id": "broken", "way_id": 1, "seq": 0,
         "coords": [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]},
        {"relation_id": "good", "way_id": 2, "seq": 0,
         "coords": [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]]},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), WAYS_SCHEMA)
    out = {r["relation_id"]: r for r in
           assemble_relations(df, null_island_fallback=True).collect()}
    assert out["broken"]["geometry"] == NULL_ISLAND_GJ
    assert out["broken"]["n_dropped_ways"] == 1
    assert np.isclose(out["broken"]["area_deg2"], 0.04)  # 0.2 x 0.2
    assert np.isclose(out["good"]["area_deg2"], 1.0)
    # without the fallback the broken relation stays empty
    out2 = {r["relation_id"]: r for r in assemble_relations(df).collect()}
    assert out2["broken"]["n_polys"] == 0


def test_lint_geojson_error_cases():
    assert lint_geojson(None) == "empty geometry"
    assert lint_geojson("{not json") == "unparseable JSON"
    assert lint_geojson('{"type":"Weird","coordinates":[]}').startswith("unknown type")
    assert lint_geojson(
        '{"type":"Polygon","coordinates":[[[0,0],[1,0],[0,0]]]}'
    ) == "ring with <4 points"
    assert lint_geojson(
        '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1]]]}'
    ) == "unclosed ring"
    assert "out of range" in lint_geojson(
        '{"type":"Polygon","coordinates":[[[0,0],[200,0],[200,1],[0,1],[0,0]]]}'
    )
    assert lint_geojson(
        '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}'
    ) is None
    assert lint_geojson(
        '{"type":"MultiPolygon","coordinates":[]}'
    ) == "missing coordinates"
    assert "declared" in lint_geojson(
        '{"type":"LineString","coordinates":[[0,0],[1,1]]}', "Polygon"
    )


def test_lint_features_spark(spark):
    pdf = osm_features_pdf()
    bad = pd.DataFrame(
        [
            {"source_id": "bad1", "geom_type": "Polygon", "feature_type": "boundary",
             "geometry": '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1]]]}'},
            {"source_id": "bad2", "geom_type": "Polygon", "feature_type": "boundary",
             "geometry": "oops"},
        ]
    )
    df = spark.createDataFrame(pd.concat([pdf, bad], ignore_index=True))
    out = lint_features(df).toPandas()
    by_id = out.groupby("source_id")["lint_ok"].all()
    assert not by_id["bad1"] and not by_id["bad2"]
    assert by_id[["alpha", "bravo", "golf"]].all()
    errs = out.set_index("source_id")["lint_error"]
    assert errs["bad1"] == "unclosed ring"
    assert errs["bad2"] == "unparseable JSON"


def test_include_exclude_and_source_pruning(spark):
    cfg = spark.createDataFrame(zones_config_pdf())
    src = spark.createDataFrame(sources_pdf())
    kept = apply_zone_filters(cfg, included_zones=["Test/Alpha", "Test/Hotel"])
    assert {r["tzid"] for r in kept.select("tzid").distinct().collect()} == {
        "Test/Alpha",
        "Test/Hotel",
    }
    pruned = prune_sources(src, kept)
    assert {r["source_id"] for r in pruned.collect()} == {
        "alpha",
        "hotel",
        "disputed",
    }
    zones = build_zones(spark, kept, pruned)
    assert zones.count() == 2
    excl = apply_zone_filters(cfg, excluded_zones=["Test/Golf"])
    assert excl.select("tzid").distinct().count() == 7


def test_lint_self_intersection():
    bowtie = ('{"type":"Polygon","coordinates":'
              '[[[0,0],[10,10],[10,0],[0,10],[0,0]]]}')
    assert lint_geojson(bowtie) == "self-intersecting ring"
    # the non-simple star that corrupted the boolean fuzz is caught
    star = ('{"type":"Polygon","coordinates":[[[12.36,13.65],[8.57,14.63],'
            '[12.09,23.56],[12.13,-25.04],[10.04,-8.15],[12.36,13.65]]]}')
    assert lint_geojson(star) == "self-intersecting ring"
    square = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'
    assert lint_geojson(square) is None
    tri = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[5,8],[0,0]]]}'
    assert lint_geojson(tri) is None


def test_lint_config_clean_fixture_has_no_errors(spark):
    """The canonical fixture config must pass the lint-json.js-equivalent
    gate with zero rows (the broken-config positive cases live in the
    geo_lint_config oracle query)."""
    from timezone_boundary_builder_spark.operators.lint import lint_config
    from timezone_boundary_builder_spark.sources.fixtures import (
        expected_overlaps_pdf,
        sources_pdf,
        zones_config_pdf,
    )

    out = lint_config(
        spark.createDataFrame(zones_config_pdf()),
        spark.createDataFrame(sources_pdf()),
        spark.createDataFrame(expected_overlaps_pdf()),
    )
    assert out.count() == 0


def test_lint_rejects_invalid_ring_nesting():
    """Overlapping/nested holes make boolean results undefined (the class
    JSTS throws TopologyException on); ingest lint must quarantine them.
    Valid holed polygons and touching rings still pass."""
    import json

    from timezone_boundary_builder_spark.operators.lint import lint_geojson

    def poly(*rings):
        return json.dumps({"type": "Polygon", "coordinates": list(rings)})

    outer = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    h1 = [[1, 1], [1, 4], [4, 4], [4, 1], [1, 1]]
    h1_overlap = [[3, 3], [3, 6], [6, 6], [6, 3], [3, 3]]   # crosses h1
    h1_nested = [[2, 2], [2, 3], [3, 3], [3, 2], [2, 2]]    # inside h1
    h_cross_shell = [[8, 8], [8, 12], [12, 12], [12, 8], [8, 8]]
    h_touch = [[4, 5], [4, 8], [8, 8], [8, 5], [4, 5]]      # touches h1 corner

    assert lint_geojson(poly(outer, h1)) is None
    assert lint_geojson(poly(outer, h1, h_touch)) is None
    assert lint_geojson(poly(outer, h1, h1_overlap)) == "crossing rings"
    assert lint_geojson(poly(outer, h1, h1_nested)) == "hole inside hole"
    assert lint_geojson(poly(outer, h_cross_shell)) == "crossing rings"
