"""Tile materialization tests (SURVEY.md §2.4 B7/B8)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timezone_boundary_builder_spark.geom.cellindex import cell_bounds, encode_points
from timezone_boundary_builder_spark.geom.codec import from_geojson
from timezone_boundary_builder_spark.geom.kernels import planar_area
from timezone_boundary_builder_spark.operators.tiles import (
    raster_tile_summary,
    raster_tiles,
    vector_tiles,
)
from timezone_boundary_builder_spark.operators.zone_build import build_zones
from timezone_boundary_builder_spark.sources.fixtures import sources_pdf, zones_config_pdf

RES = 5


@pytest.fixture(scope="module")
def zones_df(spark):
    zc = spark.createDataFrame(zones_config_pdf())
    src = spark.createDataFrame(sources_pdf())
    return build_zones(spark, zc, src).cache()


def test_raster_tiles_uniform_res_and_membership(spark, zones_df):
    tiles = raster_tiles(zones_df, RES).toPandas()
    assert (tiles.res == RES).all()
    assert (np.array([int(c) >> 58 for c in tiles.cell_id]) == RES).all()
    # membership check: a full tile's center must be inside its zone
    zones = {r.tzid: from_geojson(r.geometry) for r in zones_df.toPandas().itertuples()}
    from timezone_boundary_builder_spark.geom.kernels import points_in_packed

    full = tiles[tiles.coverage == "full"]
    sample = full.sample(n=min(len(full), 200), random_state=1)
    for r in sample.itertuples():
        b = cell_bounds(int(r.cell_id))
        center = np.array([[(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]])
        assert points_in_packed(center, zones[r.tzid])[0], (r.tzid, b)


def test_raster_tiles_cover_known_point(spark, zones_df):
    tiles = raster_tiles(zones_df, RES).toPandas()
    # (10, 10) is deep inside Test/Alpha
    c = int(encode_points(np.array([10.0]), np.array([10.0]), RES)[0])
    mine = tiles[(tiles.cell_id == c)]
    assert ("Test/Alpha" == mine.tzid).any()


def test_vector_tiles_clip_area_conserves(spark, zones_df):
    vt = vector_tiles(zones_df.where(F.col("tzid") == "Test/Golf"), RES).toPandas()
    # sum of clipped piece areas == zone area (tiles partition the zone)
    total = sum(planar_area(from_geojson(g)) for g in vt.geometry)
    zone_area = zones_df.where(F.col("tzid") == "Test/Golf").first().area_deg2
    assert total == pytest.approx(zone_area, rel=1e-6)


def test_raster_summary_salted_equals_unsalted(spark, zones_df):
    tiles = raster_tiles(zones_df, RES)
    plain = raster_tile_summary(tiles).toPandas().sort_values("cell_id").reset_index(drop=True)
    salted = (
        raster_tile_summary(tiles, salt_buckets=8)
        .toPandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        plain[["cell_id", "res", "n_zones", "n_full", "first_tzid"]],
        salted[["cell_id", "res", "n_zones", "n_full", "first_tzid"]],
        check_dtype=False,
    )


def test_vector_tiles_conserve_all_zones(spark, zones_df):
    """Every zone's tiles partition it exactly — including zones whose
    cover compacts to coarse full cells (Test/Echo), which must be emitted
    as rect payloads."""
    vt = vector_tiles(zones_df, RES).toPandas()
    got = vt.assign(area=[planar_area(from_geojson(g)) for g in vt.geometry])
    sums = got.groupby("tzid")["area"].sum()
    for r in zones_df.select("tzid", "area_deg2").toPandas().itertuples():
        assert sums[r.tzid] == pytest.approx(r.area_deg2, rel=1e-9), r.tzid


def test_vector_tiles_res_column_matches_cell_header(spark, zones_df):
    vt = vector_tiles(zones_df, RES).toPandas()
    assert (vt.res == np.array([int(c) >> 58 for c in vt.cell_id])).all()
    assert (vt.res <= RES).all()


def test_serve_from_tiles_equals_cellmap_join(spark, zones_df):
    """The tile-table serving join and the broadcast-CellMap join are two
    physical strategies for the same logical query — identical output."""
    import __spark_entry__ as entry
    from timezone_boundary_builder_spark.operators.tiles import serve_points_from_tiles
    from timezone_boundary_builder_spark.sources.fixtures import OCEAN_BANDS

    sf = "/root/testdata/sf0.001"
    tiles = raster_tiles(zones_df, RES)
    served = (
        serve_points_from_tiles(
            entry._points(spark, sf), tiles, entry._local_zones(), OCEAN_BANDS, res=RES
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    direct = (
        entry._q_geo_pip_assign(spark, sf)
        .select("url", "tzid")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(served, direct)


def test_incremental_tile_counts_equal_full_recompute(spark):
    """merge_tile_counts over increments must equal the from-scratch
    rollup on the full point set — the exactness contract that lets the
    assign_pages incremental loop maintain tiles without reprocessing."""
    import pandas as pd

    from timezone_boundary_builder_spark.operators.tiles import (
        merge_tile_counts,
        page_tile_counts,
    )

    rng = __import__("numpy").random.default_rng(3)
    n = 9000
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(n)],
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-85, 85, n),
            "tzid": rng.choice(["A/A", "B/B", "C/C"], n),
        }
    )
    full = page_tile_counts(spark.createDataFrame(pdf), res=5)
    merged = None
    for lo, hi in ((0, 3000), (3000, 7000), (7000, 9000)):
        delta = page_tile_counts(spark.createDataFrame(pdf.iloc[lo:hi]), res=5)
        merged = merge_tile_counts(merged, delta)
    key = ["cell_id", "res", "tzid"]
    a = full.orderBy(key).toPandas()
    b = merged.orderBy(key).toPandas()
    assert a.equals(b)
    assert a.n_pages.sum() == n


def test_write_tiles_partitioned_prefix_respects_row_res(spark, tmp_path):
    """Mixed-resolution tile tables (compacted covers) must partition each
    cell under its OWN ancestor prefix at prefix_res — a uniform shift
    keyed to max(res) sends every coarse interior cell to prefix 0."""
    import pandas as pd

    from timezone_boundary_builder_spark.geom.cellindex import cell_parent
    from timezone_boundary_builder_spark.operators.tiles import (
        write_tiles_partitioned,
    )

    prefix_res = 3
    rng = np.random.default_rng(7)
    rows = []
    for res in (2, 3, 5, 7):
        lon = rng.uniform(-170, 170, 8)
        lat = rng.uniform(-80, 80, 8)
        for c in encode_points(lon, lat, res):
            rows.append((int(np.int64(np.uint64(c))), res, "Test/Alpha", "full"))
    pdf = pd.DataFrame(rows, columns=["cell_id", "res", "tzid", "coverage"])
    path = str(tmp_path / "tiles")
    write_tiles_partitioned(
        spark.createDataFrame(pdf), path, prefix_res=prefix_res
    )
    back = spark.read.parquet(path).toPandas()
    assert len(back) == len(pdf)
    mask = (1 << 58) - 1
    for r in back.itertuples():
        cell = np.uint64(np.int64(r.cell_id))
        if r.res <= prefix_res:
            expect = int(cell) & mask
        else:
            expect = int(cell_parent(cell, r.res - prefix_res)) & mask
        assert int(r.cell_prefix) == expect, (r.res, hex(int(cell)))
    # locality: fine cells sharing an ancestor land in the same partition
    fine = back[back.res == 7]
    anc = {
        int(cell_parent(np.uint64(np.int64(c)), 7 - prefix_res)) & mask
        for c in fine.cell_id
    }
    assert set(fine.cell_prefix.astype(int)) == anc
