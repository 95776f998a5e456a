"""Dense-zone-world stress for the cover / CellMap / assignment path
(round-4 verdict item 7).

The real reference world is 419 zones; BENCH.md's open question was how
the broadcast cover grows at 10^4-10^5 zones (cover size is proportional
to total perimeter, not zone count). `dense_zone_world` tiles the globe
with 10,000 jittered convex quads — a PERFECT tiling (shared lattice
corners, no gaps/overlaps), so every sample point has a
known-by-construction expected zone, independent of the engine's PIP.

Asserts, in one Spark pass over the real operators
(build_cell_covers -> collect_cell_map -> broadcast -> assign_tzid):
- the broadcast CellMap stays under a stated byte bound (the 100 TB
  design constraint: the map must fit comfortably in every executor),
- a 20k-point deterministic sample assigns to exactly the expected zone
  for every point (oracle = the tiling construction itself).
"""

import pickle

import numpy as np
import pytest
from pyspark.sql import functions as F

from timezone_boundary_builder_spark.operators.cover import (
    build_cell_covers,
    collect_cell_map,
)
from timezone_boundary_builder_spark.operators.spatial_join import assign_tzid
from timezone_boundary_builder_spark.sources.fixtures import (
    dense_zone_world,
    dense_world_points,
)

NX, NY = 100, 100  # 10,000 zones
COVER_RES = 8  # 256x256 world grid: ~1.4 x 0.7 deg cells
# stated bound: ~131k cover cells x ~13 B packed + 10k quad GeoJSON
# strings (~1.6 MB) + bboxes; measured ~4.3 MB pickled. 16 MB leaves 3x
# headroom and is far inside Spark broadcast comfort (executors hold one
# copy per process, not per core).
BROADCAST_BOUND_BYTES = 16 * 1024 * 1024


@pytest.fixture(scope="module")
def dense_cellmap(spark):
    world = dense_zone_world(NX, NY)
    zones = spark.createDataFrame(world)
    covers = build_cell_covers(zones, max_res=COVER_RES)
    cm = collect_cell_map(covers, zones)
    return world, cm


def test_dense_world_broadcast_size_bounded(spark, dense_cellmap):
    world, cm = dense_cellmap
    assert len(cm.tzids) == NX * NY
    blob = pickle.dumps(cm, protocol=pickle.HIGHEST_PROTOCOL)
    n_cells = len(cm.full_cells) + len(cm.bnd_cells)
    # cover growth sanity: compact cover stays O(perimeter) — well under
    # a flat res-8 rasterization of the globe (256*128 cells/zone world)
    assert n_cells < 40 * NX * NY, n_cells
    assert len(blob) < BROADCAST_BOUND_BYTES, f"{len(blob)} bytes"


def test_pair_pip_path_equals_per_zone_path(dense_cellmap, monkeypatch):
    """The pair-vectorized PIP (dense regime) and the per-zone batch PIP
    must agree bit-for-bit — including uniform random points that land
    arbitrarily close to zone edges (same strict inequalities, same
    even-odd arithmetic, elementwise)."""
    from timezone_boundary_builder_spark.operators import spatial_join as sj

    _, cm = dense_cellmap
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 50_000)
    lat = rng.uniform(-90, 90, 50_000)
    be = sj._band_edges([])
    # tiny slice budget: many (pair, edge) slices per chunk, so the
    # cuts/bounds/offset arithmetic of _iter_pair_slices is actually
    # exercised (at the default 4M budget this workload fits one slice)
    monkeypatch.setattr(sj, "PAIR_PIP_EDGE_CHUNK", 10_000)
    code_pair, m_pair = sj.assign_codes(cm, be, 0, lon, lat, 1852.0)
    monkeypatch.setattr(sj, "PAIR_PIP_MIN_ZONES", 10**9)  # force per-zone loop
    code_loop, m_loop = sj.assign_codes(cm, be, 0, lon, lat, 1852.0)
    np.testing.assert_array_equal(code_pair, code_loop)
    np.testing.assert_array_equal(m_pair, m_loop)


def test_knn_pair_path_equals_per_zone_path_on_holey_world(monkeypatch):
    """kNN fallback in the dense regime: punch every 9th quad out of the
    tiling so ~11% of points MISS and fall through to the kNN path, then
    assert the pair-vectorized distance path and the per-zone loop agree
    on every assignment and method (knn within 1852 m of a hole edge,
    none deeper in). Distances between distinct zones differ by far more
    than the 1e-9 m tie window here, where the two winner rules provably
    coincide."""
    from timezone_boundary_builder_spark.operators import spatial_join as sj
    from timezone_boundary_builder_spark.operators.cover import (
        cellmap_from_zones_pdf,
    )

    world = dense_zone_world(NX, NY)
    kept = world.iloc[[i for i in range(len(world)) if i % 9 != 0]].reset_index(
        drop=True
    )
    cm = cellmap_from_zones_pdf(kept, max_res=8)
    rng = np.random.default_rng(17)
    lon = rng.uniform(-180, 180, 60_000)
    lat = rng.uniform(-90, 90, 60_000)
    be = sj._band_edges([])
    monkeypatch.setattr(sj, "PAIR_PIP_EDGE_CHUNK", 10_000)  # force slicing
    code_pair, m_pair = sj.assign_codes(cm, be, 0, lon, lat, 1852.0)
    monkeypatch.setattr(sj, "PAIR_PIP_MIN_ZONES", 10**9)  # force per-zone loops
    code_loop, m_loop = sj.assign_codes(cm, be, 0, lon, lat, 1852.0)
    np.testing.assert_array_equal(code_pair, code_loop)
    np.testing.assert_array_equal(m_pair, m_loop)
    counts = dict(zip(*np.unique(m_pair, return_counts=True)))
    # all four land outcomes actually exercised: cell, pip, knn, none
    assert counts.get(sj.M_KNN, 0) > 200, counts
    assert counts.get(sj.M_NONE, 0) > 1000, counts


def test_dense_world_assignment_matches_construction(spark, dense_cellmap):
    world, cm = dense_cellmap
    pts = dense_world_points(world, NX, NY, n=20_000)
    bc = spark.sparkContext.broadcast(cm)
    df = spark.createDataFrame(pts)
    out = assign_tzid(df, bc, ocean_bands=[]).join(
        df.select("url", "expect_tzid"), "url"
    )
    mism = out.where(F.col("tzid") != F.col("expect_tzid"))
    bad = mism.limit(5).collect()
    assert not bad, bad
    # interior points resolve via the index: full-cell hits answer with
    # ZERO exact PIP work; the rest go through the boundary-cell PIP path
    methods = dict(
        out.groupBy("method").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert set(methods) <= {"cell", "pip"}, methods
    assert methods.get("cell", 0) > 0, methods
    bc.destroy()


def test_cover_growth_model_fits_measured_cells(spark):
    """The zone-count curve as an ASSERTED MODEL (round-5 verdict item 6,
    complementing the measured 10^5-zone bench datapoint): the
    perimeter-proxy estimator auto_cover_res uses for its broadcast
    budget — est = 2*(sum_w/cell_w + sum_h/cell_h) over zone bboxes —
    must track the MEASURED compact-cover cell count within a constant
    factor across a 16x zone-count sweep, at each world's auto-picked
    resolution (the production path). Measured anchors on the bench
    frontier: 10^4 zones -> 331k cells vs est 227k (1.46x) at res 9;
    10^5 zones -> 1.84M cells vs est 3.64M (0.51x) at res 10 (interval
    compaction pulls large worlds UNDER the proxy). With the fitted
    band, the budget guard (coarsen while est > 2M) bounds any world's
    cover at ~2*2M cells, and at the measured ~42 B/cell the broadcast
    stays under ~200 MB no matter how many zones a user throws at the
    serving path — the 100 TB design constraint, asserted, not prose."""
    import pickle

    from timezone_boundary_builder_spark.operators.cover import auto_cover_res

    for n in (25, 50, 100):
        world = dense_zone_world(n, n)
        res = auto_cover_res(world)
        zones = spark.createDataFrame(world)
        cm = collect_cell_map(build_cell_covers(zones, max_res=res), zones)
        cells = len(cm.full_cells) + len(cm.bnd_cells)
        w = (world.max_x - world.min_x).to_numpy()
        h = (world.max_y - world.min_y).to_numpy()
        est = 2.0 * (
            w.sum() / (360.0 / (1 << res)) + h.sum() / (180.0 / (1 << res))
        )
        ratio = cells / est
        assert 0.3 <= ratio <= 2.0, (n, res, cells, est, ratio)
        # bytes/cell constant: the pickled map is cells*O(1) + the zone
        # geometries themselves (n^2 * ~160 B) + fixed overhead — no
        # superlinear term hiding in the codec
        blob = len(pickle.dumps(cm, protocol=pickle.HIGHEST_PROTOCOL))
        assert blob <= 64 * cells + 250 * n * n + 1_500_000, (n, blob, cells)


def test_auto_cover_res_tracks_zone_density():
    """auto_cover_res adapts the cover resolution to the zone-size
    distribution: coarse for the 8-zone fixture world (~30-40 deg
    zones), fine for the 10k dense world (~3.6x1.8 deg quads), clamped
    at both ends, and DEFAULT on degenerate inputs. Resolution only
    moves work between the cell and pip stages (assignments invariant),
    so the heuristic is a pure performance knob."""
    import pandas as pd

    from timezone_boundary_builder_spark.operators.cover import (
        DEFAULT_COVER_RES,
        auto_cover_res,
    )
    from timezone_boundary_builder_spark.sources.fixtures import local_zones

    dense = dense_zone_world(NX, NY)
    # jitter widens the median quad bbox past the 3.6x1.8 lattice pitch;
    # the 5-cells/axis target (measured: res 9 is ~12% faster than res 8
    # on this world — see auto_cover_res docstring) must land on 9
    assert auto_cover_res(dense) == 9
    fixture = local_zones()
    assert 5 <= auto_cover_res(fixture) <= 7
    # clamps: planet-sized zones floor at min_res, micro-zones cap at 11
    import json as _json

    def one_zone(w, h):
        ring = [[0, 0], [w, 0], [w, h], [0, h], [0, 0]]
        return pd.DataFrame(
            {
                "tzid": ["Z"],
                "geometry": [_json.dumps({"type": "Polygon", "coordinates": [ring]})],
            }
        )

    assert auto_cover_res(one_zone(360, 180)) == 4
    assert auto_cover_res(one_zone(0.001, 0.001)) == 11
    # bimodal guard: micro-zone MEDIAN wants the cap, but the total
    # (perimeter-driven) cover estimate coarsens it — the budget wins
    bimodal = pd.concat(
        [dense_zone_world(100, 100), one_zone(340, 170)], ignore_index=True
    )
    fine = auto_cover_res(bimodal)
    assert auto_cover_res(bimodal, max_cells=2_000) < fine
    # a PARTIAL bbox column set must re-derive, not KeyError
    partial = dense_zone_world(10, 10).drop(columns=["max_x", "max_y"])
    assert auto_cover_res(partial) == auto_cover_res(
        dense_zone_world(10, 10).drop(
            columns=["min_x", "min_y", "max_x", "max_y"]
        )
    )
    # degenerate: empty frame -> library default
    empty = pd.DataFrame({"tzid": [], "geometry": []})
    assert auto_cover_res(empty) == DEFAULT_COVER_RES
