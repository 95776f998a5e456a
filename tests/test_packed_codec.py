"""Packed int64 micro-degree coordinate codec: the bench hot path
(assign_tzid_udf_packed, 8 B/row down the Arrow pipe) must produce
row-identical assignments to the two-f64 path on the bench grid."""

import pandas as pd

import __spark_entry__ as entry
from timezone_boundary_builder_spark.operators.spatial_join import (
    assign_tzid_udf,
    assign_tzid_udf_packed,
)
from timezone_boundary_builder_spark.sources.fixtures import OCEAN_BANDS


def test_packed_path_row_equal_to_double_path(spark):
    import bench

    n = 1_000_000
    bc = spark.sparkContext.broadcast(entry._local_cellmap())
    std = (
        assign_tzid_udf(bench.synthetic_points(spark, n), bc, OCEAN_BANDS)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    packed = (
        assign_tzid_udf_packed(bench.synthetic_points_packed(spark, n), bc, OCEAN_BANDS)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(std, packed)
    # every method appears in the sample (land full-cell, boundary PIP,
    # offshore kNN, deep ocean)
    assert {"cell", "pip", "knn", "ocean"} <= set(std["method"].unique())
