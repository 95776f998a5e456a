"""Ocean gap-fill: Etc/GMT+-N band rectangles minus all land zones
(reference index.js:1223-1285: anti-difference fold with an envelope
prefilter, index.js:1252-1258).

Spark shape: cross the (tiny) band table with land zones filtered by the
bbox range predicate (Catalyst folds this into a broadcast nested-loop
join with the predicate pushed — both sides are small), then
groupBy(band).applyInPandas(subtract_all). The land-zone geometries a band
must subtract are the only rows shuffled.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.boolean import difference, dissolve
from ..geom.codec import from_geojson
from ..geom.kernels import make_box
from .zone_build import ZONE_SCHEMA, post_process, zone_row


def _subtract_group(pdf: pd.DataFrame) -> pd.DataFrame:
    tzid = pdf["band_tzid"].iloc[0]
    left = float(pdf["left"].iloc[0])
    right = float(pdf["right"].iloc[0])
    band = make_box(left, -90.0, right, 90.0)
    land = [from_geojson(g) for g in pdf["geometry"] if isinstance(g, str)]
    if land:
        band = difference(band, dissolve(land))
    return pd.DataFrame([zone_row(tzid, post_process(band))])


def build_ocean_zones(
    spark: SparkSession, ocean_bands: DataFrame, zones: DataFrame
) -> DataFrame:
    """ocean_bands(tzid,left,right) x zones(tzid, geometry, bbox cols) ->
    ocean zones with land subtracted (reference index.js:1241-1266)."""
    bands = ocean_bands.select(
        F.col("tzid").alias("band_tzid"), "left", "right"
    )
    # envelope prefilter: only zones whose bbox overlaps the band rect
    joined = bands.join(
        zones.select("geometry", "min_x", "max_x"),
        on=(F.col("min_x") < F.col("right")) & (F.col("max_x") > F.col("left")),
        how="left",
    )
    return joined.groupBy("band_tzid").applyInPandas(_subtract_group, ZONE_SCHEMA)
