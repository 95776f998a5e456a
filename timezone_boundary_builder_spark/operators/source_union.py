"""Per-source multipolygon union with boundary filter (SURVEY.md S3).

The reference filters overpass-converted features to Polygon/MultiPolygon
with `properties.type === 'boundary'` (avoids unioning admin enclaves),
lints them, and unions everything into one geometry per source
(reference index.js:530-586, `saveSingleMultiPolygon`).

Engine: a plain column filter (Catalyst prunes + pushes it into the scan
when features come from parquet) followed by
`groupBy(source_id).applyInPandas(cascaded_union)`. One shuffle, keyed by
source_id — uniform (each OSM source is one boundary's features), so no
skew handling is needed at any scale; the per-group union is the same
pure-numpy boolean kernel the zone fold uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.boolean import dissolve
from ..geom.codec import from_geojson, to_geojson
from ..geom.kernels import planar_area

SOURCE_UNION_SCHEMA = (
    "source_id string, geometry string, n_features int, area_deg2 double"
)


def source_union(features: DataFrame) -> DataFrame:
    """features(source_id, geom_type, feature_type, geometry) -> one unioned
    multipolygon row per source.

    Filter semantics mirror index.js:538-541: keep (Multi)Polygon features
    whose feature_type is 'boundary'; everything else (admin enclaves,
    point/line members) is dropped BEFORE the shuffle so only survivor
    geometry bytes move.
    """
    kept = features.filter(
        F.col("geom_type").isin("Polygon", "MultiPolygon")
        & (F.col("feature_type") == "boundary")
    )

    def _union(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [from_geojson(g) for g in pdf["geometry"]]
        merged = dissolve(geoms)
        return pd.DataFrame(
            {
                "source_id": [pdf["source_id"].iloc[0]],
                "geometry": [to_geojson(merged, as_string=True)],
                "n_features": [len(pdf)],
                "area_deg2": [planar_area(merged)],
            }
        )

    return kept.groupBy("source_id").applyInPandas(_union, SOURCE_UNION_SCHEMA)
