"""S7 scale-path sink: the distributed (executor-written) FeatureCollection
must reconstruct to the same feature set as the driver-side collected
writer, with nothing data-sized crossing the driver."""

import json

import pandas as pd
import pytest

from timezone_boundary_builder_spark.operators.outputs import (
    read_feature_collection_distributed,
    write_feature_collection,
    write_feature_collection_distributed,
)


@pytest.fixture(scope="module")
def zones_df(spark):
    rows = []
    for i in range(137):
        gj = json.dumps(
            {
                "type": "Polygon",
                "coordinates": [
                    [[i, 0.0], [i + 1.0, 0.0], [i + 1.0, 1.0], [i, 1.0], [i, 0.0]]
                ],
            }
        )
        rows.append({"tzid": f'Zone/With"Quote_{i:03d}', "geometry": gj})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_distributed_sink_matches_collected(spark, zones_df, tmp_path):
    collected_path = tmp_path / "collected.geojson"
    n1 = write_feature_collection(zones_df, str(collected_path))
    n2 = write_feature_collection_distributed(zones_df, str(tmp_path / "dist"))
    assert n1 == n2 == 137

    got = read_feature_collection_distributed(str(tmp_path / "dist"))
    want = json.loads(collected_path.read_text())
    assert got["type"] == want["type"] == "FeatureCollection"

    def keyed(fc):
        return {f["properties"]["tzid"]: f["geometry"] for f in fc["features"]}

    assert keyed(got) == keyed(want)
    # every feature line is itself valid JSON with the exact schema
    for f in got["features"]:
        assert set(f) == {"type", "properties", "geometry"}
        assert set(f["properties"]) == {"tzid"}
