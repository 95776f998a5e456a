"""Pairwise overlap validation at the reference's real workload size:
C(419,2) = 87,571 zone pairs (reference index.js:1066-1070; README.md:228
calls this 'a few minutes'+ single-threaded). The engine's bbox range
self-join + per-pair exact check runs it in seconds on local[8]; box
zones make the expected overlap set computable in closed form."""

import json

import numpy as np
import pandas as pd

from timezone_boundary_builder_spark.geom.codec import from_geojson
from timezone_boundary_builder_spark.operators.validate import (
    MIN_POLY_M2,
    MIN_SIGNIFICANT_DEG2,
    find_overlaps,
)
from timezone_boundary_builder_spark.operators.zone_build import zone_row


def test_validation_at_reference_scale(spark):
    rng = np.random.default_rng(7)
    boxes = []
    rows = []
    for i in range(419):
        w = rng.uniform(0.5, 12)
        h = rng.uniform(0.5, 8)
        x0 = rng.uniform(-179, 179 - w)
        y0 = rng.uniform(-60, 70 - h)
        gj = json.dumps(
            {
                "type": "Polygon",
                "coordinates": [
                    [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
                ],
            }
        )
        boxes.append((f"Z/{i:04d}", x0, y0, x0 + w, y0 + h))
        rows.append(zone_row(f"Z/{i:04d}", from_geojson(gj)))
    zones = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        (r["tz_a"], r["tz_b"])
        for r in find_overlaps(spark, zones).select("tz_a", "tz_b").distinct().collect()
    }
    # closed-form oracle: box-box overlap rectangles above the deg^2
    # significance threshold (all overlaps here are far above MIN_POLY_M2)
    want = set()
    for i in range(len(boxes)):
        za, ax0, ay0, ax1, ay1 = boxes[i]
        for j in range(i + 1, len(boxes)):
            zb, bx0, by0, bx1, by1 = boxes[j]
            w = min(ax1, bx1) - max(ax0, bx0)
            h = min(ay1, by1) - max(ay0, by0)
            if w > 0 and h > 0 and w * h > MIN_SIGNIFICANT_DEG2:
                want.add((za, zb) if za < zb else (zb, za))
    norm_got = {(a, b) if a < b else (b, a) for a, b in got}
    assert norm_got == want
    assert len(want) > 100  # the workload is nontrivial
    assert MIN_POLY_M2 > 0  # thresholds wired
