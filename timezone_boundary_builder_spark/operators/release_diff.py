"""Release diff analysis (reference analyzeChangesFromLastRelease,
index.js:1541-1657): full-outer join of current vs last-release zones on
tzid; per zone, the buffered two-way difference; additions/removals are
significant when planar area > 1e-4 deg2 (index.js:1601,1613); zones whose
geometry hash matches are skipped outright (index.js:1592).

Spark shape: full outer join (R9) -> applyInPandas per tzid. The
hash-equality short-circuit happens as a COLUMN predicate before any
geometry work, so unchanged zones never reach the pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.boolean import buffer_slop, difference
from ..geom.codec import from_geojson
from ..geom.kernels import planar_area

MIN_DIFF_DEG2 = 1e-4  # reference index.js:1601,1613
SLOP_DEG = 0.01  # reference index.js:1584-1589

DIFF_SCHEMA = "tzid string, change string, area_deg2 double"


def _diff_group(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for row in pdf.itertuples():
        tzid = row.tzid
        cur = from_geojson(row.cur_geom) if isinstance(row.cur_geom, str) else None
        last = from_geojson(row.last_geom) if isinstance(row.last_geom, str) else None
        if cur is not None and last is None:
            a = planar_area(cur)
            if a > MIN_DIFF_DEG2:
                out.append((tzid, "addition", round(a, 6)))
            continue
        if last is not None and cur is None:
            a = planar_area(last)
            if a > MIN_DIFF_DEG2:
                out.append((tzid, "removal", round(a, 6)))
            continue
        # both present: buffered two-way diff (buffer swallows slivers)
        add = difference(cur, buffer_slop(last, SLOP_DEG))
        a = planar_area(add)
        if a > MIN_DIFF_DEG2:
            out.append((tzid, "addition", round(a, 6)))
        rem = difference(last, buffer_slop(cur, SLOP_DEG))
        a = planar_area(rem)
        if a > MIN_DIFF_DEG2:
            out.append((tzid, "removal", round(a, 6)))
    return pd.DataFrame(out, columns=["tzid", "change", "area_deg2"])


def release_diff(
    spark: SparkSession, current: DataFrame, last: DataFrame
) -> DataFrame:
    """current/last: zones_final-shaped frames. Returns one row per
    significant addition/removal."""
    c = current.select(
        F.col("tzid"),
        F.col("geometry").alias("cur_geom"),
        F.col("geom_hash").alias("cur_hash"),
    )
    l = last.select(
        F.col("tzid"),
        F.col("geometry").alias("last_geom"),
        F.col("geom_hash").alias("last_hash"),
    )
    joined = c.join(l, "tzid", "full_outer")
    # skip-if-equal guard as a plain filter (reference index.js:1592)
    changed = joined.where(
        F.col("cur_hash").isNull()
        | F.col("last_hash").isNull()
        | (F.col("cur_hash") != F.col("last_hash"))
    )
    return changed.groupBy("tzid").applyInPandas(
        lambda pdf: _diff_group(pdf), DIFF_SCHEMA
    )
