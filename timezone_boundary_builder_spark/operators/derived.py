"""Derived zone products: 1970 / now merged zones (reference
getZoneCfgSinceTime + group-merge, index.js:169-245, 869-1009).

The grouping fingerprints are precomputed config (FIXTURES.md §6 — the
reference derives them from tzdb transition lists and caches them as
zone-config-1970.json / zone-config-now.json, index.js:247-261; the engine
treats them as an input table for determinism).

Spark shape: representative selection is a row_number window over
population (reference sorts by population and takes head, index.js:230-233);
the merge is groupBy(rep).applyInPandas(cascaded union).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .zone_build import ZONE_SCHEMA, dissolve_group


def pick_representatives(zone_groups: DataFrame) -> DataFrame:
    """(strategy, group) -> representative = max-population member.
    Mirrors reference index.js:230-233 (sort by population desc, head)."""
    w = Window.partitionBy("strategy", "rep_tzid").orderBy(
        F.desc("population"), F.asc("member_tzid")
    )
    return (
        zone_groups.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("strategy", "rep_tzid", F.col("member_tzid").alias("chosen_rep"), "population")
    )


def build_derived_zones(
    spark: SparkSession, zones: DataFrame, zone_groups: DataFrame, strategy: str
) -> DataFrame:
    """Union all member geometries per representative for one strategy
    (1970 | now). Zones not in any group pass through unchanged (the
    reference keeps ungrouped zones as-is, index.js:896-904)."""
    members = zone_groups.where(F.col("strategy") == strategy).select(
        "rep_tzid", F.col("member_tzid").alias("tzid")
    )
    grouped = members.join(zones, "tzid", "inner").select(
        F.col("rep_tzid").alias("tzid"), "geometry"
    )
    merged = grouped.groupBy("tzid").applyInPandas(
        lambda pdf: dissolve_group(pdf, "tzid"), ZONE_SCHEMA
    )
    ungrouped = zones.join(
        members.select("tzid").distinct(), "tzid", "left_anti"
    ).select(*[F.col(c) for c in merged.columns])
    return merged.unionByName(ungrouped)
