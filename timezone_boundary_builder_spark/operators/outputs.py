"""Combined outputs sink (reference combineAndWriteZones + name lists,
index.js:1301-1389, 1708-1743): the 6 product FeatureCollections
(comprehensive / 1970 / now, each with and without oceans), the
timezone-names JSON arrays, and the merged-zone lookup maps.

Feature schema is the reference's exactly: {type: 'Feature',
properties: {tzid}, geometry} (index.js:1319-1327). Files are written
driver-side from collected rows — the zone tables are hundreds of rows
(the 10^12-row side never flows through here); each product is also
persisted as parquet for downstream stages.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PRODUCTS = ("comprehensive", "1970", "now")


def write_feature_collection(zones: DataFrame, path: str) -> int:
    """Streamed-array protocol like util/featureWriterStream.js:3-25 —
    header / comma-separated features / footer — collect->write since the
    zone table is small by construction."""
    rows = zones.select("tzid", "geometry").orderBy("tzid").collect()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for i, r in enumerate(rows):
            if i:
                f.write(",")
            f.write(
                json.dumps(
                    {
                        "type": "Feature",
                        "properties": {"tzid": r.tzid},
                        "geometry": json.loads(r.geometry),
                    },
                    separators=(",", ":"),
                )
            )
        f.write("]}")
    return len(rows)


def combine_and_write(
    spark: SparkSession,
    products: dict[str, DataFrame],
    oceans: DataFrame,
    out_dir: str,
) -> dict[str, int]:
    """products: {'comprehensive': zones, '1970': ..., 'now': ...} ->
    writes <product>.geojson and <product>-with-oceans.geojson plus
    timezone-names JSONs; returns feature counts per file."""
    counts = {}
    ocean_sel = oceans.select("tzid", "geometry")
    for name, zones in products.items():
        land = zones.select("tzid", "geometry")
        counts[f"{name}.geojson"] = write_feature_collection(
            land, os.path.join(out_dir, f"{name}.geojson")
        )
        with_oc = land.unionByName(ocean_sel)
        counts[f"{name}-with-oceans.geojson"] = write_feature_collection(
            with_oc, os.path.join(out_dir, f"{name}-with-oceans.geojson")
        )
        # parquet twin for downstream stages
        land.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    # name lists (reference writeBaseNames, index.js:1708-1724): the
    # no-oceans variants exclude Etc/GMT zones
    all_names = sorted(
        r.tzid
        for r in products["comprehensive"].select("tzid").distinct().collect()
    )
    ocean_names = sorted(r.tzid for r in ocean_sel.select("tzid").distinct().collect())
    with open(os.path.join(out_dir, "timezone-names.json"), "w") as f:
        json.dump(sorted(set(all_names + ocean_names)), f)
    with open(os.path.join(out_dir, "timezone-names-no-oceans.json"), "w") as f:
        json.dump([n for n in all_names if not n.startswith("Etc/GMT")], f)
    return counts


def combined_zone_table(products: dict[str, DataFrame], oceans: DataFrame) -> DataFrame:
    """The S8 combined-output relation BEFORE the sink: one row per feature
    per (product, with_oceans) — the reference's six FeatureCollections
    (index.js:1301-1389) as a single partitionable DataFrame. At scale this
    is what `write.partitionBy('product','with_oceans')` consumes; the
    GeoJSON sink above is the small-world twin."""
    ocean_sel = oceans.select("tzid", "geometry")
    parts = []
    for name, zones in products.items():
        land = zones.select("tzid", "geometry")
        parts.append(
            land.select(
                F.lit(name).alias("product"),
                F.lit(False).alias("with_oceans"),
                "tzid",
                "geometry",
            )
        )
        parts.append(
            land.unionByName(ocean_sel).select(
                F.lit(name).alias("product"),
                F.lit(True).alias("with_oceans"),
                "tzid",
                "geometry",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_zone_lookup(
    spark: SparkSession, zone_groups: DataFrame, strategy: str, path: str
) -> None:
    """Merged-zone lookup (reference writeCombinedZoneLookup,
    index.js:1726-1743): member tzid -> representative tzid."""
    rows = (
        zone_groups.where(F.col("strategy") == strategy)
        .select("member_tzid", "rep_tzid")
        .collect()
    )
    lookup = {r.member_tzid: r.rep_tzid for r in rows}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(lookup, f, sort_keys=True)
