"""Iceberg-style pages table emulation (input_hint: "Iceberg table of
Common-Crawl-style web pages ... (url, warc_ts, html, text, lang)").

The sandbox has no Iceberg jars, so the engine implements the table
CONTRACT on partitioned parquet + JSON metadata:

- snapshots: every commit writes an immutable snapshot JSON listing its
  manifest; readers pin a snapshot id -> consistent reads while a writer
  appends (snapshot isolation, which is what checkpoint-resume needs);
- manifests: per-partition file list with row counts and column bounds
  for `warc_ts` -> partition pruning happens BEFORE the Spark scan by
  selecting files, in addition to parquet's own row-group pruning;
- schema is declared, never inferred.

Layout:
  <root>/data/ts_day=YYYY-MM-DD/part-*.parquet
  <root>/metadata/snap-<id>.json   {"id", "parent", "manifest": [...]}
  <root>/metadata/current          text file with current snapshot id
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _read_json(path: str):
    with open(path) as f:
        return json.load(f)


def current_snapshot_id(root: str) -> str | None:
    cur = os.path.join(_meta_dir(root), "current")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return f.read().strip()


def read_snapshot(root: str, snapshot_id: str | None = None) -> dict:
    sid = snapshot_id or current_snapshot_id(root)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot in {root}")
    return _read_json(os.path.join(_meta_dir(root), f"snap-{sid}.json"))


def commit_append(root: str, df: DataFrame) -> str:
    """Append rows as a new snapshot: write data files under a staging
    partition layout, then atomically publish the snapshot JSON + current
    pointer (writers never mutate published files — the Iceberg property
    resume depends on)."""
    os.makedirs(_meta_dir(root), exist_ok=True)
    staged = (
        df.withColumn("ts_day", F.date_format("warc_ts", "yyyy-MM-dd"))
        .repartition(F.col("ts_day"))
    )
    batch_id = uuid.uuid4().hex[:12]
    data_path = os.path.join(root, "data", f"batch-{batch_id}")
    staged.write.mode("error").partitionBy("ts_day").parquet(data_path)

    # build the manifest from what was written
    spark = df.sparkSession
    written = spark.read.parquet(data_path)
    stats = (
        written.withColumn("ts_day", F.col("ts_day").cast("string"))
        .groupBy("ts_day")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("warc_ts").alias("min_ts"),
            F.max("warc_ts").alias("max_ts"),
        )
        .collect()
    )
    manifest = [
        {
            "path": os.path.join(data_path, f"ts_day={r.ts_day}"),
            "ts_day": r.ts_day,
            "rows": r.rows,
            "min_ts": str(r.min_ts),
            "max_ts": str(r.max_ts),
        }
        for r in stats
    ]
    parent = current_snapshot_id(root)
    if parent is not None:
        manifest = read_snapshot(root, parent)["manifest"] + manifest
    sid = f"{int(time.time() * 1000)}-{batch_id}"
    snap = {"id": sid, "parent": parent, "manifest": manifest, "schema": "pages_v1"}
    snap_path = os.path.join(_meta_dir(root), f"snap-{sid}.json")
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.rename(tmp, snap_path)  # atomic publish
    cur_tmp = os.path.join(_meta_dir(root), "current.tmp")
    with open(cur_tmp, "w") as f:
        f.write(sid)
    os.rename(cur_tmp, os.path.join(_meta_dir(root), "current"))
    return sid


def scan(
    spark: SparkSession,
    root: str,
    snapshot_id: str | None = None,
    ts_day_min: str | None = None,
    ts_day_max: str | None = None,
) -> DataFrame:
    """Snapshot-pinned scan with manifest-level partition pruning: only
    partition directories whose ts_day (and ts bounds) intersect the
    requested range are handed to the Spark reader — pruning before the
    scan, like Iceberg's manifest filtering. Parquet row-group pruning
    still applies on top for pushed filters."""
    snap = read_snapshot(root, snapshot_id)
    entries = snap["manifest"]
    if ts_day_min is not None:
        entries = [e for e in entries if e["ts_day"] >= ts_day_min]
    if ts_day_max is not None:
        entries = [e for e in entries if e["ts_day"] <= ts_day_max]
    if not entries:
        return spark.createDataFrame([], PAGES_SCHEMA)
    paths = [e["path"] for e in entries]
    return spark.read.schema(PAGES_SCHEMA).parquet(*paths)


def snapshot_row_count(root: str, snapshot_id: str | None = None) -> int:
    return sum(e["rows"] for e in read_snapshot(root, snapshot_id)["manifest"])
