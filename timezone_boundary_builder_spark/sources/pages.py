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
    return _publish_snapshot(root, manifest, parent, op="append")


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


# ------------------------------------------------- table maintenance
# The two jobs every append-heavy crawl table needs at scale, with the
# Iceberg semantics: compaction rewrites small files into a new REWRITE
# snapshot (logical content unchanged, old snapshots still readable —
# time travel keeps working), and snapshot expiry drops old metadata plus
# any data files no retained snapshot references.


def _publish_snapshot(root: str, manifest: list[dict], parent: str | None, op: str) -> str:
    """Atomic snapshot publish (shared by append and rewrite commits)."""
    batch_id = uuid.uuid4().hex[:12]
    sid = f"{int(time.time() * 1000)}-{batch_id}"
    snap = {
        "id": sid,
        "parent": parent,
        "operation": op,
        "manifest": manifest,
        "schema": "pages_v1",
    }
    snap_path = os.path.join(_meta_dir(root), f"snap-{sid}.json")
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.rename(tmp, snap_path)
    cur_tmp = os.path.join(_meta_dir(root), "current.tmp")
    with open(cur_tmp, "w") as f:
        f.write(sid)
    os.rename(cur_tmp, os.path.join(_meta_dir(root), "current"))
    return sid


def compact_data_files(spark: SparkSession, root: str) -> str:
    """Rewrite the current snapshot's data into one file set per ts_day
    (Iceberg's rewrite_data_files): many small append batches -> one
    batch directory, manifest entries collapse to one per partition.
    Logical content is untouched — the new snapshot's rows hash-match the
    old (tested), and prior snapshots keep reading their original files
    until expire_snapshots drops them."""
    parent = current_snapshot_id(root)
    df = scan(spark, root, snapshot_id=parent)
    staged = (
        df.withColumn("ts_day", F.date_format("warc_ts", "yyyy-MM-dd"))
        .repartition(F.col("ts_day"))
    )
    batch_id = uuid.uuid4().hex[:12]
    data_path = os.path.join(root, "data", f"compact-{batch_id}")
    staged.write.mode("error").partitionBy("ts_day").parquet(data_path)
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
    return _publish_snapshot(root, manifest, parent, op="rewrite")


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """Drop all but the newest `keep_last` snapshots on the current
    lineage, then delete any data directory no retained snapshot
    references (Iceberg's expire_snapshots + orphan cleanup). Returns
    {kept, expired, deleted_paths}; expired snapshot ids are no longer
    readable, the retained ones are untouched."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    chain = []
    sid = current_snapshot_id(root)
    while sid is not None:
        snap = read_snapshot(root, sid)
        chain.append(snap)
        sid = snap.get("parent")
    kept, expired = chain[:keep_last], chain[keep_last:]
    live_paths = {e["path"] for s in kept for e in s["manifest"]}
    deleted = []
    for s in expired:
        for e in s["manifest"]:
            if e["path"] not in live_paths and os.path.exists(e["path"]):
                shutil.rmtree(e["path"], ignore_errors=True)
                deleted.append(e["path"])
        os.remove(os.path.join(_meta_dir(root), f"snap-{s['id']}.json"))
    # the oldest kept snapshot's parent no longer exists
    if expired and kept:
        oldest = kept[-1]
        oldest["parent"] = None
        with open(
            os.path.join(_meta_dir(root), f"snap-{oldest['id']}.json"), "w"
        ) as f:
            json.dump(oldest, f)
    # empty batch dirs whose partitions were all deleted
    data_root = os.path.join(root, "data")
    for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
        full = os.path.join(data_root, d)
        if os.path.isdir(full) and not any(
            p == full or p.startswith(full + os.sep) for p in live_paths
        ):
            shutil.rmtree(full, ignore_errors=True)
    return {
        "kept": [s["id"] for s in kept],
        "expired": [s["id"] for s in expired],
        "deleted_paths": sorted(deleted),
    }
