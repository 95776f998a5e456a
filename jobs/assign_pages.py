"""Part B production job — the serving-side spark-submit surface
(north_rule: "run via spark-submit --py-files on a multi-executor
cluster ... resumable from checkpoint with per-partition lineage +
metrics").

    cd /root/repo && zip -qr /tmp/engine.zip timezone_boundary_builder_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/assign_pages.py --pages-root /tmp/pages --work-dir /tmp/aw \
        --out-dir /tmp/assigned

Pipeline (one scan, zero shuffles on the pages side):

    Iceberg-lite snapshot scan (manifest partition pruning by --ts-day-*)
      -> JVM-side geocode (regexp, codegen)
      -> packed micro-degree codec -> broadcast two-stage spatial join
         (scalar pandas UDF: 8 B/row down, 5 B/row back)
      -> parquet sink + per-partition lineage table

Resume: the stage fingerprint is (snapshot id, ts range, zone-set hash) —
re-running against an unchanged snapshot is a manifest hit that re-verifies
the output hash and skips the scan entirely (reference FileLookupCache
contract, util/cache.js:74-128).

Invariant (north_star): byte-identical `text` per url through every stage —
proven here by comparing an order-insensitive bit_xor(xxhash64) aggregate of
(url, text) between the input snapshot and the assignment output joined
back to the table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import uuid


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages-root", required=True, help="Iceberg-lite pages table root")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--ts-day-min", default=None)
    p.add_argument("--ts-day-max", default=None)
    p.add_argument(
        "--incremental",
        action="store_true",
        help="process only the manifest DELTA since the last processed "
        "snapshot (Iceberg-style incremental append consumption: at crawl "
        "scale the corpus is never reprocessed)",
    )
    # serve an arbitrary published zone artifact instead of the fixture
    # world: e.g. --zones-parquet <build_all out-dir>/comprehensive.parquet
    # --ocean-bands real wires a --real-config Part A build straight into
    # the Part B hot path
    p.add_argument("--zones-parquet", default=None)
    p.add_argument("--ocean-bands", choices=["fixture", "real"], default="fixture")
    p.add_argument("--cover-res", type=int, default=None)
    p.add_argument(
        "--stage2",
        choices=["auto", "broadcast", "sharded"],
        default="auto",
        help="boundary-residue resolution: 'broadcast' ships zone "
        "geometry inside the CellMap (shuffle-free hot path — the "
        "winner while the map fits executors); 'sharded' broadcasts "
        "only the slim index and resolves boundary/offshore points "
        "through a shard-cogrouped edge join (value-identical, "
        "pytest-gated; removes the zone-count/ring-complexity ceiling); "
        "'auto' (default) measures the built map and picks — the "
        "AQE-style choice, threshold set by --broadcast-budget-mb",
    )
    p.add_argument(
        "--broadcast-budget-mb",
        type=float,
        default=None,
        help="with --stage2 auto: serialized full-CellMap size above "
        "which the sharded plan is chosen (default 128 MB — between the "
        "measured 10^5-zone 77 MB world where broadcast still ties and "
        "the 10^6-zone 306 MB world where it collapses; see BENCH.md)",
    )
    p.add_argument(
        "--sharded-stage1",
        choices=["persist", "staging"],
        default="persist",
        help="with --stage2 sharded: keep the full-size stage-1 frame "
        "as an executor-memory persist (default) or write it to a "
        "durable staging parquet under --work-dir (the petabyte-scale "
        "mode: executor storage never holds the input, and a lost "
        "executor re-reads instead of recomputing the map pass). "
        "Physical strategy only — results are identical, so the choice "
        "is not part of the stage fingerprint",
    )
    args = p.parse_args(argv)

    from pyspark import SparkConf
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("tzbb-assign-pages")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if not SparkConf(loadDefaults=True).contains("spark.master"):
        builder = builder.master(f"local[{args.cores}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from timezone_boundary_builder_spark.operators.geocode import with_coordinates
    from timezone_boundary_builder_spark.operators.spatial_join import (
        assign_tzid_udf_packed,
        pack_coords_col,
    )
    from timezone_boundary_builder_spark.plans.lineage import lineage_table
    from timezone_boundary_builder_spark.plans.manifests import (
        StageManifest,
        fingerprint,
    )
    from timezone_boundary_builder_spark.sources import pages as pages_table

    t0 = time.time()
    sid = args.snapshot or pages_table.current_snapshot_id(args.pages_root)

    if args.broadcast_budget_mb is not None and args.stage2 != "auto":
        # an explicit mode ignores the budget; silently accepting the
        # flag would misreport how the physical plan was chosen
        p.error("--broadcast-budget-mb only applies with --stage2 auto")

    if args.incremental:
        if args.stage2 == "sharded":
            # the delta path reuses the packed broadcast kernel; a
            # silently-ignored flag would misreport the physical plan.
            # (auto is fine: deltas are fixture/config-sized worlds and
            # resolve to the broadcast kernel the path implements)
            p.error("--stage2 sharded is not supported with --incremental")
        if args.ts_day_min is not None or args.ts_day_max is not None:
            # the delta path scans whole manifest entries; silently
            # ignoring a range filter would assign out-of-range days
            # while the user believes the filter applied
            p.error("--ts-day-min/--ts-day-max are not supported with "
                    "--incremental (deltas are whole manifest entries)")
        return _run_incremental(spark, args, sid, t0)

    cm, cover_res, zones_pdf = _load_cellmap(spark, args)
    if args.stage2 == "auto":
        from timezone_boundary_builder_spark.operators.spatial_join_sharded import (
            DEFAULT_BROADCAST_BUDGET_MB,
            choose_stage2,
        )

        stage2, map_bytes = choose_stage2(
            cm, args.broadcast_budget_mb or DEFAULT_BROADCAST_BUDGET_MB
        )
    else:
        stage2, map_bytes = args.stage2, None
    if args.sharded_stage1 == "staging" and stage2 != "sharded":
        # round-6 ADVICE: a user requesting durable staging must not
        # silently get an executor-persist broadcast run — same
        # misreports-the-plan rationale as --broadcast-budget-mb above
        p.error(
            "--sharded-stage1 staging requires the sharded stage-2 plan "
            f"(resolved stage2: {stage2})"
        )
    zones_fp = fingerprint("zones", *cm.tzids, *[g for g in cm.geojson])
    # every input that changes the OUTPUT is in the key: the band table
    # decides ocean tzids and the cover resolution decides the
    # cell-vs-pip method mix — omitting either would replay a stale
    # cached stage after a flag change
    # "v2": the cached assign stage now carries warc_ts (composite row
    # identity for tables where urls recur across crawls) — the format
    # marker keeps an older cached stage from replaying without it
    stage_fp = fingerprint(
        "assign-v2",
        str(sid),
        str(args.ts_day_min),
        str(args.ts_day_max),
        zones_fp,
        json.dumps(_ocean_bands(args)),
        str(cover_res),
        # the two stage-2 modes are value-identical (pytest-gated), but
        # the physical mode is still in the key: a cached stage must
        # never mask a parity break behind a replay. The RESOLVED mode
        # is fingerprinted, not the flag — auto resolving to broadcast
        # is the same stage as an explicit --stage2 broadcast
        stage2,
    )

    manifest = StageManifest(args.work_dir)
    bc = spark.sparkContext.broadcast(cm.slim() if stage2 == "sharded" else cm)
    # handle to the operator's pre-select DataFrame so its caches (stage-1
    # persist, edge/residue frames) can be released once the output is
    # published (round-6 ADVICE: the sharded branch never called
    # sharded_release, pinning the full-input persist for the session)
    sharded_handle: dict = {}

    def compute():
        scan = pages_table.scan(
            spark,
            args.pages_root,
            snapshot_id=sid,
            ts_day_min=args.ts_day_min,
            ts_day_max=args.ts_day_max,
        )
        # warc_ts rides along: (url, warc_ts) is the row identity of a
        # crawl table (warc_ts exists to version url revisits), and the
        # invariant join below must not fan out on recrawled urls
        if stage2 == "sharded":
            from timezone_boundary_builder_spark.operators.spatial_join_sharded import (
                assign_tzid_sharded,
                zone_edges_frame,
            )

            tz_bc = spark.sparkContext.broadcast(list(cm.tzids))
            edges = zone_edges_frame(
                spark.createDataFrame(zones_pdf[["tzid", "geometry"]]),
                tz_bc,
                n_shards=max(16, args.cores),
            )
            pts = with_coordinates(scan).select("url", "warc_ts", "lon", "lat")
            # staging path is derived from the stage fingerprint
            # (round-6 ADVICE): two runs sharing a work dir (a retry
            # racing a stuck run, different snapshots) must not clobber
            # each other's stage-1 parquet mid-read; stale fingerprints'
            # staging dirs belong to the work-dir owner's cleanup, like
            # the manifest outputs themselves
            staging = (
                os.path.join(args.work_dir, f"sharded_stage1_{stage_fp[:16]}")
                if args.sharded_stage1 == "staging"
                else None
            )
            out = assign_tzid_sharded(
                pts,
                bc,
                edges,
                _ocean_bands(args),
                n_shards=max(16, args.cores),
                stage1_path=staging,
            )
            sharded_handle["df"] = out
            return out.select("url", "warc_ts", "tzid", "method")
        pts = with_coordinates(scan).select("url", "warc_ts", pack_coords_col())
        return assign_tzid_udf_packed(pts, bc, _ocean_bands(args))

    assigned, cached = manifest.run_stage(spark, "assign", stage_fp, compute)
    methods = {
        r["method"]: r["n"]
        for r in assigned.groupBy("method").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # byte-identical text invariant: order-insensitive hash aggregate of
    # (url, text) must survive the join back to the assignments. The
    # join keys on the COMPOSITE (url, warc_ts) row identity, null-safe
    # on warc_ts — a recrawled url (same url, two warc_ts rows) is
    # routine input, and a url-only join would fan out and abort the run
    # as a spurious invariant violation. (Exact duplicate (url, warc_ts)
    # rows still fan out and abort — that IS table corruption: a
    # double-published commit.)
    scan = pages_table.scan(
        spark,
        args.pages_root,
        snapshot_id=sid,
        ts_day_min=args.ts_day_min,
        ts_day_max=args.ts_day_max,
    )
    h_in = scan.agg(
        F.bit_xor(F.xxhash64("url", "text")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    a = assigned.select(
        F.col("url").alias("a_url"),
        F.col("warc_ts").alias("a_ts"),
        "tzid",
        "method",
    )
    joined = scan.join(
        a,
        (scan["url"] == a["a_url"]) & scan["warc_ts"].eqNullSafe(a["a_ts"]),
        "inner",
    ).drop("a_url", "a_ts")
    # stage-then-promote: write to a staging path, hash the WRITTEN bytes
    # (one join execution, and the invariant covers what actually landed
    # on disk), and only rename into the consumer-visible paths once the
    # check passes — a violation must never leave corrupt parquet (or a
    # lineage table describing an aborted output) where downstream
    # readers can pick it up
    final_path = f"{args.out_dir}/assigned_pages"
    staging_path = f"{final_path}.__staging__"
    lineage_final = f"{args.out_dir}/lineage"
    lineage_staging = f"{lineage_final}.__staging__"
    joined.write.mode("overwrite").parquet(staging_path)
    lineage_table(assigned, "url").write.mode("overwrite").parquet(lineage_staging)
    written = spark.read.parquet(staging_path)
    h_out = written.agg(
        F.bit_xor(F.xxhash64("url", "text")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    text_ok = (h_in["h"] == h_out["h"]) and (h_in["n"] == h_out["n"])
    if not text_ok:
        shutil.rmtree(staging_path, ignore_errors=True)
        shutil.rmtree(lineage_staging, ignore_errors=True)
        raise AssertionError("text passthrough invariant violated")
    # The two promotes cannot be one atomic rename (rename(2) cannot swap
    # non-empty directories), so a crash between them CAN leave a new
    # output next to the previous run's lineage. Make that torn state
    # DETECTABLE: both staged dirs carry the same _publish.json (the
    # underscore prefix hides it from parquet readers) — a consumer that
    # needs the pair consistent compares the two publish_ids, and the
    # next run heals the tear by rewriting both.
    publish = {"publish_id": uuid.uuid4().hex, "snapshot": sid}
    for staged in (staging_path, lineage_staging):
        with open(os.path.join(staged, "_publish.json"), "w") as f:
            json.dump(publish, f)
    for staged, final in ((staging_path, final_path), (lineage_staging, lineage_final)):
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(staged, final)
    # metadata-only count of the PROMOTED lineage parquet: re-running the
    # lineage mapInPandas pass just for a metrics line would double its
    # cost at crawl scale
    n_lineage = spark.read.parquet(lineage_final).count()

    # output is published and every consumer above has executed — drop
    # the sharded operator's caches (stage-1 persist, edges, residue)
    # instead of pinning them for the rest of the session (round-6
    # ADVICE; no-op when the stage replayed from the manifest cache)
    if sharded_handle.get("df") is not None:
        sharded_handle["df"].sharded_release()

    print(
        json.dumps(
            {
                "snapshot": sid,
                "cached": cached,
                "cover_res": cover_res,
                # resolved physical plan (+ the measured full-map bytes
                # that drove an auto choice) — the run report must say
                # which plan actually served, not which flag was passed
                "stage2": stage2,
                # resolved staging mode (round-6 ADVICE): null unless the
                # sharded plan served, so the report never implies a
                # durable stage-1 write that did not happen
                "sharded_stage1": args.sharded_stage1 if stage2 == "sharded" else None,
                "map_bytes": map_bytes,
                "rows": int(h_out["n"]),
                "methods": methods,
                "text_invariant_ok": text_ok,
                "lineage_partitions": n_lineage,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()
    return 0


def _ocean_bands(args) -> list[dict]:
    if args.ocean_bands == "real":
        from timezone_boundary_builder_spark.sources.real_config import (
            real_ocean_bands_pdf,
        )

        return real_ocean_bands_pdf().to_dict("records")
    from timezone_boundary_builder_spark.sources.fixtures import OCEAN_BANDS

    return OCEAN_BANDS


def _load_cellmap(spark, args):
    """Fixture world by default; with --zones-parquet, any published zone
    artifact (tzid, geometry) — bboxes re-derived, cover built driver-side
    (zones are config-sized; the pages side is where scale lives). The
    fixture world comes from the PACKAGE (sources.fixtures), never from
    the repo-root driver harness — under the documented
    `spark-submit --py-files engine.zip` invocation only the package is
    on sys.path."""
    from timezone_boundary_builder_spark.operators.cover import (
        DEFAULT_COVER_RES,
        auto_cover_res,
        cellmap_from_zones_pdf,
    )
    from timezone_boundary_builder_spark.sources.fixtures import (
        local_cellmap,
        local_zones,
    )

    if not args.zones_parquet:
        if args.cover_res is None:
            return local_cellmap(), DEFAULT_COVER_RES, local_zones()
        # honor --cover-res on the fixture world too: the flag is in the
        # stage fingerprint, so it must also change the artifact (the
        # cell-vs-pip method mix), not just bust the cache
        return (
            cellmap_from_zones_pdf(local_zones(), max_res=args.cover_res),
            args.cover_res,
            local_zones(),
        )
    zdf = spark.read.parquet(args.zones_parquet)
    # bboxes are for auto_cover_res + CellMap zone_bbox; require the full
    # quartet or none (a partial set would KeyError downstream), deriving
    # from geometry when absent
    quartet = ("min_x", "min_y", "max_x", "max_y")
    bbox_cols = list(quartet) if all(c in zdf.columns for c in quartet) else []
    zp = zdf.select("tzid", "geometry", *bbox_cols).toPandas()
    # served zone artifacts have unknown zone-size distributions ahead of
    # time, so the cover resolution adapts to them (auto_cover_res: the
    # median zone bbox spans ~3 cells/axis); an explicit --cover-res pins
    # it. The EFFECTIVE res is returned so the stage fingerprint and the
    # run report carry what actually built the cover — auto's pick
    # depends on artifact columns outside the tzid+geometry fingerprint,
    # so fingerprinting the flag alone would replay a stale cached stage
    # when the artifact's bbox columns change.
    res = args.cover_res or auto_cover_res(zp)
    return cellmap_from_zones_pdf(zp, max_res=res), res, zp


def _run_incremental(spark, args, sid, t0) -> int:
    """Process only manifest entries added since the last processed
    snapshot. The Iceberg-lite manifest is append-only (commit_append
    extends the parent's list), so the delta is exactly the new data
    files; each run appends one increment of assignments and advances the
    cursor atomically. Re-running with no new snapshot is a no-op."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from timezone_boundary_builder_spark.operators.geocode import with_coordinates
    from timezone_boundary_builder_spark.operators.spatial_join import (
        assign_tzid_udf_packed,
        pack_coords_col,
    )
    from timezone_boundary_builder_spark.sources import pages as pages_table
    from timezone_boundary_builder_spark.sources.pages import PAGES_SCHEMA

    os.makedirs(args.work_dir, exist_ok=True)
    cursor_path = os.path.join(args.work_dir, "incremental.json")
    state = {"last_snapshot": None, "increments": []}
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            state = _json.load(f)

    # chain-walked append delta (NOT a raw path diff): rewrite snapshots
    # from compact_data_files carry no new logical rows and are skipped;
    # an expired cursor fails loudly instead of reprocessing the world
    try:
        delta = pages_table.added_paths_since(
            args.pages_root, sid, state["last_snapshot"]
        )
    except (ValueError, FileNotFoundError) as e:
        raise SystemExit(
            f"incremental cursor {state['last_snapshot']} is no longer on "
            f"the snapshot chain (expired by expire_snapshots?). Delete "
            f"{cursor_path} to re-baseline. ({e})"
        )

    rows = 0
    methods: dict[str, int] = {}
    if delta:
        from timezone_boundary_builder_spark.plans.lineage import lineage_table

        cm, _, _ = _load_cellmap(spark, args)
        bc = spark.sparkContext.broadcast(cm)
        scan = spark.read.schema(PAGES_SCHEMA).parquet(*[e["path"] for e in delta])
        pts = with_coordinates(scan).select("url", "warc_ts", pack_coords_col())
        assigned = assign_tzid_udf_packed(pts, bc, _ocean_bands(args))
        inc_path = os.path.join(args.out_dir, "increments", f"snap-{sid}")
        assigned.write.mode("overwrite").parquet(inc_path)
        got = spark.read.parquet(inc_path)
        # per-partition lineage for the increment too — the incremental
        # surface carries the same per-partition metrics contract as the
        # full run, one lineage table per increment (kept OUTSIDE
        # increments/ so consumers can glob increments/* homogeneously)
        lineage_table(got, "url").write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "increments_lineage", f"snap-{sid}")
        )
        rows = got.count()
        methods = {
            r["method"]: r["n"]
            for r in got.groupBy("method").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        state["increments"].append(
            {"snapshot": sid, "rows": rows, "path": inc_path}
        )
    state["last_snapshot"] = sid
    tmp = cursor_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(state, f)
    os.rename(tmp, cursor_path)  # atomic cursor advance

    print(
        json.dumps(
            {
                "snapshot": sid,
                "incremental": True,
                "delta_files": len(delta),
                "rows": rows,
                "methods": methods,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
