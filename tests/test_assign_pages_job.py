"""Part B production job surface: jobs/assign_pages.py — snapshot-pinned
assignment with manifest resume, lineage, and the text-passthrough
invariant."""

import json
import os
import subprocess
import sys

import pytest

from tests._jobrunner import run_job

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(pages_root, work, out, extra=()):
    proc = run_job(
        "assign_pages.py",
        ["--pages-root", pages_root, "--work-dir", work, "--out-dir", out,
         "--cores", "8", *extra],
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def pages_root(spark, tmp_path_factory):
    from timezone_boundary_builder_spark.sources import pages as pt
    from timezone_boundary_builder_spark.sources.fixtures import synthetic_pages

    root = str(tmp_path_factory.mktemp("pages_tbl"))
    pdf = synthetic_pages(n=600, seed=9).drop(columns=["kind"])
    pt.commit_append(root, spark.createDataFrame(pdf))
    return root


def test_assign_job_runs_and_resumes(pages_root, tmp_path):
    work = str(tmp_path / "w")
    out = str(tmp_path / "o")
    r1 = _run(pages_root, work, out)
    assert r1["rows"] == 600
    assert r1["text_invariant_ok"] is True
    assert r1["cached"] is False
    # default --stage2 auto: the fixture map is far under the budget, so
    # the AQE-style selector resolves to the broadcast kernel and the
    # report carries the resolved plan + the measured map bytes
    assert r1["stage2"] == "broadcast"
    assert 0 < r1["map_bytes"] < 128e6
    # the synthetic mix covers every method incl. offshore knn
    assert set(r1["methods"]) >= {"cell", "knn", "ocean", "none"}
    assert r1["lineage_partitions"] >= 1
    # torn-publish detectability: output and lineage carry the SAME
    # publish marker (a crash between the two promote renames would
    # leave mismatched ids for consumers to detect)
    pub = [
        json.load(open(os.path.join(out, d, "_publish.json")))
        for d in ("assigned_pages", "lineage")
    ]
    assert pub[0]["publish_id"] == pub[1]["publish_id"]
    assert pub[0]["snapshot"] == r1["snapshot"]
    r2 = _run(pages_root, work, out)
    assert r2["cached"] is True
    assert r2["methods"] == r1["methods"]


def test_assign_job_partition_pruning(pages_root, tmp_path):
    r = _run(
        pages_root,
        str(tmp_path / "w2"),
        str(tmp_path / "o2"),
        extra=("--ts-day-min", "2026-01-01", "--ts-day-max", "2026-01-31"),
    )
    assert 0 < r["rows"] <= 600
    assert r["text_invariant_ok"] is True


def test_assign_job_incremental(spark, pages_root, tmp_path):
    """Incremental mode processes only the manifest delta per snapshot and
    is a no-op when no new snapshot was committed."""
    import shutil

    from timezone_boundary_builder_spark.sources import pages as pt
    from timezone_boundary_builder_spark.sources.fixtures import synthetic_pages

    root = str(tmp_path / "tbl")
    shutil.copytree(pages_root, root)  # snapshot 1 already committed (600)
    work = str(tmp_path / "w3")
    out = str(tmp_path / "o3")
    r1 = _run(root, work, out, extra=("--incremental",))
    assert r1["incremental"] is True and r1["rows"] == 600

    # no new snapshot -> no-op
    r2 = _run(root, work, out, extra=("--incremental",))
    assert r2["rows"] == 0 and r2["delta_files"] == 0

    # new append -> only the new 150 rows are processed
    pdf = synthetic_pages(n=150, seed=77).drop(columns=["kind"])
    pdf["url"] = pdf["url"].str.replace("example.org", "example.net")
    pt.commit_append(root, spark.createDataFrame(pdf))
    r3 = _run(root, work, out, extra=("--incremental",))
    assert r3["rows"] == 150 and r3["delta_files"] >= 1

    # the union of increments covers every row exactly once
    inc = spark.read.parquet(f"{out}/increments/*")
    assert inc.count() == 750
    assert inc.select("url").distinct().count() == 750


def test_assign_job_handles_recrawled_urls(spark, tmp_path):
    """Round-4 review regression: urls recrawled at a later warc_ts (the
    reason warc_ts exists) must not fan out the invariant join — the job
    keys row identity on (url, warc_ts) and assigns every version."""
    from timezone_boundary_builder_spark.sources import pages as pt
    from timezone_boundary_builder_spark.sources.fixtures import synthetic_pages

    root = str(tmp_path / "tbl")
    pdf = synthetic_pages(n=200, seed=21).drop(columns=["kind"])
    recrawl = pdf.head(60).copy()
    recrawl["warc_ts"] = recrawl["warc_ts"] + __import__("pandas").Timedelta(days=30)
    recrawl["text"] = recrawl["text"] + " updated on recrawl"
    pt.commit_append(root, spark.createDataFrame(pdf))
    pt.commit_append(root, spark.createDataFrame(recrawl))

    r = _run(root, str(tmp_path / "w"), str(tmp_path / "o"))
    assert r["rows"] == 260 and r["text_invariant_ok"] is True
    outp = spark.read.parquet(str(tmp_path / "o" / "assigned_pages"))
    assert outp.count() == 260
    assert outp.select("url").distinct().count() == 200  # 60 urls twice
    assert outp.select("url", "warc_ts").distinct().count() == 260


def test_assign_job_runs_with_package_only_syspath(spark, tmp_path):
    """spark-submit contract: with ONLY the package on sys.path (what
    --py-files engine.zip provides — no repo checkout, no repo-root
    driver harness), the job must still run its fixture path."""
    from timezone_boundary_builder_spark.sources import pages as pt
    from timezone_boundary_builder_spark.sources.fixtures import synthetic_pages

    pkg_only = tmp_path / "pkg_only"
    pkg_only.mkdir()
    os.symlink(
        os.path.join(REPO, "timezone_boundary_builder_spark"),
        pkg_only / "timezone_boundary_builder_spark",
    )
    root = str(tmp_path / "tbl")
    pdf = synthetic_pages(n=120, seed=5).drop(columns=["kind"])
    pt.commit_append(root, spark.createDataFrame(pdf))

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "assign_pages.py"),
            "--pages-root", root,
            "--work-dir", str(tmp_path / "w"),
            "--out-dir", str(tmp_path / "o"),
            "--cores", "4",
        ],
        cwd=str(pkg_only),
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": str(pkg_only)},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads(proc.stdout.strip().splitlines()[-1])
    assert r["rows"] == 120 and r["text_invariant_ok"] is True


def test_assign_job_stage2_sharded_matches_broadcast(pages_root, tmp_path):
    """--stage2 sharded (slim-index broadcast + shard-cogrouped edge
    join) must publish EXACTLY the rows the broadcast path publishes —
    same methods mix, same (url, warc_ts, tzid, method) set — on the
    fixture world whose synthetic mix exercises cell/pip/knn/ocean/none.
    The stage fingerprint carries the mode, so switching does not
    replay the other mode's cached stage."""
    import duckdb

    wb, ob = str(tmp_path / "wb"), str(tmp_path / "ob")
    ws, os_ = str(tmp_path / "ws"), str(tmp_path / "os")
    rb = _run(pages_root, wb, ob)
    # staging mode: stage-1 goes to a durable parquet under work-dir
    # instead of an executor persist — same rows, plus the staging
    # artifact must exist (the petabyte-scale resumable path)
    rs = _run(
        pages_root,
        ws,
        os_,
        extra=("--stage2", "sharded", "--sharded-stage1", "staging"),
    )
    assert rs["rows"] == rb["rows"] == 600
    assert rs["methods"] == rb["methods"]
    assert rs["text_invariant_ok"] is True
    import glob

    # round 7: the staging dir is keyed by the stage fingerprint so
    # concurrent/differently-parameterized runs cannot clobber each other
    assert glob.glob(f"{ws}/sharded_stage1_*/*.parquet")
    only = duckdb.sql(
        f"""SELECT count(*) FROM (
          SELECT url, warc_ts, tzid, method FROM '{ob}/assigned_pages/*.parquet'
          EXCEPT
          SELECT url, warc_ts, tzid, method FROM '{os_}/assigned_pages/*.parquet')"""
    ).fetchone()[0]
    assert only == 0
    # --stage2 auto with a budget below the map must resolve to the
    # SAME stage as the explicit sharded run: the fingerprint carries
    # the resolved mode, so this is a cache hit, not a recompute
    ra = _run(
        pages_root,
        ws,
        os_,
        extra=("--stage2", "auto", "--broadcast-budget-mb", "0.0001"),
    )
    assert ra["stage2"] == "sharded"
    assert ra["map_bytes"] > 0.0001 * 1e6
    assert ra["cached"] is True
    assert ra["methods"] == rs["methods"]
