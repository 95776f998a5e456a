"""Part B production job surface: jobs/assign_pages.py — snapshot-pinned
assignment with manifest resume, lineage, and the text-passthrough
invariant."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(pages_root, work, out, extra=()):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "assign_pages.py"),
            "--pages-root", pages_root,
            "--work-dir", work,
            "--out-dir", out,
            "--cores", "8",
            *extra,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": REPO},
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
    # the synthetic mix covers every method incl. offshore knn
    assert set(r1["methods"]) >= {"cell", "knn", "ocean", "none"}
    assert r1["lineage_partitions"] >= 1
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
