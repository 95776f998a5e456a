"""The production job surface: jobs/build_all.py runs the whole Part A
pipeline (spark-submit shape) and resumes from stage manifests."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(work, out, *extra):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "build_all.py"),
            "--work-dir",
            work,
            "--out-dir",
            out,
            "--cores",
            "8",
            *extra,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])

def test_build_all_runs_and_resumes(tmp_path):
    work = str(tmp_path / "work")
    out = str(tmp_path / "dist")
    r1 = _run(work, out)
    assert r1["stages"]["zones"] == {"cached": False, "rows": 8}
    assert r1["stages"]["outputs"]["comprehensive-with-oceans.geojson"] == 12
    # hasAlikeInNow: Etc/GMT+9 merged into Foxtrot's group -> skipped
    assert r1["stages"]["outputs"]["now-with-oceans.geojson"] == 9
    assert r1["stages"]["outputs"]["combined-osm-zones.geojson"] == 8
    assert os.path.exists(os.path.join(out, "timezone-names-with-oceans-now.json"))
    # second run: every checkpointed stage must be a manifest hit
    r2 = _run(work, out)
    for stage in ("zones", "oceans", "derived_1970", "derived_now"):
        assert r2["stages"][stage]["cached"] is True, (stage, r2)
    assert os.path.exists(os.path.join(out, "timezone-names.json"))
    # S9 zip sink + S13 input archive (index.js:1459-1477, 1659-1706)
    import zipfile

    # reference dist zip names with the `zip -j` working-file arcnames
    zf = zipfile.ZipFile(os.path.join(out, "timezones-with-oceans.geojson.zip"))
    assert zf.testzip() is None
    assert zf.namelist() == ["combined-with-oceans.json"]
    assert os.path.exists(os.path.join(out, "timezones.geojson.zip"))
    names = zipfile.ZipFile(os.path.join(out, "input-data.zip")).namelist()
    assert "zones_config.json" in names and "stage-manifest.json" in names


def test_build_all_flags_and_release_analysis(tmp_path):
    """Reference CLI parity: --skip_1970_zones / --skip_zip / a release
    diff vs a prior run's artifacts (analyzeChangesFromLastRelease)."""
    base_work, base_out = str(tmp_path / "bw"), str(tmp_path / "bo")
    _run(base_work, base_out)
    r = _run(
        str(tmp_path / "w3"),
        str(tmp_path / "d3"),
        "--excluded-zones",
        "Test/Golf",
        "--skip-1970-zones",
        "--skip-zip",
        "--last-release-dir",
        base_out,
    )
    assert "derived_1970" not in r["stages"]
    assert "derived_now" in r["stages"]
    assert r["stages"]["analyze_changes"]["rows"] == 1
    changes = json.load(open(os.path.join(str(tmp_path / "d3"), "release-changes.json")))
    assert len(changes) == 1
    assert changes[0]["tzid"] == "Test/Golf"
    assert changes[0]["change"] == "removal"
    assert abs(changes[0]["area_deg2"] - 375.0) < 1e-6
    assert not os.path.exists(
        os.path.join(str(tmp_path / "d3"), "timezones.geojson.zip")
    )
    assert not os.path.exists(
        os.path.join(str(tmp_path / "d3"), "1970.geojson")
    )


def test_build_all_assemble_stage_resumes(tmp_path):
    work = str(tmp_path / "w2")
    out = str(tmp_path / "d2")
    r1 = _run(work, out)
    assert r1["stages"]["assemble"] == {"cached": False, "rows": 7}
    r2 = _run(work, out)
    assert r2["stages"]["assemble"]["cached"] is True
