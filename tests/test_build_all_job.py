"""The production job surface: jobs/build_all.py runs the whole Part A
pipeline (spark-submit shape) and resumes from stage manifests."""

import json
import os

import pytest

from tests._jobrunner import run_job

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(work, out, *extra):
    proc = run_job(
        "build_all.py",
        ["--work-dir", work, "--out-dir", out, "--cores", "8", *extra],
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def first_build(tmp_path_factory):
    """One shared fixture-world DAG run: three tests assert different
    aspects of the SAME first build (stage rows, assemble stage, release
    baseline), so running it three times bought nothing but wall clock."""
    base = tmp_path_factory.mktemp("build_all_shared")
    work, out = str(base / "work"), str(base / "dist")
    return _run(work, out), work, out


@pytest.fixture(scope="module")
def resumed_build(first_build):
    """The resume run over the shared first build (manifest hits)."""
    _, work, out = first_build
    return _run(work, out), work, out


def test_build_all_runs_and_resumes(first_build, resumed_build):
    r1, work, out = first_build
    assert r1["stages"]["zones"] == {"cached": False, "rows": 8}
    assert r1["stages"]["outputs"]["comprehensive-with-oceans.geojson"] == 12
    # hasAlikeInNow: Etc/GMT+9 merged into Foxtrot's group -> skipped
    assert r1["stages"]["outputs"]["now-with-oceans.geojson"] == 9
    assert r1["stages"]["outputs"]["combined-osm-zones.geojson"] == 8
    assert os.path.exists(os.path.join(out, "timezone-names-with-oceans-now.json"))
    # second run: every checkpointed stage must be a manifest hit
    r2, _, _ = resumed_build
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


def test_build_all_flags_and_release_analysis(tmp_path, first_build):
    """Reference CLI parity: --skip_1970_zones / --skip_zip / a release
    diff vs a prior run's artifacts (analyzeChangesFromLastRelease)."""
    _, _, base_out = first_build
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


def test_build_all_assemble_stage_resumes(first_build, resumed_build):
    r1, _, _ = first_build
    assert r1["stages"]["assemble"] == {"cached": False, "rows": 7}
    r2, _, _ = resumed_build
    assert r2["stages"]["assemble"]["cached"] is True
