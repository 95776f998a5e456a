"""Golden tests for the network-free Overpass pieces: the query strings
must byte-match what the reference's builder emits for the same config
(reverse-key-order filters, way-mode switch), and the validation/backoff
semantics must follow index.js:332-334, 480-527."""

import pytest

from timezone_boundary_builder_spark.sources.overpass import (
    BackoffPolicy,
    build_overpass_query,
    validate_overpass_result,
)


def test_relation_query_reverse_key_order():
    # mirrors an osmBoundarySources.json entry with two filters; the
    # reference iterates keys BACKWARDS, so the later key appears first
    q = build_overpass_query({"timezone": "Asia/Tokyo", "boundary": "timezone"})
    assert q == (
        '[out:json][timeout:60];(relation["boundary"="timezone"]'
        '["timezone"="Asia/Tokyo"];);out body;>;out meta qt;'
    )


def test_way_mode_excludes_way_key():
    q = build_overpass_query({"way": True, "name": "Some Coast"})
    assert q == (
        '[out:json][timeout:60];(way["name"="Some Coast"];);'
        "out body;>;out meta qt;"
    )


def test_result_validation():
    with pytest.raises(ValueError, match="Invalid geojson"):
        validate_overpass_result({}, "q1")
    with pytest.raises(ValueError, match="No data found"):
        validate_overpass_result({"features": []}, "q1")
    validate_overpass_result({"features": [{"type": "Feature"}]}, "q1")  # ok


def test_backoff_doubles_and_halves_with_clamps():
    p = BackoffPolicy()
    assert p.gap_s == 8
    gaps = [p.on_error() for _ in range(8)]
    assert gaps[:5] == [16, 32, 64, 128, 256]
    assert gaps[5:] == [300, 300, 300]  # clamped at max
    assert p.on_success() == 150
    for _ in range(10):
        p.on_success()
    assert p.gap_s == 8  # clamped at min
