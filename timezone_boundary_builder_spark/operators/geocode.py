"""Coordinate geocoding from page text (north_star: "geocoding each page's
extracted coordinates").

Stays entirely JVM-side (regexp_extract inside whole-stage codegen) — no
Python in this hot path. Four deterministic formats are recognized, in
priority order:

    geo:<lat>,<lon>                                  (RFC 5870-style)
    @(<lat>, <lon>)                                  (map-link style)
    <meta name="geo.position" content="lat;lon">     (GeoURL meta tag)
    <meta name="ICBM" content="lat, lon">            (ICBM meta tag)

The meta-tag forms are how real Common-Crawl pages carry coordinates;
matching is case-insensitive on the tag/attribute names and tolerant of
attribute order not varying (name before content, the dominant form).

The `text` column is passed through UNTOUCHED — the per-row invariant
(BASELINE.json input_hint: "byte-identical extracted text per url") is
honored by never rewriting it; downstream stages carry `text` as-is or
re-join results to it by `url`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_RE = r"geo:(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"
AT_RE = r"@\((-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)\)"
GEOPOS_RE = (
    r'(?i)<meta\s+name="geo\.position"\s+content="'
    r"(-?\d+(?:\.\d+)?);(-?\d+(?:\.\d+)?)\""
)
ICBM_RE = (
    r'(?i)<meta\s+name="ICBM"\s+content="'
    r"(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)\""
)


def _first_match(text: Column, pattern: str, group: int) -> Column:
    m = F.regexp_extract(text, pattern, group)
    return F.when(m != "", m.cast("double"))


def with_coordinates(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds lat/lon DOUBLE columns (null when no coordinate is present)."""
    t = F.col(text_col)
    lat = F.coalesce(
        _first_match(t, GEO_RE, 1),
        _first_match(t, AT_RE, 1),
        _first_match(t, GEOPOS_RE, 1),
        _first_match(t, ICBM_RE, 1),
    )
    lon = F.coalesce(
        _first_match(t, GEO_RE, 2),
        _first_match(t, AT_RE, 2),
        _first_match(t, GEOPOS_RE, 2),
        _first_match(t, ICBM_RE, 2),
    )
    # reject out-of-range coordinates as unparseable
    lat_ok = (lat >= -90) & (lat <= 90)
    lon_ok = (lon >= -180) & (lon <= 180)
    return pages.withColumn("lat", F.when(lat_ok & lon_ok, lat)).withColumn(
        "lon", F.when(lat_ok & lon_ok, lon)
    )
