"""Coordinate geocoding from page text (north_star: "geocoding each page's
extracted coordinates").

Stays entirely JVM-side (regexp_extract inside whole-stage codegen) — no
Python in this hot path. Four deterministic formats are recognized (the
FIRST occurrence in the text wins):

    geo:<lat>,<lon>                                  (RFC 5870-style)
    @(<lat>, <lon>)                                  (map-link style)
    <meta name="geo.position" content="lat;lon">     (GeoURL meta tag)
    <meta name="ICBM" content="lat, lon">            (ICBM meta tag)

The meta-tag forms are how real Common-Crawl pages carry coordinates;
matching is case-insensitive and assumes name-before-content attribute
order (the dominant form).

The `text` column is passed through UNTOUCHED — the per-row invariant
(BASELINE.json input_hint: "byte-identical extracted text per url") is
honored by never rewriting it; downstream stages carry `text` as-is or
re-join results to it by `url`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ONE strict alternation pattern for all four forms, each branch pairing
# its prefix with its own separator and terminator (geo: takes ',' only;
# @( takes ',' and REQUIRES the closing ')'; the meta tags take [;,] and
# require the closing '"') — a shared loose `[,;]` tail cross-accepted
# 'geo:12;34' and unterminated '@(12;34'. The whole match is extracted
# once (group 0) and the lat/lon pair is re-parsed from that short
# substring, keeping the stage at three regexp_extract calls — the
# split-per-format variant (8 calls inside two coalesces) pushed
# whole-stage codegen past the 64 KB method limit and silently fell back
# to interpreted mode.
_NUM = r"-?\d+(?:\.\d+)?"
COORD_RE = (
    f"(?i)(?:geo:{_NUM},\\s*{_NUM}"
    f"|@\\({_NUM},\\s*{_NUM}\\)"
    f'|<meta\\s+name="(?:geo\\.position|icbm)"\\s+content="{_NUM}[;,]\\s*{_NUM}")'
)
PAIR_RE = f"({_NUM})[,;]\\s*({_NUM})"


def _first_match(text: Column, pattern: str, group: int) -> Column:
    m = F.regexp_extract(text, pattern, group)
    return F.when(m != "", m.cast("double"))


def with_coordinates(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds lat/lon DOUBLE columns (null when no coordinate is present)."""
    hit = F.regexp_extract(F.col(text_col), COORD_RE, 0)
    lat = _first_match(hit, PAIR_RE, 1)
    lon = _first_match(hit, PAIR_RE, 2)
    # reject out-of-range coordinates as unparseable
    lat_ok = (lat >= -90) & (lat <= 90)
    lon_ok = (lon >= -180) & (lon <= 180)
    return pages.withColumn("lat", F.when(lat_ok & lon_ok, lat)).withColumn(
        "lon", F.when(lat_ok & lon_ok, lon)
    )
