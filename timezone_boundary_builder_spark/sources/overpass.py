"""Overpass QL query construction + result validation + backoff policy —
the network-free parts of the reference's source-ingest path
(downloadFromOverpass, index.js:465-527; gap constants index.js:332-334).

The sandbox has no network, so the HTTP fetch itself stays out of scope
(SURVEY S1: fixtures replace downloads). What IS reproduced exactly:

- query text: `[out:json][timeout:60];(relation["k"="v"]...;);out body;>;
  out meta qt;` with the element switched to `way` when cfg.way is set,
  the `way` key excluded from filters, and filters emitted in REVERSE
  config-key order (the reference iterates keys backwards,
  index.js:480-486 — preserved so query strings byte-match);
- result validation: missing `features` and empty results are hard
  errors with the reference's failure semantics (index.js:517-527);
- adaptive throttle policy: gap starts at 8 s, doubles on error (cap
  300 s), halves on success (floor 8 s) — the driver-side retry policy a
  production deployment would wrap around its HTTP client.
"""

from __future__ import annotations

MIN_REQUEST_GAP_S = 8
MAX_REQUEST_GAP_S = 300


def build_overpass_query(cfg: dict) -> str:
    """cfg: osmBoundarySources.json-style mapping of OSM tag filters,
    optionally with `way: True`. Returns the exact reference query
    string."""
    element = "way" if cfg.get("way") else "relation"
    parts = [f"[out:json][timeout:60];({element}"]
    for k in reversed(list(cfg.keys())):
        if k == "way":
            continue
        parts.append(f'["{k}"="{cfg[k]}"]')
    parts.append(";);out body;>;out meta qt;")
    return "".join(parts)


def validate_overpass_result(data: dict, query_name: str) -> None:
    """Reference failure semantics (index.js:517-527)."""
    if "features" not in data:
        raise ValueError(f"Invalid geojson from overpass for query: {query_name}")
    if len(data["features"]) == 0:
        raise ValueError("No data found for from overpass query")


class BackoffPolicy:
    """Adaptive request-gap throttle (index.js:332-334, 494-512)."""

    def __init__(
        self,
        min_gap_s: float = MIN_REQUEST_GAP_S,
        max_gap_s: float = MAX_REQUEST_GAP_S,
    ):
        self.min_gap_s = float(min_gap_s)
        self.max_gap_s = float(max_gap_s)
        self.gap_s = float(min_gap_s)

    def on_error(self) -> float:
        self.gap_s = min(self.max_gap_s, self.gap_s * 2)
        return self.gap_s

    def on_success(self) -> float:
        self.gap_s = max(self.min_gap_s, self.gap_s / 2)
        return self.gap_s
