"""Real-tzdb derivation of the 1970/now zone groupings (reference
getZoneCfgSinceTime, index.js:169-245) via stdlib zoneinfo. The asserted
facts are historical tzdb record (pinned cutoff/horizon, no wall clock):

- Europe/London, Europe/Lisbon, Europe/Dublin keep identical (time,
  offset) transition lists under current rules -> merge for a 2020
  cutoff. This is the reference's own documented intent: Lisbon differs
  only in abbreviations (WET/WEST vs GMT/BST), Dublin only in which leg
  is 'standard' (negative DST) — index.js comment at 206-212.
- Since 1970 Lisbon does NOT merge with London (Lisbon used CET through
  1992-1996) while Dublin still does.
- America/Cancun abolished DST in Feb 2015 (fixed UTC-5), so for a 2020
  cutoff it fingerprints identically to Etc/GMT+5 and absorbs it —
  exactly how real ocean bands get hasAlike flags.
- Etc/GMT+9 with no fixed-UTC-9 partner in the input stays a singleton
  ocean group and is dropped (index.js:236-240).
"""

import pandas as pd
import pytest

from timezone_boundary_builder_spark.operators.tz_fingerprint import (
    derive_zone_groups,
    zone_fingerprint,
    zone_transitions,
)

CUTOFF_2020 = 1577836800  # 2020-01-01T00:00Z
HORIZON_2040 = 2208988800  # 2040-01-01T00:00Z
HORIZON_2000 = 946684800  # 2000-01-01T00:00Z

ZONES = pd.DataFrame(
    [
        {"tzid": "Europe/London", "population": 9_000_000},
        {"tzid": "Europe/Lisbon", "population": 500_000},
        {"tzid": "Europe/Dublin", "population": 1_200_000},
        {"tzid": "America/New_York", "population": 8_000_000},
        {"tzid": "America/Cancun", "population": 1_000_000},
        {"tzid": "Etc/GMT+5", "population": 0},
        {"tzid": "Etc/GMT+9", "population": 0},
    ]
)


def test_transition_scan_matches_known_record():
    # London 2020: last Sunday of March +1h (Mar 29 01:00Z), last Sunday
    # of October -1h (Oct 25 01:00Z)
    tr = zone_transitions("Europe/London", CUTOFF_2020, CUTOFF_2020 + 365 * 86400)
    assert tr[:2] == [(1585443600, 60), (1603587600, 0)]
    # offset-only zone: no transitions at all
    assert zone_transitions("Etc/GMT+5", 0, HORIZON_2040) == []


def test_fingerprint_equalities():
    fp = lambda tz, cut: zone_fingerprint(tz, cut, HORIZON_2040)
    assert fp("Europe/London", CUTOFF_2020) == fp("Europe/Lisbon", CUTOFF_2020)
    assert fp("Europe/London", CUTOFF_2020) == fp("Europe/Dublin", CUTOFF_2020)
    assert fp("Europe/London", CUTOFF_2020) != fp("America/New_York", CUTOFF_2020)
    assert fp("America/Cancun", CUTOFF_2020) == fp("Etc/GMT+5", CUTOFF_2020)
    # since-1970: Lisbon's 1992-1996 CET years split it from London...
    assert zone_fingerprint("Europe/London", 0, HORIZON_2000) != zone_fingerprint(
        "Europe/Lisbon", 0, HORIZON_2000
    )
    # ...but Dublin matched London's every offset change
    assert zone_fingerprint("Europe/London", 0, HORIZON_2000) == zone_fingerprint(
        "Europe/Dublin", 0, HORIZON_2000
    )


def test_derive_zone_groups_spark(spark):
    zones = spark.createDataFrame(ZONES)
    out = derive_zone_groups(spark, zones, "now", CUTOFF_2020, HORIZON_2040).toPandas()
    groups = {
        rep: sorted(g.member_tzid) for rep, g in out.groupby("rep_tzid")
    }
    assert groups["Europe/London"] == [
        "Europe/Dublin",
        "Europe/Lisbon",
        "Europe/London",
    ]
    assert groups["America/Cancun"] == ["America/Cancun", "Etc/GMT+5"]
    assert groups["America/New_York"] == ["America/New_York"]  # land singleton kept
    assert "Etc/GMT+9" not in set(out.member_tzid)  # ocean singleton dropped
    assert set(out.strategy) == {"now"}
