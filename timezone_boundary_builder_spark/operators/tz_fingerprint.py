"""Timekeeping fingerprints + derived-zone grouping computed from the real
tzdb (reference getZoneCfgSinceTime, index.js:169-245).

The reference fingerprints each zone as `${offsetAtCutoff}-${md5(list of
(transitionTime, utcOffset) after the cutoff)}` via @tubular/time, groups
zones with equal fingerprints, picks the max-population member as the
representative (index.js:230-233), and drops ocean groups that stayed
singletons (index.js:236-240). This module reproduces that with stdlib
zoneinfo:

- transitions are detected by scanning UTC instants from `cutoff_ts` to
  `horizon_ts` in coarse steps and bisecting each offset change down to
  the minute (real tzdb transitions are minute-aligned and never closer
  than the coarse step — the shortest real gap is Morocco's ~27-day
  Ramadan suspension);
- the horizon is an explicit parameter instead of the reference's
  500-transition cap (their cap exists only to stop far-future rule
  expansion from breaking equality, index.js comment at 214-218); any
  horizon beyond the last divergence year gives identical groupings and,
  unlike wall-clock "now", keeps fingerprints deterministic;
- only (time, offset) pairs participate in equality — zones differing in
  abbreviation (London GMT/BST vs Lisbon WET/WEST) or in which leg is
  "standard" (Dublin's negative DST) still merge, exactly the reference's
  documented intent.

Spark shape: the tzid list is tiny (419 + 25 oceans), so fingerprints run
as one mapInPandas over a repartitioned tzid table — each zone's scan is
independent; grouping/rep-pick is a plain groupBy + window.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_MIN = 60
_DAY = 86400


def _offset_min(tz, ts: int) -> int:
    off = datetime.fromtimestamp(ts, tz).utcoffset()
    return int(off.total_seconds() // _MIN)


def zone_transitions(
    tzid: str,
    cutoff_ts: int,
    horizon_ts: int,
    coarse_step_s: int = 7 * _DAY,
) -> list[tuple[int, int]]:
    """(transition_epoch_s, new_offset_minutes) for every total-offset
    change in (cutoff_ts, horizon_ts]. Offset-only zones (Etc/GMT*) return
    an empty list, matching the reference's null-transitions branch
    (index.js:194-195)."""
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(tzid)
    out: list[tuple[int, int]] = []
    prev_ts = cutoff_ts
    prev_off = _offset_min(tz, cutoff_ts)
    t = cutoff_ts + coarse_step_s
    while prev_ts < horizon_ts:
        t = min(t, horizon_ts)
        off = _offset_min(tz, t)
        if off != prev_off:
            lo, hi = prev_ts, t  # offset(lo)==prev_off, offset(hi)==off
            while hi - lo > _MIN:
                mid = (lo + hi) // 2 // _MIN * _MIN
                if mid <= lo:
                    break
                if _offset_min(tz, mid) == prev_off:
                    lo = mid
                else:
                    hi = mid
            out.append((hi, off))
            prev_off = off
        prev_ts = t
        if t >= horizon_ts:
            break
        t += coarse_step_s
    return out


def zone_fingerprint(tzid: str, cutoff_ts: int, horizon_ts: int) -> str:
    """`${startOffset}-${md5(transitions)}` (reference index.js:220)."""
    from zoneinfo import ZoneInfo

    start = _offset_min(ZoneInfo(tzid), cutoff_ts)
    trans = zone_transitions(tzid, cutoff_ts, horizon_ts)
    blob = ";".join(f"{t}:{o}" for t, o in trans).encode()
    return f"{start}-{hashlib.md5(blob).hexdigest()}"


FP_SCHEMA = "tzid string, population long, fingerprint string"


def compute_fingerprints(
    spark: SparkSession,
    zones: DataFrame,
    cutoff_ts: int,
    horizon_ts: int,
) -> DataFrame:
    """zones(tzid, population) -> + fingerprint, via mapInPandas (each
    zone's timeline scan is independent; ~5k zoneinfo probes per zone)."""
    cutoff, horizon = int(cutoff_ts), int(horizon_ts)

    def _fp(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tzid": pdf["tzid"],
                    "population": pdf["population"].astype("int64"),
                    "fingerprint": [
                        zone_fingerprint(t, cutoff, horizon) for t in pdf["tzid"]
                    ],
                }
            )

    nparts = max(spark.sparkContext.defaultParallelism, 8)
    return zones.select("tzid", "population").repartition(nparts).mapInPandas(
        _fp, FP_SCHEMA
    )


def derive_zone_groups(
    spark: SparkSession,
    zones: DataFrame,
    strategy: str,
    cutoff_ts: int,
    horizon_ts: int,
) -> DataFrame:
    """zones(tzid, population) -> zone_groups rows (strategy, rep_tzid,
    member_tzid, population) in the engine's config-table shape — the
    computed twin of the reference's zone-config-1970/now.json caches
    (index.js:247-261). Representative = max population, ties broken by
    tzid (reference sorts by population only, index.js:230-233); singleton
    Etc/GMT groups are dropped (index.js:236-240); singleton land groups
    are kept (they pass through downstream unchanged either way)."""
    fps = compute_fingerprints(spark, zones, cutoff_ts, horizon_ts)
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("population"), F.asc("tzid")
    )
    with_rep = fps.withColumn(
        "rep_tzid", F.first("tzid").over(w)
    ).withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")))
    kept = with_rep.where(
        (F.col("group_size") > 1) | ~F.col("tzid").startswith("Etc/GMT")
    )
    return kept.select(
        F.lit(strategy).alias("strategy"),
        "rep_tzid",
        F.col("tzid").alias("member_tzid"),
        "population",
    )
