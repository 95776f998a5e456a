"""Structured Streaming entry points.

The reference is strictly batch (SURVEY.md §2.3: "no streaming"); these
exist because the serving layer's input is a continuously-crawled pages
table. Same operators, streaming plan:

- `stream_assign`: readStream over the pages directory -> JVM-side
  geocode (with_coordinates) -> the same broadcast two-stage join
  mapInPandas -> parquet sink with checkpointLocation. Restart-safe: the
  sink's checkpoint + the append-only source give exactly-once file
  output.
- `stream_event_counts`: watermarked sliding-window aggregation over the
  events table (the canonical late-data pattern).

Both are testable offline with trigger(availableNow=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geocode import with_coordinates
from ..operators.spatial_join import ASSIGN_SCHEMA, make_assign_fn
from ..sources.pages import PAGES_SCHEMA


def stream_assign(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    cellmap_bc,
    ocean_bands: list[dict],
):
    """Streaming two-stage spatial join. Returns the StreamingQuery
    (caller awaits termination; availableNow drains existing files)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    with_xy = with_coordinates(pages)
    fn = make_assign_fn(cellmap_bc, ocean_bands)
    assigned = with_xy.select("url", "lon", "lat").mapInPandas(fn, ASSIGN_SCHEMA)
    return (
        assigned.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_event_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over a streamed events table
    (event_id, ts, user_id, event_type, value). Returns the streaming
    DataFrame; callers attach a sink (tests use a memory sink +
    availableNow)."""
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(source_dir)
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(w, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
