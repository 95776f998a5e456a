"""Scale-adaptive input-parallelism fix (round 7, optimization guide
§2.4/§6): a parquet file with a single row group scans as ONE task no
matter what `spark.sql.files.maxPartitionBytes` says (byte-range splits
only parallelize across row-group starts), so per-row-expensive work
downstream of such a scan runs single-core. `spread_small_scan`
hash-repartitions the frame to the cluster's default parallelism — but
ONLY when the plan's scan actually has fewer partitions than that, so on
a real multi-file / multi-row-group table (the 100 TB case) it is a
no-op and introduces no exchange. Hash (not round-robin) partitioning on
a deterministic key: retried tasks reproduce the same row placement
without the sort round-robin repartition pays (guide §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, *cols: str) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism, *cols)
