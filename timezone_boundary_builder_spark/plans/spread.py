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
without the sort round-robin repartition pays (guide §2.5).

`min_bytes` gates the OTHER end of the scale: on a tiny local input the
repartition shuffle costs more than just computing single-core (measured
+0.3–0.4 s per query at sf0.1 for cheap md5/regex projections), so when
the scan's files are locally stat-able and total under the threshold the
frame is returned untouched. Call sites whose per-row work is heavy
(image codec ~500 us/row, hashlib minhash ~250 us/doc) pass min_bytes=0
— for them the spread pays at any input size. Non-local schemes (hdfs,
s3) cannot be stat-ed here and fall through to the partition-count rule
alone, which is the correct cluster behavior anyway."""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

DEFAULT_MIN_SPREAD_BYTES = 4_000_000


def spread_small_scan(
    df: DataFrame, *cols: str, min_bytes: int = DEFAULT_MIN_SPREAD_BYTES
) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    if min_bytes > 0:
        total: int | None = 0
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("file", ""):
                total = None  # remote store: can't stat, don't guess
                break
            try:
                total += os.path.getsize(unquote(u.path))
            except OSError:
                total = None
                break
        if files and total is not None and total < min_bytes:
            return df  # single-task compute beats a shuffle at this size
    return df.repartition(sc.defaultParallelism, *cols)
