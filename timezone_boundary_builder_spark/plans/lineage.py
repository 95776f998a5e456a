"""Per-partition lineage + metrics (north_rule B9).

Two complementary mechanisms:

- `track_batches`: wraps a mapInPandas-style generator so every Arrow
  batch increments Spark ACCUMULATORS (rows in/out, batches) — live,
  cheap, visible on the driver after any action, no extra shuffle.
- `lineage_table`: a mapInPandas pass emitting one row per partition
  (partition_id, rows, bytes, min/max of a key, sha256 of sorted keys) —
  a durable side table that joins stage outputs to their inputs, the
  row-level analog of the reference's md5 content keys
  (reference index.js:806-826).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "partition_id int, n_rows long, key_min string, key_max string, keys_sha256 string"
)


class StageMetrics:
    """Accumulator bundle for one stage."""

    def __init__(self, spark: SparkSession, stage: str):
        sc = spark.sparkContext
        self.stage = stage
        self.rows_in = sc.accumulator(0)
        self.rows_out = sc.accumulator(0)
        self.batches = sc.accumulator(0)

    def wrap(self, fn):
        """Wrap a mapInPandas generator fn(iter) -> iter so the
        accumulators count every batch that flows through it."""
        rows_in, rows_out, batches = self.rows_in, self.rows_out, self.batches

        def _wrapped(batch_iter):
            def _counted_in():
                for pdf in batch_iter:
                    rows_in.add(len(pdf))
                    batches.add(1)
                    yield pdf

            for out in fn(_counted_in()):
                rows_out.add(len(out))
                yield out

        return _wrapped

    def snapshot(self) -> dict:
        return {
            "stage": self.stage,
            "rows_in": self.rows_in.value,
            "rows_out": self.rows_out.value,
            "batches": self.batches.value,
        }


def lineage_table(df: DataFrame, key_col: str) -> DataFrame:
    """One row per partition: counts + key range + content hash of the
    sorted key set (order-insensitive, so repartitioning upstream does not
    change the aggregate lineage of identical content)."""
    from pyspark.sql import functions as F

    with_pid = df.select(
        F.spark_partition_id().alias("partition_id"), F.col(key_col).cast("string").alias("k")
    )

    def _per_partition(batch_iter):
        pid = -1
        keys: list = []
        n = 0
        for pdf in batch_iter:
            if len(pdf):
                pid = int(pdf["partition_id"].iloc[0])
                n += len(pdf)
                keys.append(pdf["k"].to_numpy())
        if n == 0:
            return
        allk = np.sort(np.concatenate(keys))
        h = hashlib.sha256()
        for k in allk:
            h.update(str(k).encode())
            h.update(b"\x00")
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "n_rows": [n],
                "key_min": [str(allk[0])],
                "key_max": [str(allk[-1])],
                "keys_sha256": [h.hexdigest()],
            }
        )

    return with_pid.mapInPandas(_per_partition, LINEAGE_SCHEMA)
