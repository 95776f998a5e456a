"""Deterministic sampling for training-data curation.

Both operators are reproducible across runs, cluster sizes, and engines —
the "random" order is md5 of (id, seed), so the same rows are selected on
local[1], on 1000 executors, and by the DuckDB oracle. That property is
what makes sampled corpora auditable (re-running the pipeline cannot
silently change the training set).

- `sample_stratified`: exact n per stratum via a row_number window over
  the hash order. Spark 4 pushes rank<=n below the exchange
  (WindowGroupLimit), so each map task ships at most n rows per stratum —
  a skewed stratum (one dominant language) never concentrates more than
  n_tasks x n rows on the reducer.
- `sample_hash_fraction`: pure map-side filter `md5_prefix < threshold`;
  selects each row independently with probability ~frac (exact over the
  hash space), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 16^8 buckets: frac resolution ~2.3e-10


def hash_order_col(id_col: str, seed: int):
    """Deterministic pseudo-random sort key, identical in ANSI SQL:
    md5(CAST(id AS STRING) || '|' || seed)."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}")))


def sample_stratified(
    df: DataFrame, strata_col: str, id_col: str, n: int, seed: int = 7
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, chosen by hash
    order. Ties are impossible (md5 of distinct ids)."""
    w = Window.partitionBy(strata_col).orderBy(hash_order_col(id_col, seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def pack_token_batches(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: float,
    n_shards: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Greedy sequence packing for pretraining batches: rows are dealt to
    `n_shards` deterministic shards (hash of id), ordered pseudo-randomly
    within the shard, and cut into batches whenever the running token sum
    crosses `budget` (batch = floor(cumsum_before / budget) — a document
    straddling the boundary starts the next batch, the classic greedy
    fill). Adds (shard, batch_id) columns.

    Scale shape: ONE shuffle (hash-partition by shard) and a per-shard
    window cumsum — no global ordering anywhere. Packing quality is
    per-shard, which is what production packers do: a global greedy pack
    would serialize the corpus through one task."""
    shard = F.pmod(
        F.conv(F.substring(hash_order_col(id_col, seed), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(hash_order_col(id_col, seed + 1))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("shard", shard)
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0.0))
    return out.withColumn(
        "batch_id", F.floor(cum_before / F.lit(float(budget))).cast("long")
    )


def sample_hash_fraction(
    df: DataFrame, id_col: str, frac: float, seed: int = 7
) -> DataFrame:
    """Keep rows whose hash prefix falls below frac of the hash space.
    Map-only (no shuffle); deterministic in the row id, independent of
    partitioning and engine. frac >= 1 keeps everything and frac <= 0
    keeps nothing — the lexicographic threshold compare only works for
    thresholds inside the 8-hex-digit space (int(1.0 * 16**8) formats to
    9 chars and would lexicographically exclude ~94% of rows)."""
    if frac >= 1.0:
        return df
    if frac <= 0.0:
        return df.where(F.lit(False))
    thr = format(int(frac * 16**_HEX_DIGITS), f"0{_HEX_DIGITS}x")
    return df.where(
        F.substring(hash_order_col(id_col, seed), 1, _HEX_DIGITS) < F.lit(thr)
    )


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
    default_rate: float = 0.0,
) -> DataFrame:
    """Mixture-weight downsampling: keep each row independently with the
    RATE OF ITS SOURCE — how a training pipeline rebalances domains
    (e.g. wiki x1.0, commoncrawl x0.1) before packing. Deterministic and
    engine-independent like sample_hash_fraction (same md5(id|seed)
    hash-space threshold per row), so the mixed corpus is auditable and
    reproducible at any cluster size.

    Map-only: the per-source thresholds are a CASE expression over the
    rates dict (driver-known, like every mixture config) — no join, no
    shuffle, the filter sits directly on the scan. Sources absent from
    `rates` get default_rate (0.0 = dropped: an explicit mixture is a
    whitelist).
    """
    def _thr(rate: float) -> str:
        rate = max(0.0, min(1.0, rate))
        if rate >= 1.0:
            # past the 8-hex space: every hash compares below
            return "g" * _HEX_DIGITS
        return format(int(rate * 16**_HEX_DIGITS), f"0{_HEX_DIGITS}x")

    thr = F.lit(_thr(default_rate))
    for src, rate in sorted(rates.items()):
        thr = F.when(F.col(source_col) == src, F.lit(_thr(rate))).otherwise(thr)
    return df.where(
        F.substring(hash_order_col(id_col, seed), 1, _HEX_DIGITS) < thr
    )
