"""Deduplication operators (driver spec: exact, MinHash+LSH, SimHash,
n-gram Jaccard).

Exact dedup is JVM-side md5 + groupBy (the one shuffle is the dedup-key
groupBy — the theoretical minimum). MinHash signatures are MAP-ONLY
since round 7: one Arrow-batched hashlib kernel emits the per-doc
minima (the previous explode + min(string) aggregation sort-aggregated
the whole shingle relation), so the LSH banding self-join is the first
shuffle in the near-dup chain. SimHash packs md5 bits into a 64-bit
signature with bit arithmetic. At 10^12 rows the shuffle keys (md5 hex /
band hashes) are uniformly distributed by construction — no skew
handling needed beyond AQE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's storage blocks. DataFrame.unpersist() is
    a no-op for checkpointed frames (the blocks belong to the LogicalRDD
    inside the plan, not the cache manager), so without this a
    checkpointed frame stays in block storage until GC — verified
    empirically via getRDDStorageInfo. Best-effort: pokes the plan
    internals, falls back to the context cleaner."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:
        pass


def _materialize_then_unpersist(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Eagerly materialize `result` (localCheckpoint) so the persisted
    intermediates it reads more than once can be unpersisted NOW instead
    of leaking in the block manager for the session's lifetime. The
    result is small by construction at the call sites (LSH candidate
    pairs, verified near-dup pairs — never corpus-sized); at cluster
    scale the same boundary is where a staged pipeline would write the
    candidate table to storage. Callers that fully consume the result
    can free its blocks too via `_release_checkpoint`.

    When the context has a reliable checkpoint dir configured
    (`sc.setCheckpointDir`), uses `checkpoint()` instead of
    `localCheckpoint()`: local checkpoints truncate lineage to
    executor-resident blocks, which a lost executor on a real cluster
    cannot recompute — reliable checkpoints survive executor loss. The
    result is persisted across the checkpoint write (Spark's reliable
    checkpoint otherwise recomputes the whole plan a second time when
    materializing the files) and released once written. Checkpoint-file
    lifecycle belongs to whoever set the dir (job surfaces point it
    inside their --work-dir; spark.cleaner.referenceTracking.
    cleanCheckpoints defaults to false)."""
    sc = result.sparkSession.sparkContext
    if sc._jsc.sc().checkpointDir().isDefined():
        cached = result.persist()
        out = cached.checkpoint(eager=True)
        cached.unpersist()
    else:
        out = result.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist()
    return out


def neardup_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes shared by the Spark operator and
    the SQL oracle (both render the same float64 literals)."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def embed_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 8,
    bands: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    materialize: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed scale path:
    random-hyperplane sign bits -> banded bucket keys -> per-band self
    equi-join for candidates -> exact cosine verify >= threshold.

    All JVM-side (plane literals baked into the plan; dot products via
    zip_with/aggregate codegen). The self-joins are hash joins on small
    integer bucket keys; at 10^12 rows recall is tuned via bands /
    bits-per-band and multi-probe, and the verify join moves only
    candidate pairs — never the all-pairs cross product.

    materialize=False (default) returns a lazy plan with no persist —
    building the DataFrame has no job side effect, at the cost of the
    banded relation recomputing per reference. Job surfaces that consume
    the pairs repeatedly (clean_corpus, the driver queries) opt in with
    materialize=True: persist -> eager checkpoint -> unpersist.
    """
    from .similarity import _pair_cosine_col, _plane_dots_col

    planes = neardup_planes(n_planes, dim, seed)
    rows_per_band = n_planes // bands
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    # round 7: ONE Arrow plane-dots kernel replaces n_planes interpreted
    # `_dot(vec, literal_plane)` folds; sign tests + bit packing stay in
    # the JVM plan (bit-parity documented on _plane_dots_col)
    band_cols = []
    for b in range(bands):
        sig = F.lit(0)
        for r in range(rows_per_band):
            dp = F.element_at(F.col("__pd"), b * rows_per_band + r + 1)
            sig = sig + F.when(dp > 0, F.lit(1 << r)).otherwise(0)
        band_cols.append(sig.alias(f"band_{b}"))
    # persist (opt-in): read 2x per band for candidates plus twice in the
    # verify join; unpersisted below once the eager materialization
    # consumes it
    banded = v.withColumn("__pd", _plane_dots_col(planes, F.col("vec"))).select(
        F.col(id_col), "vec", *band_cols
    )
    if materialize:
        banded = banded.persist()
    pairs = None
    for b in range(bands):
        l = banded.select(F.col(id_col).alias("id_a"), F.col(f"band_{b}").alias("bk"))
        r = banded.select(F.col(id_col).alias("id_b"), F.col(f"band_{b}").alias("bk"))
        p = l.join(r, "bk").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.distinct()
    a = banded.select(F.col(id_col).alias("id_a"), F.col("vec").alias("vec_a"))
    bb = banded.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vec_b"))
    joined = cand.join(a, "id_a").join(bb, "id_b")
    cos = _pair_cosine_col(F.col("vec_a"), F.col("vec_b"))
    out = (
        joined.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
    if not materialize:
        return out
    return _materialize_then_unpersist(out, banded)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text,
    keeping the smallest id (deterministic winner). Round 7: the
    normalize+md5 projection runs after a scale-adaptive spread so a
    single-row-group test scan doesn't fingerprint the whole corpus on
    one core (no-op on real multi-split tables)."""
    from ..plans.spread import spread_small_scan
    from .text import norm_text_col

    norm = norm_text_col(text_col)
    return (
        spread_small_scan(df, id_col)
        .withColumn("fingerprint", F.md5(norm))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """Word-shingle MinHash: signature h_i(doc) = min over shingles of
    md5(i || shingle). Uses md5 hex strings ordered lexicographically —
    exactly reproducible in ANSI SQL (the DuckDB oracle mirrors it).

    MAP-ONLY (round 7, guide §2.4/§4.2): one Arrow-batched hashlib
    kernel computes every per-doc minimum — a projection, no explode,
    no aggregation, NO shuffle at all. The previous shape (repartition
    -> explode -> groupBy with min aggregates) shuffled one row per doc
    and SORT-aggregated `num_hashes` string mins over the exploded
    shingle relation (min(string) cannot hash-aggregate); an
    intermediate JVM higher-order-function variant (array_min over
    transform(md5)) avoided the explode but evaluated the md5 lambda
    interpreted per shingle and measured ~0.6 s SLOWER on the lsh-pairs
    chain. hashlib.md5 hexdigest over UTF-8 bytes is the identical hash,
    and Python min() on hex strings is the same binary ordering —
    verified by the unchanged DuckDB oracle. Tokenization mirrors the
    JVM expressions exactly (trim = ASCII space only; Java regex \\s =
    [ \\t\\n\\x0B\\f\\r]; split keeps trailing empties). The null-text
    filter reproduces the old explode semantics (null text -> zero
    exploded rows -> doc absent).

    On single-row-group test inputs the scan is spread to the cluster's
    parallelism first (plans/spread.py — a no-op at scale).
    """
    from pyspark.sql.functions import pandas_udf

    from ..plans.spread import spread_small_scan

    schema = ", ".join(f"mh_{i} string" for i in range(num_hashes))
    prefixes = [f"{i}|".encode() for i in range(num_hashes)]

    @pandas_udf(schema)
    def _mins(texts: pd.Series) -> pd.DataFrame:
        import hashlib
        import re

        ws = re.compile(r"[ \t\n\x0B\f\r]+")
        out: list[tuple] = []
        for t in texts:
            words = ws.split(t.strip(" "))
            n = len(words)
            shingles = [
                " ".join(words[i : i + shingle_size]).encode()
                for i in range(max(n - shingle_size, 0) + 1)
            ]
            out.append(
                tuple(
                    min(hashlib.md5(p + s).hexdigest() for s in shingles)
                    for p in prefixes
                )
            )
        return pd.DataFrame(out, columns=[f"mh_{i}" for i in range(num_hashes)])

    # min_bytes=0: the hashlib kernel costs ~250 us/doc — the spread
    # pays for itself at any input size (unlike cheap md5 projections)
    base = spread_small_scan(
        df.select(id_col, text_col), id_col, min_bytes=0
    ).where(F.col(text_col).isNotNull())
    st = base.withColumn("__mh", _mins(F.col(text_col)))
    return st.select(
        F.col(id_col), *[F.col("__mh")[f"mh_{i}"].alias(f"mh_{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    materialize: bool = False,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    band hash = md5(concat of the band's rows).

    Shape: bands are UNPIVOTED to (id, band_idx, bucket) rows and matched
    with ONE self-join on (band_idx, bucket) — a single shuffle of
    bands x docs small rows — instead of one join per band (which reads
    the signature relation 2 x bands times and pays bands x the stage
    setup; at 10^12 docs the per-band variant also shuffles the doc set
    `bands` times). Bucket keys are md5-uniform so the join hash
    partitions evenly; true hot buckets (boilerplate near-dup clusters)
    are exactly the pairs we must emit, and AQE skew-join splits them."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *cols)).alias(f"band_{b}"))
    banded = sigs.select(F.col(id_col), *band_cols)
    stack_args = ", ".join(f"{b}, band_{b}" for b in range(bands))
    # persist: the self-join references `stacked` twice; without this the
    # whole upstream minhash would recompute both times (exchange reuse
    # does NOT fire here — the two shuffle sides canonicalize differently
    # and AQE broadcasts one side anyway). Unpersisted below once the
    # eager candidate materialization consumes it.
    stacked = banded.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_args}) AS (band_idx, bucket)"),
    )
    if materialize:
        stacked = stacked.persist()
    l = stacked.select(F.col(id_col).alias("id_a"), "band_idx", "bucket")
    r = stacked.select(F.col(id_col).alias("id_b"), "band_idx", "bucket")
    cand = (
        l.join(r, ["band_idx", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if not materialize:
        # default: lazy, no persist (it could not be released) and no
        # checkpoint (it would hide the plan / run a job at construction
        # time) — job surfaces that reuse the candidates opt in
        return cand
    return _materialize_then_unpersist(cand, stacked)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Near-dup clusters from candidate pairs: min-label propagation with
    pointer jumping (iterative-join connected components). Returns
    (doc_id, cluster_id) where cluster_id = min doc id reachable — so the
    cluster label doubles as the deterministic keep_id.

    Scale shape: only docs that appear in >=1 pair enter the label table
    (singletons are trivially their own cluster and never shuffle), so
    the iteration state is proportional to the near-dup population, not
    the corpus. Each round is a neighbor-min step (one edge join, then
    ONE aggregation over the union of own-label and neighbor-label rows
    — round 7 folded the old aggregate-then-join-back pair into it)
    followed by a pointer-jump step (label := min(label, label(label))
    — one self-join on the label table). The jump is sound because a node's label is always a node
    reachable from it, so the label's own label is reachable
    transitively; composing the two steps better-than-doubles the
    propagation distance per round, giving O(log diameter) rounds — a
    pathological k-doc chain converges in ~log2(k) rounds instead of k
    (dense near-dup clusters still finish in 2). The loop stops at the
    first round that changes no label and raises if max_rounds is
    exhausted before convergence — a silent exit would return
    inconsistent cluster ids."""
    if max_rounds < 1:
        # with zero rounds the convergence state is undefined — fail the
        # contract loudly instead of NameError-ing in the raise path
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .unionByName(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .distinct()
        .persist()
    )
    # The INITIAL label table is materialized as a localCheckpoint, not a
    # persist (round 7): every later round's input is a checkpoint
    # LogicalRDD, so making round 0 read the same node type gives every
    # round the IDENTICAL physical plan — one whole-stage-codegen
    # compilation serves the whole loop. With the initial table persisted
    # instead, rounds 0 AND 1 each compiled a fresh plan family
    # (InMemoryTableScan vs LogicalRDD inputs), measured ~2x the
    # steady-state round cost apiece on a 23k-pair graph.
    labels0 = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    labels = labels0.select("node", "label")
    cached_prev = labels0
    for _ in range(max_rounds):
        # Neighbor-min via UNION + one aggregation (round 7): each
        # node's own (node, label) row and its neighbors' label rows
        # aggregate together — min over the union IS
        # least(own, min(neighbor)) — and the own-row tag carries
        # old_label through the same aggregate, so the former
        # separate neighbor-min aggregate + left-join-back pair
        # (one whole join more per round) is gone. Verified
        # row-identical to the 3-join form on the sf corpus.
        self_rows = labels.select("node", "label", F.lit(1).alias("own"))
        nbr_rows = edges.join(labels, edges.d == labels.node).select(
            F.col("s").alias("node"), "label", F.lit(0).alias("own")
        )
        mid = (
            self_rows.unionByName(nbr_rows)
            .groupBy("node")
            .agg(
                F.min("label").alias("mid_label"),
                # every node has exactly one own row: max(when(own)) IS
                # that row's label
                F.max(F.when(F.col("own") == 1, F.col("label"))).alias(
                    "old_label"
                ),
            )
        )
        # pointer jump: shortcut each label to its label's label
        jump = mid.select(
            F.col("node").alias("jnode"), F.col("mid_label").alias("jlabel")
        )
        # localCheckpoint (not persist): the jump step references `mid`
        # twice, so the logical plan would DOUBLE per round — after ~10
        # rounds analysis itself blows the driver stack. Checkpointing
        # truncates lineage to the materialized blocks each round (the
        # standard iterative-algorithm shape; a production run at cluster
        # scale would use reliable checkpoint() every few rounds instead
        # so executor loss cannot orphan the iteration state).
        stepped = (
            mid.join(jump, mid.mid_label == jump.jnode, "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("mid_label"),
                    F.coalesce(F.col("jlabel"), F.col("mid_label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = stepped.where(F.col("label") != F.col("old_label")).count()
        cached_prev.unpersist()
        _release_checkpoint(cached_prev)  # frees prior rounds' checkpoints
        cached_prev = stepped
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    else:
        # release the final round's state too — the raise path must not
        # leak the last checkpoint's blocks or the persisted label table
        edges.unpersist()
        cached_prev.unpersist()
        _release_checkpoint(cached_prev)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); the near-dup graph has a "
            f"chain longer than max_rounds — raise max_rounds"
        )
    out = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out


SIMHASH_BITS = 60  # 15 hex digits: always < 2^63, so the ANSI-mode
# decimal->long cast can never overflow (16 digits crashed under Spark 4's
# default ANSI semantics whenever a word hash had the top bit set — the
# bug hid behind count()-only checks because Catalyst prunes unused
# aggregate expressions)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over word features: bit b of the signature is the
    majority vote of bit b across md5(word) of all words. Pure DataFrame
    ops: explode -> 60 conditional sums -> bit pack. Mirrored exactly by
    the DuckDB oracle (hex-prefix -> UBIGINT -> same bit votes)."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = df.select(F.col(id_col), F.explode(words).alias("w"))
    h = F.conv(
        F.substring(F.md5(F.col("w")), 1, SIMHASH_BITS // 4), 16, 10
    ).cast("decimal(38,0)")
    exploded = exploded.withColumn("h", h.cast("long"))
    bit_sums = [
        F.sum(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1).cast("long")).cast("int") * 2 - 1
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = exploded.groupBy(id_col).agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (the verify
    stage after LSH): distinct word-n-gram sets per doc, then
    |intersection| / |union| per pair. Joins are on doc ids (broadcastable
    when the candidate set is small, which LSH guarantees).

    The gram arrays are built ONLY for docs that appear in a candidate
    pair (broadcast semi-join prune, guide §3.2): the id joins below
    restrict the output to those docs anyway, and the interpreted
    transform/slice gram expression is the expensive part of this plan —
    computing it corpus-wide just to drop most rows in the join was
    measured at ~4x the pruned cost on the sf corpus (round 7; verify
    work is meant to scale with the candidate set, not the corpus).
    Callers pass materialize=True candidates, so the extra
    candidate_pairs reference here reads a checkpoint, not the LSH
    chain."""
    from timezone_boundary_builder_spark.plans.spread import spread_small_scan

    need = (
        candidate_pairs.select(F.col("id_a").alias(id_col))
        .unionByName(candidate_pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    pruned = df.join(F.broadcast(need), id_col, "left_semi")
    # min_bytes=0: the per-row gram transform is interpreted and heavy,
    # so spreading pays even for a small pruned set on a one-row-group
    # scan (plans/spread.py rationale)
    pruned = spread_small_scan(pruned, id_col, min_bytes=0)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )
    g = pruned.select(F.col(id_col), grams.alias("grams"))
    a = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    b = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    joined = candidate_pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    uni = F.size(F.array_union("grams_a", "grams_b"))
    jac = (inter / F.greatest(uni, F.lit(1))).cast("double")
    return joined.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination detection: flag every training doc that
    shares at least one word n-gram with a benchmark/eval set, with the
    count of distinct overlapping n-grams. The standard pre-training
    hygiene pass (the reference pipelines drop or flag such docs before
    packing).

    Scale shape: the benchmark's distinct n-grams are BROADCAST (eval
    sets are tiny next to the corpus), so the corpus side is a map-only
    explode + broadcast-hash semi-probe — no corpus-wide shuffle. Only
    the hit rows (a sliver, in a clean corpus) reach the per-doc
    count-distinct aggregation; the final per-doc flag join moves one
    row per doc. Shingling matches minhash_signatures: docs shorter than
    n words contribute their single short shingle, identically on both
    engine and oracle sides.
    """
    def _shingles(frame: DataFrame, col: str, keep_id: bool) -> DataFrame:
        words = F.split(F.trim(F.col(col)), r"\s+")
        idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        cols = ([F.col(id_col)] if keep_id else []) + [F.explode(sh).alias("shingle")]
        return frame.select(*cols)

    bench_sh = _shingles(benchmark, bench_text_col, keep_id=False).distinct()
    hits = _shingles(docs, text_col, keep_id=True).join(
        F.broadcast(bench_sh), "shingle"
    )
    # per_doc is NOT broadcast-hinted: its size is the number of
    # contaminated docs, which a hygiene pass cannot assume is small
    # (a heavily contaminated corpus is exactly when it runs) — AQE
    # broadcasts it at runtime when it actually is a sliver
    per_doc = hits.groupBy(id_col).agg(
        F.count_distinct("shingle").alias("n_overlap")
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
    )
