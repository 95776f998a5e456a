"""Similarity search over embedding columns (driver spec: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

Brute-force: the literal query batch is driver-collected and ONE
Arrow-batched kernel scores each row against the whole query matrix in
a vectorized pass (round 7 — the earlier JVM zip_with/aggregate folds
evaluate interpreted per element); no shuffle until the final top-k
window. Scale path: random-hyperplane LSH signatures bucket the
vectors; probing only matching buckets turns the all-pairs scan into an
equi-join. At 10^12 rows this is the right shape: the scan stays
map-side; only k rows per query survive to the shuffle. All kernels
keep bit-parity with the old folds (np.cumsum sequential accumulation,
JVM-side rounding) — the DuckDB oracles are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _pair_cosine_col(vec_col, qvec_col):
    """cosine(vec, qvec) as an Arrow-batched pandas UDF — replaces the
    `_dot/_norm` higher-order-function expression on candidate pairs
    (round 7, guide §4.2: Spark evaluates HOF lambdas interpreted per
    element; at 64 dims x candidates that bounded the re-rank stages).

    Bit-parity with the old expression: dots and norms accumulate
    SEQUENTIALLY (np.cumsum — the F.aggregate left fold's order; np.sum
    pairwise is not), and the division happens after the norms multiply,
    exactly as `_dot / (_norm * _norm)` evaluated. Null/length semantics
    mirror zip_with: a null vector, or a length mismatch between the two
    sides, yields NULL (zip_with padded the shorter side with nulls, so
    the fold went null); equal-length vectors of ANY dimension produce
    the real fold value. (An element-level null inside a vector arrives
    through Arrow as NaN and yields a NaN cosine rather than the old
    NULL — no such rows exist in any test table; real NaN elements
    propagate to NaN cosines identically in both forms.) Rounding stays
    in the JVM plan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pc(va: pd.Series, vb: pd.Series) -> pd.Series:
        # object-dtype output: None -> SQL NULL, float('nan') stays NaN
        # (a float64 Series cannot hold None, and pandas' nullable
        # Float64 silently coerces NaN to NA — both would break parity)
        out: list[float | None] = []
        for a, b in zip(va, vb):
            if a is None or b is None or len(a) != len(b):
                out.append(None)
                continue
            aa = np.asarray(a, dtype=np.float64)
            bb = np.asarray(b, dtype=np.float64)
            if len(aa) == 0:
                # empty fold: dot = 0.0, norms = 0.0 -> 0/0 = NaN, the
                # same NaN the JVM fold produced
                out.append(float("nan"))
                continue
            dot = np.cumsum(aa * bb)[-1]
            na = np.sqrt(np.cumsum(aa * aa)[-1])
            nb = np.sqrt(np.cumsum(bb * bb)[-1])
            out.append(float(dot / (na * nb)))
        return pd.Series(out, dtype=object)

    return _pc(vec_col, qvec_col)


def _plane_dots_col(planes: np.ndarray, vec_col):
    """Per-hyperplane dot products of a vector column against a FIXED
    plane matrix, as one Arrow-batched pandas UDF emitting an
    array<double> (round 7): the previous form built one interpreted
    `_dot(vec, literal_plane)` fold per plane — n_planes x dim
    interpreted lambda evaluations per row. Sequential np.cumsum
    accumulation keeps the values bit-identical to the F.aggregate left
    fold. Malformed rows (null vector / wrong dimension; an inner null
    arrives as NaN through Arrow) yield all-NaN dots — and NaN > 0 is
    false exactly like the old NULL fold under the sign test, so bucket
    bits come out 0 for them either way."""
    from pyspark.sql.functions import pandas_udf

    pm = np.asarray(planes, dtype=np.float64)
    n_planes, dim = pm.shape

    @pandas_udf("array<double>")
    def _pdots(vec: pd.Series) -> pd.Series:
        try:
            arr = np.array(
                [r if r is not None else [np.nan] * dim for r in vec],
                dtype=np.float64,
            )
        except ValueError:
            arr = None
        if arr is not None and arr.ndim == 2 and arr.shape[1] == dim:
            m = arr
        else:
            m = np.full((len(vec), dim), np.nan)
            for i, r in enumerate(vec):
                if r is not None and len(r) == dim:
                    m[i] = r
        out = np.empty((len(m), n_planes), dtype=np.float64)
        for p in range(n_planes):
            out[:, p] = np.cumsum(m * pm[p], axis=1)[:, -1]
        return pd.Series(list(out))

    return _pdots(vec_col)


def cosine_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query id (subset of the table), the k
    nearest OTHER vectors.

    Round 7 shape (the _ivf_quantizer pattern, guide §4.2): the query
    batch is driver-collected (it is a literal input — ANN serving
    collects its query batch by definition, the same precedent as
    _ivf_probe_side) and ONE Arrow kernel emits each row's per-query
    cosine array in a single vectorized pass; a JVM inline-explode then
    produces the (query_id, neighbor_id, cosine) rows. The previous
    crossJoin(broadcast(q)) + per-pair fold shipped every (vec, qvec)
    pair through the scoring expression. np.cumsum accumulation and the
    divide-after-norms-multiply order keep every cosine bit-identical
    to the old `_dot / (_norm * _norm)` fold; a dirty QUERY row (null /
    wrong-dim / null-element vector) contributes NULL cosines exactly
    like the old broadcast row did, and a dirty FILE row gets a NULL
    array from the kernel -> NULL cosine, as the old zip_with padding
    gave it. Rounding stays in the JVM plan."""
    from pyspark.sql.functions import pandas_udf

    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    q_rows = sorted(
        v.where(F.col(id_col).isin(query_ids)).collect(),
        key=lambda r: r[id_col],
    )
    spark = vectors.sparkSession
    if not q_rows:
        return _empty_ann(spark)
    # majority dimension of the CLEAN query vectors defines the kernel
    # width; a query that does not conform keeps a NULL cosine column
    dims = [len(r["vec"]) for r in q_rows if r["vec"] is not None]
    dim = max(set(dims), key=lambda d: (dims.count(d), d)) if dims else 0
    clean: list[tuple[int, list[float]]] = []
    null_qids: list[int] = []
    for r in q_rows:
        qv = _clean_qvec(r["vec"], dim) if dim else None
        if qv is not None:
            clean.append((int(r[id_col]), qv))
        else:
            null_qids.append(int(r[id_col]))
    if clean:
        qmat = np.array([qv for _, qv in clean], dtype=np.float64)
        qnorms = np.sqrt(np.cumsum(qmat * qmat, axis=1)[:, -1])
        n_q = len(clean)

        @pandas_udf("array<double>")
        def _qcos(vec: pd.Series) -> pd.Series:
            try:
                arr = np.array(
                    [r if r is not None else [np.nan] * dim for r in vec],
                    dtype=np.float64,
                )
            except ValueError:
                arr = None
            if arr is not None and arr.ndim == 2 and arr.shape[1] == dim:
                m = arr
                bad = np.zeros(len(vec), dtype=bool)
            else:
                m = np.full((len(vec), dim), np.nan)
                bad = np.ones(len(vec), dtype=bool)
                for i, r in enumerate(vec):
                    if r is not None and len(r) == dim:
                        m[i] = r
                        bad[i] = False
            rnorm = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
            out = np.empty((len(m), n_q), dtype=np.float64)
            for j in range(n_q):
                dots = np.cumsum(m * qmat[j], axis=1)[:, -1]
                out[:, j] = dots / (rnorm * qnorms[j])
            # wrong-dim / null file rows -> NULL array (the old zip_with
            # padding nulled their folds); NaN data rows stay NaN
            return pd.Series(
                [None if b else row.tolist() for b, row in zip(bad, out)]
            )

        scored_base = v.withColumn("__qc", _qcos(F.col("vec")))
    else:
        scored_base = v.withColumn(
            "__qc", F.lit(None).cast("array<double>")
        )
    entries = []
    for j, (qid, _) in enumerate(clean):
        entries.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.round(F.element_at(F.col("__qc"), j + 1), 6).alias("cosine"),
            )
        )
    for qid in null_qids:
        entries.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.lit(None).cast("double").alias("cosine"),
            )
        )
    scored = (
        scored_base.select(
            F.col(id_col).alias("neighbor_id"), F.inline(F.array(*entries))
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_ann(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    centroid_stride: int = 25,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    Build: centroids are a deterministic stratified sample of the table
    (``vec_id % centroid_stride == 0`` — no RNG, so Spark and the SQL
    oracle agree bit-for-bit). The coarse quantizer is DRIVER-KNOWN by
    construction (a real IVF trains its centroids on a sample and pins
    them), so nearest-centroid assignment is computed MAP-SIDE with no
    shuffle: one vectorized pandas UDF holds the centroid matrix and
    emits each row's per-centroid cosine array (the raw dot/norm
    arithmetic reproduces the ``F.aggregate`` left fold bit-for-bit via
    ``np.cumsum`` — sequential accumulation, NOT pairwise ``np.sum`` —
    so the values are identical to the old in-plan fold), and the
    rounding / (-cos, centroid_id) tie-break / ``array_sort`` stay in
    the JVM plan — identical ordering semantics to a windowed argmax,
    but the shuffle carries nothing. (An earlier variant baked the
    centroids into the plan as per-centroid literal-array folds;
    higher-order-function lambdas are evaluated interpreted per row, so
    at rows x centroids x dim evaluations it was ~20x slower than the
    Arrow batch path and bloated the task binary past 3 MiB.) The old
    crossJoin + Window.partitionBy(vec_id) shape moved rows x
    n_centroids through a full exchange just to pick each vector's
    nearest centroid, which at 10^12 vectors is n_centroids x the corpus
    over the wire.

    Query: each query probes its ``nprobe`` nearest centroids and exact
    cosine re-ranks only the vectors in those lists. At 10^12 rows the
    inverted file is a partitioned table keyed by centroid_id; probing is
    partition pruning — the scan touches nprobe/N_centroids of the data.
    That persisted form is implemented: ``ivf_build`` materializes the
    partitioned table, ``ivf_serve`` answers from it with the probe list
    as PartitionFilters, value-identical to this in-plan path.
    """
    v = _as_vec(vectors, id_col, vec_col)
    cent_rows = _collect_centroids(v, centroid_stride, id_col)
    if not cent_rows:
        return _empty_ann(vectors.sparkSession)
    cent_cos, top_cents = _ivf_quantizer(cent_rows, nprobe)
    file_side = _ivf_file_side(v, cent_cos, top_cents, id_col)
    probe_side = _ivf_probe_side(
        vectors.sparkSession,
        v,
        query_ids,
        cent_cos,
        top_cents,
        id_col,
        dim=len(cent_rows[0]["cvec"]),
    )
    if probe_side is None:
        return _empty_ann(vectors.sparkSession)
    cand = file_side.join(F.broadcast(probe_side), "centroid_id").where(
        F.col(id_col) != F.col("query_id")
    )
    return _score_topk(cand, id_col, k)


def _as_vec(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )


def _empty_ann(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "query_id long, neighbor_id long, cosine double, rank int"
    )


def _clean_qvec(vec, dim: int):
    """Driver-side query-vector guard: None / wrong dimension / any
    non-finite or null element -> None (skip the query: "no results for
    that id"). Mapping a null ELEMENT to NaN instead would poison the
    cosine, and NaN sorts FIRST under desc ordering — the query would
    return k arbitrary neighbors ranked above every real score."""
    if vec is None or len(vec) != dim:
        return None
    out = []
    for x in vec:
        if x is None:
            return None
        fx = float(x)
        if fx != fx or fx in (float("inf"), float("-inf")):
            return None
        out.append(fx)
    return out


def _collect_centroids(v: DataFrame, centroid_stride: int, id_col: str) -> list:
    cents = v.where(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
    )
    rows = sorted(cents.collect(), key=lambda r: r["centroid_id"])
    # a malformed row (wrong dimension / null vector) that happens to
    # land on the centroid stride must not kill the build or persist a
    # useless list (its cosines would all be NaN): keep only centroids
    # of the majority dimension
    lengths = [len(r["cvec"]) for r in rows if r["cvec"] is not None]
    if not lengths:
        return []
    # deterministic tie-break: by count, then LARGER dimension — with
    # max(set, key=count) alone a 50/50 malformed stride sample could
    # arbitrarily pin the wrong dimension and silently NaN the whole
    # corpus' cosines against wrong-dim centroids
    maj_dim = max(set(lengths), key=lambda d: (lengths.count(d), d))
    kept = [r for r in rows if r["cvec"] is not None and len(r["cvec"]) == maj_dim]
    # the suspicion test is over NON-NULL rows only: null vectors are
    # ordinary dirty-corpus rows that degrade row-wise (the documented
    # contract); only DISAGREEING dimensions among real vectors mean the
    # table itself can't be trusted. A mostly-null stride sample with
    # consistent survivors still builds a working index.
    if 2 * len(kept) < len(lengths):
        # a majority-malformed stride sample means the table itself is
        # suspect: fail loudly instead of building an index that ranks
        # every good row NaN
        raise ValueError(
            f"ivf centroid sample: only {len(kept)}/{len(rows)} rows share "
            f"the majority dimension {maj_dim} — input embeddings look "
            "malformed; refusing to build a NaN index"
        )
    return kept


def _ivf_quantizer(cent_rows: list, nprobe: int):
    """(cent_cos UDF, top_cents Column) for a pinned centroid set.

    The UDF emits each row's per-centroid cosine array in one Arrow
    batch; top_cents ranks them JVM-side and keeps the top nprobe.
    """
    from pyspark.sql.functions import pandas_udf

    cent_ids = [int(r["centroid_id"]) for r in cent_rows]
    cmat = np.array(
        [[float(x) for x in r["cvec"]] for r in cent_rows], dtype=np.float64
    )
    # centroid norms: the same left fold the old plan literal carried
    cnorms = np.empty(len(cmat))
    for ci, row in enumerate(cmat):
        acc = 0.0
        for x in row:
            acc += x * x
        cnorms[ci] = acc**0.5
    n_cents, dim = cmat.shape

    @pandas_udf("array<double>")
    def _cent_cos(vec: pd.Series) -> pd.Series:
        try:
            arr = np.array(
                [r if r is not None else [np.nan] * dim for r in vec],
                dtype=np.float64,
            )
        except ValueError:
            arr = None
        # the fast path requires an exact (n, dim) batch — checked by
        # SHAPE, not by exception: a batch whose rows ALL have the same
        # wrong length builds a clean (n, L) array (and a reshape(-1,dim)
        # would even "succeed" when n*L is divisible by dim, interleaving
        # halves of different rows and returning the wrong row count).
        # Anything else degrades the malformed rows to all-NaN cosines —
        # the same "sorts unusably" outcome the old in-plan fold gave
        # them — instead of killing the task (and at scale, the stage).
        if arr is not None and arr.ndim == 2 and arr.shape[1] == dim:
            m = arr
        else:
            m = np.full((len(vec), dim), np.nan)
            for i, r in enumerate(vec):
                if r is not None and len(r) == dim:
                    m[i] = r
        # np.cumsum accumulates sequentially -> bit-identical to the
        # F.aggregate left fold (np.sum's pairwise order is not)
        rnorm = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
        out = np.empty((len(m), n_cents), dtype=np.float64)
        for ci in range(n_cents):
            dots = np.cumsum(m * cmat[ci], axis=1)[:, -1]
            out[:, ci] = dots / (rnorm * cnorms[ci])
        return pd.Series(list(out))

    # asNondeterministic: the UDF IS deterministic, but leaving it marked
    # deterministic lets Catalyst's constraint propagation expand the
    # file side's `centroid_id = coalesce(slice(array_sort(..UDF..)).., -1)`
    # alias THROUGH the join equality and infer a probe-side filter that
    # references the file side's `vec` attribute — which fails reference
    # binding at runtime (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND), and even
    # when it binds it would re-run the whole centroid assignment per
    # probe row. Nondeterministic expressions are excluded from
    # constraint generation, which cuts both failure modes off.
    _cent_cos = _cent_cos.asNondeterministic()

    # rounding + NaN handling + tie-break stay in the JVM plan, exactly
    # the old semantics: NaN cosine (zero-norm vector/centroid) must
    # sort FIRST like Window.orderBy(desc) did (NaN > everything in
    # Spark/DuckDB ordering), so it maps to -inf in the negated sort
    # key; ascending struct sort == (cosine DESC, centroid_id ASC).
    # Built as ONE F.expr string: the per-index Python construction
    # (round/when/struct per centroid) cost a py4j round trip per call —
    # ~650 driver round trips at 80 centroids, several seconds of plan
    # BUILD time per query. The SQL string parses JVM-side in one call
    # and resolves to the same expression tree. Only integer centroid
    # ids are embedded (exact in text); no doubles are round-tripped.
    cid_sql = ",".join(f"{c}L" for c in cent_ids)
    top_cents = F.expr(
        f"slice(array_sort(transform(sequence(0, {n_cents - 1}), "
        "i -> named_struct("
        "'neg_cos', CASE WHEN isnan(round(element_at(__ccos, i + 1), 9)) "
        "THEN CAST('-Infinity' AS DOUBLE) "
        "ELSE -round(element_at(__ccos, i + 1), 9) END, "
        f"'centroid_id', element_at(array({cid_sql}), i + 1)))), "
        f"1, {nprobe})"
    )
    return _cent_cos, top_cents


def _ivf_key(expr):
    # The join key is wrapped in coalesce(.., -1) to make it provably
    # NON-NULLABLE: otherwise the optimizer infers an
    # isnotnull(centroid_id) filter on the join key and pushes it BELOW
    # the projection, duplicating the ArrowEvalPython node (the pandas
    # UDF runs twice per file-side row). Keys are never actually null
    # (cent_rows is non-empty and ids are >= 0, so -1 can't collide).
    return F.coalesce(expr, F.lit(-1).cast("long")).alias("centroid_id")


def _ivf_file_side(v: DataFrame, cent_cos, top_cents, id_col: str) -> DataFrame:
    # each vector listed under its own top-1 centroid (the file): pure
    # map-side — no shuffle to assign
    return (
        v.withColumn("__ccos", cent_cos(F.col("vec")))
        .withColumn("top_cents", top_cents)
        .select(
            F.col(id_col),
            F.col("vec"),
            _ivf_key(F.col("top_cents")[0]["centroid_id"]),
        )
    )


def _ivf_probe_side(
    spark,
    v: DataFrame,
    query_ids: list[int],
    cent_cos,
    top_cents,
    id_col: str,
    dim: int,
):
    """Queries exploded to their top-nprobe centroids (the probe set).

    A LITERAL frame, not a second scan of `v`: the query vectors are
    driver-known inputs (the query_ids list is a literal, and ANN
    serving collects its query batch by definition), and sharing a scan
    with the file side would make this a self-join through a pandas UDF
    — Spark's DeduplicateRelations does not rewrite attribute references
    INSIDE PythonUDF expressions, so whichever deduped branch carries
    the UDF dies at runtime with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND.
    Because the literal frame has its OWN lineage (no shared expression
    ids with the file side), it can safely apply the SAME pandas UDF and
    the SAME top_cents expression — identical arithmetic on both sides
    by construction. Returns None when no query id exists in the table,
    or when every matching row is malformed (null vector / wrong
    dimension vs the centroids): a dirty QUERY row must degrade to "no
    results for that query", mirroring how dirty file-side rows degrade
    to NaN cosines, never kill the whole batch driver-side.
    """
    probe_rows = (
        v.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col), F.col("vec"))
        .collect()
    )
    clean = [
        (int(r[id_col]), qv)
        for r in probe_rows
        for qv in [_clean_qvec(r["vec"], dim)]
        if qv is not None
    ]
    if not clean:
        return None
    return (
        spark.createDataFrame(clean, "query_id long, qvec array<double>")
        .withColumn("__ccos", cent_cos(F.col("qvec")))
        .withColumn("top_cents", top_cents)
        .select(
            "query_id",
            "qvec",
            F.explode(
                F.transform(
                    "top_cents", lambda s: F.coalesce(s["centroid_id"], F.lit(-1))
                )
            ).alias("centroid_id"),
        )
    )


def _score_topk(cand: DataFrame, id_col: str, k: int) -> DataFrame:
    """Exact cosine re-rank of (vec, qvec) candidate pairs -> top k.
    Round 7: Arrow pair-cosine kernel (bit-parity on _pair_cosine_col)."""
    sim = _pair_cosine_col(F.col("vec"), F.col("qvec"))
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 6).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_build(
    vectors: DataFrame,
    path: str,
    centroid_stride: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the inverted file as a parquet table PARTITIONED BY
    centroid_id (``<path>/inverted``), plus the pinned centroids
    (``<path>/centroids``).

    This is the persisted form of ivf_ann's file side — at 10^12 rows
    the build runs once and every query batch afterwards touches only
    its probed partitions (see ivf_serve). Assignment is the same
    map-side Arrow pass as ivf_ann; the single shuffle here is the
    repartition by centroid_id so each list lands in few files instead
    of every task writing a sliver of every partition.
    """
    v = _as_vec(vectors, id_col, vec_col)
    cent_rows = _collect_centroids(v, centroid_stride, id_col)
    if not cent_rows:
        raise ValueError("ivf_build: no centroids (empty input?)")
    cent_cos, top1 = _ivf_quantizer(cent_rows, nprobe=1)
    file_side = _ivf_file_side(v, cent_cos, top1, id_col)
    file_side.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(f"{path}/inverted")
    # pandas input takes the Arrow createDataFrame path (JVM-resident
    # batches): a plain-list createDataFrame is an RDD of pickled rows
    # split defaultParallelism ways, and coalesce(1) then computes all
    # those parents SERIALLY in its one task — one Python-worker
    # roundtrip each, measured ~4.5 s for 80 rows on local[32] vs ~0.1 s
    # via Arrow (round 7; same single-file layout and values either way)
    cent_pdf = pd.DataFrame(
        {
            "centroid_id": [int(r["centroid_id"]) for r in cent_rows],
            "cvec": [[float(x) for x in r["cvec"]] for r in cent_rows],
        }
    )
    vectors.sparkSession.createDataFrame(
        cent_pdf, schema="centroid_id long, cvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return {"n_centroids": len(cent_rows), "path": path}


def ivf_serve(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve ANN queries from a materialized inverted file (ivf_build):
    probe-list selection runs on the literal query batch, and the
    inverted-file scan is filtered to the probed centroid_ids — which is
    PARTITION PRUNING on the build layout, so the scan reads
    ~nprobe/N_centroids of the table instead of all of it. Results are
    identical to ivf_ann over the same data (same quantizer arithmetic,
    same re-rank)."""
    cent_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["centroid_id"],
    )
    if not cent_rows or not queries:
        return _empty_ann(spark)
    cent_cos, top_cents = _ivf_quantizer(cent_rows, nprobe)
    # same degrade-don't-crash rule as _ivf_probe_side: a null or
    # wrong-dimension query vector is skipped (no results for that id),
    # never a driver-side TypeError
    dim = len(cent_rows[0]["cvec"])
    clean_queries = [
        (int(qid), qv)
        for qid, vec in queries
        for qv in [_clean_qvec(vec, dim)]
        if qv is not None
    ]
    if not clean_queries:
        return _empty_ann(spark)
    probe_side = (
        spark.createDataFrame(clean_queries, "query_id long, qvec array<double>")
        .withColumn("__ccos", cent_cos(F.col("qvec")))
        .withColumn("top_cents", top_cents)
        .select(
            "query_id",
            "qvec",
            F.explode(
                F.transform(
                    "top_cents", lambda s: F.coalesce(s["centroid_id"], F.lit(-1))
                )
            ).alias("centroid_id"),
        )
    )
    # the probe set must be plan-time literals for the scan to prune
    # partitions, so the tiny literal-frame job runs eagerly here
    probed = sorted({int(r["centroid_id"]) for r in probe_side.collect()})
    inverted = spark.read.parquet(f"{path}/inverted").where(
        F.col("centroid_id").isin(probed)
    )
    # partition-column inference may type centroid_id as int; normalize
    # AFTER the pruning filter so the filter stays on the raw column
    inverted = inverted.select(
        F.col(id_col),
        F.col("vec"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
    )
    cand = inverted.join(F.broadcast(probe_side), "centroid_id").where(
        F.col(id_col) != F.col("query_id")
    )
    return _score_topk(cand, id_col, k)


def lsh_multiprobe_masks(n_planes: int, multiprobe_bits: int) -> list[int]:
    """XOR masks for multi-probe LSH: every bit pattern of popcount <=
    multiprobe_bits over n_planes bits, mask 0 (the exact bucket) first.
    Deterministic order: by popcount, then numeric mask value — shared by
    the Spark plan and the SQL oracle."""
    from itertools import combinations

    masks = [0]
    for r in range(1, multiprobe_bits + 1):
        level = []
        for combo in combinations(range(n_planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            level.append(m)
        masks.extend(sorted(level))
    return masks


def lsh_bucket_ann(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH ANN: signature = sign bits against n_planes
    fixed random hyperplanes (seeded — deterministic); candidates = rows
    sharing any of the query's probe buckets; exact cosine re-rank.

    The hyperplanes are literal arrays baked into the plan (no UDF). At
    scale, bucketing replaces the full scan with an equi-join on an
    8-bit key. Multi-probe (multiprobe_bits=1 by default) additionally
    probes every bucket within Hamming distance 1 of the query's — the
    standard recall fix for sign-LSH (a near neighbor that disagrees on
    exactly one hyperplane is found without adding tables): the probe
    side fans out x(1+n_planes) rows, but that side is the broadcast
    query batch — the corpus scan and the join shape are unchanged.
    Each corpus row has ONE bucket and probe buckets are distinct, so a
    (query, neighbor) pair can match at most one probe: no dedup needed.
    multiprobe_bits=0 reproduces exact-bucket-only probing.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    # round 7: the n_planes interpreted `_dot(vec, literal_plane)` folds
    # become ONE Arrow plane-dots kernel; the sign test and bit packing
    # stay in the JVM plan (NaN > 0 is false, matching the old NULL fold
    # for malformed rows — see _plane_dots_col)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dp = F.element_at(F.col("__pd"), p + 1)
        sig = sig + F.when(dp > 0, F.lit(1 << p).cast("long")).otherwise(0)
    bucketed = (
        v.withColumn("__pd", _plane_dots_col(planes, F.col("vec")))
        .withColumn("bucket", sig)
        .drop("__pd")
    )
    masks = lsh_multiprobe_masks(n_planes, multiprobe_bits)
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    q = (
        bucketed.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("bucket").alias("qbucket"),
        )
        .withColumn(
            "pbucket",
            F.explode(
                F.transform(mask_arr, lambda m: F.col("qbucket").bitwiseXOR(m))
            ),
        )
    )
    cand = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("pbucket")
    ).where(F.col(id_col) != F.col("query_id"))
    sim = _pair_cosine_col(F.col("vec"), F.col("qvec"))
    scored = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
