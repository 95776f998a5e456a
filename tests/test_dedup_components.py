"""Connected-components clustering over candidate pairs: hand-built
graphs with known components, including a chain (worst-case diameter for
min-label propagation) and disjoint clusters."""

import pandas as pd

from timezone_boundary_builder_spark.operators.dedup import connected_components


def _cc(spark, edges):
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    )
    out = connected_components(pairs).toPandas()
    return dict(zip(out.doc_id, out.cluster_id))


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _cc(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_label_is_min_id_regardless_of_edge_order(spark):
    # the same component expressed with reversed/duplicate edges
    got = _cc(spark, [(7, 3), (3, 9), (9, 7), (9, 3)])
    assert got == {3: 3, 7: 3, 9: 3}


def test_long_chain_converges_in_log_rounds(spark):
    """A 300-doc chain (diameter 299) must converge well inside
    max_rounds=12: pointer jumping better-than-doubles propagation
    distance per round, so rounds ~ log2(diameter), not diameter. Under
    one-hop propagation this graph needs 299 rounds and would raise."""
    edges = [(i, i + 1) for i in range(300)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    )
    out = connected_components(pairs, max_rounds=12).toPandas()
    assert len(out) == 301
    assert set(out.cluster_id) == {0}


def _wait_until(pred, timeout=10.0):
    """Block-manager unpersists are async (blocking=False) — poll
    briefly before asserting on storage counts."""
    import time

    deadline = time.time() + timeout
    while not pred() and time.time() < deadline:
        time.sleep(0.2)


def test_nonconvergence_raise_releases_state(spark):
    """Regression (ADVICE r2): the non-convergence raise path must free
    the final round's blocks too, and max_rounds=0 must raise ValueError
    (not NameError)."""
    import pytest

    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(64)], columns=["id_a", "id_b"]).astype(
            "int64"
        )
    )
    with pytest.raises(ValueError, match="max_rounds"):
        connected_components(pairs, max_rounds=0)
    before = n_persisted()
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=2)  # diameter 63 >> 2 rounds
    _wait_until(lambda: n_persisted() <= before)
    assert n_persisted() <= before, (before, n_persisted())


def test_lsh_and_embed_frames_unpersisted(spark):
    """Regression (VERDICT r2 #4): minhash_lsh_pairs and
    embed_neardup_pairs must not leave their persisted intermediates in
    the block manager after the query runs — only the eagerly
    materialized (small) result checkpoint may remain, and releasing it
    returns storage to the pre-call state."""
    import numpy as np

    from timezone_boundary_builder_spark.operators.dedup import (
        _release_checkpoint,
        embed_neardup_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sc = spark.sparkContext

    def n_blocks():
        return len(sc._jsc.sc().getRDDStorageInfo())

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(60),
                "text": [f"alpha beta gamma delta {i % 7} epsilon zeta" for i in range(60)],
            }
        )
    )
    rng = np.random.default_rng(3)
    vecs = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [rng.standard_normal(64).tolist() for _ in range(40)],
            }
        )
    )

    before_blocks = n_blocks()
    lsh = minhash_lsh_pairs(minhash_signatures(docs), materialize=True)
    lsh.collect()
    emb = embed_neardup_pairs(vecs, threshold=-1.0, materialize=True)
    emb.collect()
    # no persisted intermediate survives the calls (the leak the verdict
    # flagged): at most the two small result checkpoints remain
    assert n_blocks() <= before_blocks + 2, (before_blocks, n_blocks())
    # releasing the result checkpoints restores the pre-call state
    _release_checkpoint(lsh)
    _release_checkpoint(emb)
    _wait_until(lambda: n_blocks() <= before_blocks)
    assert n_blocks() <= before_blocks, (before_blocks, n_blocks())


def test_repetition_gate_identity_and_monotone(spark):
    """Gate properties: thresholds at 1.0 pass every doc (the fractions
    are bounded by 1), and tightening any threshold can only shrink the
    kept set (monotone filter — a pipeline can tune thresholds without
    ever resurrecting dropped docs)."""
    import pandas as pd

    from timezone_boundary_builder_spark.operators.text import repetition_gate

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(30),
                "text": [
                    ("spam " * (i % 9 + 1) + f"unique words {i} appear here")
                    for i in range(30)
                ],
            }
        )
    )
    all_ids = {r.doc_id for r in docs.collect()}
    open_gate = repetition_gate(docs, 1.0, 1.0, 1.0)
    assert {r.doc_id for r in open_gate.collect()} == all_ids

    prev = all_ids
    for tw in (0.6, 0.4, 0.2):
        kept = {r.doc_id for r in repetition_gate(docs, tw, 1.0, 1.0).collect()}
        assert kept <= prev
        prev = kept
    assert prev < all_ids  # the tightest gate really dropped spammy docs


def test_materialize_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """With a checkpoint dir configured, the materialized LSH candidate
    frame must use a RELIABLE checkpoint (survives executor loss on a
    real cluster — the round-3 advice on truncated-lineage local
    checkpoints) and still return the exact lazy-plan rows."""
    import pandas as pd

    from timezone_boundary_builder_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [f"alpha beta gamma {i % 5} delta" for i in range(40)],
            }
        )
    )
    sc = spark.sparkContext
    ckdir = tmp_path / "reliable-ck"
    sc.setCheckpointDir(str(ckdir))
    try:
        got = minhash_lsh_pairs(minhash_signatures(docs), materialize=True).collect()
        # reliable checkpoint data landed on disk
        assert any(f.is_file() for f in ckdir.rglob("*")), list(ckdir.rglob("*"))
        lazy = minhash_lsh_pairs(
            minhash_signatures(docs), materialize=False
        ).collect()
        key = lambda r: (r.id_a, r.id_b)
        assert sorted(got, key=key) == sorted(lazy, key=key) and got
    finally:
        # session-scoped fixture: restore the no-checkpoint-dir state so
        # later tests keep exercising the localCheckpoint path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_round_checkpoints_released(spark):
    """Per-round label checkpoints must not accumulate in block storage:
    DataFrame.unpersist is a no-op for localCheckpointed frames, so the
    loop frees the LogicalRDD's blocks explicitly."""
    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    before = n_persisted()
    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    )
    out = connected_components(pairs, max_rounds=12).toPandas()
    assert set(out.cluster_id) == {0}
    # only the FINAL round's checkpoint (consumed by the returned frame)
    # may remain beyond the pre-call state
    assert n_persisted() <= before + 1, (before, n_persisted())


def test_decontaminate_flags_exact_ngram_overlap(spark):
    """A doc sharing one 8-gram with the benchmark is flagged with the
    right distinct-overlap count; clean docs are not; a short benchmark
    doc (< n words) contaminates only its exact short-shingle match."""
    from timezone_boundary_builder_spark.operators.dedup import decontaminate

    gram = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = spark.createDataFrame(
        [
            (1, f"intro words {gram} trailing words here"),  # shares the 8-gram
            (2, "completely different content with no overlap at all ok"),
            (3, "tiny doc"),  # exact match of the short benchmark doc
            (4, "tiny doc plus extra words making other eight grams only"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"{gram} and some benchmark tail"), (101, "tiny doc")],
        "bench_id long, text string",
    )
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(docs, bench, n=8, bench_text_col="text").collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)  # short-shingle exact match
    # doc 4 contains the words "tiny doc" but its 8-grams differ from the
    # benchmark's short shingle, so it is clean
    assert out[4] == (0, False)


def test_redact_pii_exact_output(spark):
    """Redaction replaces each PII kind with its placeholder, counts are
    taken sequentially on the progressively-redacted text, and non-PII
    text is untouched. An '@host' with a bare-IP domain is NOT an email
    (no alphabetic TLD) — the dotted quad inside it is still caught by
    the IP pass, so the address leaks no PII either way."""
    from timezone_boundary_builder_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob@site.org ip 192.168.0.1 tel +123456789 end"),
            (2, "user@10.0.0.5 hides a dotted quad in its domain"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert rows[1].text == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (rows[1].n_emails, rows[1].n_ips, rows[1].n_phones) == (1, 1, 1)
    assert rows[2].text == "user@<IP> hides a dotted quad in its domain"
    assert (rows[2].n_emails, rows[2].n_ips, rows[2].n_phones) == (0, 1, 0)
    assert rows[3].text == "nothing sensitive here"
    assert (rows[3].n_emails, rows[3].n_ips, rows[3].n_phones) == (0, 0, 0)


def test_mix_sources_rates_and_whitelist(spark):
    """rate 1.0 keeps every row of its source, unlisted sources are
    dropped (explicit mixture = whitelist), intermediate rates keep a
    deterministic subset that shrinks monotonically with the rate, and
    default_rate resurrects unlisted sources."""
    from pyspark.sql import functions as F

    from timezone_boundary_builder_spark.operators.sampling import mix_sources

    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, {"src0": 1.0, "src1": 0.5, "src2": 0.1}, seed=7)
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["src0"] == 100          # rate 1.0: everything
    assert "src3" not in by_src           # unlisted: dropped
    assert 20 < by_src["src1"] < 80       # ~50 of 100
    assert 0 < by_src["src2"] < by_src["src1"]  # lower rate -> fewer
    # determinism: the same call selects the same rows
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mix_sources(df, {"src0": 1.0, "src1": 0.5, "src2": 0.1}, seed=7).collect()
    )
    assert a == b
    # default_rate keeps unlisted sources at the fallback rate
    fallback = mix_sources(df, {"src0": 1.0}, seed=7, default_rate=1.0)
    assert fallback.count() == 400
