"""Text-analysis operators for the training-data pipeline (driver spec:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is built from JVM-side pyspark.sql.functions only — these run
inside whole-stage codegen, no Python in the hot path, so they scale to
the 10^12-row pages table the same way any projection does. Each has an
exact ANSI-SQL twin (see __spark_entry__.oracle_sql) so the DuckDB oracle
can verify values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic marker-word language heuristic (n-gram-lite): the word set
# per language is fixed so Spark and the SQL oracle agree exactly
LANG_MARKERS = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "nicht"]),
    ("fr", ["le", "et", "les"]),
    ("es", ["el", "y", "los"]),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def n_words(text: Column) -> Column:
    """Whitespace token count via pure string arithmetic (identical
    semantics in any SQL engine): #spaces + 1 on the trimmed text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.regexp_replace(t, r"\s+", "")) + 1
        - (F.length(t) - F.length(F.regexp_replace(t, r"\s+", " ")))
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (len/4 heuristic +
    punctuation splits), all codegen'd."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    bpe_est = (F.length(t) / F.lit(4.0) + punct).cast("double")
    return df.withColumn("ws_tokens", ws_tokens).withColumn("bpe_tokens_est", bpe_est)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features: char length, word count, mean word length,
    stopword ratio, punctuation ratio — the standard webtext filters."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    wc = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return (
        df.withColumn("n_chars_q", F.length(t))
        .withColumn("n_words_q", wc)
        .withColumn(
            "mean_word_len",
            F.round((F.length(F.regexp_replace(t, r"\s+", "")) / wc).cast("double"), 6),
        )
        .withColumn("stopword_ratio", F.round((stop_hits / wc).cast("double"), 6))
        .withColumn(
            "punct_ratio", F.round((punct / F.greatest(F.length(t), F.lit(1))).cast("double"), 6)
        )
    )


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits with a
    fixed priority order on ties; 'und' when nothing matches."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    hit_cols = []
    for lang, markers in LANG_MARKERS:
        hits = F.size(F.filter(words, lambda w: w.isin(markers)))
        hit_cols.append((lang, hits))
    # argmax with first-listed language winning ties (priority order)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, hits in reversed(hit_cols):
        cond = hits >= F.greatest(best_n, F.lit(1))
        # reversed iteration + >= makes the FIRST list entry win ties
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits).otherwise(best_n)
    return df.withColumn("lang_pred", best)


def norm_text_col(text_col: str = "text") -> Column:
    """Canonical dedup normalization (lowercase, whitespace-collapse) —
    the ONE definition shared by with_fingerprint, exact_dedup, and the
    clean_corpus job, so their keys can never silently drift apart."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace-collapsed) — the exact-dedup key; plus a 16-hex-char
    rolling prefix fingerprint for locality."""
    norm = norm_text_col(text_col)
    return df.withColumn("fingerprint", F.md5(norm)).withColumn(
        "fp_prefix", F.substring(F.md5(norm), 1, 8)
    )


def repetition_gate(
    df: DataFrame,
    max_top_word_frac: float = 0.2,
    max_dup_word_frac: float = 0.65,
    max_top_bigram_frac: float = 0.08,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition FILTER: keep only documents whose
    repetition signals (repetition_signals below) sit under all three
    thresholds. The gate is an inner join on the id — the signals
    relation is doc-keyed (one row per doc, three doubles), so both
    sides hash-partition on the id and the join carries no corpus text;
    at 10^12 rows this is the standard signal-table semi-join shape a
    staged pipeline would materialize between stages (clean_corpus does
    exactly that via its stage manifests)."""
    sig = repetition_signals(df.select(id_col, text_col), text_col, id_col)
    ok = sig.where(
        (F.col("top_word_frac") <= max_top_word_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    return df.join(ok, id_col)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (the filters
    large-scale training-data pipelines apply on top of basic quality
    scores): top_word_frac (most frequent word's share of all word
    occurrences), dup_word_frac (share of occurrences beyond each word's
    first), and top_bigram_frac (most frequent word-2-gram's share of
    all 2-grams; single-word docs contribute the word itself, the same
    clamp the MinHash shingler uses).

    Scale shape mirrors minhash_signatures, tightened to ONE shuffle and
    NO join: words and 2-grams are tagged and exploded in a single pass,
    and because hash-partitioning by id satisfies the clustered
    distribution of the downstream groupBy(id, kind, token) / groupBy(id)
    chain, the exploded relation never crosses the wire — the only
    exchange is the doc-sized pre-explode repartition. All JVM-side,
    codegen'd."""
    spark_parallelism = df.sparkSession.sparkContext.defaultParallelism
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.repartition(spark_parallelism, id_col).select(
        F.col(id_col), words.alias("__w")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("__w") - 2, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__w", i + 1, 2)))
    tagged = F.concat(
        F.transform(
            F.col("__w"),
            lambda x: F.struct(F.lit("w").alias("kind"), x.alias("tok")),
        ),
        F.transform(
            grams, lambda x: F.struct(F.lit("g").alias("kind"), x.alias("tok"))
        ),
    )
    t = base.select(F.col(id_col), F.explode(tagged).alias("t")).select(
        F.col(id_col), F.col("t.kind").alias("kind"), F.col("t.tok").alias("tok")
    )
    tc = t.groupBy(id_col, "kind", "tok").agg(F.count(F.lit(1)).alias("c"))
    is_w = F.col("kind") == "w"
    is_g = F.col("kind") == "g"
    per = tc.groupBy(id_col).agg(
        F.sum(F.when(is_w, F.col("c"))).alias("n_words"),
        F.count(F.when(is_w, 1)).alias("n_distinct"),
        F.max(F.when(is_w, F.col("c"))).alias("top_word"),
        F.sum(F.when(is_g, F.col("c"))).alias("n_grams"),
        F.max(F.when(is_g, F.col("c"))).alias("top_gram"),
    )
    return per.select(
        F.col(id_col),
        F.round(F.col("top_word") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(
            (F.col("n_words") - F.col("n_distinct")) / F.col("n_words"), 6
        ).alias("dup_word_frac"),
        F.round(F.col("top_gram") / F.col("n_grams"), 6).alias("top_bigram_frac"),
    )


# PII redaction patterns, applied IN ORDER on the progressively-redacted
# text (emails first so an IP-like dotted host inside an email domain is
# counted once, as part of the email). Patterns are restricted to syntax
# with identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookaround, no backrefs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{9,15}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: emails, IPv4 addresses, and
    international phone numbers are replaced by typed placeholder tokens,
    with a per-doc count of each kind. Pure chained regexp_replace /
    regexp_count — JVM-side, whole-stage codegen, no shuffle: scales as a
    projection. Counts are taken on the text as it stands BEFORE that
    pattern's replacement (sequential semantics, mirrored by the oracle).

    Adds columns: n_emails, n_ips, n_phones (long) and replaces text_col
    with the redacted text.
    """
    out = df
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}s"))
        cur = F.regexp_replace(cur, pat, rep)
    keep = [c for c in df.columns if c != text_col]
    return out.select(*keep, cur.alias(text_col), *counts)
