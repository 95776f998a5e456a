"""Round-7 optimization measurement harness (bench.py is FROZEN for the
driver, so per-query isolation work lives here — guide §1.4).

Usage:
  python bench_extra.py time  [sf_dir] [q1 q2 ...]   # per-query wall (2 passes,
                                                     # .count() like bench.py)
  python bench_extra.py noop  [sf_dir] [q1 q2 ...]   # noop-sink isolation
  python bench_extra.py plans [before|after] [q1 ..] # .explain(formatted) ->
                                                     # plans/r07/<q>_<tag>.txt

Prints one JSON line per mode; diagnostics to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "geo_pip_assign",
    "geo_knn_assign",
    "geo_zone_build",
    "geo_validate_overlaps",
    "geo_ocean_zones",
    "dedup_exact",
    "dedup_minhash",
    "dedup_lsh_pairs",
    "dedup_clusters",
    "pipeline_clean",
    "events_sessions",
    "text_quality",
    "text_langid",
    "text_repetition",
    "pipeline_gopher",
    "geo_tiles_skew",
    "multimodal_decode",
    "ann_recall",
    "decontaminate",
    "pii_redact",
    "mix_sources",
    "ann_cosine_topk",
    "rel_pricing_summary",
    "rel_top_customer_per_nation",
    "rel_customer_order_stats",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_spark():
    from bench import make_spark as bench_make_spark

    return bench_make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    tag = "before"
    if mode == "plans" and rest and rest[0] in ("before", "after"):
        tag = rest[0]
        rest = rest[1:]
    dirs = [a for a in rest if os.path.isdir(a)]
    if dirs:
        sf_dir = dirs[0]
    rest = [a for a in rest if not os.path.isdir(a)]
    names = rest or BENCH_QUERIES

    import __spark_entry__ as entry

    qs = entry.queries()
    spark = make_spark()
    out: dict[str, object] = {"mode": mode, "sf": sf_dir}
    try:
        if mode in ("time", "noop"):
            samples: dict[str, list[float]] = {n: [] for n in names}
            for pass_i in (1, 2):
                for name in names:
                    spark.sparkContext.setJobDescription(f"{name} (pass {pass_i})")
                    t0 = time.perf_counter()
                    df = qs[name](spark, sf_dir)
                    if mode == "noop":
                        df.write.format("noop").mode("overwrite").save()
                    else:
                        df.count()
                    dt = round(time.perf_counter() - t0, 3)
                    samples[name].append(dt)
                    log(f"  {name} (pass {pass_i}): {dt}s")
            out["queries"] = {n: min(s) for n, s in samples.items()}
            out["queries_samples"] = samples
            out["total_best"] = round(sum(min(s) for s in samples.values()), 3)
            out["total_pass1"] = round(sum(s[0] for s in samples.values()), 3)
        elif mode == "plans":
            os.makedirs("plans/r07", exist_ok=True)
            for name in names:
                df = qs[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = f"plans/r07/{name}_{tag}.txt"
                with open(path, "w") as f:
                    f.write(plan)
                log(f"  wrote {path} ({len(plan.splitlines())} lines)")
            out["written"] = names
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
