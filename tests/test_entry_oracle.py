"""Mirror of the driver's correctness gate: run every __spark_entry__
query at sf0.01 and compare to its DuckDB oracle — row count, column
names, and order-insensitive values.

Set ENTRY_ORACLE_SF_DIR to run the same gate at another scale factor
(e.g. /root/testdata/sf0.1 — a 10x parity soak; slower, so not the
default CI path)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("ENTRY_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        # ints may come back as different widths; normalize
        elif "int" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    exp = _canon(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows: {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6, rtol=0)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES.keys()) - set(ORACLES.keys()))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0


def test_trailing_queries_are_multi_green_in_prior_rounds():
    """Mechanized driver-sampling invariant (adopted round 4): the
    correctness driver checks only the FIRST 50 entries of queries(), so
    any key beyond position 50 must already hold green rows in at least
    TWO prior driver CORRECTNESS files — a new or recently-changed query
    parked in the tail would silently never be driver-verified."""
    import glob
    import json

    keys = list(QUERIES)
    trailing = keys[50:]
    if not trailing:
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green_counts = {k: 0 for k in trailing}
    rounds = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert rounds, "driver correctness files missing — cannot prove the tail"
    for path in rounds:
        with open(path) as f:
            data = json.load(f)
        for k in trailing:
            e = data.get(k)
            if e and e.get("rows_match") and e.get("schema_match") and (
                e.get("hash_match") in (True, None)
            ) and not e.get("err"):
                green_counts[k] += 1
    weak = [k for k, n in green_counts.items() if n < 2]
    assert not weak, (
        f"trailing queries lack two prior green driver rows: {weak} — "
        "move them into the first 50 of __spark_entry__.queries()"
    )
