"""Mirror of the driver's t2 gate: run every __spark_entry__ query AND
its DuckDB oracle at sf0.001, compare row-count + column names +
order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v, bridge):
    # Collections first: pd.isna() on them returns an array, not a bool.
    if isinstance(v, (list, tuple)) or (hasattr(v, "__len__")
                                        and not isinstance(v, str)):
        return "[" + ",".join(_canon(x, bridge) for x in v) + "]"
    # NULL-spelling rules are SIDE-AWARE (ADVICE r10): on the DuckDB
    # pandas bridge a NULL double/timestamp surfaces as NaN/NaT, so
    # there NaN must collapse to the NULL token. Spark hands NULLs back
    # as Python None, so a float NaN on the Spark side is a GENUINE
    # computed NaN and keeps its own token — collapsing it too (the r10
    # fix's overreach) would mask a Spark-NaN-vs-oracle-NULL divergence.
    if v is None:
        return "∅"
    if isinstance(v, float) and v != v:
        return "∅" if bridge else "nan"
    if pd.isna(v):  # pandas NaT / pd.NA (bridge-only spellings)
        return "∅"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _rowset(rows, cols, bridge=False):
    return sorted(",".join(_canon(r[c], bridge) for c in cols)
                  for r in rows)


ALL = sorted(entrymod.queries())
WITH_ORACLE = [n for n in ALL if n in entrymod.oracle_sql()]
ROWS_ONLY = [n for n in ALL if n not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sdf.columns

    odf = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(cols) == sorted(odf.columns), (
        f"{name}: column mismatch {cols} vs {list(odf.columns)}")
    oracle_rows = odf.to_dict("records")
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(oracle_rows)}")
    s = _rowset(spark_rows, cols, bridge=False)
    o = _rowset(oracle_rows, cols, bridge=True)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b][:5]
    assert s == o, f"{name}: first diffs {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {r["route"] for r in rows} <= {"bad", "good", "neutral"}
