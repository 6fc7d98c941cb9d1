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


def _canon(v):
    # Collections first: pd.isna() on them returns an array, not a bool.
    if isinstance(v, (list, tuple)) or (hasattr(v, "__len__")
                                        and not isinstance(v, str)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    # Unify every scalar NULL spelling: Python None (Spark), pandas NaT
    # (NULL timestamp out of ddb .df()), and float nan (NULL double in a
    # typed pandas column). Spark also hands NULL doubles back as None,
    # so both sides land on the same token.
    if v is None or pd.isna(v):
        return "∅"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _rowset(rows, cols):
    return sorted(",".join(_canon(r[c]) for c in cols) for r in rows)


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
    s, o = _rowset(spark_rows, cols), _rowset(oracle_rows, cols)
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
