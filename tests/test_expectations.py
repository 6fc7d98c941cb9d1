"""Declarative data-quality expectations (operators/expectations.py):
per-rule violation counting with seeded dirty data, NULL semantics,
one-scan plan shape, referential integrity, and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.expectations import (
    check_expectations,
    check_expectations_sql,
    check_referential,
    check_referential_sql,
    expect_between,
    expect_in_set,
    expect_not_null,
    expect_regex,
    expect_unique,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a@x.com", 10.0, "OK"),
        (2, None, 20.0, "OK"),          # null email
        (3, "bad-email", 150.0, "OK"),  # regex fail + range fail
        (3, "c@x.com", -5.0, "BAD"),    # dup id + range fail + set fail
        (4, "d@x.com", None, "OK"),     # null amount: NOT a range fail
    ]
    return spark.createDataFrame(
        rows, "id long, email string, amount double, status string")


RULES = [
    expect_not_null("email"),
    expect_unique("id"),
    expect_between("amount", 0.0, 100.0),
    expect_in_set("status", ["OK", "WARN"]),
    expect_regex("email", r"[a-z]+@[a-z]+\.[a-z]+"),
]


def test_violation_counts_seeded(spark, dirty):
    out = {r["rule"]: r for r in
           check_expectations(dirty, RULES).collect()}
    assert out["not_null(email)"]["n_violations"] == 1
    assert out["unique(id)"]["n_violations"] == 1
    # amount: 150 and -5 out of range; NULL amount is NOT counted
    assert out["between(amount, 0, 100)"]["n_violations"] == 2
    assert out["in_set(status, 2 values)"]["n_violations"] == 1
    # regex: 'bad-email' fails; NULL email not counted here
    assert out["regex(email)"]["n_violations"] == 1
    assert all(r["n_rows"] == 5 for r in out.values())
    assert not any(r["passed"] for r in out.values())


def test_clean_table_passes_and_order_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com", 10.0, "OK"), (2, "b@x.com", 20.0, "WARN")],
        "id long, email string, amount double, status string")
    rows = check_expectations(df, RULES).collect()
    assert [r["rule"] for r in rows] == [
        "not_null(email)", "unique(id)", "between(amount, 0, 100)",
        "in_set(status, 2 values)", "regex(email)"]
    assert all(r["passed"] for r in rows)


def test_twin_parity(spark, dirty):
    got = check_expectations(dirty, RULES)
    con = duckdb.connect()
    con.register("t", dirty.toPandas())
    odf = con.execute(check_expectations_sql("t", RULES)).df()
    assert [tuple(r) for r in got.collect()] \
        == [tuple(r) for r in odf.itertuples(index=False)]


def test_one_scan_plan(spark, dirty):
    """50 rules must still be ONE aggregate over one scan — no
    per-rule jobs, no Python."""
    many = RULES * 10
    out = check_expectations(dirty, many)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Python" not in plan
    assert out.count() == 50


def test_referential(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    [r] = check_referential(fact, "fk", dim, "pk").collect()
    assert (r["n_rows"], r["n_violations"], r["passed"]) == (4, 1, False)
    con = duckdb.connect()
    con.register("fact", fact.toPandas())
    con.register("dim", dim.toPandas())
    [t] = con.execute(check_referential_sql(
        "fact", "fk", "dim", "pk")).fetchall()
    assert tuple(r) == tuple(t)


def test_referential_broadcasts_dimension(spark):
    fact = spark.range(1000).withColumnRenamed("id", "fk")
    dim = spark.range(10).withColumnRenamed("id", "pk")
    out = check_referential(fact, "fk", dim, "pk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark, dirty):
    with pytest.raises(ValueError, match="non-empty"):
        check_expectations(dirty, [])
    with pytest.raises(ValueError, match="non-empty"):
        expect_in_set("x", [])
    with pytest.raises(ValueError, match="unknown rule"):
        check_expectations(dirty, [("bogus", "id")])
    with pytest.raises(ValueError, match="unknown rule"):
        check_expectations_sql("t", [("bogus", "id")])


def test_stream_quality_monitor(spark, tmp_path):
    """Per-micro-batch expectation reports land as an audit log with
    batch ids; counts reconcile with the batch operator over the
    same data."""
    from pyspark.sql import functions as F

    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_quality_monitor,
    )
    src = str(tmp_path / "in")
    out = str(tmp_path / "report")
    df = spark.createDataFrame(
        [(1, "a@x.com", 10.0), (2, None, 150.0), (3, "b@x.com", None)],
        "id long, email string, amount double")
    df.write.mode("overwrite").parquet(src)
    rules = [expect_not_null("email"),
             expect_between("amount", 0.0, 100.0)]
    stream = (spark.readStream
              .schema("id long, email string, amount double")
              .parquet(src))
    q = stream_quality_monitor(
        stream, rules, out,
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rep = spark.read.parquet(out)
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in rep.collect()}
    assert got["not_null(email)"] == (1, False)
    assert got["between(amount, 0, 100)"] == (1, False)
    assert {r["batch_id"] for r in rep.collect()} == {0}
    # reconciles with the batch operator on the same data
    batch = {r["rule"]: (r["n_violations"], r["passed"])
             for r in check_expectations(df, rules).collect()}
    assert got == batch
