"""Cross-engine double-rounding semantics (r16).

Pins the `dround` contract: Spark `F.round(x * 10^dp) / 10^dp`
must equal DuckDB `round(x, dp)` EXACTLY — including shortest-repr
boundary cases (0.9452499999999999 -> 0.9453, the sf1-caught
training_data_prep divergence), exact .5 ties, and negative ties —
where plain `F.round(x, dp)` (BigDecimal over the shortest decimal
repr, HALF_UP) disagrees on ~0.2% of boundary-dense values.
"""

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.rounding import dround


def _vals():
    rng = random.Random(7)
    vals = [rng.uniform(-1e6, 1e6) * 10 ** rng.randint(-8, 2)
            for _ in range(4000)]
    # decimal half-boundaries: k/2e4 has a 4th-decimal .5 tail
    for k in range(-150, 150):
        vals.append(k / 2e4)
        vals.append(k / 2e4 + rng.randint(0, 100))
    vals += [0.9452499999999999, -0.9452499999999999,
             2.5, -2.5, 0.5, -0.5,
             0.49999999999999994, -0.49999999999999994]
    return vals


@pytest.mark.parametrize("dp", [0, 1, 2, 4, 6])
def test_dround_matches_duckdb_exactly(spark, dp):
    vals = _vals()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in
           df.select(dround(F.col("x"), dp).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [r[0] for r in
            con.execute(f"SELECT round(x, {dp}) FROM t").fetchall()]
    bad = [(v, a, b) for v, a, b in zip(vals, got, want)
           if a != b and not (math.isnan(a) and math.isnan(b))]
    assert not bad, bad[:5]


def test_plain_round_disagrees_on_the_boundary_case(spark):
    """Documents WHY dround exists: the flagship divergence value.
    If a Spark upgrade ever makes plain F.round match, this canary
    flags that dround could be retired."""
    x = 0.9452499999999999
    df = spark.createDataFrame([(x,)], "x double")
    [r] = df.select(F.round("x", 4).alias("plain"),
                    dround(F.col("x"), 4).alias("d")).collect()
    con = duckdb.connect()
    [(dk,)] = con.execute(
        "SELECT round(0.9452499999999999::DOUBLE, 4)").fetchall()
    assert dk == 0.9453
    assert r["d"] == 0.9453
    assert r["plain"] == 0.9452  # the divergence dround closes


def test_dround_accepts_column_name_and_nulls(spark):
    df = spark.createDataFrame([(1.23456,), (None,)], "x double")
    rows = df.select(dround("x", 2).alias("r")).collect()
    assert rows[0]["r"] == 1.23 and rows[1]["r"] is None
