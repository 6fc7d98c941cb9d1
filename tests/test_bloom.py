"""Bloom-filter join pruning (operators/bloom.py): bitset golden vs
an independent Python Bloom, the no-false-negative join-equality
property, false-positive rate bound, DuckDB position parity, and
the filter-before-Exchange plan shape."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_positions_sql,
    bloom_prune_join,
)


def _dim(spark, n=200):
    return spark.range(0, n * 10, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dval"))


def _fact(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("fval"))


class TestBitset:
    def test_matches_independent_python(self, spark):
        import hashlib
        dim = _dim(spark, 50)
        words, m, k, _ = bloom_build(dim, "k", m_bits=1 << 10,
                                     k_hashes=3, md5=True)
        ref = [0] * (m // 64)
        for r in dim.collect():
            for j in range(k):
                h = int(hashlib.md5(
                    f"{r['k']}#b{j}".encode()).hexdigest()[:8], 16)
                p = h % m
                ref[p >> 6] |= 1 << (p & 63)
        assert words == ref

    def test_membership_no_false_negatives(self, spark):
        dim = _dim(spark, 100)
        bloom = bloom_build(dim, "k", m_bits=1 << 12, k_hashes=5)
        probed = dim.select(
            "k", bloom_might_contain(F.col("k"), bloom).alias("hit"))
        assert all(r["hit"] for r in probed.collect())

    def test_false_positive_rate_bounded(self, spark):
        dim = _dim(spark, 100)                      # keys 0,10,...
        bloom = bloom_build(dim, "k", m_bits=1 << 14, k_hashes=7)
        miss = spark.range(1, 2000, 2).select(
            F.col("id").alias("k"))                  # odd: never in dim
        hits = miss.filter(
            bloom_might_contain(F.col("k"), bloom)).count()
        # theoretical fp ~ (1-e^(-700/16384))^7 ~ 1e-10; allow slack
        assert hits <= 2

    def test_null_probes_false(self, spark):
        dim = _dim(spark, 10)
        bloom = bloom_build(dim, "k", m_bits=1 << 8, k_hashes=2)
        df = spark.createDataFrame([(None,), (0,)], "k long")
        got = {r["k"]: r["hit"] for r in df.select(
            "k", bloom_might_contain(F.col("k"), bloom).alias("hit"))
            .collect()}
        assert got[None] is False and got[0] is True

    def test_validation(self, spark):
        dim = _dim(spark, 5)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(dim, "k", m_bits=100)
        with pytest.raises(ValueError, match="ceiling"):
            bloom_build(dim, "k", m_bits=1 << 24)
        with pytest.raises(ValueError, match="k_hashes"):
            bloom_build(dim, "k", k_hashes=0)


class TestPrunedJoin:
    def test_equals_plain_join(self, spark):
        fact, dim = _fact(spark), _dim(spark)
        got = sorted(tuple(r) for r in bloom_prune_join(
            fact, dim, "k").collect())
        want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
        assert got == want

    def test_semi_join_and_bad_how(self, spark):
        fact, dim = _fact(spark), _dim(spark)
        got = sorted(r["k"] for r in bloom_prune_join(
            fact, dim, "k", how="left_semi").select("k").collect())
        want = sorted(r["k"] for r in fact.join(
            dim, "k", "left_semi").select("k").collect())
        assert got == want
        with pytest.raises(ValueError, match="inner/left_semi"):
            bloom_prune_join(fact, dim, "k", how="left")

    def test_filter_sits_below_the_exchange(self, spark):
        fact, dim = _fact(spark), _dim(spark)
        # force a shuffle join so there IS an Exchange to sit below
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = bloom_prune_join(fact, dim, "k")._jdf \
                .queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # the bloom probe (bit_get over the literal word array) must
        # sit BELOW the shuffle — in the printed tree, below = the
        # Filter appears after its parent Exchange, i.e. the fact
        # rows are probed before they enter the Exchange
        low = plan.lower()
        first_exchange = low.index("exchange")
        assert "bit_get" in low
        assert low.index("bit_get") > first_exchange

    def test_duckdb_position_parity(self, spark):
        dim = _dim(spark, 30)
        m, k = 1 << 10, 3
        got = sorted(tuple(sorted(
            int(r[f"p{j}"]) for j in range(k)))
            for r in dim.select(
                *[p.alias(f"p{j}") for j, p in enumerate(
                    __import__(
                        "nifi_extracttext_processor_spark.operators."
                        "bloom", fromlist=["_positions"]
                    )._positions(F.col("k"), m, k, md5=True))])
            .collect())
        con = duckdb.connect()
        con.register("dim", dim.toPandas())
        exprs = bloom_positions_sql("k", m, k)
        want = sorted(tuple(sorted(int(x) for x in r))
                      for r in con.execute(
                          f"SELECT {exprs} FROM dim").fetchall())
        assert got == want
