"""Negative-pair sampling (operators/contrastive.py): no self-pairs,
uniformity, determinism, positive exclusion, DuckDB parity."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.contrastive import (
    sample_negative_pairs,
    sample_negative_pairs_sql,
)


def _docs(spark, n=50):
    return spark.range(n).select(F.col("id").alias("doc_id"))


class TestNegatives:
    def test_counts_and_no_self(self, spark):
        df = _docs(spark)
        out = sample_negative_pairs(df, k=3).collect()
        assert len(out) == 150
        per = {}
        for r in out:
            assert r["anchor_id"] != r["negative_id"]
            per[r["anchor_id"]] = per.get(r["anchor_id"], 0) + 1
        assert set(per.values()) == {3}

    def test_deterministic_and_seed_sensitive(self, spark):
        df = _docs(spark)
        a = sorted(tuple(r) for r in
                   sample_negative_pairs(df, k=2, seed=1).collect())
        b = sorted(tuple(r) for r in
                   sample_negative_pairs(df, k=2, seed=1).collect())
        c = sorted(tuple(r) for r in
                   sample_negative_pairs(df, k=2, seed=2).collect())
        assert a == b
        assert a != c

    def test_roughly_uniform(self, spark):
        # each doc should be drawn as a negative ~k times on average
        df = _docs(spark, 40)
        out = sample_negative_pairs(df, k=10).collect()
        hits = {}
        for r in out:
            hits[r["negative_id"]] = hits.get(r["negative_id"], 0) + 1
        assert len(hits) == 40              # everyone gets drawn
        assert max(hits.values()) < 10 * 4  # no pathological hot doc

    def test_positive_exclusion(self, spark):
        df = _docs(spark, 20)
        full = sample_negative_pairs(df, k=5, seed=3).collect()
        pos_pairs = {(r["anchor_id"], r["negative_id"])
                     for r in full[:10]}
        pos = spark.createDataFrame(
            [(a, b) for a, b in pos_pairs], "id1 long, id2 long")
        out = sample_negative_pairs(df, k=5, seed=3, positives=pos)
        got = {(r["anchor_id"], r["negative_id"])
               for r in out.collect()}
        assert not (got & pos_pairs)
        # and the reversed orientation is excluded too
        rev = {(b, a) for a, b in pos_pairs}
        assert not (got & rev)

    def test_duckdb_parity(self, spark):
        df = _docs(spark, 30)
        got = sorted(tuple(r) for r in
                     sample_negative_pairs(df, k=4, seed=7,
                                           md5=True).collect())
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = sorted(tuple(int(x) for x in r) for r in con.execute(
            sample_negative_pairs_sql("t", k=4, seed=7)).fetchall())
        assert got == want

    def test_validation(self, spark):
        df = _docs(spark, 1)
        with pytest.raises(ValueError, match="at least 2"):
            sample_negative_pairs(df, k=1)
        with pytest.raises(ValueError, match="k must"):
            sample_negative_pairs(_docs(spark), k=0)
