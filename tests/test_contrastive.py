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


class TestHardNegatives:
    @staticmethod
    def _vecs(spark):
        # 1-d-ish geometry in 4 dims: anchors near specific corpus
        # points so the "hardest" negatives are known by construction
        rows = []
        import math
        for i in range(20):
            ang = i * 0.3
            rows.append((i, [math.cos(ang), math.sin(ang), 0.0, 1.0]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_hardest_are_nearest_and_no_self(self, spark):
        from nifi_extracttext_processor_spark.operators.contrastive \
            import mine_hard_negatives
        vecs = self._vecs(spark)
        anchors = vecs.filter(F.col("vec_id") < 3)
        got = mine_hard_negatives(anchors, vecs, k=2).collect()
        by_anchor = {}
        for r in got:
            by_anchor.setdefault(r["anchor_id"], []).append(
                (r["rk"], r["negative_id"]))
            assert r["negative_id"] != r["anchor_id"]
        # angular neighbors i±1 are the most similar vectors
        assert {n for _, n in by_anchor[1]} == {0, 2}
        assert len(by_anchor) == 3

    def test_positives_excluded(self, spark):
        from nifi_extracttext_processor_spark.operators.contrastive \
            import mine_hard_negatives
        vecs = self._vecs(spark)
        anchors = vecs.filter(F.col("vec_id") < 3)
        pos = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
        got = {(r["anchor_id"], r["negative_id"]) for r in
               mine_hard_negatives(anchors, vecs, k=2,
                                   positives=pos).collect()}
        assert (1, 2) not in got
        assert (2, 1) not in got

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.contrastive \
            import mine_hard_negatives, mine_hard_negatives_sql
        vecs = self._vecs(spark)
        anchors = vecs.filter(F.col("vec_id") < 5)
        a = sorted(map(tuple, mine_hard_negatives(
            anchors, vecs, k=3).collect()))
        con = duckdb.connect()
        con.register("embeddings", vecs.toPandas())
        b = sorted(map(tuple, con.execute(mine_hard_negatives_sql(
            k=3, anchor_pred="vec_id < 5")).fetchall()))
        assert a == b

    def test_validates(self, spark):
        from nifi_extracttext_processor_spark.operators.contrastive \
            import mine_hard_negatives
        vecs = self._vecs(spark)
        with pytest.raises(ValueError):
            mine_hard_negatives(vecs, vecs, k=0)
        with pytest.raises(ValueError):
            mine_hard_negatives(vecs, vecs, k=1, overfetch=0)
