"""Entity resolution plan: known-cluster goldens (transitive match,
singletons, NULL/over-long key exclusion), canonical completeness
ordering, DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import Row

from nifi_extracttext_processor_spark.plans.entity_resolution import (
    resolve_entities,
    resolve_entities_sql,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # one 3-member cluster, chained: A~B (1), B~C (1), A~C (2)
        Row(doc_id=1, key="acme corp", city="nyc", phone=None),
        Row(doc_id=2, key="acme corp.", city="nyc", phone="555"),
        Row(doc_id=3, key="acme c0rp.", city=None, phone=None),
        # a 2-member cluster
        Row(doc_id=4, key="globex", city="la", phone=None),
        Row(doc_id=5, key="globeX", city=None, phone=None),
        # singleton (far from everything)
        Row(doc_id=6, key="initech systems intl", city="sf",
            phone="777"),
        # NULL key: unmatchable, surfaces as its own cluster
        Row(doc_id=7, key=None, city="sf", phone=None),
        # over-long key: same contract
        Row(doc_id=8, key="x" * 600, city=None, phone=None),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def resolved(frame):
    return resolve_entities(frame, "doc_id", "key", max_dist=2,
                            attr_cols=["city", "phone"]).cache()


class TestClusters:
    def test_membership(self, resolved):
        got = {r["doc_id"]: r["cluster_id"] for r in
               resolved.collect()}
        assert got[1] == got[2] == got[3] == 1   # transitive closure
        assert got[4] == got[5] == 4
        assert got[6] == 6 and got[7] == 7 and got[8] == 8

    def test_n_members_and_no_drops(self, resolved):
        rows = resolved.collect()
        assert len(rows) == 8                    # nothing dropped
        n = {r["doc_id"]: r["n_members"] for r in rows}
        assert n[1] == 3 and n[4] == 2 and n[7] == 1

    def test_canonical_by_completeness_then_id(self, resolved):
        canon = {r["cluster_id"]: r["doc_id"] for r in
                 resolved.collect() if r["is_canonical"]}
        # cluster 1: doc 2 has 2 non-null attrs (city+phone), wins
        assert canon[1] == 2
        # cluster 4: doc 4 (city) beats doc 5 (none)
        assert canon[4] == 4
        # one canonical per cluster
        assert sorted(canon) == [1, 4, 6, 7, 8]


class TestLink:
    @pytest.fixture(scope="class")
    def tables(self, spark):
        dirty = spark.createDataFrame(
            [Row(dirty_id=10, key="acme corp"),
             Row(dirty_id=11, key="globex inc"),
             Row(dirty_id=12, key="zzz unmatched zzz"),
             Row(dirty_id=13, key=None)])
        master = spark.createDataFrame(
            [Row(master_id=1, key="acme corp."),
             Row(master_id=2, key="acme core"),
             Row(master_id=3, key="globex inc")])
        return dirty, master

    def test_best_match_and_tiebreak(self, spark, tables):
        from nifi_extracttext_processor_spark.plans \
            .entity_resolution import link_entities
        dirty, master = tables
        got = {r["dirty_id"]: (r["master_id"], r["dist"],
                               r["n_candidates"]) for r in
               link_entities(dirty, master, max_dist=2).collect()}
        # 10: dist 1 to both master 1 and 2 -> min id wins, 2 cands
        assert got[10] == (1, 1, 2)
        assert got[11] == (3, 0, 1)      # exact match
        assert 12 not in got and 13 not in got

    def test_twin_parity(self, spark, tables):
        from nifi_extracttext_processor_spark.plans \
            .entity_resolution import link_entities, link_entities_sql
        dirty, master = tables
        con = duckdb.connect()
        con.register("dirty", dirty.toPandas())
        con.register("master", master.toPandas())
        a = sorted(map(tuple, link_entities(
            dirty, master, max_dist=2).collect()))
        b = sorted(map(tuple, con.execute(link_entities_sql(
            "dirty", "master", max_dist=2)).fetchall()))
        assert a == b


class TestTwin:
    def test_parity(self, spark, frame, resolved):
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        a = sorted(map(tuple, resolved.collect()))
        b = sorted(map(tuple, con.execute(resolve_entities_sql(
            "t", "doc_id", "key", max_dist=2,
            attr_cols=["city", "phone"])).fetchall()))
        assert a == b
