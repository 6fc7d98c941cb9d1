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


class TestIncremental:
    @staticmethod
    def _resolve_full(spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, key string")
        from nifi_extracttext_processor_spark.plans \
            .entity_resolution import resolve_entities
        return {(r["doc_id"], r["cluster_id"]) for r in
                resolve_entities(df, "doc_id", "key",
                                 max_dist=2).collect()}

    def _apply_increment(self, spark, catalog_rows, batch_rows):
        from nifi_extracttext_processor_spark.plans \
            .entity_resolution import resolve_entities_incremental
        cat = spark.createDataFrame(
            catalog_rows, "doc_id long, key string, cluster_id long")
        batch = spark.createDataFrame(batch_rows,
                                      "doc_id long, key string")
        updated = {r["doc_id"]: (r["key"], r["cluster_id"]) for r in
                   resolve_entities_incremental(
                       batch, cat, "doc_id", "key",
                       max_dist=2).collect()}
        out = {i: (k, c) for i, k, c in catalog_rows}
        out.update(updated)
        return out

    def test_increment_equals_full_resolve(self, spark):
        day1 = [(1, "acme corp"), (2, "acme corp."), (4, "globex"),
                (6, "initech systems intl")]
        cat = [(i, k, c) for (i, k), c in
               zip(day1, [1, 1, 4, 6])]       # day-1 resolution
        day2 = [(3, "acme c0rp."),            # joins cluster 1
                (5, "globeX"),                # joins cluster 4
                (7, "wayne enterprises")]     # new singleton
        state = self._apply_increment(spark, cat, day2)
        full = self._resolve_full(spark, day1 + day2)
        assert {(i, c) for i, (_, c) in state.items()} == full

    def test_bridge_record_merges_clusters(self, spark):
        # a NEW record bridging two previously-separate clusters must
        # merge them (the invariant the full-resolve comparison pins)
        day1 = [(10, "alpha one"), (20, "alpha four")]
        # dist("alpha one", "alpha four") > 2: two singletons on day 1
        cat = [(10, "alpha one", 10), (20, "alpha four", 20)]
        day2 = [(15, "alpha oue")]  # near BOTH day-1 keys
        state = self._apply_increment(spark, cat, day2)
        full = self._resolve_full(
            spark, [(10, "alpha one"), (20, "alpha four"),
                    (15, "alpha oue")])
        assert {(i, c) for i, (_, c) in state.items()} == full

    def test_untouched_clusters_not_in_output(self, spark):
        from nifi_extracttext_processor_spark.plans \
            .entity_resolution import resolve_entities_incremental
        cat = spark.createDataFrame(
            [(1, "acme corp", 1), (6, "zzz far away zzz", 6)],
            "doc_id long, key string, cluster_id long")
        batch = spark.createDataFrame([(2, "acme corp.")],
                                      "doc_id long, key string")
        got = {r["doc_id"] for r in resolve_entities_incremental(
            batch, cat).collect()}
        assert 2 in got and 1 in got     # touched cluster rewritten
        assert 6 not in got              # untouched cluster untouched
