"""k-core decomposition: h-index propagation fixpoint vs the exact
sequential Matula-Beck peel, structured goldens (clique + pendant),
uniqueness/determinism, and k_core filtering."""

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.graph import (
    core_numbers,
    core_reference,
    k_core,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestGoldens:
    def test_clique_plus_pendant(self, spark):
        # K4 on 1-4 (coreness 3 each) + pendant 5-1 (coreness 1)
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (5, 1)]
        got = {r["node"]: r["coreness"] for r in
               core_numbers(_edges(spark, pairs)).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1}

    def test_path_graph_all_one(self, spark):
        pairs = [(i, i + 1) for i in range(1, 6)]
        got = {r["node"]: r["coreness"] for r in
               core_numbers(_edges(spark, pairs)).collect()}
        assert set(got.values()) == {1}

    def test_k_core_filter(self, spark):
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (5, 1), (5, 6)]
        nodes = {r["node"] for r in
                 k_core(_edges(spark, pairs), 3).collect()}
        assert nodes == {1, 2, 3, 4}
        with pytest.raises(ValueError):
            k_core(_edges(spark, pairs), 0)

    def test_self_loops_and_duplicates_ignored(self, spark):
        pairs = [(1, 1), (1, 2), (2, 1), (1, 2)]
        got = {r["node"]: r["coreness"] for r in
               core_numbers(_edges(spark, pairs)).collect()}
        assert got == {1: 1, 2: 1}


class TestReferenceParity:
    def test_random_graph_matches_peel(self, spark):
        # deterministic pseudo-random graph, 40 nodes / 120 edges
        pairs = []
        x = 7
        for _ in range(120):
            x = (x * 1103515245 + 12345) % (1 << 31)
            a = x % 40
            x = (x * 1103515245 + 12345) % (1 << 31)
            b = x % 40
            if a != b:
                pairs.append((a, b))
        got = {r["node"]: r["coreness"] for r in
               core_numbers(_edges(spark, pairs)).collect()}
        want = core_reference(pairs)
        assert got == want

    def test_deterministic_across_partitionings(self, spark):
        pairs = [(i, (i * 3) % 17) for i in range(17) if i != (i * 3) % 17]
        e = _edges(spark, pairs)
        a = sorted(map(tuple, core_numbers(e).collect()))
        b = sorted(map(tuple,
                       core_numbers(e.repartition(13)).collect()))
        assert a == b


class TestUnrolledTwin:
    def test_seed_graph_converges_within_half_the_unroll(self):
        """The driver row's oracle unrolls 8 h-index sweeps; the SF-
        invariant seed graph (37 residue nodes mod 37) must reach its
        fixpoint in <= 4 so the margin is real. Pure-python peel —
        no engine in the loop."""
        edges = set()
        for doc_id in range(37):  # residues cover the full node set
            a, b = doc_id % 37, (doc_id * 7 + 3) % 37
            c, d = doc_id % 37, (doc_id * 3 + 11) % 37
            for s, t in ((a, b), (c, d)):
                if s != t:
                    edges.add((min(s, t), max(s, t)))
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        c = {v: len(ns) for v, ns in adj.items()}
        rounds = 0
        while True:
            nxt = {}
            for v, ns in adj.items():
                vals = sorted((c[u] for u in ns), reverse=True)
                h = max((min(i + 1, x) for i, x in enumerate(vals)),
                        default=0)
                nxt[v] = min(c[v], h)
            rounds += 1
            if nxt == c:
                break
            c = nxt
        assert rounds <= 4

    def test_unrolled_sql_matches_spark_fixpoint(self, spark):
        """core_numbers_unrolled_sql == core_numbers on a graph that
        converges within the unroll; raises on rounds < 1."""
        import duckdb
        import pytest as _pt

        from nifi_extracttext_processor_spark.operators.graph import (
            core_numbers,
            core_numbers_unrolled_sql,
        )
        import random
        rng = random.Random(3)
        rows = [(str(rng.randrange(25)), str(rng.randrange(25)))
                for _ in range(80)]
        df = spark.createDataFrame(rows, "src string, dst string")
        got = sorted(map(tuple, core_numbers(df).collect()))
        con = duckdb.connect()
        con.register("e", df.toPandas())
        want = sorted(con.execute(core_numbers_unrolled_sql(
            "SELECT src, dst FROM e", rounds=25)).fetchall())
        assert got == want
        with _pt.raises(ValueError):
            core_numbers_unrolled_sql("SELECT 1", rounds=0)
