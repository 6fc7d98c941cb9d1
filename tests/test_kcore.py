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
