"""Market-basket mining (operators/basket.py): brute-force oracle
parity for pairs/rules/triples, hand-computed lift golden, Apriori
pruning semantics (an infrequent item never reaches a pair), DuckDB
twin parity at sf0.001, plan shape (row-local pair generation — no
self-join, no UDF, TakeOrdered cut).
"""
from __future__ import annotations

import itertools
import re
from collections import Counter

import pytest

from nifi_extracttext_processor_spark.operators.basket import (
    association_rules,
    association_rules_sql,
    frequent_pairs,
    frequent_triples,
    reference_rules,
)

DOCS = [
    "bread milk butter",
    "bread milk",
    "bread butter jam",
    "milk butter",
    "bread milk butter jam",
    "tea bread milk",
    "tea scone",
    "bread bread milk milk",      # duplicates collapse: one basket
    "jam tea bread",
    "milk tea butter bread",
]


@pytest.fixture(scope="module")
def baskets(spark):
    return spark.createDataFrame([(d,) for d in DOCS], "text string")


def _brute(min_support):
    b = [sorted(set(re.split(r"\s+", d))) for d in DOCS]
    n1, npair, ntri = Counter(), Counter(), Counter()
    for s in b:
        n1.update(s)
        npair.update(itertools.combinations(s, 2))
        ntri.update(itertools.combinations(s, 3))
    return b, n1, npair, ntri


class TestPairs:
    def test_counts_match_bruteforce(self, baskets):
        _, n1, npair, _ = _brute(2)
        got = {(r["a"], r["b"]): r["n_pair"] for r in
               frequent_pairs(baskets, min_support=2).collect()}
        want = {p: n for p, n in npair.items()
                if n >= 2 and n1[p[0]] >= 2 and n1[p[1]] >= 2}
        assert got == want

    def test_duplicate_tokens_one_basket(self, baskets):
        # doc "bread bread milk milk" contributes exactly ONE
        # (bread, milk) event
        got = {(r["a"], r["b"]): r["n_pair"] for r in
               frequent_pairs(baskets, min_support=1).collect()}
        _, _, npair, _ = _brute(1)
        assert got[("bread", "milk")] == npair[("bread", "milk")]

    def test_infrequent_item_pruned(self, baskets):
        # "scone" appears once; with min_support=2 no pair may
        # contain it even at pair-count>=min... (it can't, but the
        # Apriori narrowing also keeps it out of generation)
        got = frequent_pairs(baskets, min_support=2).collect()
        assert all("scone" not in (r["a"], r["b"]) for r in got)


class TestRules:
    def test_matches_reference_oracle(self, baskets):
        got = sorted(
            tuple(r) for r in
            association_rules(baskets, min_support=2,
                              top_k=1000).collect())
        want = sorted(reference_rules(DOCS, 2))
        assert got == want

    def test_hand_computed_lift(self, baskets):
        # n(bread)=8, n(jam)=3, n(bread,jam)=3, N=10
        # support=.3 conf(jam->bread)=1.0 lift=3*10/(8*3)=1.25
        rules = {(r["antecedent"], r["consequent"]): r for r in
                 association_rules(baskets, min_support=2,
                                   top_k=1000).collect()}
        r = rules[("jam", "bread")]
        assert r["n_pair"] == 3
        assert r["support"] == pytest.approx(0.3)
        assert r["confidence"] == pytest.approx(1.0)
        assert r["lift"] == pytest.approx(1.25)

    def test_topk_deterministic_cut(self, baskets):
        full = [tuple(r) for r in
                association_rules(baskets, min_support=2,
                                  top_k=1000).collect()]
        cut = [tuple(r) for r in
               association_rules(baskets, min_support=2,
                                 top_k=5).collect()]
        assert cut == full[:5]

    def test_validation(self, baskets):
        with pytest.raises(ValueError):
            association_rules(baskets, min_support=0)
        with pytest.raises(ValueError):
            association_rules(baskets, top_k=0)


class TestTriples:
    def test_matches_bruteforce(self, baskets):
        _, n1, _, ntri = _brute(2)
        got = {(r["a"], r["b"], r["c"]): r["n_triple"] for r in
               frequent_triples(baskets, min_support=2).collect()}
        want = {t: n for t, n in ntri.items() if n >= 2
                and all(n1[x] >= 2 for x in t)}
        assert got == want

    def test_empty_when_support_too_high(self, baskets):
        assert frequent_triples(baskets, min_support=9).count() == 0


class TestParityAndPlan:
    def test_duckdb_parity(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = [tuple(r) for r in
               association_rules(docs, min_support=50,
                                 top_k=40).collect()]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(association_rules_sql(
                    min_support=50, top_k=40))
                .df().itertuples(index=False)]
        assert got == want
        assert len(got) == 40

    def test_plan_rowlocal_pairing(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (association_rules(docs, min_support=50, top_k=40)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        # the basket stream is paired row-locally: the only joins are
        # broadcast (frequent-1 margins + the 1-row totals)
        assert "SortMergeJoin" not in plan
