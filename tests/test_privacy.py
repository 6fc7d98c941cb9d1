"""Privacy audit (operators/privacy.py): hand-computed k/l goldens,
NULL-quasi-as-bucket and NULL-sensitive-excluded semantics, threshold
edge (k == threshold is NOT violating), DuckDB twin parity on the
customer table, validation, and plan shape (one groupBy, no join).
"""
from __future__ import annotations

import pytest

from nifi_extracttext_processor_spark.operators.privacy import (
    anonymity_classes,
    anonymity_classes_sql,
    anonymity_summary,
    anonymity_summary_sql,
)

# (zip, age_band, diagnosis)
ROWS = [
    ("02138", "20s", "flu"), ("02138", "20s", "flu"),
    ("02138", "20s", "cold"),
    ("02139", "30s", "flu"),                       # a k=1 singleton
    ("02140", "40s", "covid"), ("02140", "40s", "covid"),
    (None, "20s", "flu"), (None, "20s", None),     # NULL quasi bucket
]


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        ROWS, "zip string, age_band string, diagnosis string")


class TestClasses:
    def test_k_and_l_golden(self, people):
        out = {(r["zip"], r["age_band"]): r for r in anonymity_classes(
            people, ["zip", "age_band"], "diagnosis").collect()}
        assert out[("02138", "20s")]["k"] == 3
        assert out[("02138", "20s")]["l_diversity"] == 2
        assert out[("02139", "30s")]["k"] == 1
        assert out[("02140", "40s")]["l_diversity"] == 1
        # NULL zip is its own class; NULL sensitive not counted in l
        assert out[(None, "20s")]["k"] == 2
        assert out[(None, "20s")]["l_diversity"] == 1

    def test_riskiest_first_order(self, people):
        ks = [r["k"] for r in anonymity_classes(
            people, ["zip", "age_band"]).collect()]
        assert ks == sorted(ks)

    def test_no_sensitive_col_omits_l(self, people):
        cols = anonymity_classes(people, ["zip"]).columns
        assert cols == ["zip", "k"]

    def test_validation(self, people):
        with pytest.raises(ValueError):
            anonymity_classes(people, [])


class TestSummary:
    def test_hand_computed(self, people):
        r = anonymity_summary(
            people, ["zip", "age_band"], "diagnosis",
            k_threshold=3).collect()[0]
        assert r["n_rows"] == 8
        assert r["n_classes"] == 4
        assert r["min_k"] == 1
        # classes with k < 3: the singleton (1), covid pair (2),
        # NULL-zip pair (2) → 3 classes, 5 rows
        assert r["n_violating_classes"] == 3
        assert r["n_violating_rows"] == 5
        assert r["pct_violating_rows"] == pytest.approx(5 / 8)
        assert r["min_l"] == 1

    def test_threshold_edge_k_equal_not_violating(self, people):
        r = anonymity_summary(
            people, ["zip", "age_band"], k_threshold=1).collect()[0]
        assert r["n_violating_classes"] == 0
        assert r["n_violating_rows"] == 0
        assert r["pct_violating_rows"] == 0.0

    def test_validation(self, people):
        with pytest.raises(ValueError):
            anonymity_summary(people, ["zip"], k_threshold=0)


class TestParityAndPlan:
    QUASI = ["c_nationkey", "c_mktsegment"]

    def test_classes_twin(self, spark, sf_dir):
        import duckdb

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        got = [tuple(r) for r in anonymity_classes(
            cust, self.QUASI, "c_acctbal").collect()]
        want = [tuple(r) for r in duckdb.sql(anonymity_classes_sql(
            f"'{sf_dir}/customer.parquet'", self.QUASI, "c_acctbal"))
            .df().itertuples(index=False)]
        assert got == want

    def test_summary_twin(self, spark, sf_dir):
        import duckdb

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        got = anonymity_summary(
            cust, self.QUASI, "c_acctbal",
            k_threshold=10).collect()[0].asDict()
        want = duckdb.sql(anonymity_summary_sql(
            f"'{sf_dir}/customer.parquet'", self.QUASI, "c_acctbal",
            k_threshold=10)).df().iloc[0].to_dict()
        for c in got:
            assert got[c] == pytest.approx(want[c]), c

    def test_plan_one_groupby_no_join(self, spark, sf_dir):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        plan = (anonymity_summary(cust, self.QUASI, "c_acctbal")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan
        # column pruning: the scan must not read the comment payload
        assert "c_comment" not in plan
