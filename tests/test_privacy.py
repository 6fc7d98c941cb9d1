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
    generalize_numeric,
    generalize_numeric_sql,
    generalize_prefix,
    generalize_prefix_sql,
    suppress_small_classes,
    suppress_small_classes_sql,
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


class TestSuppress:
    def test_drops_exactly_violating_rows(self, people):
        # k_threshold=3 violators: the 02139 singleton, the 02140
        # covid pair, the NULL-zip pair → 5 of 8 rows drop
        out = suppress_small_classes(
            people, ["zip", "age_band"], k_threshold=3)
        rows = [(r["zip"], r["age_band"]) for r in out.collect()]
        assert len(rows) == 3
        assert set(rows) == {("02138", "20s")}

    def test_output_is_k_anonymous(self, people):
        out = suppress_small_classes(
            people, ["zip", "age_band"], k_threshold=2)
        r = anonymity_summary(
            out, ["zip", "age_band"], k_threshold=2).collect()[0]
        assert r["min_k"] >= 2
        assert r["n_violating_rows"] == 0

    def test_null_bucket_suppressed_as_a_class(self, people):
        # NULL-zip class has k=2: survives threshold 2, dies at 3
        keep2 = suppress_small_classes(people, ["zip"], k_threshold=2)
        assert any(r["zip"] is None for r in keep2.collect())
        keep3 = suppress_small_classes(people, ["zip"], k_threshold=3)
        assert all(r["zip"] is not None for r in keep3.collect())

    def test_threshold_one_keeps_all(self, people):
        assert suppress_small_classes(
            people, ["zip", "age_band"], k_threshold=1).count() == 8

    def test_validation(self, people):
        with pytest.raises(ValueError):
            suppress_small_classes(people, [], k_threshold=2)
        with pytest.raises(ValueError):
            suppress_small_classes(people, ["zip"], k_threshold=0)


class TestGeneralize:
    def test_numeric_floor_bins(self, spark):
        df = spark.createDataFrame(
            [(37.0,), (-3.0,), (30.0,), (None,)], "age double")
        got = [r["g"] for r in df.select(
            generalize_numeric("age", 10.0).alias("g")).collect()]
        assert got == [30.0, -10.0, 30.0, None]

    def test_prefix_pads_to_length(self, spark):
        df = spark.createDataFrame(
            [("02138",), ("02",), ("",), (None,)], "zip string")
        got = [r["g"] for r in df.select(
            generalize_prefix("zip", 3).alias("g")).collect()]
        assert got == ["021**", "02", "", None]

    def test_generalization_raises_k(self, people):
        # full zip: min_k = 1 (the 02139 singleton); 3-digit prefix
        # merges 02138/02139 (021**) so every class reaches k >= 2
        gen = people.withColumn("zip", generalize_prefix("zip", 3))
        r = anonymity_summary(gen, ["zip"], k_threshold=2).collect()[0]
        assert r["min_k"] >= 2

    def test_validation(self):
        with pytest.raises(ValueError):
            generalize_numeric("x", 0)
        with pytest.raises(ValueError):
            generalize_prefix("x", -1)


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

    def test_suppress_twin(self, spark, sf_dir):
        import duckdb

        # single quasi column + low threshold so survival is PARTIAL
        # at sf0.001 (150 customers / 25 nations ≈ 6 per class)
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        got = sorted(
            r["c_custkey"] for r in suppress_small_classes(
                cust, ["c_nationkey"], k_threshold=6)
            .select("c_custkey").collect())
        want = sorted(
            r[0] for r in duckdb.sql(
                "SELECT c_custkey FROM (" + suppress_small_classes_sql(
                    f"'{sf_dir}/customer.parquet'", ["c_nationkey"],
                    k_threshold=6) + ")").fetchall())
        assert got == want
        assert 0 < len(got) < cust.count()

    def test_generalize_twin(self, spark, sf_dir):
        import duckdb

        pq = f"{sf_dir}/customer.parquet"
        cust = spark.read.parquet(pq)
        got = sorted(
            (r["c_custkey"], r["g"]) for r in cust.select(
                "c_custkey",
                generalize_numeric("c_acctbal", 500.0).alias("g"))
            .collect())
        want = sorted(duckdb.sql(
            f"SELECT c_custkey, "
            f"{generalize_numeric_sql('c_acctbal', 500.0)} AS g "
            f"FROM '{pq}'").fetchall())
        assert got == want
        gotp = sorted(
            (r["c_custkey"], r["g"]) for r in cust.select(
                "c_custkey",
                generalize_prefix("c_mktsegment", 4).alias("g"))
            .collect())
        wantp = sorted(duckdb.sql(
            f"SELECT c_custkey, "
            f"{generalize_prefix_sql('c_mktsegment', 4)} AS g "
            f"FROM '{pq}'").fetchall())
        assert gotp == wantp

    def test_suppress_plan_anti_join_no_python(self, spark, sf_dir):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        plan = (suppress_small_classes(cust, self.QUASI, 10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "LeftAnti" in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_plan_one_groupby_no_join(self, spark, sf_dir):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        plan = (anonymity_summary(cust, self.QUASI, "c_acctbal")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan
        # column pruning: the scan must not read the comment payload
        assert "c_comment" not in plan
