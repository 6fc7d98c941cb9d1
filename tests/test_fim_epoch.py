"""FIM transformation + deterministic epoch shuffle
(corpus.fim_transform / corpus.shuffle_for_epoch): span reassembly,
rate selection, determinism across epochs/reruns, order pinning,
and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.corpus import (
    fim_transform,
    fim_transform_sql,
    shuffle_for_epoch,
    shuffle_for_epoch_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))


class TestFim:
    def test_spans_reassemble_exactly(self, spark, docs):
        out = fim_transform(docs, rate=1.0)
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        rows = out.collect()
        assert all(r["fim_applied"] for r in rows
                   if len(orig[r["doc_id"]]) > 0)
        for r in rows:
            if not r["fim_applied"]:
                continue
            t = r["text"]
            assert t.startswith("<PRE>")
            pre, rest = t[5:].split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
            assert pre + mid + suf == orig[r["doc_id"]]

    def test_rate_zero_is_identity(self, spark, docs):
        out = fim_transform(docs, rate=0.0)
        assert out.filter(F.col("fim_applied")).count() == 0
        a = sorted((r["doc_id"], r["text"]) for r in out.collect())
        b = sorted((r["doc_id"], r["text"]) for r in docs.collect())
        assert a == b

    def test_rate_selects_stable_fraction(self, spark, docs):
        out = fim_transform(docs, rate=0.5)
        n = docs.count()
        k = out.filter(F.col("fim_applied")).count()
        assert abs(k / n - 0.5) < 0.1
        # deterministic: rerun picks the SAME docs
        k2 = {r["doc_id"] for r in fim_transform(docs, rate=0.5)
              .filter(F.col("fim_applied")).select("doc_id").collect()}
        k1 = {r["doc_id"] for r in out.filter(F.col("fim_applied"))
              .select("doc_id").collect()}
        assert k1 == k2

    def test_twin_parity_and_validation(self, spark, docs, sf_dir):
        got = sorted(map(str, (tuple(r) for r in
                               fim_transform(docs, rate=0.5)
                               .collect())))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = sorted(map(str, ((t[0], t[1], t[2]) for t in con.execute(
            fim_transform_sql("documents", rate=0.5)).fetchall())))
        assert got == want
        with pytest.raises(ValueError, match="rate"):
            fim_transform(docs, rate=1.5)
        with pytest.raises(ValueError, match="sentinels"):
            fim_transform(docs, sentinels=("a", "b"))

    def test_plan_is_narrow(self, spark, docs):
        out = fim_transform(docs, rate=0.5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestEpochShuffle:
    def test_order_matches_key_and_is_reproducible(self, spark, docs):
        out = shuffle_for_epoch(docs.select("doc_id"), epoch=1,
                                num_partitions=4)
        ids = [r["doc_id"] for r in out.select("doc_id").collect()]
        con = duckdb.connect()
        con.register("d", docs.select("doc_id").toPandas())
        want = [t[0] for t in con.execute(
            shuffle_for_epoch_sql("d", epoch=1)).fetchall()]
        assert ids == want                      # induced TOTAL order
        ids2 = [r["doc_id"] for r in shuffle_for_epoch(
            docs.select("doc_id"), epoch=1, num_partitions=4)
            .select("doc_id").collect()]
        assert ids == ids2                      # rerun-stable

    def test_epochs_decorrelate(self, spark, docs):
        a = [r["doc_id"] for r in shuffle_for_epoch(
            docs.select("doc_id"), epoch=1, num_partitions=4)
            .select("doc_id").collect()]
        b = [r["doc_id"] for r in shuffle_for_epoch(
            docs.select("doc_id"), epoch=2, num_partitions=4)
            .select("doc_id").collect()]
        assert a != b and sorted(a) == sorted(b)
        # positions should be essentially unrelated
        pos_b = {d: i for i, d in enumerate(b)}
        same = sum(1 for i, d in enumerate(a) if pos_b[d] == i)
        assert same < len(a) * 0.05

    def test_plan_is_range_partition_local_sort(self, spark, docs):
        out = shuffle_for_epoch(docs.select("doc_id"), epoch=1,
                                num_partitions=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan
        # partition-local sort only (global=False), no second exchange
        assert plan.count("Exchange") == 1


class TestNeymanAllocation:
    def test_budget_follows_variance(self, spark):
        from nifi_extracttext_processor_spark.operators.corpus import (
            neyman_allocation, stratified_sample,
        )
        rows = [("lowvar", 5.0 + (i % 3) * 0.01) for i in range(1000)] \
            + [("highvar", float((i * 37) % 1000))
               for i in range(1000)]
        df = spark.createDataFrame(
            [(i, s, v) for i, (s, v) in enumerate(rows)],
            "doc_id long, source string, value double")
        rates = neyman_allocation(df, "source", "value", total_n=500)
        assert rates["highvar"] > 100 * rates["lowvar"]
        got = stratified_sample(df, rates).count()
        assert 350 < got < 650          # ~500 by construction
        # deterministic: same plan twice
        assert rates == neyman_allocation(df, "source", "value",
                                          total_n=500)

    def test_zero_variance_fallback_and_clamp(self, spark):
        from nifi_extracttext_processor_spark.operators.corpus import (
            neyman_allocation,
        )
        df = spark.createDataFrame(
            [(i, "const", 7.0) for i in range(100)]
            + [(100 + i, "tiny", float(i)) for i in range(10)],
            "doc_id long, source string, value double")
        rates = neyman_allocation(df, "source", "value", total_n=50)
        assert 0 < rates["const"] <= 1.0   # proportional fallback
        assert rates["tiny"] == 1.0        # clamped (n_h > N_h)
        with pytest.raises(ValueError, match="total_n"):
            neyman_allocation(df, "source", "value", total_n=0)

    def test_all_degenerate_proportional(self, spark):
        from nifi_extracttext_processor_spark.operators.corpus import (
            neyman_allocation,
        )
        df = spark.createDataFrame(
            [(i, f"s{i % 2}", 1.0) for i in range(100)],
            "doc_id long, source string, value double")
        rates = neyman_allocation(df, "source", "value", total_n=50)
        assert rates["s0"] == pytest.approx(0.5)
        assert rates["s1"] == pytest.approx(0.5)


class TestDedupSavings:
    def test_report_reconciles_with_dedup_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from nifi_extracttext_processor_spark.operators.dedup import (
            dedup_exact, dedup_savings_report,
        )
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text"))
        dup = (docs.filter(F.pmod(F.col("doc_id"), 7) == 0)
               .withColumn("doc_id", F.col("doc_id") + 10**9))
        tri = (docs.filter(F.pmod(F.col("doc_id"), 50) == 3)
               .withColumn("doc_id", F.col("doc_id") + 2 * 10**9))
        seeded = docs.unionByName(dup).unionByName(tri)
        rep = dedup_savings_report(seeded).collect()
        dropped = sum(r["n_docs"] - r["n_clusters"] for r in rep)
        # the report's dropped-doc count IS what dedup_exact removes
        kept = dedup_exact(seeded).count()
        assert seeded.count() - kept == dropped
        sizes = {r["cluster_size"] for r in rep}
        assert sizes == {2, 3}           # pairs + the triple-seeded
        assert all(0 < r["frac_docs"] < 1 for r in rep)

    def test_clean_corpus_empty_report(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators.dedup import (
            dedup_savings_report,
        )
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text"))
        assert dedup_savings_report(docs).count() == 0


class TestTokenFertility:
    def test_hand_golden_and_twin(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.text_analysis \
            import token_fertility, token_fertility_sql
        # "ab cd" -> 2 tokens, 5 chars; "x1!" -> 3 tokens (word,
        # number, punct), 3 chars
        df = spark.createDataFrame(
            [("en", "ab cd"), ("en", "x1!"), ("zh", "")],
            "lang string, text string")
        out = {r["lang"]: r for r in token_fertility(
            df, group_by=["lang"]).collect()}
        assert out["en"]["n_tokens"] == 5
        assert out["en"]["n_chars"] == 8
        assert out["en"]["chars_per_token"] == 1.6
        assert out["zh"]["n_tokens"] == 0
        assert out["zh"]["chars_per_token"] is None
        con = duckdb.connect()
        con.register("t", df.toPandas())
        got = [tuple(r) for r in token_fertility(
            df, group_by=["lang"]).collect()]
        want = [tuple(t) for t in con.execute(token_fertility_sql(
            "t", group_by=["lang"])).fetchall()]
        assert got == want
