"""Hybrid-retrieval fusion (operators/fusion.py): hand-computed RRF
goldens (reciprocal sum, absent-source convention, doc-id tie-break),
min-max score fusion (constant-source → 1.0 convention, per-source
weights), top-k cutoff determinism, validation, DuckDB twin parity on
a deterministic two-source derivation of the embeddings table, and
plan shape (no Python eval, no join anywhere in the fused plan).
"""
from __future__ import annotations

import pytest

from nifi_extracttext_processor_spark.operators.fusion import (
    rrf_fuse,
    rrf_fuse_sql,
    score_fuse,
    score_fuse_sql,
)

# (query, doc, source, score). Query A: doc 2 is #1 lexically and #2
# semantically; doc 1 only lexical; doc 3 only semantic (#1).
ROWS = [
    ("A", 2, "lex", 9.0), ("A", 1, "lex", 5.0), ("A", 4, "lex", 1.0),
    ("A", 3, "sem", 0.9), ("A", 2, "sem", 0.8), ("A", 4, "sem", 0.1),
    # query B: a pure score tie inside one source → doc-id tie-break
    ("B", 7, "lex", 3.0), ("B", 6, "lex", 3.0),
]


@pytest.fixture(scope="module")
def rankings(spark):
    return spark.createDataFrame(
        ROWS, "query_id string, doc_id long, source string, score double")


class TestRRF:
    def test_hand_computed_scores(self, rankings):
        out = {(r["query_id"], r["doc_id"]): r
               for r in rrf_fuse(rankings, k_const=60, top_k=10)
               .collect()}
        # doc 2: rank 1 in lex, rank 2 in sem
        assert out[("A", 2)]["rrf_score"] == pytest.approx(
            round(1 / 61 + 1 / 62, 6))
        assert out[("A", 2)]["n_sources"] == 2
        assert out[("A", 2)]["best_rank"] == 1
        # doc 3: only sem, rank 1 — absent source contributes nothing
        assert out[("A", 3)]["rrf_score"] == pytest.approx(
            round(1 / 61, 6))
        assert out[("A", 3)]["n_sources"] == 1
        # doc 4: rank 3 in both
        assert out[("A", 4)]["rrf_score"] == pytest.approx(
            round(2 / 63, 6))

    def test_order_and_winner(self, rankings):
        a = [r["doc_id"] for r in rrf_fuse(rankings).collect()
             if r["query_id"] == "A"]
        # 1/61+1/62 (doc2) > 1/61 (doc3) > 1/62 (doc1) > 2/63? no:
        # 2/63 ≈ .03175 > 1/61 ≈ .01639, so doc4 is second
        assert a == [2, 4, 3, 1]

    def test_score_tie_breaks_by_doc_id(self, rankings):
        b = {r["doc_id"]: r for r in rrf_fuse(rankings).collect()
             if r["query_id"] == "B"}
        # tie at 3.0: doc 6 ranks 1, doc 7 ranks 2
        assert b[6]["best_rank"] == 1
        assert b[7]["best_rank"] == 2

    def test_top_k_cutoff(self, rankings):
        a = [r for r in rrf_fuse(rankings, top_k=2).collect()
             if r["query_id"] == "A"]
        assert [r["doc_id"] for r in a] == [2, 4]

    def test_validation(self, rankings):
        with pytest.raises(ValueError):
            rrf_fuse(rankings, k_const=0)
        with pytest.raises(ValueError):
            rrf_fuse(rankings, top_k=0)


class TestScoreFuse:
    def test_minmax_and_weights(self, rankings):
        out = {(r["query_id"], r["doc_id"]): r
               for r in score_fuse(
                   rankings, weights={"sem": 2.0}).collect()}
        # lex A: min 1, max 9 → doc2=1.0, doc1=0.5, doc4=0.0
        # sem A: min .1, max .9 → doc3=1.0, doc2=.875, doc4=0.0
        assert out[("A", 2)]["fused_score"] == pytest.approx(
            round(1.0 + 2.0 * 0.875, 6))
        assert out[("A", 3)]["fused_score"] == pytest.approx(2.0)
        assert out[("A", 1)]["fused_score"] == pytest.approx(0.5)
        assert out[("A", 4)]["fused_score"] == pytest.approx(0.0)

    def test_constant_source_normalizes_to_one(self, rankings):
        # query B's lex scores are a constant 3.0 → both docs 1.0
        b = {r["doc_id"]: r for r in score_fuse(rankings).collect()
             if r["query_id"] == "B"}
        assert b[6]["fused_score"] == pytest.approx(1.0)
        assert b[7]["fused_score"] == pytest.approx(1.0)

    def test_validation(self, rankings):
        with pytest.raises(ValueError):
            score_fuse(rankings, top_k=0)


def _two_source_view(sf_dir):
    """Deterministic two-source rankings from embeddings: 'lex' scores
    by an md5-uniform draw, 'sem' by a different salt — identical
    derivation in both engines, 16 queries via vec_id % 16."""
    return (
        "(SELECT vec_id % 16 AS query_id, vec_id AS doc_id, 'lex' AS "
        "source, round((('0x' || substr(md5(vec_id::VARCHAR || ':l'), "
        "1, 8))::BIGINT) / 4294967296.0, 6) AS score "
        f"FROM '{sf_dir}/embeddings.parquet' WHERE vec_id % 3 <> 0 "
        "UNION ALL "
        "SELECT vec_id % 16 AS query_id, vec_id AS doc_id, 'sem' AS "
        "source, round((('0x' || substr(md5(vec_id::VARCHAR || ':s'), "
        "1, 8))::BIGINT) / 4294967296.0, 6) AS score "
        f"FROM '{sf_dir}/embeddings.parquet' WHERE vec_id % 5 <> 0)")


def _spark_two_source(spark, sf_dir):
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def src(tag, mod):
        u = (F.conv(F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"),
                           F.lit(":" + tag[0]))), 1, 8), 16, 10)
            .cast("long") / F.lit(4294967296.0))
        return (e.filter(F.col("vec_id") % mod != 0)
                .select((F.col("vec_id") % 16).alias("query_id"),
                        F.col("vec_id").alias("doc_id"),
                        F.lit(tag).alias("source"),
                        F.round(u, 6).alias("score")))

    return src("lex", 3).unionAll(src("sem", 5))


class TestParityAndPlan:
    def test_rrf_twin(self, spark, sf_dir):
        import duckdb

        got = [tuple(r) for r in rrf_fuse(
            _spark_two_source(spark, sf_dir), top_k=5).collect()]
        want = [tuple(r) for r in duckdb.sql(rrf_fuse_sql(
            _two_source_view(sf_dir), top_k=5)).df()
            .itertuples(index=False)]
        assert len(got) == 16 * 5
        assert got == want

    def test_score_fuse_twin(self, spark, sf_dir):
        import duckdb

        wts = {"sem": 1.5, "lex": 0.75}
        got = [tuple(r) for r in score_fuse(
            _spark_two_source(spark, sf_dir), weights=wts,
            top_k=5).collect()]
        want = [tuple(r) for r in duckdb.sql(score_fuse_sql(
            _two_source_view(sf_dir), weights=wts, top_k=5)).df()
            .itertuples(index=False)]
        assert len(got) == 16 * 5
        for g, w in zip(got, want):
            assert g[:3] == w[:3]
            assert g[3] == pytest.approx(w[3], abs=1e-9)

    def test_plan_no_python_no_join(self, spark, sf_dir):
        plan = (rrf_fuse(_spark_two_source(spark, sf_dir))
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Join" not in plan
        plan2 = (score_fuse(_spark_two_source(spark, sf_dir))
                 ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan2
        assert "BatchEvalPython" not in plan2
