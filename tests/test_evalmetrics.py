"""Evaluation metrics (operators/evalmetrics.py): plain-Python
reference parity for the midrank AUC / confusion counts, hand-computed
ranking goldens (MRR/MAP/NDCG incl. the no-relevant NULL contract and
the deterministic tie-break), calibration bin clamping + ECE from
unrounded stats, degenerate-input NULL (never error) semantics, DuckDB
twin parity on a deterministic scored derivation of the embeddings
table, and plan shape (no Python eval, single-row reduction).
"""
from __future__ import annotations

import math

import pytest

from nifi_extracttext_processor_spark.operators.evalmetrics import (
    best_threshold,
    best_threshold_sql,
    binary_metrics,
    binary_metrics_sql,
    calibration_bins,
    calibration_bins_sql,
    expected_calibration_error,
    expected_calibration_error_sql,
    pr_curve,
    pr_curve_sql,
    ranking_metrics,
    ranking_metrics_sql,
)

# (label, score) with score ties crossing the class boundary
PAIRS = [
    (1, 0.9), (0, 0.9), (1, 0.8), (1, 0.7), (0, 0.7), (0, 0.7),
    (1, 0.4), (0, 0.3), (0, 0.2), (1, 0.2), (0, 0.1), (1, 0.55),
]


def _ref_auc(pairs):
    """Midrank Mann-Whitney AUC, plain Python."""
    asc = sorted(range(len(pairs)), key=lambda i: pairs[i][1])
    ranks = [0.0] * len(pairs)
    i = 0
    while i < len(asc):
        j = i
        while j < len(asc) and pairs[asc[j]][1] == pairs[asc[i]][1]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for t in range(i, j):
            ranks[asc[t]] = avg
        i = j
    pos = [ranks[i] for i, (y, _) in enumerate(pairs) if y == 1]
    p, n = len(pos), len(pairs) - len(pos)
    return (sum(pos) - p * (p + 1) / 2.0) / (p * n)


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(PAIRS, "label int, score double")


class TestBinary:
    def test_confusion_and_rates(self, scored):
        r = binary_metrics(scored, threshold=0.5).collect()[0]
        tp = sum(1 for y, s in PAIRS if y == 1 and s >= 0.5)
        fp = sum(1 for y, s in PAIRS if y == 0 and s >= 0.5)
        tn = sum(1 for y, s in PAIRS if y == 0 and s < 0.5)
        fn = sum(1 for y, s in PAIRS if y == 1 and s < 0.5)
        assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (tp, fp, tn, fn)
        assert r["accuracy"] == pytest.approx((tp + tn) / len(PAIRS))
        assert r["precision"] == pytest.approx(tp / (tp + fp))
        assert r["recall"] == pytest.approx(tp / (tp + fn))
        p, q = tp / (tp + fp), tp / (tp + fn)
        assert r["f1"] == pytest.approx(2 * p * q / (p + q))

    def test_auc_matches_midrank_reference(self, scored):
        r = binary_metrics(scored).collect()[0]
        assert r["auc"] == pytest.approx(_ref_auc(PAIRS), abs=1e-6)

    def test_auc_equals_trapezoid_roc(self, scored):
        # independent second reference: trapezoidal area under the
        # ROC curve swept over distinct thresholds
        thr = sorted({s for _, s in PAIRS}, reverse=True)
        p = sum(y for y, _ in PAIRS)
        n = len(PAIRS) - p
        pts = [(0.0, 0.0)]
        for t in thr:
            tp = sum(1 for y, s in PAIRS if y == 1 and s >= t)
            fp = sum(1 for y, s in PAIRS if y == 0 and s >= t)
            pts.append((fp / n, tp / p))
        area = sum((x2 - x1) * (y1 + y2) / 2
                   for (x1, y1), (x2, y2) in zip(pts, pts[1:]))
        r = binary_metrics(scored).collect()[0]
        assert r["auc"] == pytest.approx(area, abs=1e-6)

    def test_degenerate_single_class_null_auc(self, spark):
        one = spark.createDataFrame([(1, 0.9), (1, 0.2)],
                                    "label int, score double")
        r = binary_metrics(one).collect()[0]
        assert r["auc"] is None
        assert r["precision"] == 1.0
        assert r["n_neg"] == 0

    def test_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 0.9), (None, 0.5), (0, None), (0, 0.1)],
            "label int, score double")
        r = binary_metrics(df).collect()[0]
        assert r["n"] == 2 and r["tp"] == 1 and r["tn"] == 1


RANKED = [
    # query A: rel at pos 1 and 3 (by score desc, doc asc)
    ("A", 101, 0.9, 1), ("A", 102, 0.8, 0), ("A", 103, 0.7, 1),
    ("A", 104, 0.6, 0),
    # query B: single rel at pos 2; tie broken by doc_id
    ("B", 201, 0.5, 0), ("B", 202, 0.5, 1), ("B", 203, 0.1, 0),
    # query C: nothing relevant
    ("C", 301, 0.9, 0), ("C", 302, 0.8, 0),
]


@pytest.fixture(scope="module")
def results(spark):
    return spark.createDataFrame(
        RANKED, "query_id string, doc_id long, score double, relevant int")


class TestRanking:
    def test_hand_computed_golden(self, results):
        out = {r["query_id"]: r for r in
               ranking_metrics(results, k=3).collect()}
        a = out["A"]
        assert a["n_rel"] == 2
        assert a["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
        assert a["recall_at_k"] == pytest.approx(1.0)
        assert a["mrr"] == pytest.approx(1.0)
        # AP = mean(prec@1, prec@3) = (1 + 2/3)/2
        assert a["ap"] == pytest.approx((1 + 2 / 3) / 2, abs=1e-6)
        dcg = 1 / math.log2(2) + 1 / math.log2(4)
        idcg = 1 / math.log2(2) + 1 / math.log2(3)
        assert a["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)

    def test_tiebreak_doc_id_ascending(self, results):
        # B's tie at 0.5: doc 201 (rel=0) ranks before 202 (rel=1)
        b = {r["query_id"]: r for r in
             ranking_metrics(results, k=3).collect()}["B"]
        assert b["mrr"] == pytest.approx(0.5)
        assert b["ap"] == pytest.approx(0.5)

    def test_no_relevant_is_null_not_zero(self, results):
        c = {r["query_id"]: r for r in
             ranking_metrics(results, k=3).collect()}["C"]
        assert c["precision_at_k"] == 0.0
        assert c["recall_at_k"] is None
        assert c["mrr"] is None and c["ap"] is None
        assert c["ndcg_at_k"] is None

    def test_k_larger_than_list(self, results):
        a = {r["query_id"]: r for r in
             ranking_metrics(results, k=100).collect()}["A"]
        # fixed-cutoff convention: denominator stays k
        assert a["precision_at_k"] == pytest.approx(2 / 100)
        assert a["recall_at_k"] == pytest.approx(1.0)

    def test_validation(self, results):
        with pytest.raises(ValueError):
            ranking_metrics(results, k=0)


def _ref_sweep(pairs):
    """Plain-Python PR sweep: one point per distinct score threshold."""
    p_all = sum(y for y, _ in pairs)
    out = {}
    for t in sorted({s for _, s in pairs}, reverse=True):
        tp = sum(1 for y, s in pairs if y == 1 and s >= t)
        fp = sum(1 for y, s in pairs if y == 0 and s >= t)
        fn = p_all - tp
        prec = tp / (tp + fp) if tp + fp else None
        rec = tp / p_all if p_all else None
        f1 = (None if prec is None or rec is None or prec + rec == 0
              else 2 * prec * rec / (prec + rec))
        out[t] = (tp, fp, fn, prec, rec, f1)
    return out


class TestPRCurve:
    def test_matches_plain_python_sweep(self, scored):
        ref = _ref_sweep(PAIRS)
        rows = pr_curve(scored).collect()
        assert len(rows) == len(ref)
        for r in rows:
            tp, fp, fn, prec, rec, f1 = ref[r["threshold"]]
            assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
            assert r["precision"] == pytest.approx(prec, abs=1e-6)
            assert r["recall"] == pytest.approx(rec, abs=1e-6)
            assert r["f1"] == pytest.approx(f1, abs=1e-6)

    def test_ordered_descending_and_monotone_recall(self, scored):
        rows = pr_curve(scored).collect()
        ths = [r["threshold"] for r in rows]
        assert ths == sorted(ths, reverse=True)
        recs = [r["recall"] for r in rows]
        assert recs == sorted(recs)
        assert recs[-1] == pytest.approx(1.0)

    def test_best_threshold_maximizes_f1(self, scored):
        ref = _ref_sweep(PAIRS)
        want_f1 = max(v[5] for v in ref.values() if v[5] is not None)
        want_t = max(t for t, v in ref.items()
                     if v[5] is not None
                     and abs(v[5] - want_f1) < 1e-12)
        r = best_threshold(scored).collect()
        assert len(r) == 1
        assert r[0]["threshold"] == want_t
        assert r[0]["f1"] == pytest.approx(want_f1, abs=1e-6)

    def test_single_class_null_f1(self, spark):
        neg = spark.createDataFrame([(0, 0.9), (0, 0.2)],
                                    "label int, score double")
        rows = pr_curve(neg).collect()
        assert all(r["f1"] is None and r["tp"] == 0 for r in rows)
        b = best_threshold(neg).collect()[0]
        assert b["f1"] is None and b["threshold"] == 0.9


class TestCalibration:
    def test_bins_and_top_clamp(self, spark):
        df = spark.createDataFrame(
            [(1, 0.05), (0, 0.05), (1, 1.0), (1, 0.95), (0, 0.51)],
            "label int, score double")
        bins = {r["bin"]: r for r in calibration_bins(df, n_bins=10)
                .collect()}
        assert set(bins) == {0, 5, 9}
        assert bins[9]["n"] == 2          # 1.0 clamps into bin 9
        assert bins[0]["accuracy"] == pytest.approx(0.5)
        assert bins[0]["confidence"] == pytest.approx(0.05)
        assert bins[0]["gap"] == pytest.approx(0.45)

    def test_ece_weighted_sum(self, spark):
        df = spark.createDataFrame(
            [(1, 0.05), (0, 0.05), (1, 1.0), (1, 0.95), (0, 0.51)],
            "label int, score double")
        r = expected_calibration_error(df, n_bins=10).collect()[0]
        # bin0: 2 rows gap .45; bin5: 1 row gap .51; bin9: 2 rows
        # gap |1 - .975| = .025
        want = (2 * 0.45 + 1 * 0.51 + 2 * 0.025) / 5
        assert r["ece"] == pytest.approx(want, abs=1e-6)
        assert r["n"] == 5 and r["n_bins_used"] == 3

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0.5)], "label int, score double")
        with pytest.raises(ValueError):
            calibration_bins(df, n_bins=0)
        with pytest.raises(ValueError):
            expected_calibration_error(df, n_bins=0)


def _scored_view(sf_dir):
    """The driver derivation: deterministic md5-uniform score blended
    with the (binary) embeddings label — identical in both engines."""
    return (
        "(SELECT vec_id, label % 2 AS label, "
        "round(0.55 * ((('0x' || substr(md5(vec_id::VARCHAR), 1, 8))"
        "::BIGINT) / 4294967296.0) + 0.45 * (label % 2), 6) AS score "
        f"FROM '{sf_dir}/embeddings.parquet')")


class TestParityAndPlan:
    def _spark_scored(self, spark, sf_dir):
        from pyspark.sql import functions as F
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        u = (F.conv(F.substring(F.md5(F.col("vec_id").cast("string")),
                                1, 8), 16, 10).cast("long")
             / F.lit(4294967296.0))
        return e.select(
            "vec_id", (F.col("label") % 2).alias("label"),
            F.round(0.55 * u + 0.45 * (F.col("label") % 2), 6)
            .alias("score"))

    def test_binary_twin(self, spark, sf_dir):
        import duckdb

        got = binary_metrics(self._spark_scored(spark, sf_dir)).collect()
        want = duckdb.sql(
            binary_metrics_sql(_scored_view(sf_dir))).df()
        assert len(got) == 1
        g = got[0].asDict()
        w = want.iloc[0].to_dict()
        for c in g:
            assert g[c] == pytest.approx(w[c], abs=1e-9), c

    def test_ece_twin(self, spark, sf_dir):
        import duckdb

        got = expected_calibration_error(
            self._spark_scored(spark, sf_dir)).collect()[0].asDict()
        want = duckdb.sql(expected_calibration_error_sql(
            _scored_view(sf_dir))).df().iloc[0].to_dict()
        for c in got:
            assert got[c] == pytest.approx(want[c], abs=1e-9), c

    def test_bins_twin(self, spark, sf_dir):
        import duckdb

        got = [tuple(r) for r in calibration_bins(
            self._spark_scored(spark, sf_dir)).collect()]
        want = [tuple(r) for r in duckdb.sql(calibration_bins_sql(
            _scored_view(sf_dir))).df().itertuples(index=False)]
        assert got == pytest.approx(want)

    def test_ranking_twin(self, spark, sf_dir):
        import duckdb
        from pyspark.sql import functions as F

        base = self._spark_scored(spark, sf_dir).select(
            (F.col("vec_id") % 16).alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            "score", F.col("label").alias("relevant"))
        got = [tuple(r) for r in ranking_metrics(base, k=10).collect()]
        view = (
            "(SELECT vec_id % 16 AS query_id, vec_id AS doc_id, score, "
            f"label AS relevant FROM {_scored_view(sf_dir)} s)")
        want = [tuple(r) for r in duckdb.sql(
            ranking_metrics_sql(view, k=10)).df().itertuples(index=False)]
        assert len(got) == 16
        for g, w in zip(got, want):
            assert g == pytest.approx(w, abs=1e-9)

    def test_pr_curve_twin(self, spark, sf_dir):
        import duckdb

        got = [tuple(r) for r in pr_curve(
            self._spark_scored(spark, sf_dir)).collect()]
        want = [tuple(r) for r in duckdb.sql(pr_curve_sql(
            _scored_view(sf_dir))).df().itertuples(index=False)]
        assert len(got) == len(want) > 100
        for g, w in zip(got, want):
            assert g[:4] == w[:4]
            for a, b in zip(g[4:], w[4:]):
                assert a == pytest.approx(b, abs=1e-9, nan_ok=True)

    def test_best_threshold_twin(self, spark, sf_dir):
        import duckdb

        got = best_threshold(
            self._spark_scored(spark, sf_dir)).collect()[0].asDict()
        want = duckdb.sql(best_threshold_sql(
            _scored_view(sf_dir))).df().iloc[0].to_dict()
        for c in got:
            assert got[c] == pytest.approx(want[c], abs=1e-9), c

    def test_plan_no_python_single_reduction(self, spark, sf_dir):
        from pyspark.sql import functions as F

        plan = (binary_metrics(self._spark_scored(spark, sf_dir))
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # ranking: one keyed window, no join
        plan2 = (ranking_metrics(
            self._spark_scored(spark, sf_dir).select(
                (F.col("vec_id") % 16).alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "score", F.col("label").alias("relevant")), k=10)
            ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan2
        assert "BatchEvalPython" not in plan2


class TestCohenKappa:
    def test_classic_golden(self, spark):
        """Cohen 1960 shape: 20 yy + 15 nn + 10 yn + 5 ny ->
        po=0.7, pe=0.5, kappa=0.4 (exact rational 500/1250)."""
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import cohen_kappa
        rows = [("y", "y")] * 20 + [("n", "n")] * 15 \
            + [("y", "n")] * 10 + [("n", "y")] * 5 + [(None, "y")]
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = cohen_kappa(df, "a", "b").collect()
        assert (r["n"], r["po"], r["kappa"]) == (50, 0.7, 0.4)

    def test_degenerate_constant_raters(self, spark):
        """Both raters constant on the same label: pe=1, kappa
        undefined -> NULL (not 1.0)."""
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import cohen_kappa
        df = spark.createDataFrame([("x", "x")] * 5,
                                   "a string, b string")
        [r] = cohen_kappa(df, "a", "b").collect()
        assert r["po"] == 1.0 and r["kappa"] is None

    def test_perfect_and_inverse_agreement(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import cohen_kappa
        perfect = spark.createDataFrame(
            [("a", "a")] * 3 + [("b", "b")] * 3, "a string, b string")
        [r] = cohen_kappa(perfect, "a", "b").collect()
        assert r["kappa"] == 1.0
        inverse = spark.createDataFrame(
            [("a", "b")] * 3 + [("b", "a")] * 3, "a string, b string")
        [r] = cohen_kappa(inverse, "a", "b").collect()
        assert r["kappa"] == -1.0

    def test_grouped_twin_parity(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import cohen_kappa, cohen_kappa_sql
        rows = [(f"s{i % 2}", str((i * 3) % 4), str((i * 5 + i // 7) % 4))
                for i in range(200)]
        df = spark.createDataFrame(rows, "src string, a string, b string")
        got = cohen_kappa(df, "a", "b", group_by=["src"])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        odf = con.execute(cohen_kappa_sql(
            "t", "a", "b", group_by=["src"])).df()
        assert [tuple(r) for r in got.collect()] \
            == [tuple(r) for r in odf.itertuples(index=False)]


class TestMulticlass:
    def _df(self, spark):
        rows = [("a", "a")] * 10 + [("a", "b")] * 2 \
            + [("b", "b")] * 8 + [("b", "c")] * 4 \
            + [("c", "a")] * 3 + [("c", "c")] * 5 + [(None, "a")]
        return spark.createDataFrame(rows, "label string, pred string")

    def test_per_class_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import multiclass_metrics
        out = {r["class"]: r for r in multiclass_metrics(
            self._df(spark), "label", "pred").collect()}
        a = out["a"]
        assert (a["support"], a["n_predicted"], a["tp"]) == (12, 13, 10)
        assert a["precision"] == round(10 / 13, 4)
        assert a["recall"] == round(10 / 12, 4)
        assert a["f1"] == 0.8                    # 2*10/(12+13)
        # class never predicted -> NULL precision, f1 defined
        df2 = spark.createDataFrame(
            [("x", "y"), ("y", "y")], "label string, pred string")
        out2 = {r["class"]: r for r in multiclass_metrics(
            df2, "label", "pred").collect()}
        assert out2["x"]["precision"] is None
        assert out2["x"]["f1"] == 0.0

    def test_summary_golden_and_twins(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import (multiclass_metrics, multiclass_metrics_sql,
                    multiclass_summary, multiclass_summary_sql)
        df = self._df(spark)
        [s] = multiclass_summary(df, "label", "pred").collect()
        assert s["n"] == 32 and s["n_classes"] == 3
        assert s["accuracy"] == round(23 / 32, 4)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        assert [tuple(r) for r in multiclass_metrics(
            df, "label", "pred").collect()] \
            == [tuple(t) for t in con.execute(
                multiclass_metrics_sql("t", "label", "pred"))
                .fetchall()]
        assert [tuple(r) for r in multiclass_summary(
            df, "label", "pred").collect()] \
            == [tuple(t) for t in con.execute(
                multiclass_summary_sql("t", "label", "pred"))
                .fetchall()]

    def test_perfect_classifier(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import multiclass_summary
        df = spark.createDataFrame(
            [(str(i % 3), str(i % 3)) for i in range(30)],
            "label string, pred string")
        [s] = multiclass_summary(df, "label", "pred").collect()
        assert s["accuracy"] == 1.0 and s["macro_f1"] == 1.0


class TestEmbeddingOutliers:
    def test_planted_outlier_wins(self, spark):
        from nifi_extracttext_processor_spark.operators.similarity \
            import embedding_outliers
        rows = [(i, [0.1 * ((i + j) % 3) for j in range(8)])
                for i in range(100)]
        rows.append((999, [50.0] * 8))           # the junk embedding
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, k=3).collect()
        assert out[0]["vec_id"] == 999
        assert out[0]["dist2"] > 100 * out[1]["dist2"]
        # NULL and wrong-dim vectors are excluded, not ranked
        df2 = df.union(spark.createDataFrame(
            [(1000, None), (1001, [1.0])],
            "vec_id long, embedding array<double>"))
        out2 = embedding_outliers(df2, k=3).collect()
        assert {r["vec_id"] for r in out2} \
            == {r["vec_id"] for r in out}

    def test_twin_parity_and_plan(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.similarity \
            import embedding_outliers, embedding_outliers_sql
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        got = embedding_outliers(emb, k=25)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{sf_dir}/embeddings.parquet'")
        twin = con.execute(embedding_outliers_sql(
            "embeddings", k=25)).fetchall()
        assert [tuple(r) for r in got.collect()] \
            == [tuple(t) for t in twin]
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan    # no global sort
        import pytest as _pt
        with _pt.raises(ValueError, match="k must"):
            embedding_outliers(emb, k=0)

    def test_empty_input(self, spark):
        from nifi_extracttext_processor_spark.operators.similarity \
            import embedding_outliers
        df = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        assert embedding_outliers(df, k=5).count() == 0


class TestRocAuc:
    def test_hand_computed_with_ties(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import roc_auc
        # scores: pos at {0.9, 0.7, 0.5}, neg at {0.7, 0.3, 0.1}
        # pairs: 9 total; pos>neg: 0.9 beats all 3; 0.7 beats 2,
        # ties 1 (0.5); 0.5 beats 2 -> wins 7 + 0.5 tie? recompute:
        # pos 0.7 vs neg 0.7 is the tie (0.5 credit); pos 0.5 beats
        # neg {0.3, 0.1} = 2. total = 3 + 2 + 0.5 + 2 = 7.5 -> 7.5/9
        rows = [(1, 0.9), (1, 0.7), (1, 0.5),
                (0, 0.7), (0, 0.3), (0, 0.1)]
        df = spark.createDataFrame(rows, "label int, score double")
        [r] = roc_auc(df).collect()
        assert (r["n_pos"], r["n_neg"]) == (3, 3)
        assert r["auc"] == round(7.5 / 9, 6)

    def test_perfect_random_and_inverted(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import roc_auc
        perfect = [(1, 0.8), (1, 0.9), (0, 0.1), (0, 0.2)]
        [p] = roc_auc(spark.createDataFrame(
            perfect, "label int, score double")).collect()
        assert p["auc"] == 1.0
        inverted = [(0, 0.8), (0, 0.9), (1, 0.1), (1, 0.2)]
        [i] = roc_auc(spark.createDataFrame(
            inverted, "label int, score double")).collect()
        assert i["auc"] == 0.0
        # all scores tied -> AUC exactly 0.5
        tied = [(1, 0.5), (1, 0.5), (0, 0.5)]
        [t] = roc_auc(spark.createDataFrame(
            tied, "label int, score double")).collect()
        assert t["auc"] == 0.5

    def test_degenerate_single_class(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import roc_auc
        [r] = roc_auc(spark.createDataFrame(
            [(1, 0.5), (1, 0.7)], "label int, score double")).collect()
        assert r["auc"] is None and r["n_neg"] == 0

    def test_grouped_twin_parity_and_sklearn_free_golden(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import roc_auc, roc_auc_sql
        import random
        rng = random.Random(17)
        rows = [(rng.randrange(2), rng.randrange(2),
                 round(rng.random(), 2)) for _ in range(500)]
        df = spark.createDataFrame(rows,
                                   "g int, label int, score double")
        a = sorted(map(tuple, roc_auc(
            df, group_by=["g"]).collect()))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        b = sorted(map(tuple, con.execute(roc_auc_sql(
            "t", group_by=["g"])).fetchall()))
        assert a == b
        # brute-force pair-count oracle on one group
        g0 = [(y, s) for g, y, s in rows if g == 0]
        pos = [s for y, s in g0 if y == 1]
        neg = [s for y, s in g0 if y == 0]
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
                   for p in pos for n in neg)
        want = round(wins / (len(pos) * len(neg)), 6)
        got = dict((t[0], t[3]) for t in a)[0]
        assert got == want
