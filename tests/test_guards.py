"""Quantization-contract enforcement (operators/guards.py — VERDICT
r13 "what's wrong" #1): the rank-family operators that end in ONE
ordered window over a distinct-value collapse must fail LOUD when a
caller feeds an unquantized high-cardinality metric, instead of
silently funnelling the whole domain through a single sort task.

Checks per operator: (a) a high-cardinality float score raises
USER_RAISED_EXCEPTION naming the op and the knob, (b) the same input
passes with max_distinct raised / disabled and with quantized scores,
(c) guarded results are value-identical to max_distinct=None (the
guard is a gate, not a transform) including NULL group keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from nifi_extracttext_processor_spark.operators.evalmetrics import (
    binary_metrics,
    roc_auc,
)
from nifi_extracttext_processor_spark.operators.guards import (
    guard_max_distinct,
)
from nifi_extracttext_processor_spark.operators.ranktest import (
    ab_mann_whitney,
    ab_wilcoxon_signed,
    corr_spearman,
)


def _high_card_scores(spark, n=500):
    """n rows with n distinct float scores (1/3, 2/3, ... — no two
    collide) and alternating labels/variants."""
    return (spark.range(n)
            .select((F.col("id") % 2).cast("int").alias("label"),
                    F.when(F.col("id") % 2 == 0, F.lit("c"))
                    .otherwise(F.lit("t")).alias("variant"),
                    (F.col("id").cast("double") / F.lit(3.0))
                    .alias("score")))


def _assert_raises_guard(fn, op_name):
    with pytest.raises(Exception) as ei:
        fn().collect()
    msg = str(ei.value)
    assert "USER_RAISED_EXCEPTION" in msg or "quantization contract" \
        in msg, msg
    assert op_name in msg
    assert "max_distinct" in msg


class TestRocAucGuard:
    def test_high_cardinality_raises(self, spark):
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: roc_auc(df, max_distinct=100), "roc_auc")

    def test_quantized_passes_and_matches_unguarded(self, spark):
        df = _high_card_scores(spark).withColumn(
            "score", F.round("score", -1))  # 500/3 → 18 distinct
        got = roc_auc(df, max_distinct=100).collect()
        ref = roc_auc(df, max_distinct=None).collect()
        assert got == ref
        assert got[0]["auc"] is not None

    def test_grouped_guard_is_per_partition(self, spark):
        """One bad group must raise even when the other is bounded,
        and a per-group-bounded table passes a global-looking total."""
        df = (_high_card_scores(spark, 200)
              .withColumn("g", (F.col("label") % 2 == 0).cast("int")))
        _assert_raises_guard(
            lambda: roc_auc(df, group_by=["g"], max_distinct=50),
            "roc_auc")
        ok = roc_auc(df, group_by=["g"], max_distinct=100)
        assert ok.count() == 2  # 100 distinct scores per group

    def test_default_knob_admits_normal_domains(self, spark):
        df = _high_card_scores(spark, 300)
        assert roc_auc(df).count() == 1  # default 1e6 >> 300


class TestBinaryMetricsGuard:
    def test_high_cardinality_raises(self, spark):
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: binary_metrics(df, max_distinct=100),
            "binary_metrics")

    def test_guarded_matches_unguarded(self, spark):
        df = _high_card_scores(spark, 80)
        got = binary_metrics(df, max_distinct=100).collect()
        ref = binary_metrics(df, max_distinct=None).collect()
        assert got == ref


class TestMannWhitneyGuard:
    def test_high_cardinality_raises(self, spark):
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: ab_mann_whitney(df, "variant", "score", "c", "t",
                                    max_distinct=100),
            "ab_mann_whitney")

    def test_guarded_matches_unguarded(self, spark):
        df = _high_card_scores(spark, 80).withColumn(
            "score", F.round("score", 0))
        args = (df, "variant", "score", "c", "t")
        got = ab_mann_whitney(*args, max_distinct=100).collect()
        ref = ab_mann_whitney(*args, max_distinct=None).collect()
        assert got == ref


class TestSpearmanGuard:
    def test_high_cardinality_x_margin_raises(self, spark):
        df = _high_card_scores(spark).withColumn(
            "y2", F.round("score", 0))
        _assert_raises_guard(
            lambda: corr_spearman(df, "score", "y2",
                                  max_distinct=100),
            "corr_spearman")

    def test_high_cardinality_y_margin_raises(self, spark):
        df = _high_card_scores(spark).withColumn(
            "x2", F.round("score", 0))
        _assert_raises_guard(
            lambda: corr_spearman(df, "x2", "score",
                                  max_distinct=100),
            "corr_spearman")

    def test_guarded_matches_unguarded(self, spark):
        df = _high_card_scores(spark, 120).withColumn(
            "y2", F.round(F.col("score") * 2, 0)).withColumn(
            "score", F.round("score", 0))
        got = corr_spearman(df, "score", "y2",
                            max_distinct=200).collect()
        ref = corr_spearman(df, "score", "y2",
                            max_distinct=None).collect()
        assert got == ref
        assert got[0]["rho"] is not None


class TestWilcoxonGuard:
    def _paired(self, spark, n_units, grain):
        """Each unit has one pre and one post row; post-pre diffs take
        n_units/grain ... distinct magnitudes."""
        pre = (spark.range(n_units)
               .select(F.concat(F.lit("u"), F.col("id")).alias("unit"),
                       F.lit(1.0).alias("value"),
                       F.lit("2024-01-01 00:00:00").cast("timestamp")
                       .alias("ts")))
        post = (spark.range(n_units)
                .select(F.concat(F.lit("u"), F.col("id")).alias("unit"),
                        (F.lit(1.0) + (F.col("id") % grain + 1)
                         .cast("double") / 7.0).alias("value"),
                        F.lit("2024-02-01 00:00:00").cast("timestamp")
                        .alias("ts")))
        return pre.unionByName(post)

    def test_high_cardinality_raises(self, spark):
        df = self._paired(spark, 400, grain=400)
        _assert_raises_guard(
            lambda: ab_wilcoxon_signed(df, "unit", "value", "ts",
                                       "2024-01-15",
                                       max_distinct=100),
            "ab_wilcoxon_signed")

    def test_guarded_matches_unguarded(self, spark):
        df = self._paired(spark, 100, grain=20)
        args = (df, "unit", "value", "ts", "2024-01-15")
        got = ab_wilcoxon_signed(*args, max_distinct=50).collect()
        ref = ab_wilcoxon_signed(*args, max_distinct=None).collect()
        assert got == ref


class TestGuardPrimitive:
    def test_none_disables(self, spark):
        df = spark.range(10).select(F.col("id").alias("v"))
        out = guard_max_distinct(df, [], None, "x")
        assert out is df

    def test_null_group_key_is_guarded_and_kept(self, spark):
        """NULL group keys are real window partitions: they must both
        survive the guard join (eqNullSafe) and trip the limit."""
        df = spark.createDataFrame(
            [(None, float(i)) for i in range(20)]
            + [("a", float(i)) for i in range(3)],
            "g string, v double")
        ok = guard_max_distinct(df, ["g"], 50, "x")
        assert ok.count() == 23  # NULL-keyed rows kept
        with pytest.raises(Exception) as ei:
            guard_max_distinct(df, ["g"], 10, "x").collect()
        assert "max_distinct" in str(ei.value)

    def test_empty_input_passes(self, spark):
        df = spark.range(0).select(F.col("id").alias("v"))
        assert guard_max_distinct(df, [], 10, "x").count() == 0


class TestBrownForsytheGuard:
    """r15: the two median-rule operators the r14 guard missed
    (VERDICT r14 "what's wrong" #1) — same ordered-window-over-
    distinct-collapse shape, now gated per (group, variant)."""

    def test_high_cardinality_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_brown_forsythe
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: ab_brown_forsythe(df, "variant", "score",
                                      "c", "t", max_distinct=100),
            "ab_brown_forsythe")

    def test_guarded_matches_unguarded(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_brown_forsythe
        df = _high_card_scores(spark, 80).withColumn(
            "score", F.round("score", 0))
        args = (df, "variant", "score", "c", "t")
        got = ab_brown_forsythe(*args, max_distinct=100).collect()
        ref = ab_brown_forsythe(*args, max_distinct=None).collect()
        assert got == ref


class TestMoodMedianGuard:
    def test_high_cardinality_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: ab_mood_median(df, "variant", "score",
                                   max_distinct=100),
            "ab_mood_median")

    def test_guarded_matches_unguarded(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_mood_median
        df = _high_card_scores(spark, 80).withColumn(
            "score", F.round("score", 0))
        args = (df, "variant", "score")
        got = ab_mood_median(*args, max_distinct=100).collect()
        ref = ab_mood_median(*args, max_distinct=None).collect()
        assert got == ref
        assert got[0]["chi2"] is not None


class TestKsExactGuard:
    """r15 sweep finding: ks_test_exact documented the quantize-
    upstream contract but never enforced it."""

    def test_high_cardinality_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.drift \
            import ks_test_exact
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: ks_test_exact(df, "variant", "score", "c", "t",
                                  max_distinct=100),
            "ks_test_exact")

    def test_guarded_matches_unguarded(self, spark):
        from nifi_extracttext_processor_spark.operators.drift \
            import ks_test_exact
        df = _high_card_scores(spark, 80).withColumn(
            "score", F.round("score", 0))
        args = (df, "variant", "score", "c", "t")
        got = ks_test_exact(*args, max_distinct=100).collect()
        ref = ks_test_exact(*args, max_distinct=None).collect()
        assert got == ref


class TestValueConcentrationGuard:
    """r15 sweep finding: value_concentration's 1e-6-grid collapse
    feeds the gini rank window unguarded."""

    def test_high_cardinality_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import value_concentration
        df = _high_card_scores(spark)
        _assert_raises_guard(
            lambda: value_concentration(df, "score",
                                        max_distinct=100),
            "value_concentration")

    def test_guarded_matches_unguarded(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import value_concentration
        df = _high_card_scores(spark, 80).withColumn(
            "score", F.round("score", 0))
        got = value_concentration(df, "score",
                                  max_distinct=100).collect()
        ref = value_concentration(df, "score",
                                  max_distinct=None).collect()
        assert got == ref


class TestKruskalDecimalAccumulation:
    """ADVICE r14 (medium): 2R_g must accumulate as decimal(38,0),
    not long — an int64 c·mid2 product wraps silently at ~3e9 rows
    per group. Values must be unchanged on normal domains."""

    def test_r2_carries_as_decimal(self, spark):
        import re
        from nifi_extracttext_processor_spark.operators.ranktest \
            import kruskal_wallis
        df = _high_card_scores(spark, 90).withColumn(
            "score", F.round("score", 0))
        out = kruskal_wallis(df, "variant", "score")
        plan = out._jdf.queryExecution().analyzed().toString()
        # assert the SPECIFIC r2 accumulation (c * mid2, both
        # operands decimal-widened before the multiply) — a bare
        # "decimal(38,0) in plan" would pass on any unrelated cast
        assert re.search(
            r"cast\(mid2#\d+L? as decimal\(38,0\)\)", plan), \
            "r2 accumulation regressed: mid2 operand not widened " \
            "to decimal(38,0) before the c*mid2 multiply"
        assert re.search(
            r"cast\(c#\d+L? as decimal\(38,0\)\)", plan), \
            "r2 accumulation regressed: c operand not widened " \
            "to decimal(38,0) before the c*mid2 multiply"
        [r] = out.collect()
        assert r["h"] is not None
