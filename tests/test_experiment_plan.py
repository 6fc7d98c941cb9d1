"""Composed experiment-report plan (plans/experiment.py): one call
assembles the full A/B battery; planted scenarios drive every
section to its expected verdict."""

import random

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.plans.experiment import (
    experiment_report,
)


def _experiment(spark, effect=2.0, broken_split=False,
                imbalanced_cov=False):
    rng = random.Random(12)
    rows = []
    for i in range(3000):
        if broken_split:
            v = "t" if i % 10 else "c"       # 90/10 vs declared 50/50
        else:
            v = "c" if i % 2 else "t"
        day = 1 + (i % 28)
        age = rng.gauss(40 + (8 if (imbalanced_cov and v == "t")
                              else 0), 5)
        y = rng.gauss(10, 2) + (effect if v == "t" else 0)
        rows.append((v, f"2024-01-{day:02d}", y, age))
    return spark.createDataFrame(
        rows, "variant string, ts string, v double, age double") \
        .withColumn("ts", F.to_timestamp("ts"))


class TestExperimentReport:
    def test_healthy_experiment_full_story(self, spark):
        rep = experiment_report(
            _experiment(spark, effect=2.0), "variant", "v",
            "c", "t", covariates=["age"], ts_col="ts",
            split="2024-01-15", tau2=1.0)
        assert set(rep) == {"srm", "balance", "welch", "winsorized",
                            "quantile_lift", "msprt", "anova",
                            "did", "power"}
        [srm] = rep["srm"].collect()
        assert srm["srm_suspected"] is False
        [bal] = rep["balance"].collect()
        assert bal["imbalanced"] is False
        [w] = rep["welch"].collect()
        assert w["significant"] is True
        [m] = rep["msprt"].collect()
        assert m["significant"] is True
        [a] = rep["anova"].collect()
        assert a["f_stat"] > 100
        [p] = rep["power"].collect()
        assert p["n_per_arm_required"] > 0

    def test_broken_split_caught_by_srm(self, spark):
        rep = experiment_report(
            _experiment(spark, broken_split=True), "variant", "v",
            "c", "t")
        [srm] = rep["srm"].collect()
        assert srm["srm_suspected"] is True

    def test_covariate_imbalance_flagged(self, spark):
        rep = experiment_report(
            _experiment(spark, imbalanced_cov=True), "variant", "v",
            "c", "t", covariates=["age"])
        [bal] = rep["balance"].collect()
        assert bal["imbalanced"] is True
        assert abs(bal["smd"]) > 0.5

    def test_did_section_optional(self, spark):
        rep = experiment_report(_experiment(spark), "variant", "v",
                                "c", "t")
        assert "did" not in rep
        rep2 = experiment_report(_experiment(spark), "variant", "v",
                                 "c", "t", ts_col="ts",
                                 split="2024-01-15")
        assert "did" in rep2
