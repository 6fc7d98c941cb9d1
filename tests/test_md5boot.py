"""operators/md5boot.py — the r17 Arrow md5 bootstrap-weight kernel.

The kernel's claim is BIT-IDENTITY with the JVM explode+md5 plan it
replaces; these tests pin (1) the vectorized single-block md5 against
hashlib on adversarial ids, (2) full ab_bootstrap_ci /
ab_bootstrap_ratio_ci output equality kernel-vs-JVM (the `_MD5_KERNEL`
escape hatch) on fixtures covering NULL groups, NaN values, the
object-int overflow fallback, and the long-id hashlib fallback, and
(3) the weight inverse-CDF walk against the chained-WHEN semantics."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators import abtest
from nifi_extracttext_processor_spark.operators.abtest import (
    _POIS_CDF,
    ab_bootstrap_ci,
    ab_bootstrap_ratio_ci,
)
from nifi_extracttext_processor_spark.operators.md5boot import (
    _hash_matrix,
    _hash_matrix_hashlib,
    _weights,
)


def _ref_hash(id_str: str, b: int, seed: int) -> int:
    msg = f"{id_str}#{b}#{seed}".encode()
    return int(hashlib.md5(msg).hexdigest()[:8], 16)


class TestHashMatrix:
    def test_matches_hashlib_on_adversarial_ids(self):
        ids = ["0", "", "42", "999999999999999999", "ümlaut-Ид",
               "with\x00nul", "a" * 40, "#7#", " spaces  "]
        enc = [s.encode("utf-8") for s in ids]
        for n_boot, seed in ((60, 7), (3, 123456)):
            h = _hash_matrix(enc, n_boot, seed)
            assert h.shape == (n_boot, len(ids))
            for i, s in enumerate(ids):
                for b in range(n_boot):
                    assert int(h[b, i]) == _ref_hash(s, b, seed), \
                        (s, b, seed)

    def test_long_id_falls_back_and_still_matches(self):
        # 60-byte id forces a 2-block message -> hashlib path
        ids = ["x" * 60, "7"]
        enc = [s.encode() for s in ids]
        h = _hash_matrix(enc, 5, 7)
        hh = _hash_matrix_hashlib(enc, 5, 7)
        assert (h == hh).all()
        for i, s in enumerate(ids):
            for b in range(5):
                assert int(h[b, i]) == _ref_hash(s, b, 7)

    def test_weight_walk_equals_chained_when(self):
        # w = first k with u < cdf[k], else 12 — on hashes landing in
        # every CDF bucket plus the extreme corners
        cdf = np.array(_POIS_CDF, dtype=np.float64)
        h = np.array([[0, 1, 2**31, 2**32 - 1,
                       int(0.3678794 * 2**32),
                       int(0.7357589 * 2**32),
                       int(0.9999999 * 2**32)]], dtype=np.uint32)
        w = _weights(h, cdf)
        u = (h.astype(np.float64) + 0.5) / 2**32
        for j in range(h.shape[1]):
            expect = 12
            for k in range(len(_POIS_CDF) - 1, -1, -1):
                if u[0, j] < _POIS_CDF[k]:
                    expect = k
            assert w[0, j] == expect


@pytest.fixture()
def jvm_path(monkeypatch):
    monkeypatch.setattr(abtest, "_MD5_KERNEL", False)


def _rows(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda t: tuple(str(x) for x in t))


class TestOperatorEquivalence:
    @pytest.fixture(scope="class")
    def adversarial(self, spark):
        """NULL group values, NaN value (-> NULL __xq), negatives,
        a singleton group, ties."""
        rows = [(i, "g1", "c", float(i % 5) - 2.0) for i in range(40)]
        rows += [(100 + i, "g1", "t", float(i % 3)) for i in range(40)]
        rows += [(200 + i, None, "c", 1.5) for i in range(10)]
        rows += [(300, "g2", "t", float("nan"))]
        rows += [(301, "g2", "t", 2.25), (302, "g2", "t", 2.25)]
        return spark.createDataFrame(
            rows, "row_id long, grp string, variant string, "
                  "value double")

    def test_bootstrap_ci_kernel_equals_jvm(self, spark, adversarial,
                                            monkeypatch):
        kern = _rows(ab_bootstrap_ci(
            adversarial, "variant", "value", "row_id", n_boot=25,
            group_by=["grp"]))
        monkeypatch.setattr(abtest, "_MD5_KERNEL", False)
        jvm = _rows(ab_bootstrap_ci(
            adversarial, "variant", "value", "row_id", n_boot=25,
            group_by=["grp"]))
        assert kern == jvm

    def test_bootstrap_ratio_kernel_equals_jvm(self, spark,
                                               adversarial,
                                               monkeypatch):
        num = adversarial.withColumn(
            "den", (F.pmod(F.col("row_id"), 4) + 1).cast("double"))
        kern = _rows(ab_bootstrap_ratio_ci(
            num, "variant", "value", "den", "row_id", n_boot=25,
            group_by=["grp"]))
        monkeypatch.setattr(abtest, "_MD5_KERNEL", False)
        jvm = _rows(ab_bootstrap_ratio_ci(
            num, "variant", "value", "den", "row_id", n_boot=25,
            group_by=["grp"]))
        assert kern == jvm

    def test_overflow_fallback_exact(self, spark, monkeypatch):
        """|value*1e6| far past the int64 guard -> the kernel's
        object-int path; result must still equal the JVM decimal
        aggregation bit-for-bit."""
        rows = [(i, "c", 4.2e15 if i % 2 else -3.9e15)
                for i in range(30)]
        df = spark.createDataFrame(
            rows, "row_id long, variant string, value double")
        kern = _rows(ab_bootstrap_ci(df, "variant", "value",
                                     "row_id", n_boot=10))
        monkeypatch.setattr(abtest, "_MD5_KERNEL", False)
        jvm = _rows(ab_bootstrap_ci(df, "variant", "value",
                                    "row_id", n_boot=10))
        assert kern == jvm

    def test_long_string_ids_match_jvm(self, spark, monkeypatch):
        rows = [(f"doc-{'x' * 70}-{i}", "c", float(i)) for i in
                range(20)] + [(f"s{i}", "t", float(i)) for i in
                              range(20)]
        df = spark.createDataFrame(
            rows, "row_id string, variant string, value double")
        kern = _rows(ab_bootstrap_ci(df, "variant", "value",
                                     "row_id", n_boot=12))
        monkeypatch.setattr(abtest, "_MD5_KERNEL", False)
        jvm = _rows(ab_bootstrap_ci(df, "variant", "value",
                                    "row_id", n_boot=12))
        assert kern == jvm

    def test_partition_invariance(self, spark, adversarial):
        a = _rows(ab_bootstrap_ci(adversarial, "variant", "value",
                                  "row_id", n_boot=25,
                                  group_by=["grp"]))
        b = _rows(ab_bootstrap_ci(adversarial.repartition(13),
                                  "variant", "value", "row_id",
                                  n_boot=25, group_by=["grp"]))
        assert a == b

    def test_schema_unchanged(self, spark, adversarial, monkeypatch):
        kern = ab_bootstrap_ci(adversarial, "variant", "value",
                               "row_id", n_boot=5, group_by=["grp"])
        monkeypatch.setattr(abtest, "_MD5_KERNEL", False)
        jvm = ab_bootstrap_ci(adversarial, "variant", "value",
                              "row_id", n_boot=5, group_by=["grp"])
        assert kern.schema == jvm.schema

    def test_nested_group_col_keeps_jvm_path(self, spark):
        """Array group keys are outside the kernel's factorization
        contract — the operator must still work (JVM path)."""
        rows = [(i, ["a"], "c", 1.0) for i in range(10)]
        df = spark.createDataFrame(
            rows, "row_id long, grp array<string>, variant string, "
                  "value double")
        out = ab_bootstrap_ci(df, "variant", "value", "row_id",
                              n_boot=5, group_by=["grp"])
        assert "MapInArrow" not in out._jdf.queryExecution() \
            .executedPlan().toString()
        assert out.count() == 1
