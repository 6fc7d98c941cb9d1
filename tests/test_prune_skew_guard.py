"""r17 skew guard for the per-cluster similarity kernels
(clustering.py `_PRUNE_BLOCK` / `_dominated_blocked`): a degenerate or
skewed clustering can put m rows in ONE cluster, and the kernels built
an m x m similarity on a single worker (O(m^2) memory). Above the
block edge they now tile at B x B. These tests pin (1) the tiled
helper against the naive matrices on adversarial inputs (NaN, zero
vectors, every block size), (2) operator-level equality
blocked-vs-unblocked for all three kernels (gemm, exact, incremental),
and (3) completion + the min-id rule on a pathological single-cluster
fixture whose unblocked similarity would be ~100x the tile budget."""

import numpy as np
import pytest
from pyspark.sql import Row

from nifi_extracttext_processor_spark.operators import clustering
from nifi_extracttext_processor_spark.operators.clustering import (
    _dominated_blocked,
    semantic_dedup,
    semantic_dedup_incremental,
)


def _naive_exact(Xa, Xb, bound, upper_only):
    m, dim = Xa.shape
    S = np.zeros((m, Xb.shape[0]))
    for i in range(dim):
        S = S + np.multiply.outer(Xa[:, i], Xb[:, i])
    mask = (S >= bound) | np.isnan(S)
    if upper_only:
        mask &= (np.arange(m)[:, None] < np.arange(Xb.shape[0])[None, :])
    return mask.any(axis=0)


class TestBlockedHelper:
    def test_matches_naive_at_every_block_size(self):
        rng = np.random.default_rng(7)
        X = rng.normal(size=(37, 5))
        X[4] = 0.0                       # zero vector
        X[11] = X[3]                     # exact duplicate
        X[20, 2] = np.nan                # NaN propagates into sims
        n = np.sqrt((X * X).sum(axis=1))
        nz = n > 0
        Xn = np.where(nz[:, None], X / np.where(nz, n, 1.0)[:, None],
                      0.0)
        Xn[20] = X[20]                   # keep the NaN row as-is
        for upper in (True, False):
            want = _naive_exact(Xn, Xn, 0.9, upper)
            for b in (1, 3, 8, 36, 37, 100):
                got = _dominated_blocked(
                    Xn, Xn, lambda t: (t >= 0.9) | np.isnan(t),
                    upper_only=upper, gemm=False, block=b)
                assert (got == want).all(), (upper, b)

    def test_rectangular_no_upper(self):
        rng = np.random.default_rng(3)
        Xa = rng.normal(size=(23, 4))
        Xb = rng.normal(size=(9, 4))
        want = _naive_exact(Xa, Xb, 0.5, False)
        for b in (2, 5, 23):
            got = _dominated_blocked(
                Xa, Xb, lambda t: (t >= 0.5) | np.isnan(t),
                upper_only=False, gemm=False, block=b)
            assert (got == want).all()


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])


def _skewed_vecs(n, dim=6, seed=5):
    """A few tight direction bundles + noise: plenty of prune hits."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(7, dim))
    out = []
    for i in range(n):
        v = base[i % 7] + rng.normal(scale=0.01 if i % 3 else 0.6,
                                     size=dim)
        out.append(v.tolist())
    out[13] = [0.0] * dim               # zero vector
    return out


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


class TestOperatorBlockedEqualsUnblocked:
    @pytest.mark.parametrize("method", ["exact", "gemm"])
    def test_semantic_dedup(self, spark, monkeypatch, method):
        df = _vec_df(spark, _skewed_vecs(120))
        cents = [[1.0] + [0.0] * 5]     # one centroid: one giant cluster
        want = _sorted_rows(semantic_dedup(
            df, threshold=0.6, centroids=cents, method=method))
        monkeypatch.setattr(clustering, "_PRUNE_BLOCK", 17)
        got = _sorted_rows(semantic_dedup(
            df, threshold=0.6, centroids=cents, method=method))
        assert got == want
        assert len(got) < 120           # the prune actually pruned

    def test_incremental(self, spark, monkeypatch):
        vecs = _skewed_vecs(150, seed=11)
        cat = _vec_df(spark, vecs[:60])
        from pyspark.sql import functions as F
        bat = _vec_df(spark, vecs[60:]).withColumn(
            "vec_id", F.col("vec_id") + 1000)
        cents = [[1.0] + [0.0] * 5]
        want = _sorted_rows(semantic_dedup_incremental(
            bat, cat, threshold=0.6, centroids=cents))
        monkeypatch.setattr(clustering, "_PRUNE_BLOCK", 13)
        got = _sorted_rows(semantic_dedup_incremental(
            bat, cat, threshold=0.6, centroids=cents))
        assert got == want
        assert 0 < len(got) < 90


class TestPathologicalCluster:
    def test_identical_vector_flood_completes_min_id_survives(
            self, spark, monkeypatch):
        """6000 near-identical vectors in ONE cluster: unblocked this
        is a 6000^2 similarity (~288 MB, and O(m^2) at any scale);
        with the guard at block=512 no tile exceeds 512^2 (~2 MB).
        The min-id rule must leave exactly the lowest id."""
        monkeypatch.setattr(clustering, "_PRUNE_BLOCK", 512)
        n = 6000
        vecs = [[1.0, 1e-9 * i, 0.0, 0.0] for i in range(n)]
        df = _vec_df(spark, vecs)
        out = semantic_dedup(df, threshold=0.99,
                             centroids=[[1.0, 0.0, 0.0, 0.0]],
                             method="gemm").collect()
        assert [r["vec_id"] for r in out] == [0]
