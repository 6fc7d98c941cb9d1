"""Distributed PCA (operators/reduction.py): agreement with an
independent numpy SVD PCA, variance ordering, whitening, NULL
handling, and recall preservation through the ANN path.
"""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.reduction import (
    pca_fit,
    pca_reference,
    pca_transform,
)


def _data(n=200, d=8, seed=4):
    """Anisotropic Gaussian-ish data: variance concentrated in the
    first few directions."""
    rnd = random.Random(seed)
    rows = []
    for _ in range(n):
        base = [rnd.gauss(0, 4), rnd.gauss(0, 2)]
        rest = [rnd.gauss(0, 0.3) for _ in range(d - 2)]
        # rotate a little so components aren't axis-aligned
        x = [base[0] + 0.5 * base[1]] + [base[1]] + rest
        rows.append([v + 1.5 for v in x])      # nonzero mean
    return rows


class TestPCAFit:
    def test_matches_numpy_reference(self, spark):
        X = _data()
        df = spark.createDataFrame([(i, x) for i, x in enumerate(X)],
                                   "vec_id long, embedding array<double>")
        mean, comps, ev = pca_fit(df, k=3)
        mean2, comps2, ev2 = pca_reference(X, k=3)
        assert max(abs(a - b) for a, b in zip(mean, mean2)) < 1e-9
        assert all(abs(a - b) < 1e-6 for a, b in zip(ev, ev2))
        for c1, c2 in zip(comps, comps2):
            assert max(abs(a - b) for a, b in zip(c1, c2)) < 1e-6

    def test_variance_ordering_and_orthonormal(self, spark):
        import numpy as np
        X = _data()
        df = spark.createDataFrame([(i, x) for i, x in enumerate(X)],
                                   "vec_id long, embedding array<double>")
        _, comps, ev = pca_fit(df, k=4)
        assert ev == sorted(ev, reverse=True)
        C = np.asarray(comps)
        G = C @ C.T
        assert np.allclose(G, np.eye(4), atol=1e-9)

    def test_null_vectors_ignored_and_errors(self, spark):
        X = _data(n=20)
        rows = [(i, x) for i, x in enumerate(X)] + [(99, None)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        mean, _, _ = pca_fit(df, k=2)
        mean2, _, _ = pca_reference(X, k=2)
        assert max(abs(a - b) for a, b in zip(mean, mean2)) < 1e-9
        with pytest.raises(ValueError):
            pca_fit(df, k=0)
        empty = spark.createDataFrame([], "embedding array<double>")
        with pytest.raises(ValueError):
            pca_fit(empty, k=1)


class TestPCATransform:
    def test_projection_matches_numpy(self, spark):
        import numpy as np
        X = _data(n=50)
        df = spark.createDataFrame([(i, x) for i, x in enumerate(X)],
                                   "vec_id long, embedding array<double>")
        mean, comps, ev = pca_fit(df, k=3)
        out = {r["vec_id"]: r["reduced"] for r in
               pca_transform(df, mean, comps).collect()}
        M = np.asarray(comps)
        mu = np.asarray(mean)
        for i, x in enumerate(X):
            want = (np.asarray(x) - mu) @ M.T
            assert np.allclose(out[i], want, atol=1e-9)

    def test_whitening_unit_variance(self, spark):
        import numpy as np
        X = _data(n=300)
        df = spark.createDataFrame([(i, x) for i, x in enumerate(X)],
                                   "vec_id long, embedding array<double>")
        mean, comps, ev = pca_fit(df, k=2)
        out = pca_transform(df, mean, comps, whiten=True,
                            explained_variance=ev).collect()
        Z = np.stack([r["reduced"] for r in out])
        assert np.allclose(Z.var(axis=0), 1.0, atol=0.05)
        with pytest.raises(ValueError):
            pca_transform(df, mean, comps, whiten=True)

    def test_null_passthrough(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None)],
            "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r["reduced"] for r in
               pca_transform(df, [0.0, 0.0],
                             [[1.0, 0.0]]).collect()}
        assert out[1] == [1.0] and out[2] is None

    def test_ann_recall_preserved_on_low_rank_data(self, spark):
        """When embeddings HAVE low-rank structure (the regime PCA
        exists for — model embeddings concentrate variance), reducing
        32 dims to the 6-dim latent rank keeps brute-force cosine
        top-k neighbors nearly intact. (On isotropic noise PCA cannot
        and should not preserve neighbors — verified while writing
        this test against the synthetic random embeddings table.)"""
        import numpy as np

        from nifi_extracttext_processor_spark.operators.similarity import (
            brute_force_topk,
        )
        rng = np.random.default_rng(11)
        latent = rng.normal(size=(300, 6))
        proj = rng.normal(size=(6, 32))
        X = latent @ proj + 0.02 * rng.normal(size=(300, 32))
        emb = spark.createDataFrame(
            [(i, x.tolist()) for i, x in enumerate(X)],
            "vec_id long, embedding array<double>")
        mean, comps, ev = pca_fit(emb, k=6)
        red = pca_transform(emb, mean, comps, out_col="r").select(
            "vec_id", F.col("r").alias("embedding"))
        q = X[3].tolist()
        qr = pca_transform(
            spark.createDataFrame([(0, q)],
                                  "i long, embedding array<double>"),
            mean, comps, out_col="r").first()["r"]
        full = [r["vec_id"] for r in
                brute_force_topk(emb, q, k=8).collect()]
        reduced = [r["vec_id"] for r in
                   brute_force_topk(red, list(qr), k=8).collect()]
        overlap = len(set(full) & set(reduced)) / 8
        assert overlap >= 0.75


class TestPcaExprTwin:
    def test_expr_path_matches_arrow_kernel(self, spark):
        """The unrolled-Catalyst projection (pca_transform_expr — the
        oracle-replayable path) must agree with the Arrow matmul
        kernel (pca_transform — the big-k production path) on the
        same (mean, components): numpy's BLAS dot may associate
        differently from the left fold, so equality is asserted to
        1e-9, then the 4dp round used by the driver row is asserted
        exactly."""
        from nifi_extracttext_processor_spark.operators.reduction import (
            pca_transform,
            pca_transform_expr,
        )
        import random
        rng = random.Random(5)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(16)])
             for i in range(50)],
            "vec_id long, embedding array<float>")
        mean = [round(rng.uniform(-0.1, 0.1), 6) for _ in range(16)]
        comps = [[round(rng.uniform(-0.5, 0.5), 6) for _ in range(16)]
                 for _ in range(3)]
        a = {r["vec_id"]: [r["pc1"], r["pc2"], r["pc3"]]
             for r in pca_transform_expr(emb, mean, comps).collect()}
        b = {r["vec_id"]: r["reduced"]
             for r in pca_transform(emb, mean, comps,
                                    out_col="reduced").collect()}
        for k in a:
            for x, y in zip(a[k], b[k]):
                assert abs(x - y) < 1e-9, (k, a[k], b[k])

    def test_expr_twin_duckdb_bit_exact(self, spark):
        """pca_project_sql replays pca_transform_expr bit-for-bit
        (incl. the -0.0 normalization after round)."""
        import duckdb

        from nifi_extracttext_processor_spark.operators.reduction import (
            pca_project_sql,
            pca_transform_expr,
        )
        import random
        rng = random.Random(9)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
                for i in range(40)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        mean = [0.0] * 8
        comps = [[round(rng.uniform(-0.3, 0.3), 6) for _ in range(8)],
                 [0.0] * 8]  # degenerate all-zero component too
        got = sorted(map(tuple, pca_transform_expr(
            emb, mean, comps, round_dp=4).drop("embedding")
            .collect()))
        con = duckdb.connect()
        con.register("t", emb.toPandas())
        want = sorted(con.execute(
            pca_project_sql("t", mean, comps, round_dp=4)).fetchall())
        assert got == want
