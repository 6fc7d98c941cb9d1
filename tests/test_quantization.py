"""Product quantization (operators/quantization.py): encode goldens
vs an independent numpy argmin, literal≡arrow equivalence, ADC recall
against brute force, and DuckDB parity of codes + top-k.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.quantization import (
    _adc_lut,
    pq_codes_sql,
    pq_encode,
    pq_topk,
    pq_topk_sql,
    pq_train,
)


def _vecs(spark, n=60, dim=16, n_clusters=4):
    """Clustered synthetic embeddings: cluster c centers at c*10 on
    every dim, plus a small deterministic wiggle."""
    rows = []
    for i in range(n):
        c = i % n_clusters
        rows.append((i, [float(c * 10 + ((i * 7 + j * 3) % 5) / 10.0)
                         for j in range(dim)]))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


class TestPqEncode:
    def test_matches_independent_numpy(self, spark):
        import numpy as np
        df = _vecs(spark)
        books = pq_train(df, m=4, k=4, iters=2)
        got = {r["vec_id"]: list(r["codes"]) for r in
               pq_encode(df, books, encode="literal").collect()}
        b = np.asarray(books)            # (m, k, dsub)
        for row in df.collect():
            x = np.asarray(row["embedding"]).reshape(4, -1)
            want = list(((x[:, None, :] - b) ** 2).sum(2).argmin(1))
            assert got[row["vec_id"]] == [int(w) for w in want], \
                row["vec_id"]

    def test_literal_equals_arrow(self, spark):
        df = _vecs(spark)
        books = pq_train(df, m=4, k=4)
        lit = sorted((r["vec_id"], tuple(r["codes"])) for r in
                     pq_encode(df, books, encode="literal").collect())
        arw = sorted((r["vec_id"], tuple(r["codes"])) for r in
                     pq_encode(df, books, encode="arrow").collect())
        assert lit == arw

    def test_auto_dispatch_and_bad_args(self, spark):
        from nifi_extracttext_processor_spark.operators.quantization import (
            _resolve_encode,
        )
        assert _resolve_encode("auto", 8, 16, 8) == "literal"
        assert _resolve_encode("auto", 8, 256, 8) == "arrow"
        with pytest.raises(ValueError):
            _resolve_encode("banana", 1, 1, 1)
        df = _vecs(spark, dim=10)
        with pytest.raises(ValueError, match="divisible"):
            pq_train(df, m=4)


class TestPqSearch:
    def test_adc_top1_recall_on_clustered_data(self, spark):
        """On well-separated clusters PQ must rank a same-cluster
        vector first for every probe."""
        df = _vecs(spark, n=80, dim=16, n_clusters=4)
        books = pq_train(df, m=4, k=8, iters=3)
        codes = pq_encode(df, books)
        probes = {r["vec_id"]: r["embedding"]
                  for r in df.filter("vec_id < 4").collect()}
        for qid, q in probes.items():
            top = pq_topk(codes, books, q, k=3).collect()
            # the probe itself is in the corpus: distance 0-ish first
            assert top[0]["vec_id"] % 4 == qid % 4
            assert top[0]["adc_dist"] <= top[-1]["adc_dist"]

    def test_compression_vs_exact_distance(self, spark):
        """ADC distance approximates the true squared distance —
        within the quantization error bound on this data."""
        import numpy as np
        df = _vecs(spark, n=40, dim=16)
        books = pq_train(df, m=8, k=8, iters=3)
        codes = pq_encode(df, books)
        q = [5.0] * 16
        adc = {r["vec_id"]: r["adc_dist"] for r in
               pq_topk(codes, books, q, k=40).collect()}
        for row in df.collect():
            true = float(np.sum((np.asarray(row["embedding"])
                                 - np.asarray(q)) ** 2))
            assert adc[row["vec_id"]] == pytest.approx(true, rel=0.3,
                                                       abs=20.0)

    def test_bad_query_dim(self, spark):
        df = _vecs(spark)
        books = pq_train(df, m=4, k=4)
        with pytest.raises(ValueError, match="query dim"):
            _adc_lut(books, [1.0] * 7)
        with pytest.raises(ValueError):
            pq_topk(pq_encode(df, books), books, [0.0] * 16, k=0)


class TestPqParity:
    def test_codes_and_topk_match_duckdb(self, spark):
        import duckdb
        df = _vecs(spark, n=50, dim=16)
        books = pq_train(df, m=4, k=4, iters=2)
        con = duckdb.connect()
        con.register("embeddings", df.toPandas())
        got_codes = sorted((r["vec_id"], tuple(r["codes"])) for r in
                           pq_encode(df, books,
                                     encode="literal").collect())
        want_codes = sorted((r[0], tuple(r[1])) for r in con.execute(
            pq_codes_sql(books)).fetchall())
        assert got_codes == want_codes
        q = [3.0] * 16
        got = [(r["vec_id"], r["adc_dist"]) for r in
               pq_topk(pq_encode(df, books, encode="literal"),
                       books, q, k=7).collect()]
        want = [tuple(r) for r in con.execute(
            pq_topk_sql(books, q, k=7)).fetchall()]
        assert got == want


class TestPqPlanShape:
    def test_zero_udf_takeordered(self, spark):
        df = _vecs(spark)
        books = pq_train(df, m=4, k=4)
        plan = pq_topk(pq_encode(df, books, encode="literal"),
                       books, [0.0] * 16, k=5)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan.replace("TakeOrdered", "")


class TestIvfPq:
    def test_nprobe_all_equals_flat_pq(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.quantization import (
            build_ivfpq_index, ivfpq_topk_indexed, pq_encode,
        )
        df = _vecs(spark, n=60, dim=16, n_clusters=4)
        books = pq_train(df, m=4, k=4, iters=2)
        path = str(tmp_path / "ivfpq")
        build_ivfpq_index(df, path, books, n_cells=4)
        q = [12.0] * 16
        flat = [(r["vec_id"], r["adc_dist"]) for r in
                pq_topk(pq_encode(df, books), books, q, k=10).collect()]
        idx = [(r["vec_id"], r["adc_dist"]) for r in
               ivfpq_topk_indexed(spark, path, q, k=10,
                                  nprobe=4).collect()]
        assert idx == flat

    def test_partition_pruning_and_small_probe(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.quantization import (
            build_ivfpq_index, ivfpq_topk_indexed,
        )
        # DIRECTION-separated clusters (the coarse stage is cosine):
        # cluster c has mass on dims [4c, 4c+4)
        rows = []
        for i in range(80):
            c = i % 4
            v = [0.05] * 16
            for j in range(4 * c, 4 * c + 4):
                v[j] = 1.0 + ((i * 7 + j) % 5) / 20.0
            rows.append((i, v))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        books = pq_train(df, m=4, k=8, iters=3)
        cents = [[1.0 if 4 * c <= j < 4 * c + 4 else 0.0
                  for j in range(16)] for c in range(4)]
        path = str(tmp_path / "ivfpq2")
        build_ivfpq_index(df, path, books, n_cells=4,
                          cell_centroids=cents)
        q = [1.0 if 8 <= j < 12 else 0.02 for j in range(16)]  # c=2
        out = ivfpq_topk_indexed(spark, path, q, k=5, nprobe=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "cell" in plan.split("PartitionFilters:")[1][:200]
        rows = out.collect()
        assert rows and all(r["vec_id"] % 4 == 2 for r in rows)

    def test_codebooks_save_load_roundtrip(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            load_pq, save_pq,
        )
        df = _vecs(spark, n=40, dim=16)
        books = pq_train(df, m=4, k=4)
        path = str(tmp_path / "pqmodel")
        save_pq(spark, path, books)
        fresh = spark.newSession()
        b2 = load_pq(fresh, path)
        assert b2 == books
        df2 = _vecs(fresh, n=40, dim=16)
        a = sorted((r["vec_id"], tuple(r["codes"])) for r in
                   pq_encode(df, books).collect())
        b = sorted((r["vec_id"], tuple(r["codes"])) for r in
                   pq_encode(df2, b2).collect())
        assert a == b


def _iid_vecs(spark, n=100, dim=16):
    """Deterministic pseudo-random i.i.d. vectors — the ADC
    worst case (no cluster structure for the codebooks to exploit),
    where un-refined recall measurably degrades."""
    import random
    rng = random.Random(42)
    rows = [(i, [round(rng.uniform(-1, 1), 6) for _ in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


class TestL2Training:
    def test_l2_lloyd_matches_numpy(self, spark):
        """kmeans_fit(metric='l2') replays an independent numpy
        Euclidean Lloyd loop exactly (same init, same round-6
        update, first-min assignment)."""
        import numpy as np
        from nifi_extracttext_processor_spark.operators.clustering import (
            kmeans_fit,
        )
        df = _iid_vecs(spark, n=40, dim=4)
        got = kmeans_fit(df, k=4, iters=3, metric="l2")
        rows = sorted((r["vec_id"], r["embedding"])
                      for r in df.collect())
        X = np.asarray([v for _, v in rows])
        cents = X[:4].copy()
        for _ in range(3):
            d = np.round(
                ((X[:, None, :] - cents[None, :, :]) ** 2).sum(2), 6)
            a = d.argmin(1)
            for c in range(4):
                if (a == c).any():
                    cents[c] = np.round(X[a == c].mean(0), 6)
        flat_got = [x for c in got for x in c]
        flat_want = [x for c in cents.tolist() for x in c]
        assert flat_got == pytest.approx(flat_want, abs=1e-9)

    def test_l2_literal_equals_arrow(self, spark):
        from nifi_extracttext_processor_spark.operators.clustering import (
            _assign,
        )
        df = _iid_vecs(spark, n=50, dim=8)
        v = df.select("vec_id", F.col("embedding").alias("v"))
        cents = [r["embedding"] for r in
                 df.orderBy("vec_id").limit(5).collect()]
        lit = sorted((r["vec_id"], r["cluster"]) for r in
                     _assign(v, cents, "literal", metric="l2").collect())
        arw = sorted((r["vec_id"], r["cluster"]) for r in
                     _assign(v, cents, "arrow", metric="l2").collect())
        assert lit == arw

    def test_bad_metric_raises(self, spark):
        from nifi_extracttext_processor_spark.operators.clustering import (
            _assign,
        )
        df = _iid_vecs(spark, n=5, dim=4)
        v = df.select("vec_id", F.col("embedding").alias("v"))
        with pytest.raises(ValueError, match="metric"):
            _assign(v, [[0.0] * 4], "literal", metric="manhattan")


class TestPqRefine:
    def _recall(self, got_ids, want_ids):
        return len(set(got_ids) & set(want_ids)) / len(want_ids)

    def test_refine_restores_recall(self, spark):
        """The faiss re-rank pattern: ADC alone loses recall on
        i.i.d. data at high compression; refine at c=4 recovers
        near-brute-force."""
        import numpy as np
        df = _iid_vecs(spark, n=120, dim=16)
        books = pq_train(df, m=8, k=16, iters=3)
        codes = pq_encode(df, books)
        q = [0.3, -0.2] * 8
        rows = sorted((r["vec_id"], r["embedding"])
                      for r in df.collect())
        X = np.asarray([v for _, v in rows])
        true = np.argsort(((X - np.asarray(q)) ** 2).sum(1),
                          kind="stable")[:10].tolist()
        adc_ids = [r["vec_id"] for r in
                   pq_topk(codes, books, q, k=10).collect()]
        ref = pq_topk(codes, books, q, k=10, refine_mult=4,
                      vectors_df=df).collect()
        ref_ids = [r["vec_id"] for r in ref]
        assert self._recall(ref_ids, true) >= 0.9
        assert self._recall(ref_ids, true) >= self._recall(adc_ids,
                                                           true)
        # exact distances come back ascending and truly exact
        for r in ref:
            want = float(((np.asarray(
                dict(rows)[r["vec_id"]]) - np.asarray(q)) ** 2).sum())
            assert r["exact_dist"] == pytest.approx(want, abs=1e-5)

    def test_refine_duckdb_parity(self, spark):
        import duckdb
        from nifi_extracttext_processor_spark.operators.quantization import (
            pq_topk_refine_sql,
        )
        df = _iid_vecs(spark, n=60, dim=16)
        books = pq_train(df, m=4, k=4, iters=2)
        codes = pq_encode(df, books, encode="literal")
        q = [0.1 * ((j % 5) - 2) for j in range(16)]
        got = [(r["vec_id"], r["adc_dist"], r["exact_dist"]) for r in
               pq_topk(codes, books, q, k=7, refine_mult=3,
                       vectors_df=df).collect()]
        con = duckdb.connect()
        con.register("embeddings", df.toPandas())
        want = [tuple(r) for r in con.execute(
            pq_topk_refine_sql(books, q, k=7, refine_mult=3)
        ).fetchall()]
        assert got == want

    def test_refine_validation(self, spark):
        df = _iid_vecs(spark, n=10, dim=16)
        books = pq_train(df, m=4, k=2)
        codes = pq_encode(df, books)
        with pytest.raises(ValueError, match="sidecar"):
            pq_topk(codes, books, [0.0] * 16, refine_mult=2)
        with pytest.raises(ValueError, match="refine_mult"):
            pq_topk(codes, books, [0.0] * 16, refine_mult=0,
                    vectors_df=df)

    def test_refine_broadcasts_candidates(self, spark):
        """Plan shape: the c·k candidate side is broadcast — the
        vector sidecar never shuffles."""
        df = _iid_vecs(spark, n=30, dim=16)
        books = pq_train(df, m=4, k=2)
        codes = pq_encode(df, books)
        plan = pq_topk(codes, books, [0.0] * 16, k=5, refine_mult=2,
                       vectors_df=df)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_ivfpq_refine_nprobe_all_equals_flat(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.quantization import (
            build_ivfpq_index, ivfpq_topk_indexed,
        )
        df = _iid_vecs(spark, n=60, dim=16)
        books = pq_train(df, m=4, k=4, iters=2)
        path = str(tmp_path / "ivfpq_ref")
        build_ivfpq_index(df, path, books, n_cells=4,
                          store_vectors=True)
        q = [0.25] * 16
        flat = [(r["vec_id"], r["exact_dist"]) for r in
                pq_topk(pq_encode(df, books), books, q, k=8,
                        refine_mult=3, vectors_df=df).collect()]
        idx = [(r["vec_id"], r["exact_dist"]) for r in
               ivfpq_topk_indexed(spark, path, q, k=8, nprobe=4,
                                  refine_mult=3).collect()]
        assert idx == flat
