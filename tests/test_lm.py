"""Char n-gram LM quality scoring: hand-computed goldens, DuckDB
parity on a dirty fixture, outlier behavior, and plan shape
(broadcast joins, no UDF)."""

from __future__ import annotations

import math

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators import lm


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(1, "ababab"), (2, "abab"), (3, "zzzz"),
            (4, "a"), (5, None), (6, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTrain:
    def test_counts_contexts_vocab(self, spark, tiny):
        counts, ctx, v = lm.train_char_lm(tiny, n=2)
        got = {r["ngram"]: r["cnt"] for r in counts.collect()}
        # "ababab": ab*3 ba*2; "abab": ab*2 ba*1; "zzzz": zz*3
        assert got == {"ab": 5, "ba": 3, "zz": 3}
        cgot = {r["ctx"]: r["ctx_cnt"] for r in ctx.collect()}
        # 1-char contexts = all chars: a*6 b*5 z*4  ("a" adds one a)
        assert cgot == {"a": 6, "b": 5, "z": 4}
        assert v == 3

    def test_top_k_cap(self, spark, tiny):
        counts, _, _ = lm.train_char_lm(tiny, n=2, top_k=1)
        rows = counts.collect()
        assert len(rows) == 1 and rows[0]["ngram"] == "ab"


class TestScore:
    def test_hand_computed_nll(self, spark, tiny):
        out = {r["doc_id"]: r for r in
               lm.char_lm_self_score(tiny, n=2, k=1.0).collect()}
        # model: c(ab)=5 c(ba)=3 c(zz)=3; ctx a=6 b=5 z=4; V=3
        p_ab = (5 + 1) / (6 + 3)
        p_ba = (3 + 1) / (5 + 3)
        p_zz = (3 + 1) / (4 + 3)
        nll_1 = -(3 * math.log(p_ab) + 2 * math.log(p_ba)) / 5
        nll_3 = -math.log(p_zz)
        assert out[1]["nll"] == pytest.approx(round(nll_1, 6), abs=2e-6)
        assert out[3]["nll"] == pytest.approx(round(nll_3, 6), abs=2e-6)
        assert out[1]["n_ngrams"] == 5 and out[3]["n_ngrams"] == 3

    def test_short_and_null_docs_score_null(self, spark, tiny):
        out = {r["doc_id"]: r for r in
               lm.char_lm_self_score(tiny, n=2).collect()}
        for d in (4, 5, 6):
            assert out[d]["nll"] is None
            assert out[d]["n_ngrams"] == 0
        assert len(out) == 6  # nothing vanishes

    def test_outlier_scores_higher(self, spark):
        rows = [(i, "the quick brown fox jumps over the lazy dog")
                for i in range(20)]
        rows.append((99, "zqxjkvwpyg mzxqjw vvkkpp"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["nll"] for r in
               lm.char_lm_self_score(df, n=3).collect()}
        assert out[99] > out[0] + 1.0

    def test_unseen_ngrams_still_score(self, spark, tiny):
        counts, ctx, v = lm.train_char_lm(tiny, n=2)
        probe = spark.createDataFrame([(7, "qq")],
                                      "doc_id long, text string")
        (row,) = lm.lm_score(probe, counts, ctx, v, n=2).collect()
        # c=0, ctx unseen: p = 1 / (0 + 3) with k=1, V=3
        assert row["nll"] == pytest.approx(round(-math.log(1 / 3), 6),
                                           abs=2e-6)


class TestParityAndPlan:
    def test_duckdb_parity_dirty_fixture(self, spark):
        rows = [(1, "hello world"), (2, "hello there world"),
                (3, "héllo wörld ünicode"), (4, "aaa"), (5, ""),
                (6, None), (7, "x"), (8, "the the the the"),
                (9, "punct!!! ??? ..."), (10, "MiXeD CaSe TeXt")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_ngrams"], r["nll"]) for r in
               lm.char_lm_self_score(df, n=3).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = {int(r[0]): (int(r[1]), r[2]) for r in con.execute(
            lm.char_lm_score_sql(n=3)).fetchall()}
        assert set(got) == set(want)
        for d in got:
            assert got[d][0] == want[d][0], d
            if want[d][1] is None:
                assert got[d][1] is None, d
            else:
                assert got[d][1] == pytest.approx(want[d][1],
                                                  abs=2e-6), d

    def test_plan_broadcast_no_udf(self, spark, tiny):
        out = lm.char_lm_self_score(tiny, n=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
            assert bad not in plan, bad


class TestBuckets:
    def test_exact_thirds_and_duckdb_parity(self, spark):
        # increasing amounts of rare bigrams → strictly distinct nll
        rows = ([(i, "the quick brown fox jumps " + "zq" * i)
                 for i in range(9)] + [(90, "x"), (91, None)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from nifi_extracttext_processor_spark.operators.lm import (
            char_lm_self_score, lm_buckets, lm_buckets_sql,
        )
        out = lm_buckets(char_lm_self_score(df, n=3), mode="exact")
        got = {r["doc_id"]: r["lm_bucket"] for r in out.collect()}
        assert got[90] is None and got[91] is None
        import duckdb
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = {int(r[0]): r[3] for r in
                con.execute(lm_buckets_sql(n=3)).fetchall()}
        want = {k: (None if v is None else v) for k, v in want.items()}
        assert got == want
        from collections import Counter
        c = Counter(v for v in got.values() if v)
        assert c["head"] == 3 and c["middle"] == 3 and c["tail"] == 3

    def test_approx_matches_exact_on_separated_scores(self, spark):
        rows = ([(i, "common english text the and of a %d" % i)
                 for i in range(20)]
                + [(100 + i, "zzqx jjww vvkk %d" % i)
                   for i in range(10)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from nifi_extracttext_processor_spark.operators.lm import (
            char_lm_self_score, lm_buckets,
        )
        scored = char_lm_self_score(df, n=3).cache()
        exact = {r["doc_id"]: r["lm_bucket"] for r in
                 lm_buckets(scored, mode="exact").collect()}
        approx = {r["doc_id"]: r["lm_bucket"] for r in
                  lm_buckets(scored, mode="approx").collect()}
        agree = sum(1 for k in exact if exact[k] == approx[k])
        assert agree >= len(exact) - 2  # boundary ties may differ
        # the gibberish cluster must be tail in both modes
        assert all(exact[100 + i] == "tail" for i in range(10))
        assert all(approx[100 + i] == "tail" for i in range(10))

    def test_bad_mode(self, spark):
        from nifi_extracttext_processor_spark.operators.lm import lm_buckets
        df = spark.createDataFrame([(1, 0.5)], "doc_id long, nll double")
        import pytest as pt
        with pt.raises(ValueError, match="mode"):
            lm_buckets(df, mode="nope")


class TestBucketReviewFixes:
    def test_approx_mode_total_on_all_null_scores(self, spark):
        from nifi_extracttext_processor_spark.operators.lm import lm_buckets
        df = spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, nll double")
        rows = lm_buckets(df, mode="approx").collect()
        assert len(rows) == 2
        assert all(r["lm_bucket"] is None for r in rows)
        # and on a fully empty frame
        empty = df.limit(0)
        assert lm_buckets(empty, mode="approx").count() == 0


class TestTrainFusedSinglePass:
    """r17: train_char_lm derives ctx + vocab from the n-gram count
    table plus per-doc tail projections (one corpus explode instead of
    three). These pin count-exact equality against the old three-pass
    form on adversarial lengths (empty / NULL / len < n / len == n-1 /
    len == n / unicode / single char appearing only in a tail)."""

    def _old_train(self, df, text_col, n):
        from pyspark.sql import functions as F

        from nifi_extracttext_processor_spark.operators.lm import (
            _exploded_char_ngrams,
        )
        grams = _exploded_char_ngrams(df, text_col, n)
        counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt"))
        ctx = (_exploded_char_ngrams(df, text_col, n - 1, alias="ctx")
               .groupBy("ctx").agg(F.count("*").alias("ctx_cnt")))
        vocab = (_exploded_char_ngrams(df, text_col, 1, alias="ch")
                 .agg(F.countDistinct("ch").alias("v"))
                 .collect()[0]["v"])
        return counts, ctx, int(vocab)

    def test_counts_ctx_vocab_identical(self, spark):
        from nifi_extracttext_processor_spark.operators.lm import (
            train_char_lm,
        )
        rows = [("",), (None,), ("a",), ("ab",), ("abc",), ("abcd",),
                ("ümläut",), ("xx",), ("x",), ("aaaa",),
                ("the quick brown fox",), ("Q",)]
        df = spark.createDataFrame(rows, "text string")
        for n in (2, 3, 4):
            nc, nx, nv = train_char_lm(df, "text", n=n)
            oc, ox, ov = self._old_train(df, "text", n)
            assert sorted(map(tuple, nc.collect())) == \
                sorted(map(tuple, oc.collect())), f"counts n={n}"
            assert sorted(map(tuple, nx.collect())) == \
                sorted(map(tuple, ox.collect())), f"ctx n={n}"
            assert nv == ov, f"vocab n={n}"
            assert dict(nc.dtypes) == dict(oc.dtypes)
            assert dict(nx.dtypes) == dict(ox.dtypes)

    def test_top_k_applies_after_full_ctx(self, spark):
        from nifi_extracttext_processor_spark.operators.lm import (
            train_char_lm,
        )
        df = spark.createDataFrame(
            [("ababab",), ("zzz",)], "text string")
        nc, nx, nv = train_char_lm(df, "text", n=3, top_k=1)
        oc, ox, ov = self._old_train(df, "text", 3)
        # counts: only the single most frequent n-gram survives
        assert nc.count() == 1
        # ctx stays COMPLETE (derived from the pre-limit table)
        assert sorted(map(tuple, nx.collect())) == \
            sorted(map(tuple, ox.collect()))
        assert nv == ov
