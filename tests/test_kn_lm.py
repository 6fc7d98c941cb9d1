"""Interpolated Kneser-Ney bigram LM (operators/kn_lm.py): golden vs
an independent pure-Python implementation, the continuation-prob
("San Francisco") property, DuckDB train+score parity, vocab cap,
and plan shape."""
from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.kn_lm import (
    BOS,
    UNK,
    kn_score,
    kn_score_sql,
    train_kn_bigram,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "a cat and a dog played"),
    (3, "the cat chased the dog"),
    (4, "san francisco is foggy"),
    (5, "san francisco is hilly"),
    (6, "the mat and the rug"),
]


def _df(spark, rows=None):
    return spark.createDataFrame(rows or CORPUS,
                                 "doc_id long, text string")


def _py_kn(train_texts, score_texts, d=0.75):
    """Independent plain-loop interpolated KN bigram scorer."""
    bigrams: dict[tuple[str, str], int] = {}
    for t in train_texts:
        ws = t.lower().split()
        prev = BOS
        for w in ws:
            bigrams[(prev, w)] = bigrams.get((prev, w), 0) + 1
            prev = w
    c1: dict[str, int] = {}
    nf: dict[str, int] = {}
    nc: dict[str, int] = {}
    for (w1, w2), c in bigrams.items():
        c1[w1] = c1.get(w1, 0) + c
        nf[w1] = nf.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    b = len(bigrams)
    v = len(nc)

    def pcont(w):
        return (nc.get(w, 0) + 1.0) / (b + v + 1.0)

    def p(w1, w2):
        if w1 not in c1:
            return pcont(w2)
        return (max(bigrams.get((w1, w2), 0) - d, 0.0) / c1[w1]
                + d * nf[w1] / c1[w1] * pcont(w2))

    out = []
    for t in score_texts:
        ws = t.lower().split()
        if not ws:
            out.append((0, None))
            continue
        prev = BOS
        logs = []
        for w in ws:
            logs.append(math.log(p(prev, w)))
            prev = w
        out.append((len(ws), round(-sum(logs) / len(logs), 6)))
    return out


class TestGolden:
    def test_matches_independent_python(self, spark):
        df = _df(spark)
        model = train_kn_bigram(df)
        got = {r["doc_id"]: (r["n_bigrams"], r["kn_nll"])
               for r in kn_score(df, model).collect()}
        want = _py_kn([t for _, t in CORPUS], [t for _, t in CORPUS])
        for i, (n, nll) in enumerate(want):
            assert got[i][0] == n, i
            assert got[i][1] == pytest.approx(nll, abs=2e-6), i

    def test_probabilities_sum_near_one(self, spark):
        """Σ_w2 P(w2 | w1) over the model vocab (+unseen floor mass)
        stays ~1 for an observed context — the interpolation is a
        proper redistribution, not an ad-hoc mix."""
        df = _df(spark)
        bigrams, contexts, conts, b, v, d, _ = train_kn_bigram(df)
        rows = {(r["w1"], r["w2"]): r["c12"]
                for r in bigrams.collect()}
        c1 = {r["w1"]: (r["c1"], r["nf"])
              for r in contexts.collect()}
        nc = {r["w2"]: r["nc"] for r in conts.collect()}
        vocab = sorted(nc)

        def pcont(w):
            return (nc.get(w, 0) + 1.0) / (b + v + 1.0)

        for w1 in ("the", "cat", BOS):
            tot, nf_ = c1[w1]
            s = sum(max(rows.get((w1, w2), 0) - d, 0.0) / tot
                    + d * nf_ / tot * pcont(w2) for w2 in vocab)
            # the add-one floor slightly over-allocates; within the
            # (V+1)/(B+V+1) slack of exactly 1
            assert 0.9 < s < 1.1, w1

    def test_san_francisco_property(self, spark):
        """'francisco' is frequent but follows ONLY 'san' — as a novel
        continuation it must be less likely than a same-frequency word
        seen after many contexts."""
        rows = [(i, "san francisco") for i in range(10)]
        rows += [(100 + i, t) for i, t in enumerate(
            ["the cat", "a cat", "my cat", "that cat", "one cat",
             "her cat", "his cat", "our cat", "your cat", "some cat"])]
        df = _df(spark, rows)
        model = train_kn_bigram(df)
        _, _, conts, b, v, _, _ = model
        nc = {r["w2"]: r["nc"] for r in conts.collect()}
        # both words appear 10 times, but continuation counts differ
        assert nc["francisco"] == 1 and nc["cat"] == 10
        # novel-context probability orders by continuation count
        probe = _df(spark, [(0, "zzz francisco"), (1, "zzz cat")])
        got = {r["doc_id"]: r["kn_nll"]
               for r in kn_score(probe, model).collect()}
        assert got[1] < got[0]   # cat cheaper than francisco

    def test_shuffled_text_scores_worse(self, spark):
        df = _df(spark)
        model = train_kn_bigram(df)
        probe = _df(spark, [
            (0, "the cat sat on the rug"),           # natural
            (1, "rug the on sat cat the")])          # shuffled
        got = {r["doc_id"]: r["kn_nll"]
               for r in kn_score(probe, model).collect()}
        assert got[0] < got[1]


class TestParity:
    def test_duckdb_train_and_score(self, spark):
        import pandas as pd
        df = _df(spark)
        model = train_kn_bigram(df.filter("doc_id % 2 = 0"))
        got = sorted(tuple(r) for r in kn_score(df, model).collect())
        con = duckdb.connect()
        con.register("documents",
                     pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        want = sorted(tuple(r) for r in con.execute(kn_score_sql(
            "documents", ref_pred="doc_id % 2 = 0")).fetchall())
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1] == w[1]
            assert g[2] == pytest.approx(w[2], abs=2e-6)


class TestVocabCap:
    def test_cap_maps_oov_to_unk(self, spark):
        df = _df(spark)
        model = train_kn_bigram(df, max_vocab=5)
        bigrams = model[0]
        words = {r["w1"] for r in bigrams.collect()} \
            | {r["w2"] for r in bigrams.collect()}
        assert UNK in words
        assert len(words - {BOS, UNK}) <= 5
        # scoring applies the same mapping: an OOV-heavy doc scores
        # through the unk mass, deterministically
        probe = _df(spark, [(0, "qqq www eee")])
        a = kn_score(probe, model).collect()[0]["kn_nll"]
        b_ = kn_score(probe, model).collect()[0]["kn_nll"]
        assert a == b_ and a is not None

    def test_validation(self, spark):
        df = _df(spark)
        with pytest.raises(ValueError, match="discount"):
            train_kn_bigram(df, discount=1.5)
        with pytest.raises(ValueError, match="max_vocab"):
            train_kn_bigram(df, max_vocab=0)


class TestEdgesAndPlan:
    def test_empty_doc(self, spark):
        df = _df(spark)
        model = train_kn_bigram(df)
        probe = _df(spark, [(0, ""), (1, "   "), (2, "the cat")])
        got = {r["doc_id"]: (r["n_bigrams"], r["kn_nll"])
               for r in kn_score(probe, model).collect()}
        assert got[0] == (0, None) and got[1] == (0, None)
        assert got[2][0] == 2 and got[2][1] is not None

    def test_plan_broadcast_no_udf(self, spark):
        df = _df(spark)
        model = train_kn_bigram(df)
        plan = kn_score(df, model)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert plan.count("BroadcastHashJoin") >= 3


class TestPersistence:
    def test_save_load_byte_identical(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            load_kn_bigram, save_kn_bigram,
        )
        df = _df(spark)
        model = train_kn_bigram(df, max_vocab=8)
        p = str(tmp_path / "kn")
        save_kn_bigram(p, model)
        fresh = spark.newSession()
        m2 = load_kn_bigram(fresh, p)
        probe = fresh.createDataFrame(
            CORPUS, "doc_id long, text string")
        a = sorted(tuple(r) for r in kn_score(_df(spark),
                                              model).collect())
        b = sorted(tuple(r) for r in kn_score(probe, m2).collect())
        assert a == b
        assert m2[6] == model[6]          # capped vocab survives

    def test_wrong_type_raises(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.models import (
            load_kn_bigram, save_bpe,
        )
        p = str(tmp_path / "notkn")
        save_bpe(spark, p, [("a", "b")])
        with pytest.raises(ValueError, match="kn_bigram"):
            load_kn_bigram(spark, p)
