"""Real BPE: hand-computed merges on the canonical corpus,
determinism, encode round-trip, Spark e2e with sampling."""

from __future__ import annotations

import pytest

from nifi_extracttext_processor_spark.operators import tokenize as T


class TestTrainLocal:
    def test_canonical_corpus_first_merges(self):
        # Sennrich et al. example shape: low/lower/newest/widest
        counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = T.bpe_train_from_counts(counts, 10)
        # the est</w> chain dominates at count 9 (newest+widest); the
        # 9-way tie resolves to the lexicographically largest pair, so
        # the chain builds right-to-left deterministically
        assert merges[0] == ("t", "</w>")
        assert merges[1] == ("s", "t</w>")
        assert merges[2] == ("e", "st</w>")
        # 'ow' chain (low+lower = 7) comes next
        assert merges[3] == ("o", "w")
        assert merges[4] == ("l", "ow")

    def test_deterministic(self):
        counts = {"abab": 3, "abba": 3, "baba": 2}
        a = T.bpe_train_from_counts(counts, 8)
        b = T.bpe_train_from_counts(counts, 8)
        assert a == b

    def test_merge_budget_respected(self):
        merges = T.bpe_train_from_counts({"aaaa": 1}, 2)
        assert len(merges) == 2

    def test_exhausts_gracefully(self):
        # single 1-char word: only ('a','</w>') is mergeable
        merges = T.bpe_train_from_counts({"a": 1}, 100)
        assert merges == [("a", "</w>")]


class TestEncode:
    def test_trained_words_become_single_tokens(self):
        counts = {"low": 5, "newest": 6}
        merges = T.bpe_train_from_counts(counts, 50)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        assert T.bpe_encode_word("low", ranks) == ["low</w>"]
        assert T.bpe_encode_word("newest", ranks) == ["newest</w>"]

    def test_unseen_word_falls_back_to_learned_pieces(self):
        counts = {"newest": 6, "widest": 3}
        merges = T.bpe_train_from_counts(counts, 6)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        # 'fewest' was never seen but shares the learned west</w> piece
        toks = T.bpe_encode_word("fewest", ranks)
        assert toks == ["f", "e", "west</w>"]
        # a word sharing nothing falls back to characters, losslessly
        toks2 = T.bpe_encode_word("talls", ranks)
        assert "".join(toks2).replace("</w>", "") == "talls"

    def test_no_merges_yields_chars(self):
        assert T.bpe_encode_word("ab", {}) == ["a", "b", "</w>"]

    def test_lossless_concatenation(self):
        counts = {"hello": 3, "world": 2}
        merges = T.bpe_train_from_counts(counts, 20)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for w in ("hello", "world", "held", "x", ""):
            toks = T.bpe_encode_word(w, ranks) if w else []
            assert "".join(toks).replace("</w>", "") == w


class TestSpark:
    def test_train_and_tokenize_e2e(self, spark):
        rows = [(i, "the newest lowest widest the the") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = T.train_bpe(df, n_merges=30, max_words=100)
        assert merges == T.train_bpe(df, n_merges=30, max_words=100)
        out = T.bpe_tokenize(df, merges).collect()
        for r in out:
            joined = "".join(r["bpe_tokens"]).replace("</w>", "")
            assert joined == r["text"].replace(" ", "")
            assert r["n_bpe_real"] == len(r["bpe_tokens"])
            # trained on this corpus: every word is one token
            assert r["n_bpe_real"] == 6

    def test_tokenize_without_token_array(self, spark):
        df = spark.createDataFrame([(1, "ab ab")],
                                   "doc_id long, text string")
        merges = T.bpe_train_from_counts({"ab": 5}, 10)
        out = T.bpe_tokenize(df, merges, tokens_col=None).collect()
        assert out[0]["n_bpe_real"] == 2
        assert "bpe_tokens" not in out[0].asDict()

    def test_emit_prunes_columns_same_counts(self, spark):
        """r16: emit=(id,) must drop text (and any other column) from
        the kernel output while producing the identical counts."""
        df = spark.createDataFrame(
            [(1, "x", "ab ab"), (2, "y", None), (3, "z", "a-b!")],
            "doc_id long, extra string, text string")
        merges = T.bpe_train_from_counts({"ab": 5}, 10)
        slim = T.bpe_tokenize(df, merges, tokens_col=None,
                              emit=("doc_id",))
        assert slim.columns == ["doc_id", "n_bpe_real"]
        full = {r["doc_id"]: r["n_bpe_real"] for r in
                T.bpe_tokenize(df, merges, tokens_col=None).collect()}
        got = {r["doc_id"]: r["n_bpe_real"] for r in slim.collect()}
        assert got == full

    def test_null_and_punct(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "a-b!")],
            "doc_id long, text string")
        merges = []
        got = {r["doc_id"]: r["n_bpe_real"] for r in
               T.bpe_tokenize(df, merges).collect()}
        assert got[1] == 0 and got[2] == 0
        # pretokens: a, -, b, ! -> chars + </w> each = 2+2+2+2
        assert got[3] == 8

    def test_sampled_training_usable(self, spark):
        rows = [(i, "alpha beta gamma delta") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = T.train_bpe(df, n_merges=20, sample_fraction=0.3,
                             seed=1)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        assert T.bpe_encode_word("alpha", ranks) == ["alpha</w>"]
