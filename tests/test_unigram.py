"""Unigram-LM tokenizer (Kudo 2018, operators/tokenize.py): Viterbi
vs brute-force enumeration, EM training behavior, losslessness,
determinism, char coverage, and the Spark e2e path.
"""
from __future__ import annotations

import itertools
import math

import pytest

from nifi_extracttext_processor_spark.operators.tokenize import (
    _UNK_LOGP,
    train_unigram,
    unigram_encode_word,
    unigram_tokenize,
    unigram_train_from_counts,
)


def _brute_best(word, logp, max_len=8):
    """Enumerate every segmentation; return the max log-prob."""
    n = len(word)
    best = float("-inf")
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        if any(len(p) > max_len for p in pieces):
            continue
        s = 0.0
        ok = True
        for p in pieces:
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = _UNK_LOGP
                else:
                    ok = False
                    break
            s += lp
        if ok:
            best = max(best, s)
    return best


class TestViterbi:
    VOCAB = {"a": math.log(0.2), "b": math.log(0.2),
             "ab": math.log(0.3), "ba": math.log(0.1),
             "aba": math.log(0.15), "c": math.log(0.05)}

    def test_picks_best_segmentation(self):
        # p(ab)=0.3 > p(a)p(b)=0.04
        assert unigram_encode_word("ab", self.VOCAB) == ["ab"]
        # p(aba)=0.15 > p(ab)p(a)=0.06 > p(a)p(ba)=0.02
        assert unigram_encode_word("aba", self.VOCAB) == ["aba"]

    def test_matches_bruteforce_on_random_words(self):
        import random
        rnd = random.Random(9)
        for _ in range(40):
            w = "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 7)))
            got = unigram_encode_word(w, self.VOCAB)
            score = sum(self.VOCAB.get(p, _UNK_LOGP) for p in got)
            assert "".join(got) == w                  # lossless
            assert score == pytest.approx(
                _brute_best(w, self.VOCAB), abs=1e-12)

    def test_unseen_char_fallback(self):
        toks = unigram_encode_word("axb", self.VOCAB)
        assert "".join(toks) == "axb"
        assert "x" in toks


class TestTraining:
    CORPUS = {
        "international": 50, "internet": 40, "interval": 30,
        "national": 45, "nation": 35, "rational": 20,
        "cat": 10, "dog": 10,
    }

    def test_useful_pieces_survive(self):
        vocab = unigram_train_from_counts(
            self.CORPUS, vocab_size=40, seed_max_len=6)
        assert all(len(p) >= 1 for p in vocab)
        # frequent shared substrings should out-survive junk
        multi = [p for p in vocab if len(p) > 1]
        assert multi, "no multi-char pieces survived"
        joined = " ".join(multi)
        assert "at" in joined or "nation" in joined or "inter" in joined

    def test_vocab_size_target_and_char_coverage(self):
        vocab = unigram_train_from_counts(
            self.CORPUS, vocab_size=25, seed_max_len=5)
        chars = {c for w in self.CORPUS for c in w}
        assert chars <= set(vocab)          # chars never pruned
        assert len(vocab) <= 25 + len(chars)

    def test_deterministic(self):
        a = unigram_train_from_counts(self.CORPUS, vocab_size=30)
        b = unigram_train_from_counts(self.CORPUS, vocab_size=30)
        assert a == b

    def test_probs_normalized_after_em(self):
        vocab = unigram_train_from_counts(
            self.CORPUS, vocab_size=60, em_iters=3, prune_rounds=0)
        total = sum(math.exp(lp) for lp in vocab.values()
                    if lp > _UNK_LOGP)
        assert total == pytest.approx(1.0, abs=1e-6)

    def test_bad_args(self):
        with pytest.raises(ValueError):
            unigram_train_from_counts({"a": 1}, vocab_size=0)


class TestSparkE2E:
    def test_train_and_tokenize(self, spark):
        docs = [(i, "the international internet interval nation "
                    "national rational cat dog") for i in range(8)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        vocab = train_unigram(df, vocab_size=60, max_words=1000)
        out = unigram_tokenize(df, vocab).collect()
        for r in out:
            assert r["n_unigram_real"] == len(r["unigram_tokens"])
            # lossless per pre-token: concatenation recovers the words
            assert "".join(r["unigram_tokens"]) == \
                r["text"].replace(" ", "")

    def test_count_only_mode(self, spark):
        df = spark.createDataFrame([(1, "cat dog")],
                                   "doc_id long, text string")
        vocab = train_unigram(df, vocab_size=20, max_words=100)
        out = unigram_tokenize(df, vocab, tokens_col=None).collect()
        assert "unigram_tokens" not in out[0].asDict()
        assert out[0]["n_unigram_real"] >= 2
