"""Hypothesis properties for the round-7 primitives — pure-Python
layers only (no SparkSession per example): BM25 reference arithmetic,
Misra-Gries merge bounds, unigram Viterbi optimality, Morton-curve
structure.
"""
from __future__ import annotations

import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(max_examples=100, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

_word = st.text(alphabet="abcd", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


class TestBM25Properties:
    @_FAST
    @given(st.lists(_doc, min_size=1, max_size=8), _word)
    def test_scores_positive_and_only_for_matches(self, texts, qterm):
        from nifi_extracttext_processor_spark.operators.search import (
            bm25_reference,
        )
        docs = [(f"d{i}", t) for i, t in enumerate(texts)]
        scores = bm25_reference(docs, qterm)
        for did, s in scores.items():
            text = dict(docs)[did]
            assert qterm in text.split()
            assert s > 0

    @_FAST
    @given(st.lists(_doc, min_size=2, max_size=8), _word)
    def test_tf_monotone_at_equal_length(self, texts, qterm):
        """Between two docs of the SAME token length, more occurrences
        of the query term never scores lower."""
        from nifi_extracttext_processor_spark.operators.search import (
            bm25_reference,
        )
        # build two synthetic docs of equal length, tf 1 vs 2
        filler = "zzz"
        d1 = " ".join([qterm] + [filler] * 5)
        d2 = " ".join([qterm, qterm] + [filler] * 4)
        docs = [(f"d{i}", t) for i, t in enumerate(texts)]
        docs += [("lo", d1), ("hi", d2)]
        s = bm25_reference(docs, qterm)
        assert s["hi"] >= s["lo"]


class TestMisraGriesProperties:
    @_FAST
    @given(st.lists(st.lists(_word, min_size=0, max_size=40),
                    min_size=1, max_size=5),
           st.integers(min_value=2, max_value=8))
    def test_merge_bounds_hold(self, partitions, cap):
        """Simulate the operator's per-batch merge across partitions:
        summed estimates never exceed true counts and undercount by at
        most n_total/cap; any term with f > n/cap survives."""
        from collections import Counter

        def sketch(tokens):
            counters: dict[str, int] = {}
            vc = Counter(tokens)
            for t, c in vc.items():
                counters[t] = counters.get(t, 0) + c
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                thresh = vals[cap]
                counters = {t: c - thresh
                            for t, c in counters.items() if c > thresh}
            return counters

        truth: Counter = Counter()
        est: Counter = Counter()
        n = 0
        for part in partitions:
            truth.update(part)
            n += len(part)
            for t, c in sketch(part).items():
                est[t] += c
        for t, e in est.items():
            assert e <= truth[t]
        for t, f in truth.items():
            assert est.get(t, 0) >= f - (n / cap) - 1e-9
            if f > n / cap:
                assert t in est and est[t] > 0


class TestUnigramProperties:
    _vocab = st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.floats(min_value=-8.0, max_value=-0.1),
        min_size=1, max_size=10)

    @_FAST
    @given(_vocab, st.text(alphabet="ab", min_size=1, max_size=7))
    def test_viterbi_is_optimal_and_lossless(self, vocab, word):
        from nifi_extracttext_processor_spark.operators.tokenize import (
            _UNK_LOGP, unigram_encode_word,
        )
        toks = unigram_encode_word(word, vocab, max_len=4)
        assert "".join(toks) == word
        got = sum(vocab.get(p, _UNK_LOGP) for p in toks)
        # brute force over all segmentations with pieces <= 4 chars
        best = float("-inf")
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=max(0, n - 1)):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            if any(len(p) > 4 for p in pieces):
                continue
            s = 0.0
            ok = True
            for p in pieces:
                lp = vocab.get(p)
                if lp is None:
                    if len(p) == 1:
                        lp = _UNK_LOGP
                    else:
                        ok = False
                        break
                s += lp
            if ok:
                best = max(best, s)
        assert math.isclose(got, best, abs_tol=1e-9)


class TestMortonProperties:
    _coords = st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=2, max_size=20)

    @_FAST
    @given(_coords)
    def test_bit_interleave_structure(self, pts):
        """With 8-bit ranges pinned to [0,255], the reference curve is
        the textbook interleave: extracting even/odd bits recovers the
        scaled coordinates."""
        from nifi_extracttext_processor_spark.operators.layout import (
            zorder_reference,
        )
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        lo_x, hi_x = min(xs), max(xs)
        lo_y, hi_y = min(ys), max(ys)
        zs = zorder_reference([(float(x), float(y)) for x, y in pts],
                              bits=8)

        def unpack(z):
            a = b = 0
            for i in range(8):
                a |= ((z >> (2 * i)) & 1) << i
                b |= ((z >> (2 * i + 1)) & 1) << i
            return a, b

        for (x, y), z in zip(pts, zs):
            sx = (math.floor((x - lo_x) / (hi_x - lo_x) * 255)
                  if hi_x > lo_x else 0)
            sy = (math.floor((y - lo_y) / (hi_y - lo_y) * 255)
                  if hi_y > lo_y else 0)
            assert unpack(z) == (sx, sy)
