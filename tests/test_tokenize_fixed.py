"""Frozen-state tokenizer twins (operators/tokenize_fixed.py — the
r14 carve-out drain): the DuckDB replays of BPE rank-order rewriting
and unrolled-Viterbi segmentation must equal the Arrow kernels on
crafted edge cases — overlapping merges, merge-built symbols, UNK
chars, ties, empty docs — not just on the corpus."""

from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.tokenize import (
    bpe_encode_word,
    unigram_encode_word,
)
from nifi_extracttext_processor_spark.operators.tokenize_fixed import (
    FROZEN_BPE_MERGES,
    FROZEN_UNIGRAM_VOCAB,
    bpe_apply_fixed_sql,
    unigram_apply_fixed_sql,
)


def _oracle_counts(texts, sql_fn, *args, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    sql = sql_fn("documents", *args, **kw)
    return dict(con.execute(sql).fetchall())


def _kernel_bpe_count(text, merges):
    import re

    from nifi_extracttext_processor_spark.operators.text_analysis \
        import BPE_TOKEN_RE
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    return sum(len(bpe_encode_word(w, ranks))
               for w in re.findall(BPE_TOKEN_RE, text or ""))


def _kernel_uni_count(text, vocab):
    import re

    from nifi_extracttext_processor_spark.operators.text_analysis \
        import BPE_TOKEN_RE
    return sum(len(unigram_encode_word(w, vocab))
               for w in re.findall(BPE_TOKEN_RE, text or ""))


class TestBpeFixedTwin:
    def test_overlap_and_merge_built_symbols(self):
        """aaa exercises leftmost-first overlap; the frozen merges
        chain multi-step symbols (c+ustomer</w> needs 4 prior
        merges)."""
        texts = ["aaa customer column filter", "low lower newest",
                 "join hash batch scan vector order line",
                 "", "  ", "a!b?c"]
        got = _oracle_counts(texts, bpe_apply_fixed_sql,
                             FROZEN_BPE_MERGES)
        for i, t in enumerate(texts):
            assert got[i] == _kernel_bpe_count(t, FROZEN_BPE_MERGES), t

    def test_synthetic_overlap_merges(self):
        """(a,a) then (aa,a): in-order vs greedy equivalence on the
        canonical counterexample shape."""
        merges = [("a", "a"), ("aa", "a"), ("aa", "</w>")]
        texts = ["aaaa aaa aa a aaaaa"]
        got = _oracle_counts(texts, bpe_apply_fixed_sql, merges)
        assert got[0] == _kernel_bpe_count(texts[0], merges)

    def test_empty_and_null_docs_emit_zero(self):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, NULL), (1, '')")
        got = dict(con.execute(
            bpe_apply_fixed_sql("documents",
                                FROZEN_BPE_MERGES)).fetchall())
        assert got == {0: 0, 1: 0}


class TestUnigramFixedTwin:
    def test_corpus_vocab_on_crafted_words(self):
        texts = ["customer scan hash big", "zzz qqq xx",  # UNK-heavy
                 "a", "join order line filter", ""]
        got = _oracle_counts(texts, unigram_apply_fixed_sql,
                             FROZEN_UNIGRAM_VOCAB)
        for i, t in enumerate(texts):
            assert got[i] == _kernel_uni_count(
                t, FROZEN_UNIGRAM_VOCAB), t

    def test_tie_breaks_toward_longer_piece(self):
        """vocab where 'ab'+'c' and 'abc' tie exactly: the kernel's
        rule (longer piece wins) must be the struct-max's too."""
        vocab = {"ab": -1.0, "c": -1.0, "abc": -2.0,
                 "a": -3.0, "b": -3.0}
        assert unigram_encode_word("abc", vocab) == ["abc"]
        got = _oracle_counts(["abc"], unigram_apply_fixed_sql, vocab)
        assert got[0] == 1

    def test_unroll_guard_raises_on_long_pretoken(self):
        texts = ["supercalifragilistic"]  # 20 chars > unroll 12
        with pytest.raises(Exception) as ei:
            _oracle_counts(texts, unigram_apply_fixed_sql,
                           FROZEN_UNIGRAM_VOCAB)
        assert "unrolled to 12" in str(ei.value)

    def test_max_len_window(self):
        """pieces longer than max_len are never candidates even if in
        the vocab (kernel contract) — twin must agree."""
        vocab = {"abcdefghij": -0.5, "abcde": -1.0, "fghij": -1.0,
                 **{c: -5.0 for c in "abcdefghij"}}
        w = "abcdefghij"
        assert unigram_encode_word(w, vocab, max_len=8) \
            == ["abcde", "fghij"]
        got = _oracle_counts([w], unigram_apply_fixed_sql, vocab,
                             max_len=8)
        assert got[0] == 2
