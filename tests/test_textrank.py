"""textrank_keywords (operators/textrank.py): scores vs an
independent plain-Python TextRank, candidate filtering, isolated-word
and short-doc semantics, centrality-beats-frequency behaviour,
DuckDB twin parity, and validation."""
from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.textrank import (
    _candidates,
    textrank_keywords,
    textrank_keywords_sql,
    textrank_reference,
)

DOC = ("compatibility of systems of linear constraints over the set "
       "of natural numbers. criteria of compatibility of a system "
       "of linear diophantine equations strict inequations and "
       "nonstrict inequations are considered.")


def _filtered(text, min_len=3, stop=None):
    from nifi_extracttext_processor_spark.operators.text_analysis \
        import STOPWORDS_EN
    stop = STOPWORDS_EN if stop is None else stop
    out = []
    for t in text.lower().split():
        t = "".join(c for c in t if c.isalpha() and c.isascii())
        if len(t) >= min_len and t not in stop:
            out.append(t)
    return out


def test_matches_pure_python_reference(spark):
    df = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    got = {r["term"]: r["score"]
           for r in textrank_keywords(df, k=100, window=4,
                                      iters=4).collect()}
    want = textrank_reference(_filtered(DOC), window=4, iters=4)
    assert set(got) == set(want)
    for w, s in want.items():
        assert got[w] == pytest.approx(s, abs=1e-6), w


def test_candidate_filter(spark):
    df = spark.createDataFrame(
        [("The THE the cat, cat! sat on a mat-x 42 7b",)],
        "text string")
    toks = df.select(_candidates(
        "text", 3, ("the", "on", "a"))).collect()[0][0]
    # "the" stopworded, punctuation stripped, "42" -> "" dropped,
    # "7b" -> "b" under min_len, "mat-x" -> "matx"
    assert toks == ["cat", "cat", "sat", "matx"]


def test_short_and_isolated_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "solitary"), (2, ""), (3, None),
         (4, "alpha beta gamma alpha")],
        "doc_id long, text string")
    rows = textrank_keywords(df.fillna({"text": ""}), k=5).collect()
    assert {r["doc_id"] for r in rows} == {4}


def test_hub_word_outranks_frequent_word(spark):
    # "hub" co-occurs with every other word once; "noise" repeats but
    # only ever next to itself-adjacent filler — centrality wins
    text = ("hub alpha hub beta hub gamma hub delta "
            "noise filler noise filler noise filler noise filler")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {r["term"]: r for r in textrank_keywords(
        df, k=3, window=2, iters=6).collect()}
    assert "hub" in rows
    assert rows["hub"]["rank"] == 1


def test_rank_cut_and_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(i, DOC) for i in range(4)], "doc_id long, text string")
    a = textrank_keywords(df, k=3).collect()
    b = textrank_keywords(df, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["rank"] <= 3 for r in a)
    assert len(a) == 12


def test_duckdb_twin_parity(spark, tmp_path):
    docs = [(1, DOC),
            (2, "red green blue red blue cyan magenta red green"),
            (3, "one two"), (4, "lone"),
            (5, "alpha beta gamma delta epsilon zeta alpha gamma")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for kw in ({"k": 5, "window": 3, "iters": 3},
               {"k": 2, "window": 5, "iters": 4, "damping": 0.9}):
        sql = textrank_keywords_sql("d", **kw)
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        got = {tuple(r) for r in textrank_keywords(df, **kw).collect()}
        assert got == want, kw


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for kw in ({"k": 0}, {"window": 1}, {"iters": 0},
               {"damping": 1.0}, {"min_len": 0}):
        with pytest.raises(ValueError):
            textrank_keywords(df, **kw)
