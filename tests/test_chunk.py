"""chunk_tokens / chunk_sentences (operators/chunk.py): window
arithmetic vs a plain-Python reference, overlap reconstruction,
sentence-atomicity and bucket semantics, empty/NULL docs, DuckDB twin
parity, no-shuffle plan for the token path, and validation."""
from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.chunk import (
    chunk_sentences,
    chunk_sentences_sql,
    chunk_tokens,
    chunk_tokens_sql,
)


def _ref_chunks(text, max_tokens, overlap):
    toks = text.split()
    if not toks:
        return []
    st = max_tokens - overlap
    out, i = [], 0
    while True:
        win = toks[i * st:i * st + max_tokens]
        out.append((i, len(win), " ".join(win)))
        if i * st + max_tokens >= len(toks):
            break
        i += 1
    return out


def test_token_chunks_match_reference(spark):
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted((r["chunk_id"], r["n_tokens"], r["chunk_text"])
                 for r in chunk_tokens(df, max_tokens=8,
                                       overlap=3).collect())
    assert got == _ref_chunks(text, 8, 3)
    # stride 5: chunks at 0,5,10,15 -> 4 chunks, last is short
    assert len(got) == 4 and got[-1][1] == 23 - 15


def test_single_chunk_and_exact_fit(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join("x" * 1 for _ in range(8)))],
        "doc_id long, text string")
    rows = chunk_tokens(df, max_tokens=8, overlap=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    assert len(by[1]) == 1 and by[1][0]["n_tokens"] == 3
    assert len(by[2]) == 1 and by[2][0]["n_tokens"] == 8


def test_overlap_reconstructs_document(spark):
    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_tokens(df, max_tokens=10, overlap=4).collect(),
                  key=lambda r: r["chunk_id"])
    # drop each chunk's first `overlap` tokens (except chunk 0) and
    # concatenate -> the original token stream
    rebuilt = rows[0]["chunk_text"].split()
    for r in rows[1:]:
        rebuilt.extend(r["chunk_text"].split()[4:])
    assert rebuilt == text.split()


def test_empty_and_null_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "one")],
        "doc_id long, text string")
    rows = chunk_tokens(df, max_tokens=4, overlap=0).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(4, "one")]
    srows = chunk_sentences(df, budget_tokens=4).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in srows] == [(4, "one")]


def test_token_path_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c d e")],
                               "doc_id long, text string")
    plan = chunk_tokens(df, max_tokens=2, overlap=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_sentence_chunks_are_sentence_atomic(spark):
    text = ("alpha beta gamma. one two three four five. short. "
            "six seven eight nine ten eleven. tail end.")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_sentences(df, budget_tokens=6).collect(),
                  key=lambda r: r["chunk_id"])
    # token-offset buckets: before in [0,6) -> chunk 0, etc.
    # sentences have 3,5,1,6,2 tokens; before = 0,3,8,9,15
    assert [(r["chunk_id"], r["n_sentences"], r["n_tokens"])
            for r in rows] == [(0, 2, 8), (1, 2, 7), (2, 1, 2)]
    # interior terminators are consumed by the split (the
    # sentence_split convention); the final sentence keeps its "."
    assert rows[0]["chunk_text"] == \
        "alpha beta gamma one two three four five"
    joined = " ".join(r["chunk_text"] for r in rows)
    assert joined == ("alpha beta gamma one two three four five "
                      "short six seven eight nine ten eleven "
                      "tail end.")


def test_oversized_sentence_stays_atomic_and_skips_buckets(spark):
    text = "a. " + " ".join(f"w{i}" for i in range(20)) + ". b c."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_sentences(df, budget_tokens=5).collect(),
                  key=lambda r: r["chunk_id"])
    # before = 0, 1, 21 -> the 20-token sentence shares bucket 0 with
    # the 1-token opener (bucket rule), stays ATOMIC (one chunk), and
    # the next sentence jumps to bucket floor(21/5) = 4
    assert [(r["chunk_id"], r["n_sentences"], r["n_tokens"])
            for r in rows] == [(0, 2, 21), (4, 1, 2)]


def test_duckdb_twin_parity(spark, tmp_path):
    docs = [(1, " ".join(f"w{i}" for i in range(37))),
            (2, "one two. three four five six. seven."),
            (3, "  spaced   out\ttokens \n here "),
            (4, ""), (5, None), (6, "single")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for kw in ({"max_tokens": 8, "overlap": 3},
               {"max_tokens": 5, "overlap": 0},
               {"max_tokens": 64, "overlap": 16}):
        want = {tuple(r) for r in con.execute(
            chunk_tokens_sql("d", **kw)).fetchall()}
        got = {tuple(r) for r in chunk_tokens(df, **kw).collect()}
        assert got == want, kw
    for b in (4, 10, 1000):
        want = {tuple(r) for r in con.execute(
            chunk_sentences_sql("d", budget_tokens=b)).fetchall()}
        got = {tuple(r) for r in chunk_sentences(
            df, budget_tokens=b).collect()}
        assert got == want, b


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_tokens(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_tokens(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_sentences(df, budget_tokens=0)
