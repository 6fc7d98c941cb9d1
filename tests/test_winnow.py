"""Winnowing fingerprints (operators/winnow.py): golden vs an
independent plain-Python winnower, the shared-substring coverage
guarantee, overlap pairs, DuckDB parity."""
from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_overlap_pairs,
    winnow_overlap_pairs_sql,
)


def _py_winnow(text, k=5, w=4):
    """Independent reference: same k-gram hash, same (min hash,
    rightmost) selection, every window start (trailing included)."""
    ts = [t for t in text.lower().split() if t]
    grams = [" ".join(ts[i:i + k]) for i in range(len(ts) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
          for g in grams]
    sel = set()
    for s in range(len(hs)):
        win = hs[s:s + w]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(win) if h == m)
        sel.add((s + off, m))
    return sel


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi"]


def _text(seed, n):
    return " ".join(WORDS[(seed * 7 + i * 3) % len(WORDS)] + str(
        (seed + i * i) % 97) for i in range(n))


class TestSelection:
    def test_matches_independent_python(self, spark):
        rows = [(0, _text(1, 30)), (1, _text(2, 3)), (2, _text(3, 8))]
        got = {}
        for r in winnow_fingerprints(_df(spark, rows), k=5,
                                     w=4).collect():
            got.setdefault(r["doc_id"], set()).add(
                (r["pos"], r["fp"]))
        for i, t in rows:
            want = _py_winnow(t, 5, 4)
            assert got.get(i, set()) == want, i

    def test_coverage_guarantee(self, spark):
        # any shared run of >= w+k-1 tokens shares >= 1 fingerprint
        k, w = 4, 5
        shared = " ".join(f"common{j}" for j in range(w + k - 1))
        rows = [(0, _text(5, 20) + " " + shared + " " + _text(6, 20)),
                (1, _text(7, 15) + " " + shared + " " + _text(8, 25))]
        fps = {}
        for r in winnow_fingerprints(_df(spark, rows), k=k,
                                     w=w).collect():
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert fps[0] & fps[1]

    def test_density_bounded(self, spark):
        rows = [(0, _text(9, 200))]
        n_grams = 200 - 5 + 1
        n_sel = winnow_fingerprints(_df(spark, rows), k=5,
                                    w=8).count()
        assert n_sel <= n_grams
        # expected density ~ 2/(w+1); allow generous slack both ways
        assert n_sel >= n_grams / (8 + 1)

    def test_short_doc_and_validation(self, spark):
        rows = [(0, "one two three")]      # < k tokens
        assert winnow_fingerprints(_df(spark, rows), k=5,
                                   w=4).count() == 0
        with pytest.raises(ValueError):
            winnow_fingerprints(_df(spark, rows), k=0)


class TestPairs:
    def test_overlap_pairs_and_freq_cut(self, spark):
        k, w = 4, 3
        shared = " ".join(f"quote{j}" for j in range(12))
        rows = [(0, _text(1, 20) + " " + shared),
                (1, shared + " " + _text(2, 20)),
                (2, _text(3, 30))]
        fps = winnow_fingerprints(_df(spark, rows), k=k, w=w)
        pairs = {(r["id1"], r["id2"]): r["shared"] for r in
                 winnow_overlap_pairs(fps, min_shared=1).collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs
        # a freq cut at 1 removes every cross-doc fingerprint
        assert winnow_overlap_pairs(fps, min_shared=1,
                                    max_hash_freq=1).count() == 0
        with pytest.raises(ValueError):
            winnow_overlap_pairs(fps, min_shared=0)

    def test_duckdb_parity(self, spark):
        import pandas as pd
        shared = " ".join(f"same{j}" for j in range(10))
        rows = [(0, _text(1, 25) + " " + shared),
                (1, shared + " " + _text(2, 18)),
                (2, _text(3, 22))]
        df = _df(spark, rows)
        con = duckdb.connect()
        con.register("documents",
                     pd.DataFrame(rows, columns=["doc_id", "text"]))
        got_f = sorted(tuple(r) for r in winnow_fingerprints(
            df, k=4, w=3).collect())
        want_f = sorted(tuple(int(x) for x in r) for r in con.execute(
            winnow_fingerprints_sql(k=4, w=3)).fetchall())
        assert got_f == want_f
        got_p = sorted(tuple(r) for r in winnow_overlap_pairs(
            winnow_fingerprints(df, k=4, w=3),
            min_shared=2).collect())
        want_p = sorted(tuple(int(x) for x in r) for r in con.execute(
            winnow_overlap_pairs_sql(k=4, w=3,
                                     min_shared=2)).fetchall())
        assert got_p == want_p
