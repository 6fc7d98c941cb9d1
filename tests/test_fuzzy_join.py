"""fuzzy_join (operators/fuzzy_join.py): losslessness of the
filter-verify similarity joins vs brute-force all-pairs, adversarial
inputs (repetitive strings, empties, nulls, oversize keys), DuckDB
twin parity, and the plan guarantee that no O(n²) join strategy
appears.
"""
from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.fuzzy_join import (
    MAX_KEY_LEN,
    edit_similarity_join,
    edit_similarity_join_sql,
    jaccard_similarity_join,
    jaccard_similarity_join_sql,
)


def _lev(a: str, b: str) -> int:
    # independent reference implementation (classic DP)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _jac(a: str, b: str) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    inter = len(ta & tb)
    return round(inter / (len(ta) + len(tb) - inter), 6)


def _mutate(rnd: random.Random, s: str, d: int) -> str:
    for _ in range(d):
        op = rnd.choice("ids")
        i = rnd.randrange(max(1, len(s)))
        c = rnd.choice(string.ascii_lowercase)
        if op == "i":
            s = s[:i] + c + s[i:]
        elif op == "d" and s:
            s = s[:i] + s[i + 1:]
        else:
            s = s[:i] + c + s[i + 1:] if s else c
    return s


@pytest.fixture(scope="module")
def name_df(spark):
    """60 base strings + mutated copies at distance 1-3 + adversarial
    rows: repetitive strings (few distinct grams), near-empty strings,
    a NULL, and an oversize key."""
    rnd = random.Random(41)
    rows, i = [], 0
    for _ in range(60):
        base = "".join(rnd.choice("abcdef ") for _ in range(rnd.randrange(4, 24)))
        rows.append((i, base)); i += 1
        if rnd.random() < 0.7:
            rows.append((i, _mutate(rnd, base, rnd.randrange(1, 4)))); i += 1
    rows += [(i, "ababababab"), (i + 1, "abababababab"), (i + 2, "a"),
             (i + 3, ""), (i + 4, None), (i + 5, "z" * (MAX_KEY_LEN + 1))]
    return spark.createDataFrame(rows, "doc_id long, name string")


def test_edit_join_lossless_vs_bruteforce(spark, name_df):
    for d in (0, 1, 2, 3):
        got = sorted(tuple(r) for r in
                     edit_similarity_join(name_df, "doc_id", "name",
                                          max_dist=d).collect())
        rows = [(r["doc_id"], r["name"]) for r in name_df.collect()
                if r["name"] is not None and len(r["name"]) <= MAX_KEY_LEN]
        want = sorted((a, b, _lev(sa, sb))
                      for (a, sa) in rows for (b, sb) in rows
                      if a < b and _lev(sa, sb) <= d)
        assert got == want, f"max_dist={d}"


def test_edit_join_q3_same_result(spark, name_df):
    d2 = sorted(tuple(r) for r in
                edit_similarity_join(name_df, "doc_id", "name",
                                     max_dist=2, q=2).collect())
    d3 = sorted(tuple(r) for r in
                edit_similarity_join(name_df, "doc_id", "name",
                                     max_dist=2, q=3).collect())
    assert d2 == d3  # q changes the filter, never the answer


def test_jaccard_join_lossless_vs_bruteforce(spark):
    rnd = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = [(i, " ".join(rnd.choice(vocab)
                         for _ in range(rnd.randrange(1, 7))))
            for i in range(120)]
    rows += [(120, "   "), (121, None), (122, "alpha alpha alpha")]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    for t in (0.34, 0.5, 0.8, 1.0):
        got = sorted(tuple(r) for r in
                     jaccard_similarity_join(df, "doc_id", "name",
                                             threshold=t).collect())
        ok = [(i, s) for i, s in rows if s is not None and s.split()]
        want = sorted((a, b, _jac(sa, sb))
                      for (a, sa) in ok for (b, sb) in ok
                      if a < b and _jac(sa, sb) >= t)
        assert got == want, f"threshold={t}"


def test_duckdb_twin_parity(spark, name_df):
    pdf = name_df.toPandas()
    con = duckdb.connect()
    con.register("names", pdf)
    got = sorted(tuple(r) for r in
                 edit_similarity_join(name_df, "doc_id", "name",
                                      max_dist=2).collect())
    want = sorted(tuple(r) for r in con.sql(
        edit_similarity_join_sql("names", "doc_id", "name", 2)).fetchall())
    assert got == want
    got = sorted(tuple(r) for r in
                 jaccard_similarity_join(name_df, "doc_id", "name",
                                         threshold=0.5).collect())
    want = sorted(tuple(r) for r in con.sql(
        jaccard_similarity_join_sql("names", "doc_id", "name",
                                    0.5)).fetchall())
    assert got == want


def test_no_quadratic_join_in_plan(spark, name_df):
    for out in (edit_similarity_join(name_df, "doc_id", "name", 2),
                jaccard_similarity_join(name_df, "doc_id", "name", 0.5)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_null_and_oversize_keys_excluded(spark, name_df):
    out = edit_similarity_join(name_df, "doc_id", "name", max_dist=1)
    bad = {r["doc_id"] for r in name_df.collect()
           if r["name"] is None or len(r["name"] or "") > MAX_KEY_LEN}
    ids = {x for r in out.collect() for x in (r["id1"], r["id2"])}
    assert not (ids & bad)


def test_identical_and_empty_strings(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, ""), (4, "")],
        "doc_id long, name string")
    got = sorted(tuple(r) for r in
                 edit_similarity_join(df, "doc_id", "name", 0).collect())
    assert got == [(1, 2, 0), (3, 4, 0)]


def test_lookup_lossless_vs_bruteforce(spark, name_df):
    # split the fixture into two "tables" (dirty feed vs master) and
    # check the R×S lookup against brute force at several distances
    left = name_df.filter(F.col("doc_id") % 2 == 0) \
        .withColumnRenamed("doc_id", "lid")
    right = name_df.filter(F.col("doc_id") % 2 == 1) \
        .withColumnRenamed("doc_id", "rid")
    from nifi_extracttext_processor_spark.operators.fuzzy_join import (
        edit_similarity_lookup,
    )
    lrows = [(r["lid"], r["name"]) for r in left.collect()
             if r["name"] is not None and len(r["name"]) <= MAX_KEY_LEN]
    rrows = [(r["rid"], r["name"]) for r in right.collect()
             if r["name"] is not None and len(r["name"]) <= MAX_KEY_LEN]
    for d in (0, 2):
        got = sorted(tuple(r) for r in edit_similarity_lookup(
            left, right, "lid", "name", "rid", "name",
            max_dist=d).collect())
        want = sorted((a, b, _lev(sa, sb))
                      for (a, sa) in lrows for (b, sb) in rrows
                      if _lev(sa, sb) <= d)
        assert got == want, f"max_dist={d}"


def test_lookup_duckdb_parity_and_same_name_guard(spark, name_df):
    from nifi_extracttext_processor_spark.operators.fuzzy_join import (
        edit_similarity_lookup,
        edit_similarity_lookup_sql,
    )
    left = name_df.limit(40).withColumnRenamed("doc_id", "lid")
    right = name_df.withColumnRenamed("doc_id", "rid")
    con = duckdb.connect()
    con.register("lt", left.toPandas())
    con.register("rt", right.toPandas())
    got = sorted(tuple(r) for r in edit_similarity_lookup(
        left, right, "lid", "name", "rid", "name", max_dist=2).collect())
    want = sorted(tuple(r) for r in con.sql(edit_similarity_lookup_sql(
        "lt", "rt", "lid", "name", "rid", "name", max_dist=2)).fetchall())
    assert got == want
    with pytest.raises(ValueError, match="must differ"):
        edit_similarity_lookup(left, right, "lid", "name", "lid", "name")


def test_validation_errors(spark, name_df):
    with pytest.raises(ValueError):
        edit_similarity_join(name_df, "doc_id", "name", max_dist=-1)
    with pytest.raises(ValueError):
        edit_similarity_join(name_df, "doc_id", "name", 1, q=0)
    with pytest.raises(ValueError):
        jaccard_similarity_join(name_df, "doc_id", "name", threshold=0.0)
    with pytest.raises(ValueError):
        jaccard_similarity_join(name_df, "doc_id", "name", threshold=1.5)


def test_edit_join_positional_filter_boundary(spark):
    """r16: sig prefix shortened to q·d+1 + PPJoin positional filter.
    Stress the filter's `>=` boundary: pairs at EXACTLY max_dist whose
    d edits each destroy the full q grams (substitutions in the
    interior, no adjacent edits) have overlap exactly
    max(|Gx|,|Gy|) − q·d — one lost pair here means the filter
    over-prunes by one. Plus long shared-suffix strings whose first
    common gram is late in one side's order, and repetitive strings
    riding the LOW channel next to normal ones."""
    rows = [
        (0, "abcdefghijklmnop"),
        (1, "aXcdefghijkZmnop"),   # 2 interior substitutions, d=2
        (2, "abcdefghijklmnoX"),   # 1 end substitution
        (3, "zzzzabcdefghijklmnop"),  # shared long suffix, prefix noise
        (4, "ababab"), (5, "abab"),   # few distinct grams (LOW at d>=2)
        (6, "ab"), (7, ""), (8, "ba"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    for d in (1, 2, 3, 4):
        got = sorted(tuple(r) for r in
                     edit_similarity_join(df, "doc_id", "name",
                                          max_dist=d).collect())
        want = sorted((a, b, _lev(sa, sb))
                      for (a, sa) in rows for (b, sb) in rows
                      if a < b and _lev(sa, sb) <= d)
        assert got == want, f"max_dist={d}"


def test_edit_join_content_filter_boundary(spark):
    """r17: content-based count filter (partial char-histogram L1 <=
    2d over the packed probe characters). Stress its `<=` boundary:
    pairs whose d edits ALL hit probe characters have partial L1 of
    EXACTLY 2d (substitution probe->probe) or d (probe->non-probe) —
    one lost pair means the filter over-prunes. Plus all-non-probe
    keys (digits/unicode: counts all zero, filter vacuous) and
    repeated probe chars near the 255 packing cap."""
    rows = [
        (0, "arrest roast"),
        (1, "errest roust"),       # 2 probe->probe subs: L1 = 4
        (2, "arrest roasX"),       # probe->non-probe sub: L1 = 2
        (3, "arrest roast!!!"),    # 3 non-probe inserts: L1 = 0
        (4, "0123456789"), (5, "0123456798"),   # all non-probe
        (6, "ФЫВА"), (7, "ФЫВБ"),               # non-Latin
        (8, "a" * 300), (9, "a" * 299 + "b"),   # past the 255 cap
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    for d in (0, 1, 2, 3):
        got = sorted(tuple(r) for r in
                     edit_similarity_join(df, "doc_id", "name",
                                          max_dist=d).collect())
        want = sorted((a, b, _lev(sa, sb))
                      for (a, sa) in rows for (b, sb) in rows
                      if a < b and _lev(sa, sb) <= d)
        assert got == want, f"max_dist={d}"
