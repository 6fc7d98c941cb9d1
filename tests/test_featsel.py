"""chi2_terms (operators/featsel.py): χ² values vs an independent
pure-Python contingency computation, positive-only filtering,
min_doc_freq, tie-break determinism, DuckDB twin parity, and the
no-text-after-tokenize plan shape."""
from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.featsel import (
    chi2_terms,
    chi2_terms_sql,
)

DOCS = [
    ("en", "the cat sat on the mat"),
    ("en", "the dog ate the cat"),
    ("en", "a cat and a dog"),
    ("fr", "le chat et le chien"),
    ("fr", "le chien mange"),
    ("fr", "un chat dort the"),      # "the" crosses classes
    ("de", "der hund und die katze"),
    ("de", "die katze schläft"),
]


def _ref_chi2(min_df=1, positive_only=False):
    """Independent reference: dict-of-dicts contingency walk."""
    per_doc = [(lab, set(t for t in txt.lower().split() if t))
               for lab, txt in DOCS]
    n = len(per_doc)
    classes = defaultdict(int)
    for lab, _ in per_doc:
        classes[lab] += 1
    pair = defaultdict(int)
    for lab, toks in per_doc:
        for t in toks:
            pair[(t, lab)] += 1
    dft = defaultdict(int)
    for (t, _), c in pair.items():
        dft[t] += c
    out = {}
    for (t, lab), n11 in pair.items():
        if dft[t] < min_df:
            continue
        if positive_only and not n11 * n > dft[t] * classes[lab]:
            continue
        n10 = dft[t] - n11
        n01 = classes[lab] - n11
        n00 = n - dft[t] - classes[lab] + n11
        den = (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)
        out[(lab, t)] = (n * (n11 * n00 - n10 * n01) ** 2 / den
                         if den else 0.0)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "lang string, text string")


def test_chi2_values_match_reference(spark, docs):
    ref = _ref_chi2(min_df=1, positive_only=False)
    got = chi2_terms(docs, "lang", k=100, min_doc_freq=1,
                     positive_only=False, round_to=9).collect()
    for r in got:
        assert r["chi2"] == pytest.approx(
            ref[(r["label"], r["term"])], abs=1e-8), (r["label"], r["term"])
    assert len(got) == len(ref)


def test_positive_only_filter(spark, docs):
    ref = _ref_chi2(min_df=1, positive_only=True)
    got = chi2_terms(docs, "lang", k=100, min_doc_freq=1,
                     positive_only=True).collect()
    assert {(r["label"], r["term"]) for r in got} == set(ref)
    # "the" appears in 3/4 en docs vs 1/4 fr: en-positive, fr-negative
    keys = {(r["label"], r["term"]) for r in got}
    assert ("en", "the") in keys and ("fr", "the") not in keys


def test_min_doc_freq(spark, docs):
    got = chi2_terms(docs, "lang", k=100, min_doc_freq=2,
                     positive_only=False).collect()
    assert all(r["df_t"] >= 2 for r in got)
    terms = {r["term"] for r in got}
    assert "mange" not in terms       # df 1
    assert "chat" in terms            # df 2


def test_topk_and_tiebreak(spark, docs):
    got = chi2_terms(docs, "lang", k=3, min_doc_freq=1,
                     positive_only=True).collect()
    by_label = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["label"], r["rank"])):
        by_label[r["label"]].append(r)
    for rows in by_label.values():
        assert len(rows) <= 3
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["chi2"], b["term"]) >= (b["chi2"], a["term"]) or \
                a["chi2"] > b["chi2"] or \
                (a["chi2"] == b["chi2"] and a["term"] < b["term"])


def test_duckdb_twin_parity(spark, docs, tmp_path):
    p = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for kw in ({"positive_only": True}, {"positive_only": False},
               {"min_doc_freq": 2, "k": 5}):
        want = {tuple(r) for r in con.execute(
            chi2_terms_sql("d", "lang", **kw)).fetchall()}
        got = {tuple(r) for r in
               chi2_terms(docs, "lang", **kw).collect()}
        assert got == want, kw


def test_null_labels_excluded(spark):
    df = spark.createDataFrame(
        [("en", "hello world"), (None, "hello world hello world")],
        "lang string, text string")
    got = chi2_terms(df, "lang", k=10, min_doc_freq=1,
                     positive_only=False).collect()
    # N must be 1 (null-label doc neither scored nor counted)
    assert all(r["n11"] == 1 and r["df_t"] == 1 for r in got)


def test_plan_no_text_after_tokenize(spark, docs):
    plan = chi2_terms(docs, "lang")._jdf.queryExecution() \
        .executedPlan().toString()
    # the (term,label) shuffle carries triples; no sort-merge join of
    # wide rows, class totals broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestCramersV:
    def test_perfect_and_independent(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.featsel \
            import cramers_v, cramers_v_sql
        perfect = spark.createDataFrame(
            [(str(i % 3), str(i % 3)) for i in range(30)],
            "a string, b string")
        [r] = cramers_v(perfect, "a", "b").collect()
        # zero cells carry their expected mass: chi2 = 60, V exactly 1
        assert (r["chi2"], r["v"]) == (60.0, 1.0)
        indep = spark.createDataFrame(
            [(str(i % 3), str((i // 3) % 4)) for i in range(120)],
            "a string, b string")
        [r2] = cramers_v(indep, "a", "b").collect()
        assert r2["v"] == 0.0
        # degenerate single category -> NULL
        [r3] = cramers_v(spark.createDataFrame(
            [("x", "y")] * 5, "a string, b string"), "a", "b") \
            .collect()
        assert r3["v"] is None
        con = duckdb.connect()
        con.register("t", perfect.toPandas())
        assert [tuple(x) for x in cramers_v(
            perfect, "a", "b").collect()] \
            == [tuple(t) for t in con.execute(
                cramers_v_sql("t", "a", "b")).fetchall()]


class TestValueConcentration:
    def test_hand_golden(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.profile \
            import value_concentration, value_concentration_sql
        # 1,2,3,4: gini = 2(1+4+9+16)/(4*10) - 5/4 = 0.25;
        # top 25% (1 entity) = 4/10; top 50% (2) = 7/10
        df = spark.createDataFrame(
            [(i, float(i)) for i in (1, 2, 3, 4)], "u long, v double")
        [r] = value_concentration(df, "v",
                                  top_fracs=(0.25, 0.5)).collect()
        assert (r["gini"], r["top_25pct_share"],
                r["top_50pct_share"]) == (0.25, 0.4, 0.7)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        assert [tuple(x) for x in value_concentration(
            df, "v", top_fracs=(0.25, 0.5)).collect()] \
            == [tuple(t) for t in con.execute(value_concentration_sql(
                "t", "v", top_fracs=(0.25, 0.5))).fetchall()]

    def test_extremes_and_entity_collapse(self, spark):
        from pyspark.sql import functions as F

        from nifi_extracttext_processor_spark.operators.profile \
            import value_concentration
        # perfectly equal -> gini 0
        eq = spark.createDataFrame(
            [(i, 5.0) for i in range(10)], "u long, v double")
        [r] = value_concentration(eq, "v").collect()
        assert r["gini"] == 0.0
        # one whale holds everything -> gini -> (n-1)/n
        wh = spark.createDataFrame(
            [(i, 0.0) for i in range(9)] + [(9, 100.0)],
            "u long, v double")
        [w] = value_concentration(wh, "v").collect()
        assert w["gini"] == 0.9
        assert w["top_10pct_share"] == 1.0
        # entity collapse: two rows per user sum before ranking
        two = spark.createDataFrame(
            [(1, 2.0), (1, 2.0), (2, 1.0)], "u long, v double")
        [t] = value_concentration(two, "v", entity_col="u").collect()
        assert t["n"] == 2              # entities, not rows

    def test_ties_and_twin_on_events(self, spark, sf_dir):
        import duckdb

        from nifi_extracttext_processor_spark.operators.profile \
            import value_concentration, value_concentration_sql
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        a = [tuple(r) for r in value_concentration(
            ev, "value", entity_col="user_id").collect()]
        b = [tuple(t) for t in con.execute(value_concentration_sql(
            "events", "value", entity_col="user_id")).fetchall()]
        assert a == b and a


class TestJoinFanout:
    def test_exact_cardinality_and_blowup(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.profile \
            import join_fanout_report, join_fanout_report_sql
        left = spark.createDataFrame(
            [(k,) for k in (1, 1, 1, 2, 3, None)], "k long")
        right = spark.createDataFrame(
            [(k,) for k in (1, 1, 2, 9)], "k long")
        [r] = join_fanout_report(left, right, "k", "k").collect()
        # matched keys {1, 2}: est = 3*2 + 1*1 = 7; NULL never matches
        assert r["est_join_rows"] == 7
        assert r["n_matched_keys"] == 2
        assert (r["max_left_dup"], r["max_right_dup"]) == (3, 2)
        assert r["fanout"] == 1.4               # 7 / 5 non-null left
        real = left.join(right, "k").count()
        assert real == r["est_join_rows"]
        con = duckdb.connect()
        con.register("l", left.toPandas())
        con.register("r", right.toPandas())
        [t] = con.execute(join_fanout_report_sql(
            "l", "r", "k", "k")).fetchall()
        assert tuple(r) == tuple(t)


class TestBenford:
    def test_benford_vs_uniform(self, spark):
        import duckdb

        from nifi_extracttext_processor_spark.operators.profile \
            import BENFORD_P, benford_test, benford_test_sql
        # construct an exactly-Benford sample of 1000 values
        rows = []
        k = 0
        for d, p in enumerate(BENFORD_P, start=1):
            for _ in range(round(p * 1000)):
                rows.append((k, float(d) * 10 ** (k % 3)))
                k += 1
        ben = spark.createDataFrame(rows, "i long, v double")
        [r] = benford_test(ben, "v").collect()
        assert r["suspicious"] is False and r["chi2"] < 1.0
        assert r["d1"] == 301
        # uniform first digits = the classic fabrication signature
        uni = spark.createDataFrame(
            [(i, float(1 + i % 9)) for i in range(900)],
            "i long, v double")
        [u] = benford_test(uni, "v").collect()
        assert u["suspicious"] is True and u["chi2"] > 100
        con = duckdb.connect()
        con.register("t", ben.toPandas())
        [w] = con.execute(benford_test_sql("t", "v")).fetchall()
        assert tuple(r) == tuple(w)

    def test_sub_one_magnitudes_and_exclusions(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import benford_test
        # 0.00123 -> first significant digit 1; zeros/NULLs excluded
        df = spark.createDataFrame(
            [(1, 0.00123), (2, -0.9), (3, 0.0), (4, None)],
            "i long, v double")
        [r] = benford_test(df, "v").collect()
        assert r["n"] == 2
        assert r["d1"] == 1 and r["d9"] == 1


class TestMetricDecomposition:
    def test_hand_computed_shares(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import metric_decomposition
        rows = [
            # before split: a=10, b=20; after: a=40, b=25
            ("2024-01-01 00:00:00", "a", 10.0),
            ("2024-01-01 00:00:00", "b", 20.0),
            ("2024-02-01 00:00:00", "a", 40.0),
            ("2024-02-01 00:00:00", "b", 25.0),
        ]
        df = spark.createDataFrame(rows, "ts string, seg string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["dim_value"]: r for r in metric_decomposition(
            df, "ts", "v", ["seg"], "2024-01-15").collect()}
        assert got["a"]["delta"] == 30.0
        assert got["b"]["delta"] == 5.0
        assert got["a"]["share_of_change"] == round(30 / 35, 4)
        assert got["b"]["share_of_change"] == round(5 / 35, 4)
        assert got["a"]["value_before"] == 10.0
        assert got["a"]["value_after"] == 40.0

    def test_null_dim_becomes_segment(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import metric_decomposition
        rows = [("2024-01-01 00:00:00", None, 7.0),
                ("2024-02-01 00:00:00", None, 9.0)]
        df = spark.createDataFrame(rows, "ts string, seg string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = metric_decomposition(df, "ts", "v", ["seg"],
                                   "2024-01-15").collect()
        assert r["dim_value"] == "∅"
        assert r["delta"] == 2.0

    def test_zero_total_change_null_share(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import metric_decomposition
        rows = [("2024-01-01 00:00:00", "a", 10.0),
                ("2024-02-01 00:00:00", "a", 15.0),
                ("2024-01-01 00:00:00", "b", 20.0),
                ("2024-02-01 00:00:00", "b", 15.0)]
        df = spark.createDataFrame(rows, "ts string, seg string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        got = {r["dim_value"]: r for r in metric_decomposition(
            df, "ts", "v", ["seg"], "2024-01-15").collect()}
        # total change is 0 -> share undefined, not inf
        assert got["a"]["share_of_change"] is None
        assert got["a"]["delta"] == 5.0

    def test_validates_and_twin(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import metric_decomposition, metric_decomposition_sql
        import duckdb
        import pytest as _pt
        import random
        rng = random.Random(9)
        rows = [(f"2024-{rng.randint(1, 12):02d}-15 06:00:00",
                 rng.choice("xyz"), rng.choice("pq"),
                 round(rng.uniform(1, 500), 2)) for _ in range(300)]
        df = spark.createDataFrame(
            rows, "ts string, d1 string, d2 string, v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        with _pt.raises(ValueError):
            metric_decomposition(df, "ts", "v", [], "2024-06-01")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, metric_decomposition(
            df, "ts", "v", ["d1", "d2"], "2024-06-01").collect()))
        b = sorted(map(tuple, con.execute(metric_decomposition_sql(
            "t", "ts", "v", ["d1", "d2"], "2024-06-01")).fetchall()))
        assert a == b


class TestTopkTurnover:
    def test_hand_computed_churn(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import topk_turnover
        # before: a=30 b=20 c=10 ; after: a=5 c=40 d=30
        rows = [("2024-01-01", "a", 30.0), ("2024-01-01", "b", 20.0),
                ("2024-01-01", "c", 10.0),
                ("2024-02-01", "a", 5.0), ("2024-02-01", "c", 40.0),
                ("2024-02-01", "d", 30.0)]
        df = spark.createDataFrame(rows, "ts string, k string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = topk_turnover(df, "ts", "k", "v", "2024-01-15",
                            k=2).collect()
        # top2 before {a, b}; top2 after {c, d} -> disjoint
        assert (r["n_common"], r["n_entered"], r["n_exited"]) \
            == (0, 2, 2)
        assert r["jaccard_k"] == 0.0
        assert r["avg_rank_shift"] is None
        [r3] = topk_turnover(df, "ts", "k", "v", "2024-01-15",
                             k=3).collect()
        # top3 before {a,b,c}, after {c,d,a}: common {a, c}
        # ranks a:1->3 (shift 2), c:3->1 (shift 2) -> avg 2.0
        assert r3["n_common"] == 2
        assert r3["avg_rank_shift"] == 2.0
        assert r3["jaccard_k"] == 0.5  # 2 / 4 union

    def test_stable_leaderboard(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import topk_turnover
        rows = [(ts, k, v) for ts in ("2024-01-01", "2024-02-01")
                for k, v in (("a", 3.0), ("b", 2.0), ("c", 1.0))]
        df = spark.createDataFrame(rows, "ts string, k string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        [r] = topk_turnover(df, "ts", "k", "v", "2024-01-15",
                            k=3).collect()
        assert r["jaccard_k"] == 1.0
        assert r["avg_rank_shift"] == 0.0
        assert (r["n_entered"], r["n_exited"]) == (0, 0)
        import pytest as _pt
        with _pt.raises(ValueError):
            topk_turnover(df, "ts", "k", "v", "2024-01-15", k=0)

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import topk_turnover, topk_turnover_sql
        import duckdb
        import random
        rng = random.Random(31)
        rows = [(f"2024-{rng.randint(1, 12):02d}-10",
                 f"k{rng.randint(0, 40)}",
                 round(rng.uniform(1, 500), 2)) for _ in range(400)]
        df = spark.createDataFrame(rows, "ts string, k string, "
                                   "v double") \
            .withColumn("ts", F.to_timestamp("ts"))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [a] = topk_turnover(df, "ts", "k", "v", "2024-06-01",
                            k=15).collect()
        [b] = con.execute(topk_turnover_sql(
            "t", "ts", "k", "v", "2024-06-01", 15)).fetchall()
        assert tuple(a) == b


class TestTheil:
    def test_equal_values_zero(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import theil_decomposition
        df = spark.createDataFrame(
            [("a", 5.0)] * 10 + [("b", 5.0)] * 10, "g string, "
            "v double")
        [r] = theil_decomposition(df, "v", "g").collect()
        assert r["theil_total"] == 0.0
        assert r["theil_within"] == 0.0
        assert r["theil_between"] == 0.0

    def test_decomposition_identity_and_between(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import theil_decomposition
        import random
        rng = random.Random(37)
        # group b's mean is 10x group a's -> between-share dominates
        rows = ([("a", rng.uniform(9, 11)) for _ in range(200)]
                + [("b", rng.uniform(90, 110)) for _ in range(200)])
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = theil_decomposition(df, "v", "g").collect()
        # exact additive decomposition (within rounding)
        assert abs(r["theil_total"]
                   - (r["theil_within"] + r["theil_between"])) < 2e-6
        assert r["between_share"] > 0.9
        # hand check vs pure python
        import math
        vals = [(g, v) for g, v in rows]
        xs = [v for _, v in vals]
        mu = sum(xs) / len(xs)
        t = sum(x / mu * math.log(x / mu) for x in xs) / len(xs)
        assert abs(r["theil_total"] - t) < 1e-4

    def test_fully_degenerate_input_is_null_both_engines(self, spark):
        # ADVICE r12: with every value NULL/non-positive nothing
        # survives the ln-domain filter; the Spark folds previously
        # returned their 0.0 seed while the DuckDB twin's list_reduce
        # over the empty list propagates NULL. Both must be NULL now.
        from nifi_extracttext_processor_spark.operators.profile \
            import theil_decomposition, theil_decomposition_sql
        df = spark.createDataFrame(
            [("a", 0.0), ("a", -1.0), ("b", None)],
            "g string, v double")
        [r] = theil_decomposition(df, "v", "g").collect()
        assert r["n_groups"] == 0
        assert r["theil_within"] is None
        assert r["theil_between"] is None
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [o] = con.execute(theil_decomposition_sql("t", "v", "g")) \
            .fetchall()
        assert tuple(r) == o

    def test_nonpositive_excluded_and_null_dim(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import theil_decomposition
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), (None, 4.0), ("b", 0.0),
             ("b", -3.0), ("b", None)], "g string, v double")
        [r] = theil_decomposition(df, "v", "g").collect()
        assert r["n_entities"] == 3   # 0, -3, NULL excluded
        assert r["n_groups"] == 2     # NULL dim -> its own segment

    def test_twin_parity(self, spark):
        from nifi_extracttext_processor_spark.operators.profile \
            import theil_decomposition, theil_decomposition_sql
        import duckdb
        import random
        rng = random.Random(41)
        rows = [(rng.choice("pqr"), round(rng.uniform(0.5, 200), 3))
                for _ in range(500)]
        df = spark.createDataFrame(rows, "g string, v double")
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [a] = theil_decomposition(df, "v", "g").collect()
        [b] = con.execute(theil_decomposition_sql(
            "t", "v", "g")).fetchall()
        assert tuple(a) == b
