"""Rank-based inference (operators/ranktest.py): Mann-Whitney U with
tie-corrected normal approximation, and Benjamini-Hochberg FDR
control. Goldens are hand-computed; twins run side-by-side in DuckDB;
plan shape pins the distinct-value-aggregate-before-window contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.ranktest import (
    ab_mann_whitney,
    ab_mann_whitney_sql,
    bh_adjust,
    bh_adjust_sql,
)


def _canon(v):
    if isinstance(v, float) and v == v and float(v).is_integer():
        return str(int(v))
    return str(v)


def _twin(df, got, sql):
    con = duckdb.connect()
    con.register("t", df.toPandas())
    odf = con.execute(sql).df()
    assert sorted(got.columns) == sorted(odf.columns)
    cols = got.columns
    s = sorted(",".join(_canon(r[c]) for c in cols)
               for r in (row.asDict() for row in got.collect()))
    o = sorted(",".join(_canon(r[c]) for c in cols)
               for r in odf.to_dict("records"))
    assert s == o


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        """control {1,2,3} vs treatment {2,3,4}: midranks 2.5/4.5 for
        the tied pairs, R1 = 13, U1 = 7, tie term T = 12,
        Var = (9/12)(7 - 12/30) = 4.95, z = 2.5/sqrt(4.95) = 1.1237."""
        df = spark.createDataFrame(
            [("c", 1.0), ("c", 2.0), ("c", 3.0),
             ("t", 2.0), ("t", 3.0), ("t", 4.0)],
            "variant string, value double")
        [r] = ab_mann_whitney(df, "variant", "value", "c", "t") \
            .collect()
        assert (r["n_control"], r["n_treatment"]) == (3, 3)
        assert r["u"] == 7.0
        assert r["z"] == pytest.approx(1.1237, abs=1e-4)
        assert r["significant"] is False
        _twin(df, ab_mann_whitney(df, "variant", "value", "c", "t"),
              ab_mann_whitney_sql("t", "variant", "value", "c", "t"))

    def test_separated_distributions_significant(self, spark):
        rows = [("c", float(i % 10)) for i in range(100)] \
            + [("t", float(i % 10) + 8.0) for i in range(100)]
        df = spark.createDataFrame(rows, "variant string, value double")
        [r] = ab_mann_whitney(df, "variant", "value", "c", "t") \
            .collect()
        assert r["significant"] is True and r["z"] > 5

    def test_degenerate_cells(self, spark):
        # all values tied -> zero variance -> NULL z
        df = spark.createDataFrame(
            [("c", 5.0)] * 4 + [("t", 5.0)] * 4,
            "variant string, value double")
        [r] = ab_mann_whitney(df, "variant", "value", "c", "t") \
            .collect()
        assert r["z"] is None and r["significant"] is False
        # one empty side -> NULL z (and NULL rows excluded)
        df2 = spark.createDataFrame(
            [("c", 1.0), ("c", 2.0), ("t", None)],
            "variant string, value double")
        [r2] = ab_mann_whitney(df2, "variant", "value", "c", "t") \
            .collect()
        assert r2["n_treatment"] == 0 and r2["z"] is None

    def test_grouped_twin_parity_and_adversarial_names(self, spark):
        rows = [(f"g{i % 3}", "o'c" if i % 2 else 't"t',
                 float((i * 7) % 13) + (1.0 if i % 2 else 0.0))
                for i in range(240)]
        df = spark.createDataFrame(
            rows, "seg string, variant string, value double")
        got = ab_mann_whitney(df, "variant", "value", "o'c", 't"t',
                              group_by=["seg"])
        _twin(df, got, ab_mann_whitney_sql(
            "t", "variant", "value", "o'c", 't"t', group_by=["seg"]))

    def test_plan_distinct_value_agg_before_window(self, spark):
        """The shuffle must carry distinct values, never rows: a
        HashAggregate (partial, map-side) appears BELOW the Window in
        the physical plan, and no Python/Arrow eval anywhere."""
        rows = [("c" if i % 2 else "t", float(i % 5))
                for i in range(50)]
        df = spark.createDataFrame(rows, "variant string, value double")
        out = ab_mann_whitney(df, "variant", "value", "c", "t")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert plan.index("HashAggregate") < plan.index("Window") \
            or "partial" in plan.lower()
        assert "Python" not in plan and "Arrow" not in plan


class TestBhAdjust:
    PV = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074,
          0.205, 0.212, 0.216]

    def _df(self, spark, pvals=None):
        pv = self.PV if pvals is None else pvals
        return spark.createDataFrame(
            [(f"m{i}", p) for i, p in enumerate(pv)],
            "metric string, p double")

    def test_step_up_beats_per_test_threshold(self, spark):
        """q=0.05 on the classic sweep: p_(3)=0.039 > 3*.05/10=.015,
        but p_(1)=.001 <= .005 and p_(2)=.008 <= .01 -> k=2, exactly
        the first two rejected (0.039 survives per-test alpha=.05 but
        not BH — the whole point of the correction)."""
        out = {r["metric"]: r for r in
               bh_adjust(self._df(spark), "p", q=0.05).collect()}
        rejected = {m for m, r in out.items() if r["rejected"]}
        assert rejected == {"m0", "m1"}
        assert out["m0"]["p_rank"] == 1 and out["m0"]["m"] == 10
        assert out["m9"]["bh_critical"] == pytest.approx(0.05)

    def test_step_up_reaches_back_over_local_failures(self, spark):
        """q=0.25: p_(8)=0.205 fails 8*.25/10=.2 but p_(10)=0.216 <=
        .25 -> k=10 rejects EVERYTHING including the local failure —
        the step-up property a naive per-rank filter gets wrong."""
        out = bh_adjust(self._df(spark), "p", q=0.25).collect()
        assert all(r["rejected"] for r in out)

    def test_tied_block_decides_together(self, spark):
        # two copies of a p straddling its own rank thresholds must
        # agree (criterion evaluated at the block END)
        pv = [0.01, 0.02, 0.02, 0.9]
        out = bh_adjust(self._df(spark, pv), "p", q=0.1).collect()
        tied = [r for r in out if r["p"] == 0.02]
        assert len(tied) == 2
        assert len({r["rejected"] for r in tied}) == 1
        assert all(r["p_rank"] == 3 for r in tied)  # block end

    def test_null_passthrough_and_validation(self, spark):
        df = spark.createDataFrame(
            [("a", 0.001), ("b", None)], "metric string, p double")
        out = {r["metric"]: r for r in
               bh_adjust(df, "p", q=0.05).collect()}
        assert out["b"]["rejected"] is False
        assert out["b"]["m"] is None and out["b"]["p_rank"] is None
        assert out["a"]["rejected"] is True and out["a"]["m"] == 1
        with pytest.raises(ValueError, match="q must be"):
            bh_adjust(df, "p", q=0.0)

    def test_grouped_twin_parity(self, spark):
        rows = [(f"fam{i % 2}", f"m{i}",
                 ((i * 37) % 100) / 99.0) for i in range(60)]
        df = spark.createDataFrame(rows,
                                   "fam string, metric string, p double")
        got = bh_adjust(df, "p", q=0.1, group_by=["fam"])
        _twin(df, got, bh_adjust_sql("t", "p", q=0.1,
                                     group_by=["fam"]))


class TestSpearman:
    def test_perfect_monotone_and_inverted(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman
        # nonlinear but perfectly monotone -> rho exactly 1
        rows = [(float(i), float(i ** 3)) for i in range(1, 21)]
        [r] = corr_spearman(
            spark.createDataFrame(rows, "x double, y double"),
            "x", "y").collect()
        assert r["rho"] == 1.0 and r["significant"]
        inv = [(float(i), float(-i)) for i in range(1, 21)]
        [i] = corr_spearman(
            spark.createDataFrame(inv, "x double, y double"),
            "x", "y").collect()
        assert i["rho"] == -1.0

    def test_hand_computed_with_ties(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman
        rows = [(1.0, 2.0), (2.0, 2.0), (3.0, 5.0), (4.0, 4.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        [r] = corr_spearman(df, "x", "y").collect()
        # ranks x: 1,2,3,4; ranks y: 1.5,1.5,4,3 -> pearson by hand
        import math
        rx = [1, 2, 3, 4]
        ry = [1.5, 1.5, 4, 3]
        n = 4
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        want = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        assert r["rho"] == round(want, 6)

    def test_constant_margin_null(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double")
        [r] = corr_spearman(df, "x", "y").collect()
        assert r["rho"] is None and not r["significant"]

    def test_grouped_twin_parity(self, spark):
        import duckdb
        import random

        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman, corr_spearman_sql
        rng = random.Random(2)
        rows = []
        for g in ("a", "b"):
            for _ in range(300):
                x = round(rng.uniform(0, 10), 1)
                y = (round(x * 2 + rng.uniform(0, 3), 1) if g == "a"
                     else round(rng.uniform(0, 10), 1))
                rows.append((g, x, y))
        df = spark.createDataFrame(rows, "g string, x double, y double")
        a = sorted(map(tuple, corr_spearman(
            df, "x", "y", group_by=["g"]).collect()))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        b = sorted(con.execute(corr_spearman_sql(
            "t", "x", "y", group_by=["g"])).fetchall())
        assert a == b
        byg = {t[0]: t for t in a}
        assert byg["a"][2] > 0.95 and byg["a"][3]
        assert not byg["b"][3]


class TestWilcoxonSigned:
    def _frame(self, spark, effect, heavy=False):
        import datetime
        import random
        rng = random.Random(8)
        rows = []
        for u in range(150):
            base = rng.uniform(5, 500)
            for i in range(3):
                rows.append((u, datetime.datetime(2024, 1, 1 + i),
                             round(base + rng.uniform(-1, 1), 2)))
            for i in range(3):
                eff = effect
                if heavy and u == 0:
                    eff = -1000.0  # one catastrophic outlier unit
                rows.append((u, datetime.datetime(2024, 2, 1 + i),
                             round(base + eff + rng.uniform(-1, 1),
                                   2)))
        return spark.createDataFrame(rows,
                                     "u long, ts timestamp, v double")

    def test_detects_uniform_shift_between_unit_noise(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed
        [r] = ab_wilcoxon_signed(self._frame(spark, 1.0), "u", "v",
                                 "ts", "2024-01-20").collect()
        assert r["n_units"] == 150
        assert r["z"] > 8 and r["significant"]
        [n] = ab_wilcoxon_signed(self._frame(spark, 0.0), "u", "v",
                                 "ts", "2024-01-20").collect()
        assert not n["significant"]

    def test_outlier_robustness_vs_paired_t(self, spark):
        """One catastrophic unit (-1000 shift) against 149 units of
        +1: the rank test must stay significant-positive while the
        mean-of-diffs paired t is dragged toward it."""
        from nifi_extracttext_processor_spark.operators.abtest \
            import ab_paired_t
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed
        df = self._frame(spark, 1.0, heavy=True)
        [w] = ab_wilcoxon_signed(df, "u", "v", "ts",
                                 "2024-01-20").collect()
        [t] = ab_paired_t(df, "u", "v", "ts", "2024-01-20").collect()
        assert w["z"] > 8 and w["significant"]
        assert abs(t["t"]) < abs(w["z"])  # the mean chased the outlier

    def test_zero_diffs_excluded_and_counted(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed
        import datetime
        rows = []
        for u in range(6):
            d = 0.0 if u < 2 else 1.0
            rows.append((u, datetime.datetime(2024, 1, 1), 10.0))
            rows.append((u, datetime.datetime(2024, 2, 1), 10.0 + d))
        df = spark.createDataFrame(rows,
                                   "u long, ts timestamp, v double")
        [r] = ab_wilcoxon_signed(df, "u", "v", "ts",
                                 "2024-01-20").collect()
        assert r["n_zero"] == 2 and r["n_units"] == 4
        # all 4 diffs tied at +1: z NULL is wrong — variance formula:
        # one tie group of 4 -> var > 0? 2n(n+1)(2n+1)-Σ(t³-t)
        # = 2*4*5*9 - (64-4) = 360-60 = 300 > 0 -> z defined
        assert r["z"] is not None and r["w_plus_x2"] == 4 * 5

    def test_grouped_twin_parity(self, spark):
        import datetime
        import random

        import duckdb

        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed, ab_wilcoxon_signed_sql
        rng = random.Random(8)
        rows = []
        for g in ("x", "y"):
            eff = 1.0 if g == "x" else 0.0
            for u in range(150):
                base = rng.uniform(5, 500)
                for i in range(3):
                    rows.append((g, u,
                                 datetime.datetime(2024, 1, 1 + i),
                                 round(base + rng.uniform(-1, 1), 2)))
                for i in range(3):
                    rows.append((g, u,
                                 datetime.datetime(2024, 2, 1 + i),
                                 round(base + eff
                                       + rng.uniform(-1, 1), 2)))
        df = spark.createDataFrame(
            rows, "g string, u long, ts timestamp, v double")
        a = sorted(map(tuple, ab_wilcoxon_signed(
            df, "u", "v", "ts", "2024-01-20",
            group_by=["g"]).collect()))
        con = duckdb.connect()
        con.register("t", df.toPandas())
        b = sorted(con.execute(ab_wilcoxon_signed_sql(
            "t", "u", "v", "ts", "2024-01-20",
            group_by=["g"])).fetchall())
        assert a == b


class TestMonotoneInvariance:
    """The DEFINING property of the rank family: every statistic must
    be exactly invariant under strictly monotone transforms of the
    metric (exp-ish scaling, cube, affine) — that is the reason to
    reach for these tests over their moment-based siblings, so it is
    pinned exactly, not approximately."""

    def _rows(self, n=400, seed=31):
        import random
        rng = random.Random(seed)
        return [("c" if i % 2 else "t",
                 round(rng.uniform(0, 50), 1)
                 + (3.0 if i % 2 == 0 else 0.0)) for i in range(n)]

    def test_mann_whitney_invariant(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_mann_whitney
        df = spark.createDataFrame(self._rows(),
                                   "variant string, v double")
        base = ab_mann_whitney(df, "variant", "v", "c", "t") \
            .collect()[0]
        for expr in ("v * v * v", "v * 7.0 + 100.0"):
            t = df.withColumn("v", F.expr(expr))
            got = ab_mann_whitney(t, "variant", "v", "c",
                                  "t").collect()[0]
            assert got["u"] == base["u"], expr
            assert got["z"] == base["z"], expr

    def test_spearman_invariant_on_both_margins(self, spark):
        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman
        import random
        rng = random.Random(7)
        rows = [(round(rng.uniform(1, 9), 1),) for _ in range(300)]
        df = spark.createDataFrame(rows, "x double").withColumn(
            "y", F.col("x") * 2 + F.lit(1.0))
        base = corr_spearman(df, "x", "y").collect()[0]
        warped = df.select(
            (F.col("x") * F.col("x") * F.col("x")).alias("x"),
            (F.col("y") * 11.0 + 5.0).alias("y"))
        got = corr_spearman(warped, "x", "y").collect()[0]
        assert got["rho"] == base["rho"] == 1.0

    def test_wilcoxon_invariant_under_affine_value_maps(self, spark):
        """Signed-rank is invariant under POSITIVE AFFINE maps of the
        metric (diffs scale by a, ranks of |d| and signs unchanged);
        general monotone maps do change per-unit diffs, so affine is
        the exact invariance to pin."""
        import datetime
        import random

        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed
        rng = random.Random(3)
        rows = []
        for u in range(120):
            base = rng.uniform(10, 20)
            rows.append((u, datetime.datetime(2024, 1, 1),
                         round(base, 2)))
            rows.append((u, datetime.datetime(2024, 2, 1),
                         round(base + rng.uniform(-1, 2), 2)))
        df = spark.createDataFrame(rows,
                                   "u long, ts timestamp, v double")
        base_r = ab_wilcoxon_signed(df, "u", "v", "ts",
                                    "2024-01-20").collect()[0]
        aff = df.withColumn("v", F.col("v") * 4.0 + 1000.0)
        got = ab_wilcoxon_signed(aff, "u", "v", "ts",
                                 "2024-01-20").collect()[0]
        assert got["w_plus_x2"] == base_r["w_plus_x2"]
        assert got["z"] == base_r["z"]


class TestAccumulationOverflowRegression:
    """r15 widening (ADVICE r14 generalized): at ~2-4e6 rows per
    group the spearman sxx fold and a degenerate all-tied wilcoxon
    tie term exceed int64 — pre-fix, Spark silently wrapped while
    the DuckDB BIGINT twin raised. These fixtures are sized PAST the
    int64 wrap point, so engine agreement here proves the
    decimal(38,0)/HUGEINT accumulation end-to-end."""

    def test_spearman_exact_past_int64_wrap(self, spark):
        import duckdb
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.ranktest \
            import corr_spearman, corr_spearman_sql
        n = 4_000_000  # sxx ~ 4N^3/3 = 8.5e19 >> int64 max 9.2e18
        df = (spark.range(n)
              .select((F.col("id") % 3).cast("double").alias("x"),
                      (F.col("id") % 5).cast("double").alias("y")))
        [r] = corr_spearman(df, "x", "y").collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW t AS SELECT CAST(range % 3 AS DOUBLE) AS x,"
            " CAST(range % 5 AS DOUBLE) AS y FROM range("
            + str(n) + ")")
        want = con.execute(corr_spearman_sql("t", "x", "y")).fetchone()
        assert r["n"] == want[0] == n
        # float compare (0.0 == -0.0): a wrapped int64 accumulation
        # would put rho far from zero, not flip its signed zero
        assert r["rho"] == want[1]
        # near-independent residue classes: rho exists and is tiny
        assert r["rho"] is not None and abs(r["rho"]) < 0.01

    def test_wilcoxon_tie_term_past_int64_wrap(self, spark):
        import duckdb
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.ranktest \
            import ab_wilcoxon_signed, ab_wilcoxon_signed_sql
        # 3e6 units, ALL with the same |diff| -> one tied block with
        # t = 3e6, tie term t^3 - t = 2.7e19 > int64 max
        n = 3_000_000
        pre = (spark.range(n)
               .select(F.concat(F.lit("u"), F.col("id")).alias("unit"),
                       F.lit(1.0).alias("value"),
                       F.lit("2024-01-01 00:00:00").cast("timestamp")
                       .alias("ts")))
        post = (spark.range(n)
                .select(F.concat(F.lit("u"), F.col("id"))
                        .alias("unit"),
                        F.lit(3.5).alias("value"),
                        F.lit("2024-02-01 00:00:00").cast("timestamp")
                        .alias("ts")))
        df = pre.unionByName(post)
        [r] = ab_wilcoxon_signed(df, "unit", "value", "ts",
                                 "2024-01-15").collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW t AS "
            "SELECT 'u' || range AS unit, 1.0 AS value,"
            " TIMESTAMP '2024-01-01 00:00:00' AS ts FROM range("
            + str(n) + ") "
            "UNION ALL SELECT 'u' || range, 3.5,"
            " TIMESTAMP '2024-02-01 00:00:00' FROM range("
            + str(n) + ")")
        want = con.execute(ab_wilcoxon_signed_sql(
            "t", "unit", "value", "ts", "2024-01-15")).fetchone()
        got = tuple(str(v) for v in r)
        assert got == tuple(str(v) for v in want)
        assert r["n_units"] == n
        # all diffs positive and tied: W+ = n(n+1)/2 exactly
        assert r["w_plus_x2"] == n * (n + 1)
