"""Signed-zero normalization regression tests (r16 sweep).

r15 found (at sf1) that the two engines disagree on the SIGN of a
zero rounded from a tiny-negative statistic: DuckDB's round keeps
-0.0 where Spark emits 0.0 — same IEEE value, different serialized
bytes, red driver hash. r15 fixed the rank family; ADVICE r15 + the
SURVEY r16 note extend the `round(x, dp) + 0.0` identity to every
other rounded signed statistic (abtest z/t/diff chains, kappa,
corr/slope chains, log-odds, Theil, FS scores). These tests pin the
class with inputs CONSTRUCTED to round to -0.0 pre-fix: each test
first asserts the premise (the unrounded stat is tiny-negative), so
a data drift can't make it silently vacuous.
"""

import math

import duckdb
import pytest

from pyspark.sql import functions as F


def _copysign_pos(x):
    return math.copysign(1.0, x) > 0


class TestKappaSignedZero:
    """cohen_kappa: agreement just below chance -> kappa in (-eps, 0)."""

    def test_kappa_minus_zero_normalized_and_twin_exact(self, spark):
        from nifi_extracttext_processor_spark.operators.evalmetrics \
            import cohen_kappa, cohen_kappa_sql
        # po = 0.48, pe = 0.5 -> kappa = -0.04; round(-0.04, 1) = -0.0
        rows = ([(0, 0)] * 24 + [(0, 1)] * 26
                + [(1, 0)] * 26 + [(1, 1)] * 24)
        assert -0.05 < (0.48 - 0.5) / (1 - 0.5) < 0  # premise
        df = spark.createDataFrame(rows, "a int, b int")
        [r] = cohen_kappa(df, "a", "b", round_dp=1).collect()
        assert r["kappa"] == 0.0 and _copysign_pos(r["kappa"])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [(n, po, kappa)] = con.execute(
            cohen_kappa_sql("t", "a", "b", round_dp=1)).fetchall()
        assert kappa == 0.0 and _copysign_pos(kappa)
        assert (r["n"], r["po"], r["kappa"]) == (n, po, kappa)


class TestCaTrendSignedZeroAndWidening:
    def _df(self, spark):
        # doses 0/1/2 with a slightly FALLING rate: z tiny-negative
        rows = ([(0, 1)] * 500 + [(0, 0)] * 500
                + [(1, 1)] * 500 + [(1, 0)] * 500
                + [(2, 1)] * 499 + [(2, 0)] * 501)
        return spark.createDataFrame(rows, "dose int, ok int")

    def test_z_minus_zero_normalized_and_twin_exact(self, spark):
        from nifi_extracttext_processor_spark.operators.abtest \
            import ca_trend_test, ca_trend_test_sql
        df = self._df(spark)
        # premise: unrounded z is tiny-negative (|z| < 0.05 so that
        # round(z, 1) lands on a signed zero)
        [raw] = ca_trend_test(df, "dose", "ok", round_dp=10).collect()
        assert -0.05 < raw["z"] < 0
        [r] = ca_trend_test(df, "dose", "ok", round_dp=1).collect()
        assert r["z"] == 0.0 and _copysign_pos(r["z"])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        got = con.execute(
            ca_trend_test_sql("t", "dose", "ok", round_dp=1)
        ).fetchall()
        [(n, successes, n_doses, z, significant)] = got
        assert z == 0.0 and _copysign_pos(z)
        assert (r["n"], r["successes"], r["n_doses"], r["z"],
                r["significant"]) == (n, successes, n_doses, z,
                                      significant)

    def test_wr_operands_widened_before_multiply(self, spark):
        """ADVICE r15: Σwr must widen EACH operand to decimal(38,0)
        BEFORE the multiply (w*s in int64 first can wrap per-row for
        large raw dose scores), matching the twin's
        CAST(w AS HUGEINT) * s."""
        import re
        from nifi_extracttext_processor_spark.operators.abtest \
            import ca_trend_test
        out = ca_trend_test(self._df(spark), "dose", "ok")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert re.search(
            r"cast\(__w#\d+L? as decimal\(38,0\)\) \* "
            r"cast\(__s#\d+ as decimal\(38,0\)\)", plan), \
            "__wr accumulation: operands not widened before multiply"


class TestCorrSlopeSignedZero:
    def test_grouped_corr_minus_zero_both_engines(self, spark):
        from nifi_extracttext_processor_spark.operators.regression \
            import grouped_corr, grouped_corr_sql
        # near-orthogonal data with a tiny NEGATIVE correlation
        rows = [("g", 1.0, 1.0), ("g", 2.0, -1.0),
                ("g", 3.0, -1.0), ("g", 4.0, 0.999)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        [raw] = grouped_corr(df, ["g"], "x", "y",
                             round_to=None).collect()
        assert -0.05 < raw["pearson_r"] < 0  # premise
        [r] = grouped_corr(df, ["g"], "x", "y", round_to=1).collect()
        assert r["pearson_r"] == 0.0 and _copysign_pos(r["pearson_r"])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        [(g, n, pr)] = con.execute(
            grouped_corr_sql("t", ["g"], "x", "y",
                             round_to=1)).fetchall()
        assert pr == 0.0 and _copysign_pos(pr)
        assert (r["g"], r["n_points"], r["pearson_r"]) == (g, n, pr)


class TestDuckdbKeepsMinusZeroWithoutFix:
    """Documents WHY the +0.0 identity is needed: DuckDB's round()
    preserves the sign of a zero rounded from a tiny negative. If a
    DuckDB upgrade ever changes this, the fix is dead code (harmless)
    and this canary flags the behavior change."""

    def test_duckdb_round_keeps_sign(self):
        con = duckdb.connect()
        # DOUBLE input (the operators' type) — a DECIMAL literal
        # rounds through decimal arithmetic, which has no -0.0
        [(v,)] = con.execute(
            "SELECT round(-0.04::DOUBLE, 1)").fetchall()
        assert v == 0.0 and not _copysign_pos(v)
        [(v,)] = con.execute(
            "SELECT round(-0.04::DOUBLE, 1) + 0.0").fetchall()
        assert v == 0.0 and _copysign_pos(v)
