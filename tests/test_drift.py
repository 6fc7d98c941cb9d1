"""distribution_drift (operators/drift.py): PSI/KS values vs an
independent pure-Python binned computation, identical-distribution
zero, shift sensitivity, outlier clamping, empty-side semantics,
grouped spine completeness, and DuckDB twin parity."""
from __future__ import annotations

import math

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators.drift import (
    derive_frame,
    distribution_drift,
    distribution_drift_sql,
)


def _ref_psi_ks(ref_vals, cur_vals, lo, hi, bins, alpha=0.5):
    width = (hi - lo) / bins
    def counts(vs):
        c = [0] * bins
        for v in vs:
            c[min(bins - 1, max(0, int(math.floor((v - lo) / width))))] += 1
        return c
    cr, cc = counts(ref_vals), counts(cur_vals)
    tr, tc = sum(cr), sum(cc)
    psi = sum(((nc + alpha) / (tc + alpha * bins)
               - (nr + alpha) / (tr + alpha * bins))
              * math.log(((nc + alpha) / (tc + alpha * bins))
                         / ((nr + alpha) / (tr + alpha * bins)))
              for nr, nc in zip(cr, cc))
    ks, ar, ac = 0.0, 0, 0
    for nr, nc in zip(cr, cc):
        ar, ac = ar + nr, ac + nc
        ks = max(ks, abs(ar / tr - ac / tc))
    return psi, ks


REF = [0.05 * i % 1.0 for i in range(200)]            # ~uniform
CUR_SAME = [0.05 * i % 1.0 for i in range(200)]
CUR_SHIFT = [min(0.999, 0.05 * i % 1.0 + 0.3) for i in range(200)]


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda vs, g: spark.createDataFrame(
        [(g, float(v)) for v in vs], "g string, v double")
    return mk(REF, "a"), mk(CUR_SAME, "a"), mk(CUR_SHIFT, "a")


def test_identical_distribution_is_zero(spark, frames):
    ref, same, _ = frames
    r = distribution_drift(ref, same, "v", lo=0.0, hi=1.0,
                           bins=10).collect()[0]
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)
    assert r["ks"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_ref"] == r["n_cur"] == 200


def test_matches_reference_on_shift(spark, frames):
    ref, _, shift = frames
    want_psi, want_ks = _ref_psi_ks(REF, CUR_SHIFT, 0.0, 1.0, 10)
    r = distribution_drift(ref, shift, "v", lo=0.0, hi=1.0,
                           bins=10, round_to=9).collect()[0]
    assert r["psi"] == pytest.approx(want_psi, abs=1e-8)
    assert r["ks"] == pytest.approx(want_ks, abs=1e-8)
    assert r["psi"] > 0.25          # a 0.3 shift is an action-level drift


def test_outliers_clamp_to_edge_bins(spark):
    ref = spark.createDataFrame([(0.5,)] * 10, "v double")
    cur = spark.createDataFrame([(-99.0,), (999.0,)] * 5, "v double")
    r = distribution_drift(ref, cur, "v", lo=0.0, hi=1.0,
                           bins=4).collect()[0]
    want_psi, want_ks = _ref_psi_ks([0.5] * 10, [-99.0, 999.0] * 5,
                                    0.0, 1.0, 4)
    assert r["psi"] == pytest.approx(want_psi, abs=1e-6)
    assert r["ks"] == pytest.approx(want_ks, abs=1e-6)


def test_grouped_with_one_sided_group(spark):
    ref = spark.createDataFrame(
        [("a", 0.1), ("a", 0.9), ("b", 0.5)], "g string, v double")
    cur = spark.createDataFrame(
        [("a", 0.1), ("a", 0.9), ("c", 0.5)], "g string, v double")
    rows = {r["g"]: r for r in distribution_drift(
        ref, cur, "v", ["g"], lo=0.0, hi=1.0, bins=5).collect()}
    assert set(rows) == {"a", "b", "c"}          # union of groups
    assert rows["a"]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert rows["b"]["n_cur"] == 0 and rows["c"]["n_ref"] == 0
    assert rows["b"]["psi"] > 0                  # absent side drifts
    assert rows["b"]["ks"] is None               # CDF undefined at n=0


def test_derive_frame(spark, frames):
    ref, _, _ = frames
    lo, hi = derive_frame(ref, "v")
    assert lo == min(REF) and hi == max(REF)


def test_duckdb_twin_parity(spark, tmp_path):
    ref = spark.createDataFrame(
        [("a", 0.07 * i % 1.0) for i in range(150)]
        + [("b", 0.03 * i % 0.8) for i in range(90)],
        "g string, v double")
    cur = spark.createDataFrame(
        [("a", min(0.999, 0.07 * i % 1.0 + 0.2)) for i in range(120)]
        + [("c", 0.5)] * 7, "g string, v double")
    pr, pc = str(tmp_path / "r.parquet"), str(tmp_path / "c.parquet")
    ref.coalesce(1).write.parquet(pr)
    cur.coalesce(1).write.parquet(pc)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pr}/*.parquet')")
    con.execute(f"CREATE VIEW c AS SELECT * FROM read_parquet('{pc}/*.parquet')")
    for gcols in (["g"], []):
        sql = distribution_drift_sql("r", "c", "v", gcols,
                                     lo=0.0, hi=1.0, bins=8)
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        got = {tuple(r) for r in distribution_drift(
            ref, cur, "v", gcols, lo=0.0, hi=1.0, bins=8).collect()}
        assert got == want, gcols


def test_validation(spark, frames):
    ref, cur, _ = frames
    with pytest.raises(ValueError):
        distribution_drift(ref, cur, "v", bins=1)
    with pytest.raises(ValueError):
        distribution_drift(ref, cur, "v", lo=1.0, hi=1.0)


class TestKsExact:
    def test_hand_computed(self, spark):
        from nifi_extracttext_processor_spark.operators.drift import (
            ks_test_exact,
        )
        # a = {1,2,3,4}, b = {3,4,5,6}: max ECDF gap at v=2: 2/4 - 0
        rows = ([("a", float(v)) for v in (1, 2, 3, 4)]
                + [("b", float(v)) for v in (3, 4, 5, 6)])
        df = spark.createDataFrame(rows, "s string, v double")
        [r] = ks_test_exact(df, "s", "v", "a", "b").collect()
        assert r["ks_d"] == 0.5
        assert (r["n_a"], r["n_b"]) == (4, 4)

    def test_identical_zero_and_disjoint_one(self, spark):
        from nifi_extracttext_processor_spark.operators.drift import (
            ks_test_exact,
        )
        same = spark.createDataFrame(
            [(s, float(v)) for s in ("a", "b") for v in range(20)],
            "s string, v double")
        [r] = ks_test_exact(same, "s", "v", "a", "b").collect()
        assert r["ks_d"] == 0.0 and r["significant"] is False
        disj = spark.createDataFrame(
            [("a", float(v)) for v in range(20)]
            + [("b", float(v + 100)) for v in range(20)],
            "s string, v double")
        [r2] = ks_test_exact(disj, "s", "v", "a", "b").collect()
        assert r2["ks_d"] == 1.0 and r2["significant"] is True

    def test_shift_detected_with_ties(self, spark):
        from nifi_extracttext_processor_spark.operators.drift import (
            ks_test_exact,
        )
        import random
        rng = random.Random(2)
        rows = ([("a", float(round(rng.gauss(0, 1), 1)))
                 for _ in range(400)]
                + [("b", float(round(rng.gauss(0.8, 1), 1)))
                   for _ in range(400)])
        df = spark.createDataFrame(rows, "s string, v double")
        [r] = ks_test_exact(df, "s", "v", "a", "b").collect()
        assert r["significant"] is True
        assert 0.2 < r["ks_d"] < 0.6

    def test_validation_and_twin(self, spark):
        from nifi_extracttext_processor_spark.operators.drift import (
            ks_test_exact,
            ks_test_exact_sql,
        )
        import duckdb
        import pytest as _pt
        import random
        rng = random.Random(8)
        rows = [(rng.choice("gh"), rng.choice("ab"),
                 float(round(rng.uniform(0, 10), 2)))
                for _ in range(500)]
        df = spark.createDataFrame(rows, "g string, s string, "
                                   "v double")
        with _pt.raises(ValueError):
            ks_test_exact(df, "s", "v", "a", "b", alpha=0.0)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        a = sorted(map(tuple, ks_test_exact(
            df, "s", "v", "a", "b", ["g"]).collect()))
        b = sorted(map(tuple, con.execute(ks_test_exact_sql(
            "t", "s", "v", "a", "b", ["g"])).fetchall()))
        assert a == b


def test_stream_drift_monitor(spark, tmp_path):
    """Per-micro-batch PSI/KS drift reports land as an audit log
    with batch ids; values reconcile exactly with the batch operator
    over the same data."""
    from nifi_extracttext_processor_spark.streaming.pipeline import (
        stream_drift_monitor,
    )
    src = str(tmp_path / "in")
    out = str(tmp_path / "report")
    # reference ~ uniform(0, 10); current shifted up
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(200)], "v double")
    cur = spark.createDataFrame(
        [(float(i % 10) + 3.0,) for i in range(150)], "v double")
    cur.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("v double").parquet(src)
    q = stream_drift_monitor(
        stream, ref, "v", 0.0, 10.0, out,
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rep = spark.read.parquet(out).collect()
    assert {r["batch_id"] for r in rep} == {0}
    got = [(r["n_ref"], r["n_cur"], r["psi"], r["ks"]) for r in rep]
    batch = [(r["n_ref"], r["n_cur"], r["psi"], r["ks"]) for r in
             distribution_drift(ref, cur, "v", lo=0.0,
                                hi=10.0).collect()]
    assert got == batch
    # a 3-unit shift on a 10-wide frame is a real drift signal
    assert rep[0]["psi"] > 0.25
