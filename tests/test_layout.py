"""Z-order layout (operators/layout.py): Morton-curve goldens vs an
independent reference, DuckDB twin parity, the measured data-skipping
win over a random layout, and plan shape (narrow, zero UDF).
"""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.layout import (
    cluster_by_zorder,
    file_stats_overlap,
    pruned_file_fraction,
    zorder_reference,
    zorder_value,
    zorder_value_sql,
)


def _grid_df(spark, n=32):
    rows = [(i * n + j, float(i), float(j))
            for i in range(n) for j in range(n)]
    return spark.createDataFrame(rows, "id long, x double, y double")


class TestZValue:
    def test_matches_independent_reference(self, spark):
        df = _grid_df(spark, 8)
        rows = sorted(df.collect(), key=lambda r: r["id"])
        want = zorder_reference([(r["x"], r["y"]) for r in rows], bits=8)
        got = {r["id"]: r["z"] for r in
               zorder_value(df, ["x", "y"], bits=8).collect()}
        assert [got[r["id"]] for r in rows] == want

    def test_known_interleave(self, spark):
        # 2 dims, 2 bits: corners of a 4x4 grid have textbook Morton
        df = spark.createDataFrame(
            [(0, 0.0, 0.0), (1, 3.0, 0.0), (2, 0.0, 3.0),
             (3, 3.0, 3.0), (4, 1.0, 2.0)],
            "id long, x double, y double")
        got = {r["id"]: r["z"] for r in
               zorder_value(df, ["x", "y"], bits=2).collect()}
        # x is dim 0 (even bit positions), y dim 1 (odd)
        assert got[0] == 0b0000 and got[1] == 0b0101
        assert got[2] == 0b1010 and got[3] == 0b1111
        assert got[4] == 0b1001  # x=1 -> 01 even bits, y=2 -> 10 odd

    def test_locality_beats_linear_sort(self, spark):
        # neighbors on the z-curve are near in BOTH dims: the max y-gap
        # within any consecutive z window is bounded, unlike x-sort
        df = _grid_df(spark, 16)
        rows = sorted(zorder_value(df, ["x", "y"], bits=4).collect(),
                      key=lambda r: r["z"])
        window = 16
        worst = 0.0
        for s in range(0, len(rows), window):
            w = rows[s:s + window]
            worst = max(worst,
                        max(r["y"] for r in w) - min(r["y"] for r in w),
                        max(r["x"] for r in w) - min(r["x"] for r in w))
        assert worst <= 4.0  # a 16-cell z window spans <= 4 in each dim

    def test_constant_and_null_columns(self, spark):
        df = spark.createDataFrame(
            [(0, 5.0, None), (1, 5.0, 2.0), (2, 5.0, 5.0),
             (3, 5.0, 8.0)],
            "id long, x double, y double")
        got = {r["id"]: r["z"] for r in
               zorder_value(df, ["x", "y"], bits=4).collect()}
        # null y -> lo -> scaled 0; constant x -> scaled 0 everywhere;
        # y=2 IS the min -> 0; y=5 mid-range and y=8 top are ordered
        assert got[0] == 0 and got[1] == 0
        assert got[3] > got[2] > 0

    def test_pinned_ranges_stable_under_append(self, spark):
        # with pinned ranges the z of existing rows never changes when
        # new data widens the observed min/max
        df1 = spark.createDataFrame([(0, 1.0, 1.0)],
                                    "id long, x double, y double")
        df2 = spark.createDataFrame([(0, 1.0, 1.0), (1, 100.0, -5.0)],
                                    "id long, x double, y double")
        rng = {"x": (0.0, 10.0), "y": (0.0, 10.0)}
        z1 = zorder_value(df1, ["x", "y"], bits=8,
                          ranges=rng).collect()[0]["z"]
        z2 = {r["id"]: r["z"] for r in
              zorder_value(df2, ["x", "y"], bits=8, ranges=rng).collect()}
        assert z2[0] == z1

    def test_out_of_range_values_clamp(self, spark):
        # pinned ranges exist for appends where out-of-range values
        # WILL arrive; they must clamp to the range ends, not
        # sign-extend/wrap into misordered z keys (r7 ADVICE: with
        # range (0,100), a=-20 used to get z=20721 > in-range rows)
        rng = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
        df = spark.createDataFrame(
            [(0, -20.0, 50.0), (1, 0.0, 50.0), (2, 100.0, 50.0),
             (3, 250.0, 50.0), (4, 50.0, 50.0)],
            "id long, x double, y double")
        got = {r["id"]: r["z"] for r in
               zorder_value(df, ["x", "y"], bits=8, ranges=rng).collect()}
        assert 0 <= min(got.values()) and max(got.values()) < 1 << 16
        # below-range clamps to lo's z, above-range to hi's z
        assert got[0] == got[1]
        assert got[3] == got[2]
        # ordering along x holds: clamped-low < mid < clamped-high
        assert got[0] < got[4] < got[2]

    def test_bad_args(self, spark):
        df = _grid_df(spark, 2)
        with pytest.raises(ValueError):
            zorder_value(df, [])
        with pytest.raises(ValueError):
            zorder_value(df, ["x", "y"], bits=32)  # 64 > 62
        with pytest.raises(ValueError):
            zorder_value(df, ["x", "y"], ranges={"x": (0, 1)})
        with pytest.raises(ValueError):
            zorder_value(df, ["x", "y"],
                         ranges={"x": (5, 1), "y": (0, 1)})

    def test_plan_narrow_no_udf(self, spark):
        df = _grid_df(spark, 4)
        plan = zorder_value(df, ["x", "y"], bits=8)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # only the 1-row stats broadcast, no data-sized exchange
        assert "hashpartitioning" not in plan.lower()
        assert "rangepartitioning" not in plan.lower()


class TestZValueDuckDB:
    def test_parity(self, spark):
        import duckdb
        df = _grid_df(spark, 8)
        got = sorted((r["id"], r["z"]) for r in
                     zorder_value(df, ["x", "y"], bits=8)
                     .select("id", "z").collect())
        con = duckdb.connect()
        con.register("grid", df.toPandas())
        want = sorted(
            (int(r["id"]), int(r["z"])) for _, r in con.execute(
                zorder_value_sql("grid", ["x", "y"], bits=8,
                                 id_cols="id")).df().iterrows())
        assert got == want


class TestClusterByZorder:
    def test_skipping_beats_random_layout(self, spark):
        import random
        rnd = random.Random(7)
        rows = [(i, float(rnd.uniform(0, 100)),
                 float(rnd.uniform(0, 100))) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        zdir = tempfile.mkdtemp(prefix="zord_")
        rdir = tempfile.mkdtemp(prefix="rand_")
        cluster_by_zorder(df, ["x", "y"], num_partitions=16) \
            .write.mode("overwrite").parquet(zdir)
        df.repartition(16, "id").write.mode("overwrite").parquet(rdir)
        preds = {"x": (10.0, 20.0), "y": (60.0, 70.0)}
        z_skip = pruned_file_fraction(
            file_stats_overlap(zdir, ["x", "y"]), preds)
        r_skip = pruned_file_fraction(
            file_stats_overlap(rdir, ["x", "y"]), preds)
        # random layout prunes ~nothing; z-order prunes most files
        assert r_skip <= 0.25
        assert z_skip >= 0.5
        assert z_skip > r_skip

    def test_row_preservation_and_schema(self, spark):
        df = _grid_df(spark, 8)
        out = cluster_by_zorder(df, ["x", "y"], num_partitions=4)
        assert out.columns == ["id", "x", "y"]
        assert sorted(r["id"] for r in out.collect()) == \
            sorted(r["id"] for r in df.collect())


class TestHilbert:
    def _pts(self, spark, n=16):
        rows = [(i, float(x), float(y))
                for i, (x, y) in enumerate(
                    (x, y) for x in range(n) for y in range(n))]
        return spark.createDataFrame(
            rows, "id long, x double, y double")

    def test_matches_independent_reference(self, spark):
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_reference, hilbert_value,
        )
        df = self._pts(spark)
        got = {(r["x"], r["y"]): r["h"] for r in
               hilbert_value(df, ["x", "y"], bits=4).collect()}
        pts = sorted(got)
        want = hilbert_reference([(x, y) for x, y in pts], bits=4)
        assert [got[p] for p in pts] == want

    def test_unit_step_adjacency_beats_zorder(self, spark):
        """THE Hilbert property: consecutive keys are orthogonal grid
        neighbors (Manhattan distance exactly 1 at every step); the
        Z-curve jumps diagonally at every quadrant seam."""
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_value, zorder_value,
        )
        df = self._pts(spark)
        hil = sorted(((r["h"], r["x"], r["y"]) for r in
                      hilbert_value(df, ["x", "y"], bits=4).collect()))
        assert all(abs(a[1] - b[1]) + abs(a[2] - b[2]) == 1
                   for a, b in zip(hil, hil[1:]))
        zor = sorted(((r["z"], r["x"], r["y"]) for r in
                      zorder_value(df, ["x", "y"], bits=4).collect()))
        z_jumps = sum(abs(a[1] - b[1]) + abs(a[2] - b[2]) != 1
                      for a, b in zip(zor, zor[1:]))
        assert z_jumps > 0  # morton genuinely lacks the property

    def test_bijection_and_range(self, spark):
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_value,
        )
        df = self._pts(spark)
        hs = [r["h"] for r in
              hilbert_value(df, ["x", "y"], bits=4).collect()]
        assert sorted(hs) == list(range(256))  # perfect bijection

    def test_duckdb_twin_parity(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_value, hilbert_value_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        ev = load_table(spark, sf_dir, "events") \
            .select("event_id", "user_id", "value")
        got = sorted((r["event_id"], r["h"]) for r in
                     hilbert_value(ev, ["user_id", "value"],
                                   bits=8).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW ev AS SELECT event_id, user_id, value "
            f"FROM '{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(hilbert_value_sql(
            "ev", ["user_id", "value"], bits=8,
            id_cols="event_id")).fetchall()))
        assert got == want

    def test_pinned_ranges_append_stable_and_validation(self, spark):
        import pytest as pt
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_value,
        )
        rng = {"x": (0.0, 15.0), "y": (0.0, 15.0)}
        a = self._pts(spark, 8)
        whole = self._pts(spark, 16)
        ha = {(r["x"], r["y"]): r["h"] for r in
              hilbert_value(a, ["x", "y"], bits=4,
                            ranges=rng).collect()}
        hw = {(r["x"], r["y"]): r["h"] for r in
              hilbert_value(whole, ["x", "y"], bits=4,
                            ranges=rng).collect()}
        assert all(hw[p] == h for p, h in ha.items())  # append-stable
        # out-of-range clamps instead of corrupting the key
        far = spark.createDataFrame([(0, -99.0, 99.0)],
                                    "id long, x double, y double")
        [r] = hilbert_value(far, ["x", "y"], bits=4,
                            ranges=rng).collect()
        assert 0 <= r["h"] < 256
        with pt.raises(ValueError):
            hilbert_value(a, ["x"], bits=4)
        with pt.raises(ValueError):
            hilbert_value(a, ["x", "y"], bits=40)

    def test_narrow_plan(self, spark):
        from nifi_extracttext_processor_spark.operators.layout import (
            hilbert_value,
        )
        df = self._pts(spark, 4)
        plan = hilbert_value(df, ["x", "y"], bits=8,
                             ranges={"x": (0.0, 3.0),
                                     "y": (0.0, 3.0)}) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan


class TestClusterByHilbert:
    def test_skipping_at_least_matches_zorder(self, spark):
        """The measured payoff: on a 2-D range predicate the Hilbert
        layout prunes at least as many files as Z-order (its unit-step
        locality keeps per-file boxes tighter at quadrant seams), and
        both demolish a random layout."""
        import random

        from nifi_extracttext_processor_spark.operators.layout import (
            cluster_by_hilbert,
        )
        rnd = random.Random(7)
        rows = [(i, float(rnd.uniform(0, 100)),
                 float(rnd.uniform(0, 100))) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        hdir = tempfile.mkdtemp(prefix="hilb_")
        zdir = tempfile.mkdtemp(prefix="zord2_")
        cluster_by_hilbert(df, ["x", "y"], num_partitions=16) \
            .write.mode("overwrite").parquet(hdir)
        cluster_by_zorder(df, ["x", "y"], num_partitions=16) \
            .write.mode("overwrite").parquet(zdir)
        # average over several query boxes so one lucky seam can't
        # decide the comparison
        boxes = [{"x": (10.0, 20.0), "y": (60.0, 70.0)},
                 {"x": (45.0, 55.0), "y": (45.0, 55.0)},
                 {"x": (70.0, 85.0), "y": (5.0, 20.0)},
                 {"x": (0.0, 12.0), "y": (88.0, 100.0)}]
        h_stats = file_stats_overlap(hdir, ["x", "y"])
        z_stats = file_stats_overlap(zdir, ["x", "y"])
        h_skip = sum(pruned_file_fraction(h_stats, b)
                     for b in boxes) / len(boxes)
        z_skip = sum(pruned_file_fraction(z_stats, b)
                     for b in boxes) / len(boxes)
        assert h_skip >= 0.5
        assert h_skip >= z_skip

    def test_row_preservation_and_schema(self, spark):
        from nifi_extracttext_processor_spark.operators.layout import (
            cluster_by_hilbert,
        )
        df = _grid_df(spark, 8)
        out = cluster_by_hilbert(df, ["x", "y"], num_partitions=4)
        assert out.columns == ["id", "x", "y"]
        assert sorted(r["id"] for r in out.collect()) == \
            sorted(r["id"] for r in df.collect())
