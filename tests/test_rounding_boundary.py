"""dround_ge_boundary: the driver-side boundary solve that lets the
semantic-dedup kernels apply `dround(x, 6) >= t` as a plain `x >= B`.

Pins (1) py_round_spark against Spark's actual F.round(double) on
boundary-dense samples, and (2) the solved boundary against the
Catalyst comparison on doubles straddling the 1e-6 grid — the exact
contract the r16 pair-prune kernels rely on."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.rounding import (
    dround,
    dround_ge_boundary,
    py_round_spark,
)


def _nextafter_chain(x: float, n: int) -> list[float]:
    out = [x]
    up, down = x, x
    for _ in range(n):
        up = math.nextafter(up, math.inf)
        down = math.nextafter(down, -math.inf)
        out += [up, down]
    return out


def _boundary_samples() -> list[float]:
    vals: list[float] = []
    for t in (0.4, 0.95, -0.25, 0.0, 0.123456, 1.0):
        vals += _nextafter_chain(t, 3)
        # doubles whose x*1e6 lands exactly on a representable half
        vals += _nextafter_chain(t + 5e-7, 3)
        vals += _nextafter_chain(t - 5e-7, 3)
    vals += [0.9452499999999999, -0.9452499999999999,
             0.49999999999999994, -0.49999999999999994]
    return vals


class TestPyRoundSpark:
    def test_matches_spark_round_on_boundary_dense_sample(self, spark):
        xs = [x * 1e6 for x in _boundary_samples()]
        df = spark.createDataFrame([(x,) for x in xs], "y double")
        got = [r["r"] for r in
               df.select(F.round("y").alias("r")).collect()]
        want = [py_round_spark(x) for x in xs]
        assert got == want

    def test_half_away_from_zero(self):
        assert py_round_spark(2.5) == 3.0
        assert py_round_spark(-2.5) == -3.0
        # largest double below 0.5 must NOT round up (shortest-repr
        # semantics; naive floor(x+0.5) gets this wrong)
        assert py_round_spark(0.49999999999999994) == 0.0


class TestBoundary:
    @pytest.mark.parametrize("t", [0.4, 0.95, -0.25, 0.0, 0.123456])
    def test_boundary_is_tight(self, t):
        B = dround_ge_boundary(t, 6)
        p = 1e6

        def pred(x):
            return (py_round_spark(x * p) / p) >= t

        assert pred(B)
        prev = math.nextafter(B, -math.inf)
        assert not pred(prev)

    @pytest.mark.parametrize("t", [0.4, 0.95])
    def test_compare_equals_catalyst_on_straddle(self, spark, t):
        B = dround_ge_boundary(t, 6)
        xs = [x for x in _boundary_samples()
              if not (math.isnan(x) or math.isinf(x))]
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        got = [bool(r["m"]) for r in df.select(
            (dround(F.col("x"), 6) >= F.lit(t)).alias("m")).collect()]
        want = [x >= B for x in xs]
        assert got == want

    def test_bit_level_encode_roundtrip(self):
        # the solver's total-order encode must be monotone across the
        # sign boundary (regression for the involution trick)
        for a, b in [(-1.0, -0.5), (-0.5, -0.0), (-0.0, 0.0),
                     (0.0, 0.5), (0.5, 1.0)]:
            Ba = dround_ge_boundary(a, 6)
            Bb = dround_ge_boundary(b, 6)
            assert Ba <= Bb

    def test_struct_pack_sanity(self):
        # enc/dec as implemented: involution on raw bits
        for x in [-math.inf, -1.5, -0.0, 0.0, 2.75, math.inf]:
            bts = struct.unpack("<q", struct.pack("<d", x))[0]
            enc = bts if bts >= 0 else bts ^ 0x7FFFFFFFFFFFFFFF
            dec = enc if enc >= 0 else enc ^ 0x7FFFFFFFFFFFFFFF
            assert dec == bts
