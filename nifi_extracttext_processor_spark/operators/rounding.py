"""Cross-engine double rounding (r16).

The sf1 battery caught `training_data_prep` diverging on a rounded
quality score: the IDENTICAL input double 0.9452499999999999 rounds
to 0.9452 under Spark's `F.round(x, 4)` but 0.9453 under DuckDB's
`round(x, 4)`. Mechanism: Spark rounds the double's SHORTEST DECIMAL
REPR (`BigDecimal.valueOf` = `Double.toString`) with HALF_UP, while
DuckDB computes `std::round(x * 10^dp) / 10^dp` — the multiply can
land exactly ON a representable half (0.94524999... * 1e4 rounds to
exactly 9452.5), which then rounds the other way. The class is
data-dependent and bites hardest on RATIONAL-valued statistics
(ratios of small integers — rates, score mixes, po, precision), whose
true values sit exactly on decimal half-boundaries; measured rate on
a boundary-dense sample: ~0.2% of values at dp=4.

`dround(col, dp)` spells Spark's side AS the multiply: verified
equal to DuckDB's round on 21k adversarial samples at dp in
{0,1,2,4,6} with zero mismatches (including exact .5 ties, negative
ties, and shortest-repr boundary cases), where plain `F.round`
showed 43 mismatches. dp=0 needs no fix (no multiply happens, both
engines round the same double), so quantization-grid sites
(`F.round(x * 1e6).cast(...)`) stay as they are — they ARE already
the multiply spelling.

Signed zeros: `F.round(neg_tiny * p)` yields +0.0 in Spark (BigDecimal
zero is unsigned) but -0.0 in DuckDB (`std::round` keeps the sign), so
signed statistics STILL need the `+ 0.0` normalization on both sides
(see the kruskal_wallis note in ranktest.py) — dround does not change
that contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_round_spark(y: float) -> float:
    """Driver-side replica of Spark's F.round(double) at dp=0:
    BigDecimal.valueOf(y) (= the shortest decimal repr, which Python's
    repr() also produces) rounded HALF_UP (= half away from zero, the
    decimal module's ROUND_HALF_UP). Used to pre-solve comparison
    boundaries for numpy kernels — never per row."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if math.isnan(y) or math.isinf(y):
        return y
    return float(Decimal(repr(y)).quantize(Decimal(1), ROUND_HALF_UP))


def dround_ge_boundary(threshold: float, ndigits: int) -> float:
    """Smallest double B with dround(B, ndigits) >= threshold, so that
    `dround(x, ndigits) >= threshold` == `x >= B` for every non-NaN
    double x (dround is monotone: multiply by a positive power of ten,
    round, divide — each step order-preserving). Lets a vectorized
    kernel apply the exact Catalyst comparison as one plain `>=`.
    NaN compares greater than everything in both engines, so kernel
    users must OR in isnan(x) themselves."""
    import math
    import struct

    p = float(10 ** int(ndigits))

    def pred(x: float) -> bool:
        return (py_round_spark(x * p) / p) >= threshold

    # total-order encode: non-negative doubles keep their bit pattern,
    # negative ones flip the 63 value bits, so signed-int order ==
    # float order (-inf .. -0.0 .. +0.0 .. +inf); the map is an
    # involution, so dec == enc on the bit level
    def enc(x: float) -> int:
        b = struct.unpack("<q", struct.pack("<d", x))[0]
        return b if b >= 0 else b ^ 0x7FFFFFFFFFFFFFFF

    def dec(i: int) -> float:
        b = i if i >= 0 else i ^ 0x7FFFFFFFFFFFFFFF
        return struct.unpack("<d", struct.pack("<q", b))[0]

    lo, hi = enc(-math.inf), enc(math.inf)
    if pred(dec(lo)):
        return -math.inf
    if not pred(dec(hi)):
        return math.inf
    # invariant: pred(dec(hi)) and not pred(dec(lo))
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if pred(dec(mid)):
            hi = mid
        else:
            lo = mid
    return dec(hi)


def dround(col: Column, ndigits: int) -> Column:
    """Round a DOUBLE column to `ndigits` decimals with the exact
    semantics of DuckDB's `round(x, ndigits)` (multiply, round half
    away from zero at integer grain, divide). Drop-in replacement for
    presentation `F.round(col, ndigits)` in any operator whose DuckDB
    twin rounds the same double."""
    if isinstance(col, str):
        # F.round accepts a column NAME; `"name" * p` would instead
        # build `lit("name") * p` via __rmul__ — coerce first
        col = F.col(col)
    nd = int(ndigits)
    if nd == 0:
        return F.round(col)
    p = F.lit(float(10 ** nd))
    return F.round(col * p) / p
