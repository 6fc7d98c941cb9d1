"""Portable scalar-expression builders: each helper emits a DuckDB SQL
string that reproduces, value for value, what the matching Spark
expression computes (the driver's correctness gate runs both sides and
hash-compares, so arithmetic order, rounding, and hash family must be
identical — md5 + hex parsing everywhere, fold-left float sums).

The Spark sides live next to their operators (operators/dedup.py
cosine(), operators/similarity.py, operators/multimodal.py kernels);
these are their SQL twins, kept in one registry so constants stay in
sync.
"""

from __future__ import annotations


def cosine_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin of operators.dedup.cosine (fold-left dot + norms,
    0.0 when either norm is zero)."""
    dot = (f"list_sum(list_transform(list_zip({a_expr}, {b_expr}), "
           f"p -> p[1] * p[2]))")
    na = f"sqrt(list_sum(list_transform({a_expr}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({b_expr}, x -> x * x)))"
    return (f"CASE WHEN {na} > 0 AND {nb} > 0 "
            f"THEN {dot} / ({na} * {nb}) ELSE 0.0 END")


def l2_normalize_sql(vec_expr: str) -> str:
    """DuckDB twin of operators.dedup.l2_normalize (zero vector stays
    zero)."""
    n = f"sqrt(list_sum(list_transform({vec_expr}, x -> x * x)))"
    return (f"CASE WHEN {n} > 0 THEN "
            f"list_transform({vec_expr}, x -> x / {n}) "
            f"ELSE list_transform({vec_expr}, x -> x * 0.0) END")


def double_array_sql(vec: list[float]) -> str:
    """Exact DOUBLE[] literal (repr round-trips IEEE doubles)."""
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def hyperplane_bit_sql(vec_expr: str, plane: list[float]) -> str:
    """DuckDB twin of the sign-of-projection bit in
    operators.similarity / operators.dedup LSH: '1' iff dot >= 0."""
    dot = (f"list_sum(list_transform(list_zip({vec_expr}, "
           f"{double_array_sql(plane)}), p -> p[1] * p[2]))")
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


def band_keys_sql(vec_expr: str, planes: list[list[float]],
                  bands: int) -> list[str]:
    """Concatenated per-band bit strings, matching minhash/simhash-style
    banding of hyperplane sign bits."""
    bits = [hyperplane_bit_sql(vec_expr, p) for p in planes]
    per_band = len(planes) // bands
    return ["(" + ") || (".join(bits[b * per_band:(b + 1) * per_band]) + ")"
            for b in range(bands)]


def md5_byte_sql(msg_expr: str, byte_idx: int) -> str:
    """Byte `byte_idx` (0-based) of md5(msg) as an integer — twin of
    hashlib.md5(...).digest()[byte_idx]."""
    return (f"('0x' || substr(md5({msg_expr}), "
            f"{2 * byte_idx + 1}, 2))::BIGINT")
