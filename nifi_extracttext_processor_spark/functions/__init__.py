"""Scalar function registry: portable Spark↔DuckDB expression twins."""

from .portable import (  # noqa: F401
    band_keys_sql, cosine_sql, double_array_sql, hyperplane_bit_sql,
    md5_byte_sql,
)
