"""B12 QueryRecord: SQL predicate routing over a record stream.

Reference (56409-tika.xml:1848-1890): one SQL statement per
user-defined relationship over a `FLOWFILE` view —
  bad     SELECT * FROM FLOWFILE WHERE sentiment = 'NEGATIVE'
  good    SELECT * FROM FLOWFILE WHERE sentiment = 'POSITIVE'
  neutral SELECT * FROM FLOWFILE WHERE sentiment = 'NEUTRAL'
NiFi runs Calcite; we run Spark SQL (a strict superset of the SELECT/
WHERE surface Calcite exposes there).

Scale note (SURVEY §3): NiFi's queue fan-out re-reads the flow once per
relationship for free; in Spark the N routes share ONE scan only if the
input is cached/persisted first — `query_routes` does this explicitly so
a 3-way route at 100 TB costs one pass, not three.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_routes(
    df: DataFrame,
    routes: dict[str, str],
    view_name: str = "FLOWFILE",
    cache: bool = True,
    drop_empty: bool = False,
) -> dict[str, DataFrame]:
    """Run one SQL per named route against `df` registered as FLOWFILE.

    drop_empty mirrors `include-zero-record-flowfiles=false`
    (56409-tika.xml:1871 region): routes with no rows are dropped from
    the result dict (costs an extra count per route — off by default
    for the lazy path).
    """
    spark = df.sparkSession
    if cache:
        df = df.cache()
    # unique view per call: concurrent pipelines must not collide
    name = f"{view_name}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    out: dict[str, DataFrame] = {}
    for route, sql in routes.items():
        q = sql.replace(f" {view_name}", f" {name}")
        routed = spark.sql(q)
        if drop_empty and routed.isEmpty():
            continue
        out[route] = routed
    return out


SENTIMENT_ROUTES = {
    # verbatim from 56409-tika.xml:1848-1859
    "bad": "SELECT * FROM FLOWFILE WHERE sentiment = 'NEGATIVE'",
    "good": "SELECT * FROM FLOWFILE WHERE sentiment = 'POSITIVE'",
    "neutral": "SELECT * FROM FLOWFILE WHERE sentiment = 'NEUTRAL'",
}


def route_column(df: DataFrame, route_exprs: dict[str, str],
                 out_col: str = "route",
                 default: str | None = None) -> DataFrame:
    """Single-pass alternative: materialize the route as a column
    (one scan, then partitioned write by route — the shape you want
    when sinks are files, since `partitionBy(route)` avoids N filters).
    """
    expr: F.Column = F.lit(default)
    for name, predicate in reversed(list(route_exprs.items())):
        expr = F.when(F.expr(predicate), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
