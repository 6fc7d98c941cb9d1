"""ADVICE r11: the lit()/ident() escaping first hardened in
ab_srm_check_sql is now the shared `sqlutil` module and applied to
every *_sql generator that interpolates caller-supplied names
(variant names, shard names, split labels). These tests drive each
hardened generator with adversarial names (embedded single quotes,
double quotes, spaces, hyphens) and assert the DuckDB twin still
parses AND matches the Spark side, which compares names verbatim."""

from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.sqlutil import sql_ident, sql_lit

ADV_C = "o'brien-control"
ADV_T = 'treat"ment arm'


def test_sql_lit_doubles_single_quotes():
    assert sql_lit("o'brien") == "'o''brien'"
    assert sql_lit("plain") == "'plain'"
    assert sql_lit(7) == "'7'"
    # round-trips through an actual engine
    assert duckdb.sql(f"SELECT {sql_lit(ADV_C)} AS v").fetchone()[0] \
        == ADV_C


def test_sql_ident_doubles_double_quotes_and_prefixes():
    assert sql_ident('a"b') == '"a""b"'
    assert sql_ident("arm", "n_") == '"n_arm"'
    assert duckdb.sql(f"SELECT 1 AS {sql_ident(ADV_T)}").columns \
        == [ADV_T]


@pytest.fixture(scope="module")
def adv_df(spark):
    rows = [(ADV_C, float(i % 7), i % 2, 10 + i % 5)
            for i in range(60)] + \
           [(ADV_T, float(i % 7) + 1.5, (i + 1) % 2, 12 + i % 5)
            for i in range(60)]
    return spark.createDataFrame(
        rows, "variant string, value double, event int, dur int")


def _canon(v):
    # the DuckDB pandas bridge upcasts BIGINT to float64; fold both
    # sides to one spelling (values themselves must be identical)
    if isinstance(v, float) and v == v and float(v).is_integer():
        return str(int(v))
    return str(v)


def _twin(df, got, sql):
    con = duckdb.connect()
    con.register("t", df.toPandas())
    odf = con.execute(sql).df()
    assert sorted(got.columns) == sorted(odf.columns)
    s = sorted(",".join(map(_canon, r)) for r in map(tuple, got.collect()))
    o = sorted(",".join(map(_canon, r))
               for r in map(tuple, odf.itertuples(index=False)))
    assert s == o


def test_km_logrank_sql_adversarial_names(adv_df):
    from nifi_extracttext_processor_spark.operators.survival import (
        km_logrank, km_logrank_sql)
    got = km_logrank(adv_df, "dur", "event", "variant", ADV_C, ADV_T)
    _twin(adv_df, got,
          km_logrank_sql("t", "dur", "event", "variant", ADV_C, ADV_T))


def test_welch_winsorized_sql_adversarial_names(adv_df):
    from nifi_extracttext_processor_spark.operators.abtest import (
        ab_welch_test_winsorized, ab_welch_test_winsorized_sql)
    got = ab_welch_test_winsorized(
        adv_df, "variant", "value", ADV_C, ADV_T, trim=0.05)
    _twin(adv_df, got, ab_welch_test_winsorized_sql(
        "t", "variant", "value", ADV_C, ADV_T, trim=0.05))


def test_quantile_lift_sql_adversarial_names(adv_df):
    from nifi_extracttext_processor_spark.operators.abtest import (
        ab_quantile_lift, ab_quantile_lift_sql)
    got = ab_quantile_lift(adv_df, "variant", "value", ADV_C, ADV_T)
    _twin(adv_df, got,
          ab_quantile_lift_sql("t", "variant", "value", ADV_C, ADV_T))


def test_proportion_and_welch_sql_adversarial_names(adv_df):
    from nifi_extracttext_processor_spark.operators.abtest import (
        ab_proportion_test, ab_proportion_test_sql,
        ab_welch_test, ab_welch_test_sql)
    got = ab_proportion_test(adv_df, "variant", "event", ADV_C, ADV_T)
    _twin(adv_df, got,
          ab_proportion_test_sql("t", "variant", "event", ADV_C, ADV_T))
    got = ab_welch_test(adv_df, "variant", "value", ADV_C, ADV_T)
    _twin(adv_df, got,
          ab_welch_test_sql("t", "variant", "value", ADV_C, ADV_T))


def test_rendezvous_sql_adversarial_shard_names(spark):
    from nifi_extracttext_processor_spark.operators.corpus import (
        assign_shards_rendezvous, assign_shards_rendezvous_sql)
    shards = ["shard'a", 'shard"b', "shard c"]
    df = spark.createDataFrame(
        [(f"doc{i}",) for i in range(200)], "doc_id string")
    got = assign_shards_rendezvous(df, shards)
    # every shard actually used (the argmax really ran on all names)
    assert {r["shard"] for r in got.select("shard").distinct()
            .collect()} == set(shards)
    _twin(df, got, assign_shards_rendezvous_sql("t", shards))
    # 1-shard degenerate path also escapes
    one = assign_shards_rendezvous(df, ["only'one"])
    _twin(df, one, assign_shards_rendezvous_sql("t", ["only'one"]))


def test_split_by_hash_sql_adversarial_labels(spark):
    from nifi_extracttext_processor_spark.operators.corpus import (
        split_by_hash_md5, split_by_hash_md5_sql)
    df = spark.createDataFrame(
        [(f"doc{i}",) for i in range(300)], "doc_id string")
    weights = {"tr'ain": 80, "va'l": 20}
    got = split_by_hash_md5(df, weights=weights)
    _twin(df, got, split_by_hash_md5_sql("t", weights=weights))
