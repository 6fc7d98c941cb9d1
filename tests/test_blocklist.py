"""Domain blocklist filtering: subdomain semantics, plan shape,
DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.text_analysis import (
    filter_blocked_domains, filter_blocked_domains_sql, url_host,
)

ROWS = [
    (1, "http://spam.test/page"),
    (2, "https://a.b.spam.test/deep?q=1"),
    (3, "http://notspam.test/x"),          # sibling, NOT blocked
    (4, "https://myspam.test.example.org/y"),  # contains, NOT blocked
    (5, "http://clean.example.org/z"),
    (6, "not a url at all"),
    (7, "http://user:pw@spam.test:8080/auth"),  # userinfo + port
    (8, None),
    (9, "http://sub.spam.test./page"),  # FQDN trailing dot — same
    # DNS host as sub.spam.test; must NOT bypass the blocklist
]
BLOCKED = ["spam.test", "ads.example"]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "doc_id long, url string")


@pytest.fixture(scope="module")
def blocklist(spark):
    return spark.createDataFrame([(d,) for d in BLOCKED],
                                 "domain string")


class TestFilter:
    def test_subdomain_blocking(self, frame, blocklist):
        kept = {r["doc_id"] for r in
                filter_blocked_domains(frame, blocklist).collect()}
        assert kept == {3, 4, 5, 6, 8}

    def test_audit_mode(self, frame, blocklist):
        hit = {r["doc_id"] for r in
               filter_blocked_domains(frame, blocklist,
                                      keep_blocked=True).collect()}
        assert hit == {1, 2, 7, 9}

    def test_url_host(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTPS://User@Ex.ORG:443/Path")], "i long, u string")
        (r,) = df.select(url_host("u").alias("h")).collect()
        assert r["h"] == "ex.org"

    def test_url_host_strips_trailing_dot(self, spark):
        # 'ex.org.' is the same DNS host as 'ex.org' — a kept dot
        # would bypass every suffix-equality governance join
        df = spark.createDataFrame(
            [(1, "http://Ex.ORG./p"), (2, "http://.ex.org/p")],
            "i long, u string")
        got = [r["h"] for r in
               df.select(url_host("u").alias("h"))
                 .orderBy("i").collect()]
        assert got == ["ex.org", "ex.org"]

    def test_plan_broadcast_no_udf(self, frame, blocklist):
        out = filter_blocked_domains(frame, blocklist)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
        assert "BatchEvalPython" not in plan

    def test_duckdb_parity(self, frame, blocklist):
        got = sorted(r["doc_id"] for r in
                     filter_blocked_domains(frame, blocklist).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t(doc_id BIGINT, url VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
        want = sorted(r[0] for r in con.execute(
            filter_blocked_domains_sql("t", BLOCKED)).fetchall())
        assert got == want
