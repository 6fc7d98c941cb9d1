"""table_checksum: order/partitioning invariance, single-cell
sensitivity, NULL-vs-value distinction, grouped + twin parity on real
tables. readability: hand-computed Flesch goldens, empty/NULL
contracts, twin parity, no-shuffle plan."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.diff import (
    table_checksum,
    table_checksum_sql,
)
from nifi_extracttext_processor_spark.operators.text_analysis import (
    readability,
    readability_sql,
)


class TestChecksum:
    @pytest.fixture(scope="class")
    def frame(self, spark):
        rows = [Row(g="a", k=1, s="x", v=1.5),
                Row(g="a", k=2, s=None, v=2.5),
                Row(g="b", k=3, s="", v=None)]
        return spark.createDataFrame(rows)

    def test_order_and_partitioning_invariant(self, spark, frame):
        a = table_checksum(frame, ["k", "s", "v"]).collect()[0]
        b = table_checksum(
            frame.orderBy(F.desc("k")).repartition(7),
            ["k", "s", "v"]).collect()[0]
        assert (a["n_rows"], a["checksum"]) == (b["n_rows"],
                                                b["checksum"])

    def test_single_cell_sensitivity(self, spark, frame):
        a = table_checksum(frame, ["k", "s", "v"]).collect()[0]
        mutated = frame.withColumn(
            "v", F.when(F.col("k") == 1, 1.6).otherwise(F.col("v")))
        b = table_checksum(mutated, ["k", "s", "v"]).collect()[0]
        assert a["checksum"] != b["checksum"]

    def test_null_differs_from_empty_string(self, spark):
        a = spark.createDataFrame([(None,)], "s string")
        b = spark.createDataFrame([("",)], "s string")
        ca = table_checksum(a, ["s"]).collect()[0]["checksum"]
        cb = table_checksum(b, ["s"]).collect()[0]["checksum"]
        assert ca != cb

    def test_grouped_twin_parity_on_orders(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        orders = load_table(spark, sf_dir, "orders")
        cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
        a = sorted((r["o_orderpriority"], r["n_rows"],
                    int(r["checksum"])) for r in table_checksum(
            orders, cols, ["o_orderpriority"]).collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf_dir}/orders.parquet'")
        b = sorted((r[0], r[1], int(r[2])) for r in con.execute(
            table_checksum_sql("orders", cols,
                               ["o_orderpriority"])).fetchall())
        assert a == b

    def test_validates(self, spark, frame):
        with pytest.raises(ValueError):
            table_checksum(frame.select("g"), group_by=["g"])


class TestReadability:
    def test_hand_computed_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello world. This is a simple test!")],
            "doc_id long, text string")
        [r] = readability(df).collect()
        # words=7; sentences=2; syllables: hel-lo(2) world(1) this(1)
        # is(1) a(1) sim-ple(2: i, e... vowel runs 'i','e' =2) test(1)
        assert r["n_words"] == 7 and r["n_sentences"] == 2
        assert r["n_syllables"] == 9
        wps, spw = 7 / 2, 9 / 7
        assert r["flesch_ease"] == round(
            206.835 - 1.015 * wps - 84.6 * spw, 4)
        assert r["fk_grade"] == round(
            0.39 * wps + 11.8 * spw - 15.59, 4)

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([(1, ""), (2, None)],
                                   "doc_id long, text string")
        got = {r["doc_id"]: r for r in readability(df).collect()}
        for i in (1, 2):
            assert got[i]["n_words"] == 0
            assert got[i]["flesch_ease"] is None
            assert got[i]["fk_grade"] is None

    def test_unpunctuated_is_one_sentence(self, spark):
        df = spark.createDataFrame([(1, "three little words")],
                                   "doc_id long, text string")
        [r] = readability(df).collect()
        assert r["n_sentences"] == 1

    def test_twin_parity_on_documents(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        a = sorted(
            (r["doc_id"], r["n_words"], r["n_sentences"],
             r["n_syllables"], r["flesch_ease"], r["fk_grade"])
            for r in readability(docs).select(
                "doc_id", "n_words", "n_sentences", "n_syllables",
                "flesch_ease", "fk_grade").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        b = sorted(map(tuple, con.execute(readability_sql(
            "documents", select="doc_id")).fetchall()))
        assert a == b

    def test_no_shuffle_no_udf(self, spark):
        df = spark.createDataFrame([(1, "a b.")],
                                   "doc_id long, text string")
        plan = readability(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestCodeStats:
    def test_code_vs_prose_golden(self, spark):
        from nifi_extracttext_processor_spark.operators \
            .text_analysis import code_stats
        code = ("def f(x):\n    return x + 1\n\n"
                "class A:\n    pass\n")
        prose = ("The quick brown fox jumps over the lazy dog. "
                 "It was a bright day.\nBirds sang in the trees.")
        fenced = "Intro text.\n```\nx = 1\n```\nOutro."
        df = spark.createDataFrame(
            [(1, code), (2, prose), (3, fenced), (4, None)],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in code_stats(df).collect()}
        assert got[1]["looks_code"] is True
        assert got[1]["code_line_frac"] >= 0.75
        assert got[2]["looks_code"] is False
        assert got[2]["code_line_frac"] == 0.0
        assert got[3]["looks_code"] is True      # fenced block
        assert got[3]["n_fences"] == 1
        assert got[4]["looks_code"] is False
        assert got[4]["n_lines"] == 0
        assert got[4]["code_line_frac"] is None

    def test_twin_parity_on_documents(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators \
            .text_analysis import code_stats, code_stats_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        a = sorted(
            (r["doc_id"], r["n_lines"], r["code_line_frac"],
             r["n_fences"], r["symbol_ratio"], r["looks_code"])
            for r in code_stats(docs).select(
                "doc_id", "n_lines", "code_line_frac", "n_fences",
                "symbol_ratio", "looks_code").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        b = sorted(map(tuple, con.execute(code_stats_sql(
            "documents", select="doc_id")).fetchall()))
        assert a == b

    def test_no_shuffle_no_udf(self, spark):
        from nifi_extracttext_processor_spark.operators \
            .text_analysis import code_stats
        df = spark.createDataFrame([(1, "x = 1;")],
                                   "doc_id long, text string")
        plan = code_stats(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
