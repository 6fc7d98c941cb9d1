"""Text normalization: mojibake repair goldens, NFC/NFKC parity with
DuckDB, Catalyst cleanup twin parity, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from nifi_extracttext_processor_spark.operators import normalize as N


class TestMojibake:
    def test_single_and_double_encoding(self):
        assert N.fix_mojibake("cafÃ©") == "café"
        assert N.fix_mojibake(
            "cafÃÂ©") == "café"

    def test_cp1252_sloppy_bytes(self):
        # close-quote mojibake ends in U+009D, undefined in cp1252
        s = "â€œquotedâ€ text"
        assert N.fix_mojibake(s) == "“quoted” text"

    def test_cyrillic(self):
        assert N.fix_mojibake("Ð¿ÑÐ¸") \
            == "пси"

    def test_legitimate_text_untouched(self):
        for s in ("plain ascii", "¿Cómo está? é ü ñ",
                  "Ã is a letter in Portuguese alphabets", ""):
            assert N.fix_mojibake(s) == s

    def test_none_passthrough(self):
        assert N.fix_mojibake(None) is None

    def test_mixed_legit_unicode_and_mojibake(self):
        # per-run repair: the zero-width char and CJK outside the runs
        # must not block fixing the mojibake runs around them
        s = "日本語 cafÃ© and​ naÃ¯ve"
        assert N.fix_mojibake(s) == "日本語 café and​ naïve"


class TestCleanTextParity:
    ROWS = [
        (1, "hello   world"),
        (2, " leading and trailing  "),
        (3, "tab\tseparated\tvalues"),
        (4, "zero​width‌chars­here"),
        (5, "ctrl\x00chars\x07gone\x1f"),
        (6, "line  \n  breaks\n\n\n\n\nsqueezed"),
        (7, None),
        (8, ""),
    ]

    def test_duckdb_twin(self, spark):
        from pyspark.sql import functions as F
        df = spark.createDataFrame(self.ROWS, "i long, t string")
        got = {r["i"]: r["c"] for r in df.select(
            "i", F.coalesce(N.clean_text_col("t"), F.lit(""))
            .alias("c")).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", self.ROWS)
        want = {r[0]: r[1] for r in con.execute(
            f"SELECT i, {N.clean_text_sql('t')} FROM t").fetchall()}
        assert got == want
        assert got[1] == "hello world"
        assert got[4] == "zerowidthcharshere"
        assert got[5] == "ctrlcharsgone"
        assert got[6] == "line\nbreaks\n\nsqueezed"

    def test_plan_codegen_no_udf(self, spark):
        df = spark.createDataFrame(self.ROWS, "i long, t string")
        plan = N.clean_text(df, "t")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestNormalizeUnicode:
    def test_nfc_parity_with_duckdb(self, spark):
        rows = [(1, "café"),            # decomposed é
                (2, "café"),              # composed é
                (3, "Å"), (4, None), (5, "plain")]
        df = spark.createDataFrame(rows, "i long, t string")
        got = {r["i"]: r["t"] for r in
               N.normalize_unicode(df, "t", repair_mojibake=False)
               .collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = {r[0]: r[1] for r in con.execute(
            "SELECT i, nfc_normalize(t) FROM t").fetchall()}
        assert got == want
        assert got[1] == got[2] == "café"

    def test_nfkc_folds_compat(self, spark):
        rows = [(1, "ﬁle ｆull⁵")]  # ﬁ ligature etc
        df = spark.createDataFrame(rows, "i long, t string")
        (r,) = N.normalize_unicode(df, "t", form="NFKC").collect()
        assert r["t"] == "file full5"

    def test_bad_form_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "i long, t string")
        with pytest.raises(ValueError, match="form"):
            N.normalize_unicode(df, "t", form="NFX")

    def test_out_col_and_composition(self, spark):
        rows = [(1, "  cafÃ©   mojibake​  ")]
        df = spark.createDataFrame(rows, "i long, t string")
        (r,) = N.normalize_and_clean(df, "t").collect()
        assert r["t"] == "café mojibake"
        (r2,) = N.normalize_unicode(df, "t", out_col="norm").collect()
        assert r2["t"].strip().startswith("caf")  # original kept
        assert "café" in r2["norm"]


class TestReviewFixes:
    def test_non_western_mojibake_repaired(self):
        # Polish (lead 0xC5), CJK (lead 0xE6..), Greek (0xCE) — the
        # old hardcoded Western-European signature list missed all of
        # these; fixtures constructed programmatically (hand-typing
        # mojibake silently loses its control-range characters)
        def mangle(s, codec):
            return s.encode("utf-8").decode(codec)
        for word in ("Gdańsk", "日本", "Ελλάδα", "Čeština"):
            for codec in ("latin-1", "cp1252"):
                try:
                    bad = mangle(word, codec)
                except UnicodeDecodeError:
                    continue
                assert N.fix_mojibake(bad) == word, (word, codec)

    def test_crlf_normalized_in_clean(self, spark):
        import duckdb
        from pyspark.sql import functions as F
        rows = [(1, "a \r\n\r\n\r\n b"), (2, "mac\rline"),
                (3, "mixed\r\nand\nunix\n")]
        df = spark.createDataFrame(rows, "i long, t string")
        got = {r["i"]: r["c"] for r in df.select(
            "i", N.clean_text_col("t").alias("c")).collect()}
        assert got[1] == "a\n\nb"
        assert got[2] == "mac\nline"
        assert got[3] == "mixed\nand\nunix"
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = {r[0]: r[1] for r in con.execute(
            f"SELECT i, {N.clean_text_sql('t')} FROM t").fetchall()}
        assert got == want

    def test_crlf_and_lf_copies_clean_identically(self, spark):
        doc = "para one\ncontinues\n\npara two\n"
        rows = [(1, doc), (2, doc.replace("\n", "\r\n"))]
        df = spark.createDataFrame(rows, "i long, t string")
        got = [r["c"] for r in df.select(
            N.clean_text_col("t").alias("c")).collect()]
        assert got[0] == got[1]


class TestEntropySignals:
    ROWS = [
        (1, "aaaaaaaaaaaaaaaa"),            # ~0 entropy
        (2, "the quick brown fox jumps over the lazy dog repeatedly"),
        (3, "abcdefghijklmnopqrstuvwxyz"),  # max for 26 uniform chars
        (4, ""), (5, None),
        (6, "héllo wörld"),                 # non-ascii parity
    ]

    def test_char_entropy_values_and_parity(self, spark):
        import duckdb
        import math
        from nifi_extracttext_processor_spark.operators.text_analysis import (
            char_entropy, char_entropy_sql,
        )
        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {r["doc_id"]: r["entropy"] for r in
               char_entropy(df).collect()}
        assert got[1] == 0.0
        assert got[3] == round(math.log(26), 6)
        assert got[2] > 2.0
        assert got[4] is None and got[5] is None
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", self.ROWS)
        want = {r[0]: r[1] for r in con.execute(
            char_entropy_sql()).fetchall()}
        for k in got:
            if got[k] is None:
                assert want[k] is None, k
            else:
                assert abs(got[k] - want[k]) < 2e-6, k

    def test_compression_ratio_orders_texts(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis import (
            compression_ratio,
        )
        import hashlib
        noise = "".join(
            hashlib.md5(str(i).encode()).hexdigest() for i in range(40))
        rows = [(1, "spam " * 400), (2, noise), (3, None), (4, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["compression_ratio"] for r in
               compression_ratio(df).collect()}
        assert got[1] < 0.05          # pure repetition collapses
        assert got[2] > 0.5           # hex noise barely compresses
        assert got[3] is None and got[4] is None

    def test_entropy_plan_no_udf(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis import (
            char_entropy,
        )
        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        plan = char_entropy(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
