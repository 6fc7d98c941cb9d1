"""log_odds_terms: direction/sanity goldens on planted vocabulary,
prior shrinkage of hapax noise, twin parity. oov_rate: hand-counted
golden, grouped, twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.corpus_compare import (
    log_odds_terms,
    log_odds_terms_sql,
    oov_rate,
    oov_rate_sql,
)


@pytest.fixture(scope="module")
def corpora(spark):
    base = "the quick brown fox jumps over the lazy dog"
    a = [(i, base + " alpha alpha politics") for i in range(30)]
    b = [(i, base + " beta sports sports") for i in range(30)]
    a.append((99, base + " rareword"))   # hapax in A only
    return (spark.createDataFrame(a, "doc_id long, text string"),
            spark.createDataFrame(b, "doc_id long, text string"))


class TestLogOdds:
    def test_directions_and_cut(self, spark, corpora):
        a, b = corpora
        rows = log_odds_terms(a, b, min_count=5, top_k=10).collect()
        z = {r["word"]: r["z"] for r in rows}
        assert z["alpha"] > 0 and z["politics"] > 0
        assert z["beta"] < 0 and z["sports"] < 0
        # shared filler words score near zero relative to markers
        assert abs(z.get("the", 0.0)) < z["alpha"]
        # hapax excluded by min_count
        assert "rareword" not in z

    def test_prior_shrinks_hapax(self, spark, corpora):
        a, b = corpora
        rows = log_odds_terms(a, b, min_count=1, top_k=50).collect()
        z = {r["word"]: abs(r["z"]) for r in rows}
        # one occurrence cannot outrank a 30x planted marker under an
        # informative prior
        assert z["rareword"] < z["alpha"]

    def test_twin_parity(self, spark, corpora):
        a, b = corpora
        con = duckdb.connect()
        con.register("ta", a.toPandas())
        con.register("tb", b.toPandas())
        got = sorted(map(tuple, log_odds_terms(
            a, b, top_k=15).collect()))
        want = sorted(map(tuple, con.execute(log_odds_terms_sql(
            "ta", "tb", top_k=15)).fetchall()))
        assert got == want

    def test_validates(self, spark, corpora):
        a, b = corpora
        with pytest.raises(ValueError):
            log_odds_terms(a, b, prior_scale=0)
        with pytest.raises(ValueError):
            log_odds_terms(a, b, top_k=0)


class TestOov:
    def test_hand_counted(self, spark):
        df = spark.createDataFrame(
            [("en", "the cat sat"), ("en", "the unknown zig"),
             ("fr", "zag")], "lang string, text string")
        vocab = spark.createDataFrame(
            [("the",), ("cat",), ("sat",)], "word string")
        got = {r["lang"]: r for r in
               oov_rate(df, vocab, group_by=["lang"]).collect()}
        assert got["en"]["n_tokens"] == 6
        assert got["en"]["n_oov"] == 2          # unknown, zig
        assert got["en"]["oov_rate"] == round(2 / 6, 4)
        assert got["fr"]["oov_rate"] == 1.0

    def test_twin_parity_on_documents(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        vocab_q = ("SELECT DISTINCT unnest(string_split_regex("
                   "lower(trim(text)), '\\s+')) AS word "
                   "FROM documents WHERE doc_id % 3 = 0")
        vocab = docs.filter(F.col("doc_id") % 3 == 0).select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
            .alias("word")).distinct()
        a = sorted(map(tuple, oov_rate(
            docs, vocab, group_by=["lang"]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        b = sorted(map(tuple, con.execute(oov_rate_sql(
            "documents", vocab_q, group_by=["lang"])).fetchall()))
        assert a == b


class TestVocabCoverage:
    def test_hand_computed(self, spark):
        # "a" x6, "b" x3, "c" x1 -> total 10; 60% needs 1 word,
        # 90% needs 2, 100% needs 3
        df = spark.createDataFrame(
            [(1, "a a a a a a b b b c")], "doc_id long, text string")
        from nifi_extracttext_processor_spark.operators \
            .corpus_compare import vocab_coverage
        got = {r["coverage"]: (r["vocab_size"], r["covered_rate"])
               for r in vocab_coverage(df, [0.6, 0.9, 1.0]).collect()}
        assert got[0.6] == (1, 0.6)
        assert got[0.9] == (2, 0.9)
        assert got[1.0] == (3, 1.0)

    def test_twin_parity_on_documents(self, spark, sf_dir):
        from nifi_extracttext_processor_spark.operators \
            .corpus_compare import vocab_coverage, vocab_coverage_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        a = sorted(map(tuple, vocab_coverage(
            docs, [0.5, 0.9, 0.99]).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        b = sorted(map(tuple, con.execute(vocab_coverage_sql(
            "documents", [0.5, 0.9, 0.99])).fetchall()))
        assert a == b

    def test_validates(self, spark):
        from nifi_extracttext_processor_spark.operators \
            .corpus_compare import vocab_coverage
        df = spark.createDataFrame([(1, "x")],
                                   "doc_id long, text string")
        with pytest.raises(ValueError):
            vocab_coverage(df, [1.5])


class TestOovEmptyGroups:
    def test_zero_token_group_appears_with_null_rate(self, spark):
        """ADVICE r10: a group whose docs produce zero tokens used to
        vanish from the output (the explode emits no rows for it); the
        left-join-back keeps it with n_tokens=0 and a NULL rate."""
        import duckdb
        df = spark.createDataFrame(
            [("en", "the cat"), ("xx", "   "), ("yy", "")],
            "lang string, text string")
        vocab = spark.createDataFrame([("the",)], "word string")
        got = {r["lang"]: r for r in
               oov_rate(df, vocab, group_by=["lang"]).collect()}
        assert set(got) == {"en", "xx", "yy"}
        for g in ("xx", "yy"):
            assert got[g]["n_tokens"] == 0
            assert got[g]["n_oov"] == 0
            assert got[g]["oov_rate"] is None
        # twin replays the same contract
        con = duckdb.connect()
        con.register("t", df.toPandas())
        odf = con.execute(oov_rate_sql(
            "t", "SELECT 'the' AS word", group_by=["lang"])).df()
        assert len(odf) == 3
        import math
        orow = odf.set_index("lang").loc["xx"]
        assert orow["n_tokens"] == 0 and math.isnan(orow["oov_rate"])


class TestLogOddsTotalsUnfiltered:
    def test_min_count_does_not_move_totals(self, spark, corpora):
        """ADVICE r10: n_a/n_b are TOTAL corpus tokens (the paper's n),
        so pruning hapax via min_count must not change the z of a
        surviving word."""
        a, b = corpora
        z1 = {r["word"]: r["z"] for r in
              log_odds_terms(a, b, min_count=1, top_k=500).collect()}
        z5 = {r["word"]: r["z"] for r in
              log_odds_terms(a, b, min_count=5, top_k=500).collect()}
        for w, z in z5.items():
            assert z == z1[w], w
