"""Cavnar-Trenkle n-gram language ID: held-out classification,
und/edge semantics, DuckDB twin parity, broadcast plan shape.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.text_analysis import (
    language_id_ngram,
    language_id_ngram_sql,
    train_lang_profiles,
)

SEED = [
    ("en", "the quick brown fox jumps over the lazy dog while the "
           "children watch the evening light fade over the hills"),
    ("en", "there is nothing better than a long walk in the rain "
           "with the sound of water and the smell of wet earth"),
    ("de", "der schnelle braune fuchs springt über den faulen hund "
           "während die kinder das abendlicht über den hügeln sehen"),
    ("de", "es gibt nichts besseres als einen langen spaziergang im "
           "regen mit dem geräusch des wassers und der feuchten erde"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux "
           "pendant que les enfants regardent la lumière du soir"),
    ("fr", "il n'y a rien de mieux qu'une longue promenade sous la "
           "pluie avec le bruit de l'eau et l'odeur de la terre"),
]

HELD_OUT = [
    (1, "the dog and the fox walk over the hills in the evening", "en"),
    (2, "der hund und der fuchs gehen über die hügel am abend", "de"),
    (3, "le chien et le renard marchent sur les collines le soir", "fr"),
]


class TestLangNgram:
    def _profiles(self, spark):
        seed = spark.createDataFrame(SEED, "lang string, text string")
        return train_lang_profiles(seed, top_k=150)

    def test_profiles_shape(self, spark):
        p = self._profiles(spark).collect()
        by_lang = {}
        for r in p:
            by_lang.setdefault(r["lang"], []).append(r["rank"])
        assert set(by_lang) == {"en", "de", "fr"}
        for ranks in by_lang.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_held_out_classification(self, spark):
        profiles = self._profiles(spark)
        docs = spark.createDataFrame(
            [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string")
        got = {r["doc_id"]: r["lang_pred"] for r in
               language_id_ngram(docs, profiles, top_k=150).collect()}
        assert got == {i: lang for i, _, lang in HELD_OUT}

    def test_short_and_empty_text_und(self, spark):
        profiles = self._profiles(spark)
        docs = spark.createDataFrame(
            [(1, ""), (2, "ab"), (3, None)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["lang_pred"], r["lang_dist"]) for r in
               language_id_ngram(docs, profiles, n=3).collect()}
        # no trigram can be formed -> no profile row -> und
        assert got[1] == ("und", None)
        assert got[2] == ("und", None)
        assert got[3] == ("und", None)

    def test_bad_args(self, spark):
        seed = spark.createDataFrame(SEED, "lang string, text string")
        with pytest.raises(ValueError):
            train_lang_profiles(seed, top_k=0)
        with pytest.raises(ValueError):
            language_id_ngram(seed.withColumnRenamed("lang", "l")
                              .withColumn("doc_id", F.lit(1)),
                              self._profiles(spark), top_k=0)

    def test_matches_duckdb_self_consistency(self, spark):
        import duckdb
        import pandas as pd
        rows = [(i, t, lang) for i, (lang, t) in enumerate(SEED)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        profiles = train_lang_profiles(df, top_k=80)
        got = sorted(
            (r["doc_id"], r["lang_pred"], r["lang_dist"]) for r in
            language_id_ngram(df, profiles, top_k=80)
            .select("doc_id", "lang_pred", "lang_dist").collect())
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            rows, columns=["doc_id", "text", "lang"]))
        want = sorted(
            (int(r["doc_id"]), r["lang_pred"],
             None if pd.isna(r["lang_dist"]) else int(r["lang_dist"]))
            for _, r in con.execute(
                language_id_ngram_sql(top_k=80)).df().iterrows())
        assert got == want

    def test_plan_broadcast_profiles(self, spark):
        profiles = self._profiles(spark)
        docs = spark.createDataFrame([(1, "the fox")],
                                     "doc_id long, text string")
        plan = language_id_ngram(docs, profiles)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "BroadcastExchange" in plan
        assert "rangepartitioning" not in plan.lower()


class TestScriptStats:
    def test_goldens(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import script_stats
        rows = [
            (1, "hello world"),                 # latin
            (2, "привет мир"),                  # cyrillic
            (3, "pаypаl login"),                # latin + cyrillic а homoglyphs
            (4, "日本語のテキスト"),              # cjk + kana
            (5, "12345 !!!"),                   # no script chars
            (6, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in script_stats(df).collect()}
        assert got[1]["script_pred"] == "latin"
        assert got[1]["n_latin"] == 10 and got[1]["script_frac"] == 1.0
        assert got[2]["script_pred"] == "cyrillic"
        assert got[2]["n_cyrillic"] == 9
        # mixed-script spoof: both counts positive, latin dominant
        assert got[3]["n_latin"] > 0 and got[3]["n_cyrillic"] == 2
        assert got[3]["script_pred"] == "latin"
        assert got[3]["script_frac"] < 1.0
        assert got[4]["script_pred"] == "kana"   # 7 kana > 3 cjk
        assert got[4]["n_cjk"] == 3
        assert got[5]["script_pred"] == "other"
        assert got[5]["script_frac"] is None
        assert got[6]["script_pred"] == "other"

    def test_tie_breaks_on_fixed_order(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import script_stats
        df = spark.createDataFrame(
            [(1, "abжз")], "doc_id long, text string")  # 2 latin, 2 cyr
        [r] = script_stats(df).collect()
        assert r["script_pred"] == "latin"  # earlier block wins ties

    def test_twin_parity_on_documents(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import script_stats, script_stats_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        got = sorted(map(tuple, script_stats(docs).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = sorted(map(tuple, con.execute(
            script_stats_sql("documents")).fetchall()))
        assert got == want

    def test_pure_narrow_plan(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import script_stats
        df = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string")
        plan = script_stats(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan


class TestConfusables:
    def test_paypal_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import fold_confusables
        rows = [(1, "pаypаl login"),      # Cyrillic а twice
                (2, "paypal login"),       # clean
                (3, "ＦＲＥＥ ｍｏｎｅｙ１"),  # fullwidth
                (4, "привет мир"),         # genuinely Cyrillic text
                (5, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in fold_confusables(df).collect()}
        assert got[1]["skeleton"] == "paypal login"
        assert got[1]["n_folded"] == 2 and got[1]["spoofed"] is True
        # folded skeletons of spoof and clean text now COLLIDE — the
        # dedup key the byte-level fingerprint misses
        assert got[1]["skeleton"] == got[2]["skeleton"]
        assert got[2]["n_folded"] == 0 and got[2]["spoofed"] is False
        assert got[3]["skeleton"] == "FREE money1"
        # real Cyrillic text folds many chars but fails the
        # mostly-Latin spoof rule (n_folded*4 >= len)
        assert got[4]["spoofed"] is False and got[4]["n_folded"] > 0
        assert got[5]["n_folded"] == 0

    def test_twin_parity_on_documents(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import fold_confusables, fold_confusables_sql
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "text")
        got = sorted(map(tuple, fold_confusables(docs)
                         .select("doc_id", "skeleton", "n_folded",
                                 "spoofed").collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = sorted(map(tuple, con.execute(fold_confusables_sql(
            "documents", select="doc_id")).fetchall()))
        assert got == want

    def test_narrow_plan(self, spark):
        from nifi_extracttext_processor_spark.operators.text_analysis \
            import fold_confusables
        df = spark.createDataFrame([(1, "x")],
                                   "doc_id long, text string")
        plan = fold_confusables(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
