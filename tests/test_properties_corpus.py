"""Hypothesis properties for the web-corpus additions — pure-Python
layers only (no SparkSession per example)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(max_examples=120, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

_uri = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
    min_size=1, max_size=40)
_text = st.text(max_size=300)


class TestWarcProperties:
    @_FAST
    @given(st.lists(st.tuples(_uri, _text), min_size=0, max_size=8),
           st.booleans())
    def test_wet_roundtrip_lossless(self, docs, gz):
        from nifi_extracttext_processor_spark.sources.warc import (
            build_wet, parse_warc,
        )
        data = build_wet(docs, gzip_members=gz)
        recs = list(parse_warc(data)) if docs else \
            (list(parse_warc(data)) if data else [])
        assert [(r["target_uri"], r["text"]) for r in recs] == docs

    @_FAST
    @given(_uri, st.binary(max_size=400),
           st.integers(min_value=100, max_value=599))
    def test_response_roundtrip(self, uri, payload, status):
        from nifi_extracttext_processor_spark.sources.warc import (
            build_response_record, parse_warc,
        )
        rec = build_response_record(uri, payload, status=status,
                                    http_content_type="image/png")
        (r,) = parse_warc(rec)
        assert r["payload"] == payload
        assert r["http_status"] == status
        assert r["target_uri"] == uri


class TestNormalizeProperties:
    @_FAST
    @given(st.text(max_size=400))
    def test_mojibake_repair_total_and_never_longer(self, s):
        from nifi_extracttext_processor_spark.operators.normalize import (
            fix_mojibake,
        )
        out = fix_mojibake(s)
        assert isinstance(out, str)
        assert len(out) <= len(s)

    @_FAST
    @given(st.text(max_size=400))
    def test_repair_roundtrips_clean_utf8_mangling(self, s):
        """For any text whose UTF-8 bytes all decode via latin-1
        (always true), mangling then repairing returns the original
        UNLESS the original itself already looks mojibake-ish (repair
        is then allowed to fold it further) — assert the common case:
        texts with no high-byte chars at all repair exactly."""
        from nifi_extracttext_processor_spark.operators.normalize import (
            fix_mojibake,
        )
        if any(ord(c) > 0x7F for c in s):
            return  # mixed case handled by the golden tests
        mangled = s.encode("utf-8").decode("latin-1")
        assert fix_mojibake(mangled) == s


class TestBpeProperties:
    @_FAST
    @given(st.lists(
        st.tuples(st.text(
            alphabet=st.characters(min_codepoint=0x61,
                                   max_codepoint=0x7A),
            min_size=1, max_size=12),
            st.integers(min_value=1, max_value=50)),
        min_size=1, max_size=12),
        st.integers(min_value=0, max_value=40))
    def test_encode_lossless_for_any_training(self, items, n_merges):
        from nifi_extracttext_processor_spark.operators.tokenize import (
            bpe_encode_word, bpe_train_from_counts,
        )
        counts = dict(items)
        merges = bpe_train_from_counts(counts, n_merges)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for w in list(counts) + ["unseen", "zzz"]:
            toks = bpe_encode_word(w, ranks)
            assert "".join(toks).replace("</w>", "") == w
            assert toks[-1].endswith("</w>")


class TestBlockClassifierProperties:
    @_FAST
    @given(st.text(max_size=2000))
    def test_main_content_total(self, s):
        from nifi_extracttext_processor_spark.formats.boilerplate import (
            html_main_content,
        )
        out = html_main_content(s)
        assert isinstance(out, str)


class TestBpeIncrementalEquivalence:
    @_FAST
    @given(st.lists(
        st.tuples(st.text(
            alphabet=st.characters(min_codepoint=0x61,
                                   max_codepoint=0x66),
            min_size=1, max_size=8),
            st.integers(min_value=1, max_value=20)),
        min_size=1, max_size=10),
        st.integers(min_value=0, max_value=25))
    def test_matches_naive_recount_trainer(self, items, n_merges):
        """The incremental pair-count update must produce EXACTLY the
        merge list of the textbook full-recount loop."""
        from collections import Counter
        from nifi_extracttext_processor_spark.operators.tokenize import (
            END_OF_WORD, _merge_word, bpe_train_from_counts,
        )
        counts = dict(items)

        def naive(word_counts, n):
            words = {}
            for w, c in word_counts.items():
                sym = tuple(w) + (END_OF_WORD,)
                words[sym] = words.get(sym, 0) + c
            merges = []
            for _ in range(n):
                pairs = Counter()
                for sym, c in words.items():
                    for a, b in zip(sym, sym[1:]):
                        pairs[(a, b)] += c
                if not pairs:
                    break
                best = max(pairs, key=lambda p: (pairs[p], p))
                merges.append(best)
                m = best[0] + best[1]
                words = {_merge_word(s, best, m): c
                         for s, c in words.items()}
            return merges

        assert bpe_train_from_counts(counts, n_merges) == \
            naive(counts, n_merges)


class TestContaminationReport:
    def test_planted_overlap_golden(self, spark):
        from nifi_extracttext_processor_spark.operators.corpus import (
            contamination_report,
        )
        leak = "the quick brown fox jumps over the lazy dog tonight"
        corpus = spark.createDataFrame(
            [(1, leak + " extra words here to pad the document"),
             (2, leak),
             (3, "completely unrelated text with no overlap at all "
                 "whatsoever in any window")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, leak),                      # fully leaked item
             (101, "an unleaked benchmark question nobody copied "
                   "anywhere in the training corpus")],
            "doc_id long, text string")
        got = {r["bench_id"]: r for r in contamination_report(
            corpus, bench, n=8).collect()}
        # leak has 10 words -> 3 distinct 8-grams, all present in
        # docs 1 and 2
        assert got[100]["n_ngrams"] == 3
        assert got[100]["n_hit_ngrams"] == 3
        assert got[100]["hit_frac"] == 1.0
        assert got[100]["n_corpus_docs"] == 2
        assert got[101]["n_hit_ngrams"] == 0
        assert got[101]["hit_frac"] == 0.0
        assert got[101]["n_corpus_docs"] == 0

    def test_twin_parity_on_documents(self, spark, sf_dir):
        import duckdb
        from nifi_extracttext_processor_spark.operators.corpus import (
            contamination_report, contamination_report_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        from pyspark.sql import functions as F
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        corpus = docs.filter(F.col("doc_id") % 97 != 0)
        got = sorted(map(tuple, contamination_report(
            corpus, bench, n=8).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = sorted(map(tuple, con.execute(contamination_report_sql(
            "documents", "doc_id % 97 = 0", n=8)).fetchall()))
        assert got == want


class TestRendezvousShards:
    def test_minimal_movement_on_grow(self, spark):
        """THE HRW property pmod lacks: adding a shard moves keys ONLY
        onto the new shard — everything else stays put (pmod remaps
        ~N/(N+1) of all keys)."""
        from nifi_extracttext_processor_spark.operators.corpus import (
            assign_shards, assign_shards_rendezvous,
        )
        from pyspark.sql import functions as F
        df = spark.range(3000).select(F.col("id").alias("doc_id"))
        before = {r["doc_id"]: r["shard"] for r in
                  assign_shards_rendezvous(
                      df, ["s0", "s1", "s2", "s3"]).collect()}
        after = {r["doc_id"]: r["shard"] for r in
                 assign_shards_rendezvous(
                     df, ["s0", "s1", "s2", "s3", "s4"]).collect()}
        moved = {k for k in before if before[k] != after[k]}
        assert all(after[k] == "s4" for k in moved)
        # ~1/5 of keys move; pmod moves ~4/5
        assert 0.1 < len(moved) / 3000 < 0.3
        pb = {r["doc_id"]: r["shard"] for r in
              assign_shards(df, 4).collect()}
        pa = {r["doc_id"]: r["shard"] for r in
              assign_shards(df, 5).collect()}
        pmod_moved = sum(pb[k] != pa[k] for k in pb) / 3000
        assert pmod_moved > 0.5

    def test_balance_and_determinism(self, spark):
        from nifi_extracttext_processor_spark.operators.corpus import (
            assign_shards_rendezvous,
        )
        from pyspark.sql import functions as F
        df = spark.range(4000).select(F.col("id").alias("doc_id"))
        out = assign_shards_rendezvous(df, ["a", "b", "c", "d"])
        per = {r["shard"]: r["n"] for r in
               out.groupBy("shard").agg(F.count("*").alias("n"))
               .collect()}
        assert set(per) == {"a", "b", "c", "d"}
        assert max(per.values()) / min(per.values()) < 1.3
        again = assign_shards_rendezvous(
            df.repartition(9), ["a", "b", "c", "d"])
        assert sorted(map(tuple, out.collect())) \
            == sorted(map(tuple, again.collect()))

    def test_twin_parity_and_validation(self, spark, sf_dir):
        import duckdb
        import pytest as pt
        from nifi_extracttext_processor_spark.operators.corpus import (
            assign_shards_rendezvous, assign_shards_rendezvous_sql,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id")
        shards = ["alpha", "beta", "gamma"]
        got = sorted(map(tuple, assign_shards_rendezvous(
            docs, shards).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = sorted(map(tuple, con.execute(
            assign_shards_rendezvous_sql(
                "(SELECT doc_id FROM documents)", shards,
                select="doc_id")).fetchall()))
        assert got == want
        with pt.raises(ValueError):
            assign_shards_rendezvous(docs, [])
        with pt.raises(ValueError):
            assign_shards_rendezvous(docs, ["x", "x"])
        # 1-shard degenerate path
        one = assign_shards_rendezvous(docs.limit(5), ["only"])
        assert {r["shard"] for r in one.collect()} == {"only"}
