"""Perceptual image dedup (operators/image_dedup.py): real-kernel
goldens vs an independent pure-Python DCT, PNG/JPEG re-encode
collision, banded pair semantics, and DuckDB parity of the fake
kernel + pair plumbing.
"""
from __future__ import annotations

import struct
import zlib

import pytest

from nifi_extracttext_processor_spark.operators.image_dedup import (
    _n_bands,
    phash64_table,
    phash_pairs,
    phash_pairs_sql,
    phash_reference,
    phash_table_sql,
)


def _gray_png(w: int, h: int, samples: list[int]) -> bytes:
    """Minimal 8-bit grayscale PNG, filter 0 rows."""
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(samples[y * w:(y + 1) * w])
                   for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _scene_a(w=32, h=32):
    """Structured image: diagonal gradient + a bright block."""
    px = []
    for y in range(h):
        for x in range(w):
            v = (x * 4 + y * 3) % 256
            if 8 <= x < 20 and 10 <= y < 22:
                v = min(255, v + 120)
            px.append(v)
    return px


def _scene_b(w=32, h=32):
    """A genuinely different image: vertical bars."""
    return [(255 if (x // 4) % 2 else 20)
            for y in range(h) for x in range(w)]


def _hamming_hex(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


class TestPhashKernel:
    def test_matches_independent_reference(self, spark):
        png = _gray_png(32, 32, _scene_a())
        df = spark.createDataFrame([("i1", png)],
                                   "media_id string, content binary")
        got = phash64_table(df).collect()[0]
        assert got["phash_error"] is None
        from nifi_extracttext_processor_spark.operators.multimodal import (
            decode_raster_gray,
        )
        w, h, px = decode_raster_gray(png)
        assert got["phash"] == phash_reference(w, h, px)
        assert len(got["phash"]) == 16

    def test_png_jpeg_reencode_collide_distinct_dont(self, spark):
        from tests.test_operators import TestJpegDecode as TJ

        png_a = _gray_png(32, 32, _scene_a())
        jpg_a, _ = TJ._jpeg(32, 32, _scene_a(), qt=[1] * 64)
        png_b = _gray_png(32, 32, _scene_b())
        df = spark.createDataFrame(
            [("a_png", png_a), ("a_jpg", jpg_a), ("b_png", png_b)],
            "media_id string, content binary")
        hashes = {r["media_id"]: r["phash"]
                  for r in phash64_table(df).collect()}
        assert _hamming_hex(hashes["a_png"], hashes["a_jpg"]) <= 4
        assert _hamming_hex(hashes["a_png"], hashes["b_png"]) > 10
        # and the pair op finds exactly the re-encode pair
        pairs = [(r["id1"], r["id2"]) for r in
                 phash_pairs(df, max_hamming=6).collect()]
        assert pairs == [("a_jpg", "a_png")]

    def test_resize_invariance(self, spark):
        # the same scene at 2x resolution hashes close (the index-
        # sampled 32x32 frame sees nearly the same picture)
        big = [_scene_a()[(y // 2) * 32 + x // 2]
               for y in range(64) for x in range(64)]
        df = spark.createDataFrame(
            [("small", _gray_png(32, 32, _scene_a())),
             ("big", _gray_png(64, 64, big))],
            "media_id string, content binary")
        hs = {r["media_id"]: r["phash"]
              for r in phash64_table(df).collect()}
        assert _hamming_hex(hs["small"], hs["big"]) <= 4

    def test_8x_thumbnail_collides(self, spark):
        # a 256px image with pixel-level noise vs its 32px thumbnail:
        # only the area-average pre-pool (imagehash convention) keeps
        # these together — nearest-index sampling reads individual
        # noisy pixels and diverges
        import hashlib
        big = []
        for y in range(256):
            for x in range(256):
                v = _scene_a()[(y // 8) * 32 + (x // 8)]
                noise = (hashlib.md5(f"{x},{y}".encode())
                         .digest()[0] % 97) - 48
                big.append(max(0, min(255, v + noise)))
        thumb = []
        for by in range(32):
            for bx in range(32):
                acc = sum(big[(by * 8 + dy) * 256 + bx * 8 + dx]
                          for dy in range(8) for dx in range(8))
                thumb.append(acc // 64)
        df = spark.createDataFrame(
            [("big", _gray_png(256, 256, big)),
             ("thumb", _gray_png(32, 32, thumb))],
            "media_id string, content binary")
        hs = {r["media_id"]: r["phash"]
              for r in phash64_table(df).collect()}
        assert _hamming_hex(hs["big"], hs["thumb"]) <= 6

    def test_decode_failure_is_null_not_fatal(self, spark):
        df = spark.createDataFrame(
            [("ok", _gray_png(8, 8, list(range(64)))),
             ("bad", b"\x89PNG\r\n\x1a\ngarbage")],
            "media_id string, content binary")
        rows = {r["media_id"]: r for r in phash64_table(df).collect()}
        assert rows["ok"]["phash_error"] is None
        assert rows["bad"]["phash"] is None
        assert rows["bad"]["phash_error"]
        # undecodable rows never pair
        assert phash_pairs(df, max_hamming=15).collect() == []

    def test_band_selection(self):
        assert _n_bands(0) == 2 and _n_bands(1) == 2
        assert _n_bands(3) == 4 and _n_bands(6) == 8
        assert _n_bands(15) == 16
        with pytest.raises(ValueError):
            _n_bands(16)
        with pytest.raises(ValueError):
            _n_bands(-1)


class TestIncrementalAndStreaming:
    def _media(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "media_id string, content binary")

    def test_incremental_against_catalog(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.image_dedup import (
            phash_dedup_incremental, update_phash_catalog,
        )
        from tests.test_operators import TestJpegDecode as TJ

        png_a = _gray_png(32, 32, _scene_a())
        jpg_a, _ = TJ._jpeg(32, 32, _scene_a(), qt=[1] * 64)
        png_b = _gray_png(32, 32, _scene_b())
        cat = str(tmp_path / "phash_cat")
        batch1 = self._media(spark, [("m1", png_a)])
        update_phash_catalog(batch1, cat)
        catalog = spark.read.parquet(cat)
        # batch 2: a JPEG re-encode of the cataloged image (drop), a
        # genuinely new image (keep), an in-batch near-dup chain
        # (min id survives), and a corrupt image (pass through)
        batch2 = self._media(spark, [
            ("m2", jpg_a),            # near-dup of cataloged m1
            ("m3", png_b),            # new
            ("m4", png_b),            # in-batch dup of m3 -> dropped
            ("m5", b"\x89PNG\r\n\x1a\nbroken"),   # undecodable
        ])
        kept = sorted(r["media_id"] for r in phash_dedup_incremental(
            batch2, catalog, max_hamming=6).collect())
        assert kept == ["m3", "m5"]

    def test_incremental_fake_mode(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from nifi_extracttext_processor_spark.operators.image_dedup import (
            phash_dedup_incremental, update_phash_catalog,
        )
        mk = lambda rows: (spark.createDataFrame(
            rows, "media_id string, text string")
            .select("media_id",
                    F.encode("text", "UTF-8").alias("content")))
        cat = str(tmp_path / "cat_fake")
        update_phash_catalog(mk([("a", "seen before")]), cat,
                             fake=True)
        catalog = spark.read.parquet(cat)
        kept = sorted(r["media_id"] for r in phash_dedup_incremental(
            mk([("b", "seen before"), ("c", "fresh"), ("d", "fresh")]),
            catalog, max_hamming=0, fake=True).collect())
        assert kept == ["c"]

    def test_stream_dedup_matches_batch_semantics(self, spark,
                                                  tmp_path):
        """availableNow drain of stream_phash_dedup keeps the first
        arrival per hash and passes undecodable rows through."""
        import datetime as dt

        from nifi_extracttext_processor_spark.operators.image_dedup import (
            stream_phash_dedup,
        )
        src = tmp_path / "imgs"
        src.mkdir()
        png_a = _gray_png(32, 32, _scene_a())
        png_b = _gray_png(32, 32, _scene_b())
        rows = [("m1", png_a, dt.datetime(2026, 1, 1, 10, 0)),
                ("m2", png_a, dt.datetime(2026, 1, 1, 10, 1)),  # dup
                ("m3", png_b, dt.datetime(2026, 1, 1, 10, 2)),
                ("m4", b"bad", dt.datetime(2026, 1, 1, 10, 3)),
                ("m5", b"bad", dt.datetime(2026, 1, 1, 10, 4))]
        spark.createDataFrame(
            rows, "media_id string, content binary, ts timestamp"
        ).write.parquet(str(src / "p"))
        stream = (spark.readStream
                  .schema("media_id string, content binary, "
                          "ts timestamp")
                  .parquet(str(src / "p")))
        out = stream_phash_dedup(stream)
        q = (out.writeStream.format("memory").queryName("phash_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(r["media_id"] for r in
                     spark.sql("SELECT media_id FROM phash_t")
                     .collect())
        # exactly ONE of the m1/m2 pHash-dup pair survives (within a
        # micro-batch the dedup operator picks an arbitrary member);
        # both undecodables kept (unique err: keys — failures are
        # not duplicates of each other)
        assert len(got) == 4
        assert len({"m1", "m2"} & set(got)) == 1
        assert {"m3", "m4", "m5"} <= set(got)


class TestStreamImageDedup:
    def test_cross_batch_near_dup_and_replay(self, spark, tmp_path):
        """Two drains: a re-encode in batch 2 dedups against batch 1's
        catalog; replaying batch 2 is idempotent (dynamic partition
        overwrite)."""
        from tests.test_operators import TestJpegDecode as TJ

        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_image_dedup,
        )
        png_a = _gray_png(32, 32, _scene_a())
        jpg_a, _ = TJ._jpeg(32, 32, _scene_a(), qt=[1] * 64)
        png_b = _gray_png(32, 32, _scene_b())
        out = str(tmp_path / "out")
        cat = str(tmp_path / "cat")
        fn = stream_image_dedup(out, cat)
        b0 = spark.createDataFrame([("m1", png_a)],
                                   "media_id string, content binary")
        b1 = spark.createDataFrame([("m2", jpg_a), ("m3", png_b)],
                                   "media_id string, content binary")
        fn(b0, 0)
        fn(b1, 1)
        kept = sorted(r["media_id"] for r in
                      spark.read.parquet(out).collect())
        assert kept == ["m1", "m3"]   # m2 = re-encode of m1, dropped
        fn(b1, 1)                     # at-least-once replay
        kept2 = sorted(r["media_id"] for r in
                       spark.read.parquet(out).collect())
        assert kept2 == kept


class TestFakeKernelParity:
    ROWS = [("d1", "merge group part scan"),
            ("d2", "merge group part scan"),      # exact dup
            ("d3", "order filter query key"),
            ("d4", "order filter query key"),     # exact dup
            ("d5", "completely different text")]

    def _df(self, spark):
        from pyspark.sql import functions as F
        return (spark.createDataFrame(self.ROWS,
                                      "doc_id string, text string")
                .select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "UTF-8").alias("content"),
                        "text"))

    def test_table_matches_duckdb(self, spark):
        import duckdb
        df = self._df(spark)
        got = sorted((r["media_id"], r["phash"]) for r in
                     phash64_table(df, fake=True).collect())
        con = duckdb.connect()
        con.register("documents", df.select(
            df.media_id.alias("doc_id"), "text").toPandas())
        want = sorted((r[0], r[1]) for r in con.execute(
            phash_table_sql(content_expr="coalesce(text, '')")
        ).fetchall())
        assert got == want

    def test_pairs_match_duckdb(self, spark):
        import duckdb
        df = self._df(spark)
        got = sorted(tuple(r) for r in
                     phash_pairs(df, fake=True, max_hamming=6).collect())
        # exact dups (hamming 0) surface; unrelated md5s do not
        assert [g[:2] for g in got] == [("d1", "d2"), ("d3", "d4")]
        assert all(g[2] == 0 for g in got)
        con = duckdb.connect()
        con.register("documents", df.select(
            df.media_id.alias("doc_id"), "text").toPandas())
        want = sorted(tuple(r) for r in con.execute(
            phash_pairs_sql(content_expr="coalesce(text, '')",
                            max_hamming=6)).fetchall())
        assert got == want


class TestPhashClusters:
    def test_components_and_keep_best(self, spark):
        from tests.test_operators import TestJpegDecode as TJ

        from nifi_extracttext_processor_spark.operators.image_dedup import (
            keep_best_image_per_cluster, phash_clusters,
        )
        png_a = _gray_png(32, 32, _scene_a())
        jpg_a, _ = TJ._jpeg(32, 32, _scene_a(), qt=[1] * 64)
        png_b = _gray_png(32, 32, _scene_b())
        df = spark.createDataFrame(
            [("m1", png_a), ("m2", jpg_a), ("m3", png_b),
             ("m4", b"broken not an image")],
            "media_id string, content binary")
        cl = {r["media_id"]: r["cluster_id"]
              for r in phash_clusters(df, max_hamming=6).collect()}
        assert cl["m1"] == cl["m2"] == "m1"     # re-encode pair
        assert cl["m3"] == "m3" and cl["m4"] == "m4"  # singletons
        # keep-best (largest bytes) keeps ONE of the m1/m2 pair,
        # specifically the bigger file, plus both singletons
        sizes = {"m1": len(png_a), "m2": len(jpg_a)}
        expect_kept = max(sizes, key=lambda k: (sizes[k], k))
        kept = sorted(r["media_id"] for r in
                      keep_best_image_per_cluster(df).collect())
        assert kept == sorted([expect_kept, "m3", "m4"])
        # min_id mode is deterministic on ids
        kept2 = sorted(r["media_id"] for r in
                       keep_best_image_per_cluster(
                           df, prefer="min_id").collect())
        assert kept2 == ["m1", "m3", "m4"]

    def test_components_string_ids_chain(self, spark):
        """A chain a~b, b~c must collapse to one component even when
        no direct a~c pair exists (and ids are strings)."""
        from nifi_extracttext_processor_spark.operators.dedup import (
            components_from_pairs,
        )
        ids = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("z",)], "doc_id string")
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "id1 string, id2 string")
        got = {r["doc_id"]: r["cluster_id"] for r in
               components_from_pairs(ids, pairs).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "z": "z"}
