"""audio_dedup (operators/audio_dedup.py): real-kernel goldens
(amplitude-scaled copy matches at dt=0, hop-aligned delayed copy
matches at the right offset, unrelated audio does not, silence
fingerprints empty), decode-failure isolation, hash-frequency
filter, fake-mode DuckDB twin parity, and plan shape."""
from __future__ import annotations

import math
import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.audio_dedup import (
    DEFAULT_HOP,
    audio_dedup_pairs,
    audio_fingerprints,
    audio_match_pairs,
    audio_match_pairs_sql,
    fingerprint_reference,
)

RATE = 8000


def _wav(samples: list[float], rate: int = RATE) -> bytes:
    """Minimal 16-bit mono RIFF/WAVE."""
    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(s * 32767.0))))
        for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return (b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks)


_PALETTES = {
    # disjoint frequency sets so "different melody" shares NO notes
    # (same-palette melodies legitimately share constellation hashes
    # during overlapping notes — that's the algorithm working)
    0: [330, 440, 550, 660, 880, 990, 1320, 1760],
    1: [370, 490, 610, 730, 970, 1090, 1450, 1930],
}


def _melody(seed: int, secs: float = 2.0) -> list[float]:
    """A deterministic tone sequence (8 notes) — structured audio the
    constellation can lock onto."""
    rnd = random.Random(seed)
    freqs = [rnd.choice(_PALETTES[seed % 2]) for _ in range(8)]
    n = int(RATE * secs)
    out = []
    for i in range(n):
        f = freqs[min(int(i / n * 8), 7)]
        out.append(0.6 * math.sin(2 * math.pi * f * i / RATE))
    return out


@pytest.fixture(scope="module")
def clips(spark):
    a = _melody(1)
    rows = [
        (1, _wav(a)),
        (2, _wav([0.5 * s for s in a])),          # amplitude-scaled copy
        (3, _wav([0.0] * (DEFAULT_HOP * 10) + a)),  # 10-frame delay
        (4, _wav(_melody(2))),                    # different melody
        (5, _wav([0.0] * RATE)),                  # silence
        (6, b"not a wav at all"),                 # decode failure
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_scaled_copy_matches_at_zero_offset(spark, clips):
    fps = audio_fingerprints(clips).cache()
    pairs = {(r["id1"], r["id2"]): r["matches"]
             for r in audio_match_pairs(fps, min_matches=5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 50
    # delayed copy matches 1 (and its scaled twin 2)
    assert (1, 3) in pairs and (2, 3) in pairs
    # unrelated melody and silence never pair with the melody family
    assert not any(4 in p or 5 in p for p in pairs)
    fps.unpersist()


def test_delay_offset_is_consistent(spark, clips):
    # the winning offset for (1, 3) must be the 10-frame delay
    fps = audio_fingerprints(clips).filter(
        F.col("media_id").isin(1, 3))
    hist = (fps.alias("l").join(
        fps.alias("r"),
        (F.col("l.fp") == F.col("r.fp"))
        & (F.col("l.media_id") < F.col("r.media_id")))
        .select((F.col("r.t") - F.col("l.t")).alias("dt"))
        .groupBy("dt").count().orderBy(F.desc("count")).first())
    assert hist["dt"] == 10


def test_silence_fingerprints_empty():
    assert fingerprint_reference([0.0] * RATE) == []


def test_decode_failure_isolated(spark, clips):
    fps = audio_fingerprints(clips)
    errs = fps.filter(F.col("audio_error").isNotNull()).collect()
    assert [r["media_id"] for r in errs] == [6]
    assert errs[0]["fp"] is None
    # and the error row never reaches the join
    assert not any(6 in (r["id1"], r["id2"]) for r in
                   audio_match_pairs(fps, min_matches=1).collect())


def test_kernel_matches_reference(spark, clips):
    a = _melody(1)
    want = sorted((t, format(h, "06x"))
                  for t, h in fingerprint_reference(a))
    got = sorted((r["t"], r["fp"]) for r in
                 audio_fingerprints(clips)
                 .filter(F.col("media_id") == 1).collect())
    assert got == want


def test_max_hash_freq_drops_common_hashes(spark):
    # three identical clips: every hash is in 3 recordings; cap at 2
    # removes them all, so no pairs survive
    w = _wav(_melody(3, secs=1.0))
    df = spark.createDataFrame([(i, w) for i in range(3)],
                               "media_id long, content binary")
    fps = audio_fingerprints(df).cache()
    assert audio_match_pairs(fps, min_matches=1).count() == 3
    assert audio_match_pairs(fps, min_matches=1,
                             max_hash_freq=2).count() == 0
    fps.unpersist()


def test_fake_mode_duckdb_parity(spark):
    base = "".join(f"chunk-{i:02d}-ABCDEFG." for i in range(8))
    alt = ("".join(f"chunk-{i:02d}-ABCDEFG." for i in range(4))
           + "QRSTUVWXYZ123456" * 4)
    rows = [(1, base), (2, base), (3, alt),
            (4, "completely different text that is long enough here"),
            (5, "short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("t", df.toPandas())
    for mm, cap in ((1, None), (4, None), (1, 1)):
        got = sorted(tuple(r) for r in audio_dedup_pairs(
            df, "doc_id", "text", min_matches=mm, max_hash_freq=cap,
            fake=True).collect())
        want = sorted(tuple(r) for r in con.sql(audio_match_pairs_sql(
            "t", "doc_id", "text", min_matches=mm,
            max_hash_freq=cap)).fetchall())
        assert got == want, (mm, cap)
    # duplicate full texts share all 8 chunks
    full = dict(((a, b), m) for a, b, m in sorted(
        tuple(r) for r in audio_dedup_pairs(
            df, "doc_id", "text", min_matches=1, fake=True).collect()))
    assert full[(1, 2)] == 8 and full[(1, 3)] == 4


def test_no_cartesian_in_plan(spark, clips):
    out = audio_dedup_pairs(clips, fake=False, min_matches=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation(spark, clips):
    with pytest.raises(ValueError):
        audio_match_pairs(audio_fingerprints(clips, fake=False),
                          min_matches=0)


class TestIncrementalAndStreaming:
    def _clips(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "media_id string, content binary")

    def test_incremental_against_catalog(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.audio_dedup import (
            audio_dedup_incremental, update_audio_catalog,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            read_catalog,
        )
        a = _melody(1)
        cat_path = str(tmp_path / "cat")
        batch1 = self._clips(spark, [("a1", _wav(a))])
        update_audio_catalog(batch1, cat_path)
        catalog = read_catalog(spark, cat_path, ("cat_id", "t", "fp"))
        # batch 2: a scaled re-record of a1 (drop), a delayed copy
        # (drop), a new melody (keep), in-batch dup pair (keep min),
        # silence + garbage (pass through untouched)
        b = _melody(2)
        batch2 = self._clips(spark, [
            ("b1", _wav([0.5 * s for s in a])),
            ("b2", _wav([0.0] * (DEFAULT_HOP * 4) + a)),
            ("b3", _wav(b)),
            ("b4", _wav([0.9 * s for s in b])),
            ("b5", _wav([0.0] * RATE)),
            ("b6", b"garbage bytes"),
        ])
        kept = sorted(r["media_id"] for r in audio_dedup_incremental(
            batch2, catalog).collect())
        assert kept == ["b3", "b5", "b6"]

    def test_stream_cross_batch_and_replay(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.streaming.pipeline import (
            stream_audio_dedup,
        )
        a, b = _melody(1), _melody(2)
        out, cat = str(tmp_path / "out"), str(tmp_path / "cat")
        fn = stream_audio_dedup(out, cat)
        fn(self._clips(spark, [("m1", _wav(a))]), 0)
        b1 = self._clips(spark, [
            ("m2", _wav([0.7 * s for s in a])),   # re-record of m1
            ("m3", _wav(b)),                       # new
        ])
        fn(b1, 1)
        kept = sorted(r["media_id"] for r in
                      spark.read.parquet(out).collect())
        assert kept == ["m1", "m3"]
        fn(b1, 1)   # at-least-once replay: idempotent
        kept2 = sorted(r["media_id"] for r in
                       spark.read.parquet(out).collect())
        assert kept2 == kept

    def test_incremental_fake_mode(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from nifi_extracttext_processor_spark.operators.audio_dedup import (
            audio_dedup_incremental, update_audio_catalog,
        )
        from nifi_extracttext_processor_spark.sources.tables import (
            read_catalog,
        )
        base = "".join(f"chunk-{i:02d}-ABCDEFG." for i in range(8))
        cat_path = str(tmp_path / "cat")
        b1 = spark.createDataFrame([("c1", base)],
                                   "media_id string, content string")
        update_audio_catalog(b1, cat_path, fake=True)
        catalog = read_catalog(spark, cat_path, ("cat_id", "t", "fp"))
        b2 = spark.createDataFrame(
            [("n1", base), ("n2", "something else entirely here ok")],
            "media_id string, content string")
        kept = sorted(r["media_id"] for r in audio_dedup_incremental(
            b2, catalog, fake=True).collect())
        assert kept == ["n2"]
