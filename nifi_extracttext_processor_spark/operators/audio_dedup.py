"""Audio fingerprint deduplication: spectral-peak constellation
hashes (Wang 2003 — the Shazam landmark algorithm) over the engine's
stdlib WAV decoder, then an offset-consistent hash join for pairs —
the audio counterpart of pHash for images and SimHash/SemDeDup for
text, completing the dedup story across all three modalities.

Algorithm (real kernel, decode_audio_pcm → numpy):
  1. Hann-windowed STFT magnitudes (frame 512, hop 256),
  2. per frame, one peak per log-spaced frequency band (argmax —
     invariant to amplitude scaling by construction) above a small
     absolute floor so silence emits nothing,
  3. each peak anchors hashes against the next `fanout` peaks within
     `max_dt` frames: hash = f1·2^15 | f2·2^6 | dt (24 bits, 6 hex
     chars), emitted with the anchor frame t.
Two recordings of the same material share many hashes whose anchor
times differ by a CONSTANT offset; unrelated audio shares few, and
at inconsistent offsets.

`audio_match_pairs` is the scale path and never goes O(n²):
  * ONE equi-join on the hash value (the band-join analog; only
    (id, t, 6-hex hash) rows shuffle, never waveforms),
  * score = max over dt of |{DISTINCT shared hash values with
    anchor-time delta dt}| — the Shazam offset histogram as a
    distinct + two-level keyed agg (all partial-aggregatable, no
    per-pair arrays); distinct because stationary content (held
    notes, drones) repeats one hash every frame and raw
    co-occurrence counts then grow quadratically at every offset,
  * `max_hash_freq` drops ubiquitous hashes (room tone, mains hum)
    before the join — the skew defense AND a candidate-quality
    filter, same role as the rarest-first prefix in fuzzy_join.

fake=True swaps decode+STFT for deterministic md5 hashes over fixed
16-char slices of the content column (the multimodal fake-kernel
convention): the join/histogram/threshold plumbing — the part that
matters at scale — runs identically and replays value-exactly in
DuckDB (audio_match_pairs_sql) for the driver oracle gate; the real
kernel is golden-tested in pytest (amplitude-scaled copy matches at
dt=0, hop-aligned delayed copy matches at the right dt, unrelated
noise does not match, silence fingerprints empty).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FRAME = 512
DEFAULT_HOP = 256
DEFAULT_FANOUT = 5
DEFAULT_MAX_DT = 63
_BAND_EDGES = (1, 4, 8, 16, 32, 64, 128, 257)  # rfft bins at frame=512
_MAG_FLOOR = 1e-4
_REL_FLOOR = 0.05   # band peaks under 5% of the frame max are leakage

_FAKE_CHUNKS = 8
_FAKE_CHUNK_LEN = 16


def fingerprint_reference(
    mono: list[float],
    frame: int = DEFAULT_FRAME,
    hop: int = DEFAULT_HOP,
    fanout: int = DEFAULT_FANOUT,
    max_dt: int = DEFAULT_MAX_DT,
) -> list[tuple[int, int]]:
    """(t, hash) constellation of one mono waveform — the kernel both
    the Arrow path and the pytest goldens call."""
    import numpy as np

    x = np.asarray(mono, dtype=np.float64)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n = np.arange(frame)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / (frame - 1))
    peaks: list[tuple[int, int]] = []
    n_frames = 1 + (len(x) - frame) // hop
    for ti in range(n_frames):
        mag = np.abs(np.fft.rfft(x[ti * hop:ti * hop + frame] * win))
        # floor is RELATIVE to the frame's loudest bin (plus a tiny
        # absolute floor so silence emits nothing): a band whose
        # argmax is just spectral leakage from a tone elsewhere sits
        # orders of magnitude below the true peak, and those junk
        # peaks are CORRELATED between different signals with the
        # same rhythm — without the relative floor two melodies with
        # disjoint notes scored 41 aligned "shared" hashes in tests
        floor = max(_MAG_FLOOR, _REL_FLOOR * float(mag[1:].max()))
        for b in range(len(_BAND_EDGES) - 1):
            lo, hi = _BAND_EDGES[b], _BAND_EDGES[b + 1]
            f = lo + int(np.argmax(mag[lo:hi]))
            if mag[f] > floor:
                peaks.append((ti, f))
    out: list[tuple[int, int]] = []
    for i, (t1, f1) in enumerate(peaks):
        emitted = 0
        for t2, f2 in peaks[i + 1:]:
            dt = t2 - t1
            if dt == 0:
                continue
            if dt > max_dt:
                break
            out.append((t1, (f1 << 15) | (f2 << 6) | dt))
            emitted += 1
            if emitted >= fanout:
                break
    return out


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    fake: bool = False,
    frame: int = DEFAULT_FRAME,
    hop: int = DEFAULT_HOP,
    fanout: int = DEFAULT_FANOUT,
    max_dt: int = DEFAULT_MAX_DT,
) -> DataFrame:
    """(id_col, t int, fp string, audio_error string) — one row per
    constellation hash; a failed decode yields ONE row with NULL
    fp/t and the reason (A6 skip-don't-fail: a corrupt file never
    kills the job, and downstream joins filter NULLs out).

    fake=True: zero-UDF Catalyst stand-in — md5 of fixed 16-char
    slices of the (string) content column, t = slice index; empty
    slices emit nothing so short texts don't all collide on
    md5('')."""
    if fake:
        sigs = F.array(*[
            F.when(
                F.length(F.substring(F.col(content_col),
                                     i * _FAKE_CHUNK_LEN + 1,
                                     _FAKE_CHUNK_LEN)) > 0,
                F.substring(F.md5(F.substring(
                    F.col(content_col), i * _FAKE_CHUNK_LEN + 1,
                    _FAKE_CHUNK_LEN)), 1, 12))
            for i in range(_FAKE_CHUNKS)])
        return (df.select(F.col(id_col),
                          F.posexplode(sigs).alias("t", "fp"))
                .filter(F.col("fp").isNotNull())
                .withColumn("audio_error", F.lit(None).cast("string")))

    import pandas as pd

    from .multimodal import decode_audio_pcm

    id_type = {f.name: f.dataType.simpleString()
               for f in df.schema.fields}[id_col]
    schema = f"`{id_col}` {id_type}, t int, fp string, audio_error string"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    _rate, _nch, mono = decode_audio_pcm(
                        bytes(blob or b""))
                    fps = fingerprint_reference(
                        mono, frame=frame, hop=hop, fanout=fanout,
                        max_dt=max_dt)
                    yield pd.DataFrame({
                        id_col: [rid] * len(fps),
                        "t": [t for t, _ in fps],
                        "fp": [format(h, "06x") for _, h in fps],
                        "audio_error": [None] * len(fps)})
                except Exception as exc:
                    yield pd.DataFrame({
                        id_col: [rid], "t": [None], "fp": [None],
                        "audio_error": [f"{type(exc).__name__}: {exc}"]})

    return df.mapInPandas(_run, schema=schema)


def audio_match_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    min_matches: int = 5,
    max_hash_freq: int | None = None,
) -> DataFrame:
    """(id1, id2, matches) for id1 < id2 where `matches` = the best
    offset-consistent shared-hash count ≥ min_matches. Input is an
    audio_fingerprints table (real or fake; NULL-fp error rows are
    ignored). `max_hash_freq` drops hashes present in more than that
    many recordings before the join (skew + quality)."""
    if min_matches < 1:
        raise ValueError("min_matches must be >= 1")
    f = (fps.filter(F.col("fp").isNotNull())
         .select(F.col(id_col).alias("id"), "t", "fp"))
    if max_hash_freq is not None:
        rare = (f.groupBy("fp")
                .agg(F.count_distinct("id").alias("__df"))
                .filter(F.col("__df") <= max_hash_freq)
                .select("fp"))
        f = f.join(rare, "fp")
    l, r = f.alias("l"), f.alias("r")
    # DISTINCT (pair, dt, fp) before counting: a hash contributes at
    # most once per offset. Stationary content (held notes, drones)
    # emits the SAME hash every frame, and raw co-occurrence counts
    # then grow quadratically in the note length at EVERY offset —
    # distinct-hash alignment counts stay proportional to genuinely
    # shared material (reproduced in tests: two disjoint-palette
    # melodies scored 369 raw co-occurrences at a junk offset but
    # only ~a dozen distinct hashes).
    return (l.join(r, (F.col("l.fp") == F.col("r.fp"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id1"),
                    F.col("r.id").alias("id2"),
                    (F.col("l.t") - F.col("r.t")).alias("dt"),
                    F.col("l.fp").alias("fp"))
            .distinct()
            .groupBy("id1", "id2", "dt")
            .agg(F.count("*").alias("__n"))
            .groupBy("id1", "id2")
            .agg(F.max("__n").alias("matches"))
            .filter(F.col("matches") >= min_matches))


def audio_dedup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    min_matches: int = 5,
    max_hash_freq: int | None = None,
    fake: bool = False,
) -> DataFrame:
    """fingerprints + offset-consistent match in one call."""
    fps = audio_fingerprints(df, id_col=id_col,
                             content_col=content_col, fake=fake)
    return audio_match_pairs(fps, id_col=id_col,
                             min_matches=min_matches,
                             max_hash_freq=max_hash_freq)


def audio_match_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    content_expr: str = "text",
    min_matches: int = 5,
    max_hash_freq: int | None = None,
) -> str:
    """DuckDB twin of audio_dedup_pairs(fake=True): same md5 slice
    hashes, same offset histogram, same threshold."""
    chunks = " UNION ALL ".join(
        f"SELECT id, {i} AS t, "
        f"substr(md5(substr(s, {i * _FAKE_CHUNK_LEN + 1}, "
        f"{_FAKE_CHUNK_LEN})), 1, 12) AS fp "
        f"FROM k WHERE length(substr(s, {i * _FAKE_CHUNK_LEN + 1}, "
        f"{_FAKE_CHUNK_LEN})) > 0"
        for i in range(_FAKE_CHUNKS))
    freq_filter = ""
    if max_hash_freq is not None:
        freq_filter = f""",
rare AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING count(DISTINCT id) <= {max_hash_freq}
)"""
    fp_src = ("(SELECT f.* FROM fps f JOIN rare USING (fp))"
              if max_hash_freq is not None else "fps")
    return f"""
WITH k AS (
  SELECT {id_col} AS id, {content_expr} AS s FROM {table}
),
fps AS ({chunks}){freq_filter},
aligned AS (
  SELECT DISTINCT l.id AS id1, r.id AS id2, l.t - r.t AS dt, l.fp
  FROM {fp_src} l JOIN {fp_src} r
    ON l.fp = r.fp AND l.id < r.id
),
hist AS (
  SELECT id1, id2, dt, count(*) AS n FROM aligned GROUP BY 1, 2, 3
)
SELECT id1, id2, max(n) AS matches
FROM hist GROUP BY id1, id2
HAVING max(n) >= {min_matches}
"""


# ---------------------------------------------------------------------------
# incremental (catalog) variant — the dedup_exact_incremental /
# phash_dedup_incremental shape for audio
# ---------------------------------------------------------------------------


def audio_dedup_incremental(
    new_df: DataFrame,
    catalog_df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    min_matches: int = 5,
    max_hash_freq: int | None = None,
    fake: bool = False,
) -> DataFrame:
    """Dedup a NEW audio batch against a historical fingerprint
    catalog, then within itself. At 100 TB you fingerprint the DELTA
    and hash-join it against the persisted catalog — never re-decode
    the archive.

    catalog_df needs (cat_id, t, fp) columns — what
    update_audio_catalog writes (recording identity must persist:
    matching requires the offset histogram per catalog recording,
    unlike the image catalog where a bare hash set suffices). A new
    clip is dropped when some catalog recording aligns with ≥
    min_matches distinct hashes at a consistent offset, or when a
    SMALLER-id batch sibling does (min of each chain survives).
    Undecodable clips pass through (the A6 posture: extraction
    decides their fate, dedup never silently drops them)."""
    fps = audio_fingerprints(new_df, id_col=id_col,
                             content_col=content_col, fake=fake)
    hashed = (fps.filter(F.col("fp").isNotNull())
              .select(F.col(id_col).alias("__nid"), "t", "fp"))
    cat = catalog_df.select(F.col("cat_id"),
                            F.col("t").alias("ct"), "fp")
    if max_hash_freq is not None:
        rare = (cat.groupBy("fp")
                .agg(F.count_distinct("cat_id").alias("__df"))
                .filter(F.col("__df") <= max_hash_freq)
                .select("fp"))
        cat = cat.join(rare, "fp")
    matched = (hashed.join(cat, "fp")
               .select("__nid", "cat_id",
                       (F.col("t") - F.col("ct")).alias("dt"), "fp")
               .distinct()
               .groupBy("__nid", "cat_id", "dt")
               .agg(F.count("*").alias("__n"))
               .filter(F.col("__n") >= min_matches)
               .select(F.col("__nid").alias(id_col)).distinct())
    fresh_fps = fps.join(matched, id_col, "left_anti")
    losers = (audio_match_pairs(fresh_fps, id_col=id_col,
                                min_matches=min_matches,
                                max_hash_freq=max_hash_freq)
              .select(F.col("id2").alias(id_col)).distinct())
    # keep-set starts from ALL batch ids so clips with EMPTY
    # fingerprints (silence) and undecodable clips (error row) pass
    # through — no fingerprint evidence never means "duplicate"
    return (new_df
            .join(matched, id_col, "left_anti")
            .join(losers, id_col, "left_anti"))


def update_audio_catalog(
    new_df: DataFrame,
    catalog_path: str,
    content_col: str = "content",
    id_col: str = "media_id",
    fake: bool = False,
) -> None:
    """Append the batch's fingerprints to the parquet catalog
    (append-only; duplicate rows only cost space because the match
    histogram DISTINCTs (pair, dt, fp) — compact with
    sources.tables.compact_catalog). Anchor times persist: the
    offset-consistency check needs them."""
    (audio_fingerprints(new_df, id_col=id_col,
                        content_col=content_col, fake=fake)
     .filter(F.col("fp").isNotNull())
     .select(F.col(id_col).cast("string").alias("cat_id"), "t", "fp")
     .write.mode("append").parquet(catalog_path))
