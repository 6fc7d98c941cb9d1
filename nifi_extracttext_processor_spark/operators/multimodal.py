"""Multimodal column conventions (north star): image/audio/video as
opaque binary columns + typed metadata structs, with decode /
feature-extract / resize / frame-sample as Arrow-batched mapInPandas
stages.

The media codec libraries (Pillow, ffmpeg, torchaudio…) are NOT in this
container, so the decode kernels are STUBS — deterministic fakes behind
`fake=True` (default) and a clearly-marked NotImplementedError otherwise.
The Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; dropping in a real codec is a
one-function change that does not alter any plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("content", BinaryType()),     # opaque encoded bytes
    StructField("mime_type", StringType()),
    StructField("meta", MapType(StringType(), StringType())),
])


def _passthrough_fields(df: DataFrame, drop: tuple[str, ...] = ()) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name not in drop)


def _fake_pixels(data: bytes, w: int, h: int) -> list[float]:
    """Deterministic stand-in for a real image decode: md5-seeded floats."""
    seed = hashlib.md5(data).digest()
    n = w * h
    out = []
    for i in range(n):
        b = seed[i % 16]
        out.append(round((b ^ (i & 0xFF)) / 255.0, 6))
    return out


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    width: int = 8,
    height: int = 8,
    fake: bool = True,
) -> DataFrame:
    """content → pixels array<float> (w*h grayscale) + width/height.

    Real implementation would be `PIL.Image.open(io.BytesIO(b))` inside
    the same batch loop — identical schema and plan.
    """
    schema = (_passthrough_fields(df)
              + ", pixels ARRAY<FLOAT>, width INT, height INT")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode needs Pillow; container ships none "
                    "— run with fake=True")
            pdf = pdf.copy()
            pdf["pixels"] = [
                _fake_pixels(bytes(b) if b is not None else b"", width, height)
                for b in pdf[content_col]]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def image_features(
    df: DataFrame,
    pixels_col: str = "pixels",
    n_features: int = 16,
) -> DataFrame:
    """pixels → fixed-size feature vector (mean-pooled blocks) —
    numpy-vectorized, the real shape of an embedding-extraction stage."""
    schema = _passthrough_fields(df) + ", features ARRAY<FLOAT>"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for px in pdf[pixels_col]:
                arr = np.asarray(px, dtype=np.float32)
                if arr.size == 0:
                    feats.append([0.0] * n_features)
                    continue
                pad = (-arr.size) % n_features
                if pad:
                    arr = np.pad(arr, (0, pad))
                feats.append([round(float(x), 6) for x in
                              arr.reshape(n_features, -1).mean(axis=1)])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def resize_image(
    df: DataFrame,
    pixels_col: str = "pixels",
    src_w: int = 8, src_h: int = 8,
    dst_w: int = 4, dst_h: int = 4,
) -> DataFrame:
    """Nearest-neighbor resize on the decoded pixel array (numpy)."""
    schema = (_passthrough_fields(df, drop=("width", "height", pixels_col))
              + f", {pixels_col} ARRAY<FLOAT>, width INT, height INT")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ys = (np.arange(dst_h) * src_h // dst_h)
        xs = (np.arange(dst_w) * src_w // dst_w)
        for pdf in batches:
            out = []
            for px in pdf[pixels_col]:
                arr = np.asarray(px, dtype=np.float32).reshape(src_h, src_w)
                out.append([float(v) for v in arr[np.ix_(ys, xs)].ravel()])
            res = pdf.drop(columns=[pixels_col, "width", "height"],
                           errors="ignore").copy()
            res[pixels_col] = out
            res["width"] = dst_w
            res["height"] = dst_h
            yield res

    return df.mapInPandas(_run, schema=schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    every_n: int = 10,
    max_frames: int = 3,
    fake: bool = True,
) -> DataFrame:
    """video content → exploded (frame_no, frame binary) rows.

    Real implementation: ffmpeg/pyav demux in the same loop. The fake
    emits deterministic md5-derived frame payloads so downstream
    plumbing (explode cardinality, binary transport) is fully exercised.
    """
    schema = (_passthrough_fields(df)
              + ", frame_no INT, frame BINARY")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling needs ffmpeg/pyav; run fake=True")
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col] or b"")
                for f in range(max_frames):
                    d = dict(row)
                    d["frame_no"] = f * every_n
                    d["frame"] = hashlib.md5(
                        data + f"#{f * every_n}".encode()).digest()
                    rows.append(d)
            yield pd.DataFrame(rows, columns=list(pdf.columns)
                               + ["frame_no", "frame"])

    return df.mapInPandas(_run, schema=schema)


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    n_mfcc: int = 8,
    fake: bool = True,
) -> DataFrame:
    """audio content → fake-MFCC vector (deterministic md5-derived)."""
    schema = _passthrough_fields(df) + ", mfcc ARRAY<FLOAT>"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio features need torchaudio/librosa; "
                    "run fake=True")
            pdf = pdf.copy()
            pdf["mfcc"] = [
                [round(hashlib.md5(bytes(b or b"") + bytes([i])).digest()[0]
                       / 255.0, 6) for i in range(n_mfcc)]
                for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(_run, schema=schema)
