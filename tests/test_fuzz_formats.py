"""Robustness fuzzing: extract_any must NEVER raise — malformed input
is a failure ROUTE (A6 semantics), not an exception. Mirrors the
reference's catch-all error capture (ExtractTextProcessor.java:178-189,
227-233) under adversarial bytes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_extracttext_processor_spark.formats import detect_mime, extract_any
from nifi_extracttext_processor_spark.formats.metadata import (
    html_title, ooxml_core_props, pdf_info,
)
from nifi_extracttext_processor_spark.formats.oleps import summary_info

_FAST = settings(max_examples=150, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@_FAST
@given(st.binary(max_size=4096))
def test_extract_any_never_raises(data):
    text, mime, err = extract_any(data, "fuzz.bin")
    assert isinstance(text, str) and isinstance(mime, str)
    assert err is None or isinstance(err, str)
    if err is not None:
        assert text == ""  # A6 quirk: empty content on failure


@_FAST
@given(st.binary(max_size=4096))
def test_detect_mime_total(data):
    assert isinstance(detect_mime(data, None), str)


# magic-byte prefixes steer the fuzz into each parser's deep path
@_FAST
@given(st.sampled_from([b"%PDF-1.4\n", b"PK\x03\x04",
                        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",
                        b"{\\rtf1", b"<html><body>"]),
       st.binary(max_size=2048))
def test_parsers_survive_corrupt_tails(prefix, tail):
    text, mime, err = extract_any(prefix + tail, "fuzz.doc")
    assert isinstance(text, str)
    if err is not None:
        assert text == ""


@_FAST
@given(st.binary(max_size=2048))
def test_metadata_extractors_total(data):
    assert isinstance(pdf_info(b"%PDF-1.4" + data), dict)
    assert isinstance(ooxml_core_props(b"PK\x03\x04" + data), dict)
    assert isinstance(summary_info(
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + data), dict)
    t = html_title(data)
    assert t is None or isinstance(t, str)


@_FAST
@given(st.text(alphabet=st.characters(codec="latin-1"), max_size=1024))
def test_rtf_tokenizer_total(body):
    from nifi_extracttext_processor_spark.formats.rtf import (
        extract_rtf_text,
    )
    data = ("{\\rtf1" + body + "}").encode("latin-1", "replace")
    assert isinstance(extract_rtf_text(data), str)


@_FAST
@given(st.text(max_size=200))
def test_el_parser_total(spark, expr):
    """el_column either compiles or raises ValueError — never crashes
    with an unrelated exception. (Column construction needs an active
    SparkContext, hence the session fixture.)"""
    from nifi_extracttext_processor_spark.operators.expression_language import (
        el_column,
    )
    try:
        el_column(expr)
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Avro codec property tests: encode/decode round-trip for arbitrary values
# ---------------------------------------------------------------------------

@given(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
def test_avro_long_roundtrip(n):
    import io

    from nifi_extracttext_processor_spark.formats.avro_codec import (
        decode_long, encode_long,
    )
    assert decode_long(io.BytesIO(encode_long(n))) == n


@given(st.lists(
    st.fixed_dictionaries({
        "l": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
        "s": st.text(max_size=40),
        "d": st.floats(allow_nan=False, allow_infinity=False,
                       width=64),
        "b": st.booleans(),
        "n": st.one_of(st.none(),
                       st.integers(min_value=-1000, max_value=1000)),
        "arr": st.lists(st.integers(min_value=0, max_value=9),
                        max_size=5),
        "raw": st.binary(max_size=16),
    }), max_size=8))
def test_avro_container_roundtrip_property(rows):
    from nifi_extracttext_processor_spark.formats.avro_codec import (
        read_container, write_container,
    )
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "raw", "type": "bytes"}]}
    _, back = read_container(write_container(schema, rows,
                                             records_per_block=3))
    assert back == rows


# ---------------------------------------------------------------------------
# Truncation fuzzing for the r3 binary formats: a malformed/truncated doc
# must route to failure (or best-effort metadata), never raise — an
# exception inside the Arrow extraction task would fail the whole batch.
# ---------------------------------------------------------------------------


def _r3_fixtures():
    import bz2
    import gzip
    import io
    import lzma
    import struct
    import zipfile

    from tests.fixtures.builders import build_msg

    out = []
    out.append(build_msg("S", "a@x", "b@x", "body"))
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a.txt", "text")
    out.append(zbuf.getvalue())
    out.append(gzip.compress(b"text"))
    out.append(bz2.compress(b"text"))
    out.append(lzma.compress(b"text"))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    out.append(b"RIFF" + struct.pack("<I", 36 + 32) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", 32) + b"\x00" * 32)
    out.append(b"ID3\x03\x00\x00\x00\x00\x00\x10"
               + b"TIT2" + struct.pack(">I", 2) + b"\x00\x00\x00T")
    out.append(b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
               + struct.pack("<HHIHH", 256, 3, 1, 9, 0)
               + struct.pack("<I", 0))
    return out


@given(st.integers(min_value=0, max_value=200), st.integers(0, 7))
@_FAST
def test_truncated_r3_formats_never_raise(cut, idx):
    fixtures = _r3_fixtures()
    data = fixtures[idx % len(fixtures)]
    truncated = data[:cut] if cut < len(data) else data
    text, mime, err = extract_any(truncated, None)
    assert isinstance(text, str) and isinstance(mime, str)


@given(st.integers(min_value=0, max_value=200), st.integers(0, 7))
@_FAST
def test_truncated_r3_metadata_never_raises(cut, idx):
    from nifi_extracttext_processor_spark.formats.image_meta import (
        image_dimensions, mp3_metadata, wav_metadata,
    )
    fixtures = _r3_fixtures()
    data = fixtures[idx % len(fixtures)]
    truncated = data[:cut] if cut < len(data) else data
    for fn in (image_dimensions, wav_metadata, mp3_metadata):
        assert isinstance(fn(truncated), dict)


# ---- media decoders (multimodal.py): decode must fail CLOSED — only
# ValueError / NotImplementedError, never IndexError/KeyError/zlib
# errors/hangs — mirroring the extract_any contract for binary docs.

from nifi_extracttext_processor_spark.operators.multimodal import (  # noqa: E402
    decode_audio_pcm, decode_raster_gray,
)


def _decode_contract(fn, data):
    try:
        fn(data)
    except (ValueError, NotImplementedError):
        pass  # the documented failure modes


@_FAST
@given(st.binary(max_size=4096))
def test_raster_decode_fails_closed(data):
    _decode_contract(decode_raster_gray, data)


@_FAST
@given(st.sampled_from([b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
                        b"BM", b"P5\n", b"P6\n", b"\xff\xd8\xff",
                        b"II*\x00", b"MM\x00*"]),
       st.binary(max_size=2048))
def test_raster_decode_survives_corrupt_tails(prefix, tail):
    _decode_contract(decode_raster_gray, prefix + tail)


@_FAST
@given(st.binary(max_size=4096))
def test_audio_decode_fails_closed(data):
    _decode_contract(decode_audio_pcm, data)


@_FAST
@given(st.binary(max_size=2048))
def test_audio_decode_survives_corrupt_wav(tail):
    _decode_contract(decode_audio_pcm, b"RIFF\xff\xff\x00\x00WAVE" + tail)


def test_gif_truncated_after_lct_is_valueerror():
    """Regression: a GIF cut right after the local color table must be
    ValueError, not IndexError."""
    import struct

    import pytest
    gif = (b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x00, 0, 0])
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
           + bytes([0x80]) + b"\x01\x02\x03" * 2)  # LCT then EOF
    with pytest.raises(ValueError):
        decode_raster_gray(gif)


@_FAST
@given(st.binary(max_size=2048))
def test_av_container_meta_total(data):
    """MP4/FLAC/Ogg metadata walks are total functions: adversarial
    bytes yield a dict (possibly partial), never an exception, and
    never a large allocation (header arithmetic only)."""
    from nifi_extracttext_processor_spark.formats.av_meta import (
        flac_metadata, mp4_metadata, ogg_metadata, ogg_mime,
    )
    for fn, magic in ((mp4_metadata, bytes(4) + b"ftyp"),
                      (flac_metadata, b"fLaC"),
                      (ogg_metadata, b"OggS")):
        assert isinstance(fn(data), dict)
        assert isinstance(fn(magic + data), dict)
    m = ogg_mime(b"OggS" + data)
    assert m is None or isinstance(m, str)


@_FAST
@given(st.integers(min_value=2, max_value=4096),
       st.binary(min_size=1, max_size=16))
def test_progressive_jpeg_corruption_fails_closed(cut, junk):
    """Splice junk into / truncate a valid progressive JPEG at an
    arbitrary offset: decode must return pixels or raise ValueError /
    NotImplementedError — never crash, hang, or over-allocate."""
    from nifi_extracttext_processor_spark.formats.jpeg_decode import (
        decode_jpeg_gray,
    )
    from tests.test_operators import TestJpegProgressive
    base, _ = TestJpegProgressive._jpeg_prog(
        16, 16, [(i * 37) % 256 for i in range(256)],
        sampling=(2, 2), chroma=True)
    cut = cut % len(base)
    for mutated in (base[:cut], base[:cut] + junk + base[cut:],
                    base[:cut] + junk):
        try:
            w, h, px = decode_jpeg_gray(mutated, max_pixels=1 << 26)
            assert len(px) == w * h
        except (ValueError, NotImplementedError):
            pass


@_FAST
@given(st.binary(max_size=1024))
def test_webp_pngtext_xmp_meta_total(data):
    """The round-6 metadata additions are total functions under
    adversarial bytes behind their magic prefixes."""
    from nifi_extracttext_processor_spark.formats.image_meta import (
        _xmp_properties, image_dimensions,
    )
    for prefix in (b"RIFF\x00\x00\x00\x00WEBP",
                   b"\x89PNG\r\n\x1a\n" + b"\x00" * 18,
                   b"\xff\xd8\xff",
                   b"\x00\x00\x00\x0cjP  \r\n\x87\n",
                   b"\xff\x4f\xff\x51",
                   b"\x00\x00\x01\x00\x02\x00" + b"\x00" * 16,
                   b"<svg "):
        assert isinstance(image_dimensions(prefix + data), dict)
    assert isinstance(_xmp_properties(data), dict)


@_FAST
@given(st.binary(max_size=1024))
def test_avi_walks_total(data):
    from nifi_extracttext_processor_spark.formats.av_meta import (
        avi_metadata, avi_mjpeg_frames,
    )
    prefix = b"RIFF\x00\x04\x00\x00AVI "
    assert isinstance(avi_metadata(prefix + data), dict)
    assert isinstance(avi_mjpeg_frames(prefix + data), list)
    assert avi_metadata(data[:12]) == {} or data[:4] == b"RIFF"


@_FAST
@given(st.integers(min_value=0, max_value=4096), st.binary(max_size=16))
def test_encrypted_pdf_corruption_fails_closed(cut, junk):
    """Truncate/splice a valid encrypted PDF: extract routes to
    failure or succeeds — never crashes; decryptor_for is total up to
    ValueError."""
    from nifi_extracttext_processor_spark.formats.pdf_crypt import (
        decryptor_for,
    )
    from tests.fixtures.builders import build_encrypted_pdf
    base = build_encrypted_pdf(["fuzz"], "aes-128")
    cut = cut % len(base)
    for mutated in (base[:cut], base[:cut] + junk + base[cut:]):
        text, mime, err = extract_any(mutated, "f.pdf")
        assert isinstance(text, str)
        try:
            decryptor_for(mutated)
        except ValueError:
            pass


@_FAST
@given(st.integers(min_value=0, max_value=6000), st.binary(max_size=16))
def test_encrypted_ooxml_corruption_fails_closed(cut, junk):
    from tests.fixtures.builders import build_encrypted_docx
    base = build_encrypted_docx(["fuzz"], "agile", spin=2)
    cut = cut % len(base)
    for mutated in (base[:cut], base[:cut] + junk + base[cut:]):
        text, mime, err = extract_any(mutated, "f.docx")
        assert isinstance(text, str)
