"""Pure-Python parser tests, incl. Tika-parity goldens on the
reference's own fixtures (ExtractTextProcessorTest.java ports — the
Spark-level ports live in test_extract_spark.py)."""

from __future__ import annotations

import pytest

from nifi_extracttext_processor_spark.formats import (
    detect_mime, extract_any, extract_doc_text, extract_docx_text,
    extract_pdf_text, html_to_text, render_xhtml,
)
from tests.fixtures.builders import (
    build_doc, build_docx, build_pdf, build_ppt, build_pptx, build_rtf,
    build_xlsx,
)


class TestReferenceGoldens:
    """1:1 ports of the reference's golden-prefix asserts (SURVEY §5)."""

    def test_simple_pdf(self, reference_fixture):  # Test.java:47-75
        text = extract_pdf_text(reference_fixture("simple.pdf"))
        assert text.strip().startswith("A Simple PDF File")

    def test_simple_doc(self, reference_fixture):  # :77-104
        text = extract_doc_text(reference_fixture("simple.doc"))
        assert text.strip().startswith("A Simple WORD DOC File")

    def test_simple_docx(self, reference_fixture):  # :107-133
        text = extract_docx_text(reference_fixture("simple.docx"))
        assert text.strip().startswith("A Simple WORD DOCX File")

    def test_big_pdf_unlimited(self, reference_fixture):  # :245-272
        text, _, err = extract_any(reference_fixture("big.pdf"), "big.pdf")
        assert err is None
        assert len(text) > 100

    def test_big_pdf_truncated(self, reference_fixture):  # :275-297
        text, _, err = extract_any(
            reference_fixture("big.pdf"), "big.pdf", max_text_length=100)
        assert err is None
        assert len(text) <= 100

    def test_mime_attributes(self, reference_fixture):  # :138-160, 196-243
        for name, want in [
            ("simple.pdf", "application/pdf"),
            ("simple.doc", "application/msword"),
            ("simple.docx",
             "application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document"),
        ]:
            assert detect_mime(reference_fixture(name), name) == want

    def test_html_mode_no_truncation(self, reference_fixture):  # A4 quirk
        html, _, err = extract_any(
            reference_fixture("big.pdf"), "big.pdf",
            max_text_length=100, output_mode="html")
        assert err is None
        assert len(html) > 100  # :158-172 never applies the cap


class TestSyntheticFormats:
    def test_pdf_roundtrip(self):
        for compress in (False, True):
            data = build_pdf(["alpha beta", "gamma"], compress=compress)
            assert detect_mime(data) == "application/pdf"
            assert extract_pdf_text(data) == "alpha beta\ngamma"

    def test_pdf_truncation_bound(self):
        data = build_pdf(["x" * 500])
        assert len(extract_pdf_text(data, max_length=10)) == 10
        assert len(extract_pdf_text(data, max_length=0)) == 0
        assert len(extract_pdf_text(data, max_length=-1)) == 500

    def test_docx(self):
        data = build_docx(["one", "two", "three"])
        assert extract_docx_text(data) == "one\ntwo\nthree\n"

    def test_xlsx(self):
        data = build_xlsx([["h1", "h2"], ["v1", "v2"]])
        text, mime, err = extract_any(data, "t.xlsx")
        assert err is None
        assert "spreadsheetml" in mime
        assert text == "h1\th2\nv1\tv2\n"

    def test_legacy_doc(self):
        data = build_doc("Legacy doc body text")
        assert extract_doc_text(data).startswith("Legacy doc body text")
        assert detect_mime(data) == "application/msword"

    def test_html_input(self):
        html = (b"<html><head><title>T</title><style>p{}</style></head>"
                b"<body><p>Hello</p><p>World &amp; more</p>"
                b"<script>var x=1;</script></body></html>")
        assert html_to_text(html) == "T\nHello\nWorld & more"

    def test_render_xhtml_structure(self):
        out = render_xhtml("a\nb", title="t")
        assert out.startswith('<html xmlns="http://www.w3.org/1999/xhtml">')
        assert "<p>a</p>" in out and "<p>b</p>" in out
        assert "<title>t</title>" in out

    def test_error_quirks(self):
        # corrupt bytes → text='' + error set, mime attrs withheld (A6)
        text, _, err = extract_any(b"\x00\x01\x02\xff\xfe", "x.bin")
        assert text == "" and err is not None
        # null content → A7 null guard message
        text, _, err = extract_any(None, None)
        assert text == "" and err == "Input file was null"
        # corrupt PDF body → error, not crash
        text, _, err = extract_any(b"%PDF-1.4 then garbage\xff\x00", "x.pdf")
        assert err is None or text == ""  # tolerant parse or clean failure

    def test_unicode_escapes_in_pdf(self):
        data = build_pdf(["paren ( inside ) ok", "back\\slash"])
        assert extract_pdf_text(data) == "paren ( inside ) ok\nback\\slash"


class TestPresentationAndRtf:
    """PPTX/PPT/RTF coverage — the reference handles these via Tika
    AutoDetectParser (ExtractTextProcessor.java:158,173-176)."""

    def test_pptx_golden(self):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any, extract_pptx_text,
        )
        from nifi_extracttext_processor_spark.formats import mime as m
        data = build_pptx([["A Simple PPTX Deck", "Second line"],
                           ["Slide two"]])
        assert detect_mime(data, "deck.pptx") == m.MIME_PPTX
        assert extract_pptx_text(data).startswith("A Simple PPTX Deck")
        text, mime, err = extract_any(data, "deck.pptx")
        assert err is None and mime == m.MIME_PPTX
        assert text == "A Simple PPTX Deck\nSecond line\nSlide two\n"

    def test_pptx_slide_order_numeric(self):
        # slide10 must come after slide2 (numeric, not lexicographic)
        from nifi_extracttext_processor_spark.formats import (
            extract_pptx_text,
        )
        slides = [[f"slide {i}"] for i in range(1, 12)]
        text = extract_pptx_text(build_pptx(slides))
        assert text.splitlines() == [f"slide {i}" for i in range(1, 12)]

    def test_ppt_utf16_and_bytes_atoms(self):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any, extract_ppt_text,
        )
        from nifi_extracttext_processor_spark.formats import mime as m
        data = build_ppt(["A Simple PPT File", "More text"])
        assert detect_mime(data, "deck.ppt") == m.MIME_PPT
        assert extract_ppt_text(data) == "A Simple PPT File\nMore text\n"
        data8 = build_ppt(["Café bytes"], utf16=False)
        text, mime, err = extract_any(data8, "deck.ppt")
        assert err is None and text == "Café bytes\n"

    def test_rtf_golden_with_skipped_tables(self):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any,
        )
        from nifi_extracttext_processor_spark.formats import mime as m
        data = build_rtf(["A Simple RTF File", "Par two"])
        assert detect_mime(data, "doc.rtf") == m.MIME_RTF
        text, mime, err = extract_any(data, "doc.rtf")
        assert err is None and mime == m.MIME_RTF
        # font/color tables must not leak into the text
        assert text == "A Simple RTF File\nPar two\n"
        assert "Helvetica" not in text

    def test_rtf_unicode_escape(self):
        from nifi_extracttext_processor_spark.formats import (
            extract_rtf_text,
        )
        rtf = (rb"{\rtf1\ansi\uc1 caf\u233? and \'e9 and "
               rb"{\*\secret hidden}done\par}")
        text = extract_rtf_text(rtf)
        assert "café and é and done" in text
        assert "hidden" not in text

    def test_truncation_applies_to_new_formats(self):
        from nifi_extracttext_processor_spark.formats import extract_any
        data = build_pptx([["A Simple PPTX Deck"]])
        text, _, err = extract_any(data, "d.pptx", max_text_length=8)
        assert err is None and text == "A Simple"


class TestLegacyXls:
    def test_xls_golden(self):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any, extract_xls_text,
        )
        from nifi_extracttext_processor_spark.formats import mime as m
        from tests.fixtures.builders import build_xls
        data = build_xls(["A Simple XLS File", "Second cell"])
        assert detect_mime(data, "book.xls") == m.MIME_XLS
        assert extract_xls_text(data) == "A Simple XLS File\nSecond cell\n"
        text, mime, err = extract_any(data, "book.xls")
        assert err is None and mime == m.MIME_XLS
        assert text.startswith("A Simple XLS File")

    def test_pptx_filename_fallback(self):
        """A zip without recognizable parts but a .pptx name maps to the
        PPTX mime (Tika filename-hint behavior)."""
        import io
        import zipfile

        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats import mime as m
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("unknown.xml", "<x/>")
        assert detect_mime(buf.getvalue(), "deck.pptx") == m.MIME_PPTX


class TestOpenDocumentEmailXml:
    """Round-2 widening: ODT/ODS/ODP, EML, XML, gzip, CSV — the rest of
    the AutoDetectParser surface (ExtractTextProcessor.java:158,173)."""

    def test_odt(self):
        from tests.fixtures.builders import build_odt
        data = build_odt(["A Simple ODT File", "second paragraph"])
        assert detect_mime(data) == "application/vnd.oasis.opendocument.text"
        text, mime, err = extract_any(data, "simple.odt")
        assert err is None
        assert text == "A Simple ODT File\nsecond paragraph\n"

    def test_ods(self):
        from tests.fixtures.builders import build_ods
        data = build_ods([["h1", "h2"], ["v1", "v2"]])
        assert detect_mime(data) == (
            "application/vnd.oasis.opendocument.spreadsheet")
        text, _, err = extract_any(data, "t.ods")
        assert err is None
        assert text == "h1\th2\nv1\tv2\n"

    def test_odp(self):
        from tests.fixtures.builders import build_odp
        data = build_odp([["Slide One Title", "bullet"], ["Slide Two"]])
        assert detect_mime(data) == (
            "application/vnd.oasis.opendocument.presentation")
        text, _, err = extract_any(data, "deck.odp")
        assert err is None
        assert text == "Slide One Title\nbullet\nSlide Two\n"

    def test_eml_plain(self):
        from tests.fixtures.builders import build_eml
        data = build_eml("Hi there", "a@example.com", "b@example.com",
                         "body line one\nbody line two\n")
        assert detect_mime(data, "m.eml") == "message/rfc822"
        # header-based detection works without the filename hint too
        assert detect_mime(data) == "message/rfc822"
        text, _, err = extract_any(data, "m.eml")
        assert err is None
        assert text.startswith("Subject: Hi there\nFrom: a@example.com\n"
                               "To: b@example.com\n\nbody line one")

    def test_eml_multipart_skips_attachment(self):
        from tests.fixtures.builders import build_eml
        data = build_eml("S", "a@x.com", "b@x.com", "plain part",
                         html_body="<html><body><p>html part</p></body></html>",
                         attachment=b"\x00\x01binary")
        text, _, err = extract_any(data, "m.eml")
        assert err is None
        assert "plain part" in text
        assert "html part" in text
        assert "binary" not in text

    def test_xml(self):
        data = b'<?xml version="1.0"?><root><a>alpha</a><b>beta <i>i</i></b></root>'
        assert detect_mime(data) == "application/xml"
        text, _, err = extract_any(data, "d.xml")
        assert err is None
        assert text == "alpha beta i\n"

    def test_gzip_transparent(self):
        import gzip
        inner = b"gzipped plain text content"
        data = gzip.compress(inner)
        assert detect_mime(data, "t.txt.gz") == "application/gzip"
        text, mime, err = extract_any(data, "t.txt.gz")
        assert err is None
        assert mime == "application/gzip"
        assert text == "gzipped plain text content"

    def test_gzip_wrapped_html(self):
        import gzip
        data = gzip.compress(b"<html><body><p>hello gz html</p></body></html>")
        text, _, err = extract_any(data, "page.html.gz")
        assert err is None
        assert "hello gz html" in text

    def test_gzip_multi_member(self):
        """Concatenated .gz members (cat a.gz b.gz / pigz output) must
        ALL decode — single-member decompressobj silently truncates."""
        import gzip
        data = gzip.compress(b"first member ") + gzip.compress(
            b"+ second member")
        text, _, err = extract_any(data, "t.txt.gz")
        assert err is None
        assert text == "first member + second member"

    def test_bzip2_multi_stream(self):
        import bz2
        data = bz2.compress(b"one ") + bz2.compress(b"two")
        text, _, err = extract_any(data, "t.txt.bz2")
        assert err is None
        assert text == "one two"

    def test_xz_multi_stream(self):
        import lzma
        data = lzma.compress(b"alpha ") + lzma.compress(b"beta")
        text, _, err = extract_any(data, "t.txt.xz")
        assert err is None
        assert text == "alpha beta"

    def test_csv(self):
        data = b"a,b\n1,2\n"
        assert detect_mime(data, "t.csv") == "text/csv"
        text, _, err = extract_any(data, "t.csv")
        assert err is None
        assert text == "a,b\n1,2\n"

    def test_corrupt_odf_routes_to_failure(self):
        import io as _io
        import zipfile as _zip
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
            zf.writestr("content.xml", "<broken")
        text, _, err = extract_any(buf.getvalue(), "bad.odt")
        assert text == "" and err is not None

    def test_truncation_applies(self):
        from tests.fixtures.builders import build_odt
        data = build_odt(["y" * 500])
        text, _, err = extract_any(data, "t.odt", max_text_length=7)
        assert err is None and text == "y" * 7


class TestRound3AdvisoryFixes:
    """Regression tests for the r2 ADVICE findings (formats layer)."""

    def test_odf_nested_span_order(self):
        """Nested inline runs with children AND trailing text must flatten
        in document order: a<span>c<span>d</span>e</span>f → acdef (the
        old flat iter() walk yielded acfde)."""
        import io as _io
        import zipfile as _zip

        from nifi_extracttext_processor_spark.formats.opendoc import (
            extract_odf_text,
        )
        content = (
            '<?xml version="1.0"?>'
            '<office:document-content'
            ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
            ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
            "<office:body><office:text>"
            "<text:p>a<text:span>c<text:span>d</text:span>e</text:span>f"
            "</text:p>"
            "</office:text></office:body></office:document-content>")
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype",
                        "application/vnd.oasis.opendocument.text")
            zf.writestr("content.xml", content)
        assert extract_odf_text(buf.getvalue()) == "acdef\n"

    def test_odf_tab_tail_order(self):
        """Tail text after a tab element lands after the tab."""
        import io as _io
        import zipfile as _zip

        from nifi_extracttext_processor_spark.formats.opendoc import (
            extract_odf_text,
        )
        content = (
            '<?xml version="1.0"?>'
            '<office:document-content'
            ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
            ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
            "<office:body><office:text>"
            "<text:p>x<text:span><text:tab/>y</text:span>z</text:p>"
            "</office:text></office:body></office:document-content>")
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype",
                        "application/vnd.oasis.opendocument.text")
            zf.writestr("content.xml", content)
        assert extract_odf_text(buf.getvalue()) == "x\tyz\n"

    def test_rtf_stray_star_keeps_text(self):
        r"""\* outside a group-open position is a no-op, not an
        ignorable-destination marker — Tika keeps the following text."""
        from nifi_extracttext_processor_spark.formats.rtf import (
            extract_rtf_text,
        )
        assert extract_rtf_text(rb"{\rtf1 a\*b c\par}") == "ab c\n"

    def test_rtf_star_destination_still_skipped(self):
        r"""{\*\dest …} groups remain ignorable."""
        from nifi_extracttext_processor_spark.formats.rtf import (
            extract_rtf_text,
        )
        rtf = rb"{\rtf1 before{\*\themedata junkdata}after\par}"
        assert extract_rtf_text(rtf) == "beforeafter\n"

    def test_gzip_nesting_bounded(self):
        """gz-of-gz is allowed; a third level errors instead of recursing
        unboundedly."""
        import gzip

        inner = gzip.compress(gzip.compress(b"deep text"))
        text, _, err = extract_any(inner, "t.txt.gz.gz")
        assert err is None and text == "deep text"
        triple = gzip.compress(inner)
        text, _, err = extract_any(triple, "t.txt.gz.gz.gz")
        assert text == "" and err is not None and "nesting" in err

    def test_gzip_bomb_capped(self, monkeypatch):
        """Expansion beyond the cap routes to failure instead of
        materializing the bomb."""
        import gzip

        import nifi_extracttext_processor_spark.formats as fmts

        monkeypatch.setattr(fmts, "MAX_DECOMPRESSED_BYTES", 1024)
        data = gzip.compress(b"x" * 100_000)
        text, _, err = extract_any(data, "bomb.txt.gz")
        assert text == "" and err is not None and "decompressed" in err


def _png_header(w, h, depth=8):
    import struct
    import zlib as _z
    ihdr = struct.pack(">II", w, h) + bytes([depth, 2, 0, 0, 0])
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr))
            + chunk + struct.pack(">I", _z.crc32(chunk)))


class TestArchiveRecursion:
    """Tika PackageParser parity: zip/tar members extracted and
    concatenated, with entry/size/depth bounds."""

    def _zip(self, entries):
        import io as _io
        import zipfile as _zip
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as zf:
            for name, payload in entries:
                zf.writestr(name, payload)
        return buf.getvalue()

    def test_zip_mixed_members(self):
        data = self._zip([
            ("a.txt", b"alpha text"),
            ("sub/b.html", b"<html><body><p>beta html</p></body></html>"),
            ("junk.bin", b"\x00\x01\x02\x03"),  # unparseable: skipped
        ])
        assert detect_mime(data, "arch.zip") == "application/zip"
        text, mime, err = extract_any(data, "arch.zip")
        assert err is None and mime == "application/zip"
        assert "alpha text" in text and "beta html" in text

    def test_zip_in_zip_bounded(self):
        inner = self._zip([("x.txt", b"deep entry")])
        outer = self._zip([("inner.zip", inner)])
        text, _, err = extract_any(outer, "o.zip")
        assert err is None and "deep entry" in text
        # a third level is skipped (per-entry best effort), not fatal
        outer2 = self._zip([("o.zip", outer), ("ok.txt", b"shallow")])
        text, _, err = extract_any(outer2, "o2.zip")
        assert err is None and "shallow" in text and "deep entry" not in text

    def test_tar_members(self):
        import io as _io
        import tarfile as _tar
        buf = _io.BytesIO()
        with _tar.open(fileobj=buf, mode="w") as tf:
            payload = b"tar member text"
            info = _tar.TarInfo("t.txt")
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))
        data = buf.getvalue()
        assert detect_mime(data, "a.tar") == "application/x-tar"
        text, _, err = extract_any(data, "a.tar")
        assert err is None and "tar member text" in text

    def test_zip_entry_size_cap(self, monkeypatch):
        import nifi_extracttext_processor_spark.formats as fmts
        monkeypatch.setattr(fmts, "MAX_DECOMPRESSED_BYTES", 16)
        data = self._zip([("big.txt", b"x" * 1000)])
        text, _, err = extract_any(data, "b.zip")
        assert text == "" and err is not None and "expanded" in err


class TestImageMetadata:
    """B3 widening: image dimensions from headers (Tika tiff:* keys)."""

    def test_png_gif_jpeg_bmp_netpbm_dims(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        assert image_dimensions(_png_header(640, 480)) == {
            "tiff:ImageWidth": "640", "tiff:ImageLength": "480",
            "tiff:BitsPerSample": "8"}
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        assert image_dimensions(gif) == {
            "tiff:ImageWidth": "320", "tiff:ImageLength": "200"}
        jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
                + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
                + struct.pack(">HH", 600, 800) + b"\x03")
        assert image_dimensions(jpeg) == {
            "tiff:ImageWidth": "800", "tiff:ImageLength": "600",
            "tiff:BitsPerSample": "8"}
        ppm = b"P6\n# c\n12 34\n255\n" + b"\x00" * (12 * 34 * 3)
        assert image_dimensions(ppm) == {
            "tiff:ImageWidth": "12", "tiff:ImageLength": "34"}

    def test_mime_detection_images(self):
        assert detect_mime(_png_header(2, 2), "i.png") == "image/png"
        assert detect_mime(b"GIF87a" + b"\x02\x00\x02\x00\x00") == (
            "image/gif")
        assert detect_mime(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
        assert detect_mime(b"P6\n1 1\n255\n\x00\x00\x00") == (
            "image/x-portable-pixmap")

    def test_image_extracts_empty_text_success(self):
        """Tika ImageParser: no text content (no OCR), no error."""
        text, mime, err = extract_any(_png_header(4, 4), "i.png")
        assert err is None and text == "" and mime == "image/png"

    def test_media_metadata_surfaces_image_dims(self, spark):
        from pyspark.sql import Row, functions as F
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        df = spark.createDataFrame(
            [Row(doc_id=1, filename="i.png",
                 content=bytearray(_png_header(99, 77)))])
        meta = media_metadata(df).collect()[0]["metadata"]
        assert meta["Content-Type"] == "image/png"
        assert meta["tiff:ImageWidth"] == "99"
        assert meta["tiff:ImageLength"] == "77"


class TestOutlookMsg:
    """Outlook .msg ([MS-OXMSG]) — Tika OutlookExtractor parity."""

    def test_detect_and_extract(self):
        from tests.fixtures.builders import build_msg
        data = build_msg("Quarterly report", "Alice Sender",
                         "Bob Recipient", "Please find the numbers "
                         "attached.\nRegards, Alice")
        assert detect_mime(data, "mail.msg") == "application/vnd.ms-outlook"
        text, mime, err = extract_any(data, "mail.msg")
        assert err is None and mime == "application/vnd.ms-outlook"
        assert text.startswith("Subject: Quarterly report\n"
                               "From: Alice Sender\nTo: Bob Recipient\n\n")
        assert "Please find the numbers attached." in text
        assert text.endswith("Regards, Alice\n")

    def test_ansi_properties(self):
        from tests.fixtures.builders import build_msg
        data = build_msg("Héllo", "a@x.com", "b@x.com", "ansi body",
                         ansi=True)
        text, _, err = extract_any(data, "m.msg")
        assert err is None
        assert "Subject: Héllo" in text and "ansi body" in text

    def test_msg_metadata_surface(self, spark):
        from pyspark.sql import Row
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        from tests.fixtures.builders import build_msg
        data = build_msg("Subj", "From Person", "To Person", "b")
        df = spark.createDataFrame(
            [Row(doc_id=1, filename="m.msg", content=bytearray(data))])
        meta = media_metadata(df).collect()[0]["metadata"]
        assert meta["Content-Type"] == "application/vnd.ms-outlook"
        assert meta["dc:title"] == "Subj"
        assert meta["Message-From"] == "From Person"
        assert meta["Message-To"] == "To Person"

    def test_plain_ole_still_unsupported(self):
        from tests.fixtures.builders import _build_ole2
        data = _build_ole2({"SomeStream": b"\x01\x02"})
        text, mime, err = extract_any(data, "x.bin")
        assert mime == "application/x-tika-msoffice"
        assert text == "" and err is not None


class TestTiffWavMetadata:
    def test_tiff_dims_both_endians(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )

        def tiff(le=True, w=321, h=123):
            e = "<" if le else ">"
            magic = b"II*\x00" if le else b"MM\x00*"
            hdr = magic + struct.pack(f"{e}I", 8)
            tags = [(256, 3, w), (257, 4, h), (258, 3, 16)]
            body = struct.pack(f"{e}H", len(tags))
            for tag, typ, val in tags:
                body += struct.pack(f"{e}HHI", tag, typ, 1)
                body += (struct.pack(f"{e}HH", val, 0) if typ == 3
                         else struct.pack(f"{e}I", val))
            return hdr + body + struct.pack(f"{e}I", 0)

        for le in (True, False):
            md = image_dimensions(tiff(le))
            assert md["tiff:ImageWidth"] == "321"
            assert md["tiff:ImageLength"] == "123"
            assert md["tiff:BitsPerSample"] == "16"
        assert detect_mime(tiff(True), "x.tif") == "image/tiff"

    @staticmethod
    def _exif_tiff(e="<"):
        """TIFF blob with IFD0 (Make/Model/Orientation/XResolution +
        EXIF pointer) and an EXIF sub-IFD, out-of-line ASCII/RATIONAL
        values in a trailing data area — the real layout cameras
        write."""
        import struct

        sizes = {2: 1, 3: 2, 4: 4, 5: 8}

        def vbytes(typ, values):
            if typ == 2:
                return values  # bytes incl. NUL
            out = b""
            for v in values:
                if typ == 3:
                    out += struct.pack(e + "H", v)
                elif typ == 4:
                    out += struct.pack(e + "I", v)
                else:  # RATIONAL
                    out += struct.pack(e + "II", *v)
            return out

        ifd0 = [
            (271, 2, b"TestCam Inc\x00"),
            (272, 2, b"Model X\x00"),
            (274, 3, [6]),
            (282, 5, [(72, 1)]),
        ]
        exif = [
            (0x829A, 5, [(1, 125)]),
            (0x829D, 5, [(28, 10)]),
            (0x8827, 3, [200]),
            (0x9003, 2, b"2024:01:02 03:04:05\x00"),
            (0x920A, 5, [(50, 1)]),
            (0xA002, 4, [640]),
        ]
        ifd0_len = 2 + 12 * (len(ifd0) + 1) + 4  # +1: EXIF pointer
        exif_off = 8 + ifd0_len
        data_off = exif_off + 2 + 12 * len(exif) + 4
        data_area = b""

        def render(entries, extra=b""):
            nonlocal data_off, data_area
            body = struct.pack(e + "H",
                               len(entries) + (1 if extra else 0))
            for tag, typ, values in entries:
                vb = vbytes(typ, values)
                count = len(vb) // sizes[typ]
                body += struct.pack(e + "HHI", tag, typ, count)
                if len(vb) <= 4:
                    body += vb + b"\x00" * (4 - len(vb))
                else:
                    body += struct.pack(e + "I", data_off)
                    data_area += vb
                    data_off += len(vb)
            return body + extra + struct.pack(e + "I", 0)

        exif_ptr = struct.pack(e + "HHI", 0x8769, 4, 1) + struct.pack(
            e + "I", exif_off)
        ifd0_body = render(ifd0, extra=exif_ptr)
        exif_body = render(exif)
        magic = b"II*\x00" if e == "<" else b"MM\x00*"
        return (magic + struct.pack(e + "I", 8) + ifd0_body + exif_body
                + data_area)

    @classmethod
    def _exif_jpeg(cls):
        import struct
        tiff = cls._exif_tiff()
        app1 = b"Exif\x00\x00" + tiff
        return (b"\xff\xd8"
                + b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
                + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
                + struct.pack(">HH", 600, 800) + b"\x03"
                + b"\xff\xd9")

    EXIF_WANT = {
        "tiff:Make": "TestCam Inc", "tiff:Model": "Model X",
        "tiff:Orientation": "6", "tiff:XResolution": "72",
        "exif:ExposureTime": "0.008", "exif:FNumber": "2.8",
        "exif:IsoSpeedRatings": "200",
        "exif:DateTimeOriginal": "2024:01:02 03:04:05",
        "exif:FocalLength": "50", "exif:PixelXDimension": "640",
    }

    def test_jpeg_exif_golden(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        md = image_dimensions(self._exif_jpeg())
        for k, v in self.EXIF_WANT.items():
            assert md[k] == v, k
        # SOF frame dims override EXIF-claimed dimensions
        assert md["tiff:ImageWidth"] == "800"
        assert md["tiff:ImageLength"] == "600"
        assert md["tiff:BitsPerSample"] == "8"

    def test_standalone_tiff_exif_both_endians(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            tiff_metadata,
        )
        for e in ("<", ">"):
            md = tiff_metadata(self._exif_tiff(e))
            for k, v in self.EXIF_WANT.items():
                assert md[k] == v, (e, k)

    def test_jpeg_without_exif_unchanged(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
                + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
                + struct.pack(">HH", 600, 800) + b"\x03")
        assert image_dimensions(jpeg) == {
            "tiff:ImageWidth": "800", "tiff:ImageLength": "600",
            "tiff:BitsPerSample": "8"}

    def test_jpeg_fill_bytes_before_marker(self):
        """0xFF padding before a marker is legal (T.81 B.1.1.2): the
        walk must consume fill bytes instead of reading marker=0xFF
        and a garbage segment length that jumps past the real SOF."""
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            exif_metadata, image_dimensions,
        )
        sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
               + struct.pack(">HH", 600, 800) + bytes([1, 0x11, 0]))
        jpeg = b"\xff\xd8" + b"\xff\xff\xff" + sof[1:] + b"\xff\xd9"
        assert image_dimensions(jpeg) == {
            "tiff:ImageWidth": "800", "tiff:ImageLength": "600",
            "tiff:BitsPerSample": "8"}
        # same padding in front of APP1 on the exif_metadata walk
        exif = self._exif_jpeg()
        padded = exif[:2] + b"\xff\xff" + exif[3:]
        assert exif_metadata(padded)  # still finds the APP1 payload

    def test_exif_metadata_surface(self, spark):
        from pyspark.sql import Row
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        df = spark.createDataFrame(
            [Row(doc_id=1, filename="photo.jpg",
                 content=bytearray(self._exif_jpeg()))])
        meta = media_metadata(df).collect()[0]["metadata"]
        assert meta["Content-Type"] == "image/jpeg"
        assert meta["tiff:Make"] == "TestCam Inc"
        assert meta["exif:DateTimeOriginal"] == "2024:01:02 03:04:05"
        assert meta["tiff:ImageWidth"] == "800"

    def _wav(self, rate=16000, channels=2, bits=16, seconds=2):
        import struct
        byte_rate = rate * channels * bits // 8
        frames = b"\x00" * (byte_rate * seconds)
        fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                          channels * bits // 8, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(frames)) + frames)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def test_wav_metadata_and_mime(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            wav_metadata,
        )
        data = self._wav()
        assert detect_mime(data, "a.wav") == "audio/x-wav"
        md = wav_metadata(data)
        assert md["xmpDM:audioSampleRate"] == "16000"
        assert md["channels"] == "2"
        assert md["bits"] == "16"
        assert md["xmpDM:duration"] == "2.0"
        text, mime, err = extract_any(data, "a.wav")
        assert err is None and text == "" and mime == "audio/x-wav"

    def test_media_metadata_surfaces_wav(self, spark):
        from pyspark.sql import Row
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        df = spark.createDataFrame(
            [Row(doc_id=1, filename="a.wav",
                 content=bytearray(self._wav(rate=8000, channels=1)))])
        meta = media_metadata(df).collect()[0]["metadata"]
        assert meta["Content-Type"] == "audio/x-wav"
        assert meta["xmpDM:audioSampleRate"] == "8000"
        assert meta["channels"] == "1"


class TestCompressorsAndMp3:
    def test_bz2_transparent(self):
        import bz2
        data = bz2.compress(b"bzipped plain text")
        assert detect_mime(data, "t.txt.bz2") == "application/x-bzip2"
        text, mime, err = extract_any(data, "t.txt.bz2")
        assert err is None and text == "bzipped plain text"
        assert mime == "application/x-bzip2"

    def test_xz_transparent(self):
        import lzma
        data = lzma.compress(b"xz plain text")
        assert detect_mime(data, "t.txt.xz") == "application/x-xz"
        text, _, err = extract_any(data, "t.txt.xz")
        assert err is None and text == "xz plain text"

    def test_bz2_nesting_bounded(self):
        import bz2
        triple = bz2.compress(bz2.compress(bz2.compress(b"deep")))
        text, _, err = extract_any(triple, "t.bz2.bz2.bz2")
        assert text == "" and err is not None and "nesting" in err

    def _id3(self, frames, ver=3):
        import struct
        body = b""
        for fid, val in frames:
            payload = b"\x03" + val.encode("utf-8") if ver >= 4 \
                else b"\x00" + val.encode("latin-1")
            if ver >= 4:
                n = len(payload)
                size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                              (n >> 7) & 0x7F, n & 0x7F])
            else:
                size = struct.pack(">I", len(payload))
            body += fid + size + b"\x00\x00" + payload
        n = len(body)
        ss = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F])
        return b"ID3" + bytes([ver, 0, 0]) + ss + body

    def test_mp3_id3_metadata(self, spark):
        from pyspark.sql import Row

        from nifi_extracttext_processor_spark.formats.image_meta import (
            mp3_metadata,
        )
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        for ver in (3, 4):
            data = self._id3([(b"TIT2", "Song Title"),
                              (b"TPE1", "The Artist")], ver=ver)
            assert detect_mime(data, "a.mp3") == "audio/mpeg"
            md = mp3_metadata(data)
            assert md["dc:title"] == "Song Title"
            assert md["xmpDM:artist"] == "The Artist"
        df = spark.createDataFrame(
            [Row(doc_id=1, filename="a.mp3",
                 content=bytearray(self._id3([(b"TIT2", "T")])))])
        meta = media_metadata(df).collect()[0]["metadata"]
        assert meta["Content-Type"] == "audio/mpeg"
        assert meta["dc:title"] == "T"

    @staticmethod
    def _cbr_frames(n_frames=10, kbps_idx=5, stereo=True):
        """MPEG1 Layer III 44.1 kHz CBR frames (64 kbps at idx 5):
        frame length 144*64000//44100 = 208 bytes, no padding."""
        hdr = bytes([0xFF, 0xFB, (kbps_idx << 4),
                     0x00 if stereo else 0xC0])
        flen = 144 * 64000 // 44100
        return (hdr + bytes(flen - 4)) * n_frames

    def test_mp3_duration_bitrate_estimate(self):
        """VERDICT r5 item 7: xmpDM:duration from a frame-header walk,
        exact on a tiny CBR file (10 frames * 1152 / 44100 s)."""
        from nifi_extracttext_processor_spark.formats.image_meta import (
            mp3_metadata,
        )
        audio = self._cbr_frames(10)
        want_dur = str(round(10 * 1152 / 44100, 3))
        # raw MPEG stream, no ID3 tag
        md = mp3_metadata(audio)
        assert md["xmpDM:duration"] == want_dur
        assert md["xmpDM:audioSampleRate"] == "44100"
        assert md["xmpDM:audioChannelType"] == "Stereo"
        assert md["xmpDM:fileDataRate"] == "64.0"
        assert md["xmpDM:audioCompressor"] == "MP3"
        # ID3v2-tagged: text frames AND the audio estimate together
        md = mp3_metadata(self._id3([(b"TIT2", "Song")]) + audio)
        assert md["dc:title"] == "Song"
        assert md["xmpDM:duration"] == want_dur
        # mono flag
        md = mp3_metadata(self._cbr_frames(3, stereo=False))
        assert md["xmpDM:audioChannelType"] == "Mono"

    def test_mp3_frame_walk_fails_soft(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            mp3_metadata,
        )
        # free-format / reserved headers: no crash, no duration key
        assert "xmpDM:duration" not in mp3_metadata(
            bytes([0xFF, 0xFB, 0x00, 0x00]) + bytes(100))
        assert mp3_metadata(b"\xff\xe0\xff\xff") in ({},)
        # truncated mid-frame: the completed frames still count
        md = mp3_metadata(self._cbr_frames(5)[:-100])
        assert md["xmpDM:duration"] == str(round(4 * 1152 / 44100, 3))


def test_ooxml_app_xml_statistics():
    """docProps/app.xml statistics surface under Tika meta:* keys."""
    import io as _io
    import zipfile as _zip

    from nifi_extracttext_processor_spark.formats.metadata import (
        ooxml_core_props,
    )
    app = (b'<?xml version="1.0"?>'
           b'<Properties xmlns="http://schemas.openxmlformats.org/'
           b'officeDocument/2006/extended-properties">'
           b'<Application>LibreOffice</Application>'
           b'<Pages>3</Pages><Words>1250</Words>'
           b'<Company>ACME</Company></Properties>')
    buf = _io.BytesIO()
    with _zip.ZipFile(buf, "w") as zf:
        zf.writestr("docProps/app.xml", app)
        zf.writestr("word/document.xml", "<d/>")
    md = ooxml_core_props(buf.getvalue())
    assert md["extended-properties:Application"] == "LibreOffice"
    assert md["meta:page-count"] == "3"
    assert md["meta:word-count"] == "1250"
    assert md["extended-properties:Company"] == "ACME"


class TestEpub:
    def test_detect_and_extract_spine_order(self):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any,
        )
        from tests.fixtures.builders import build_epub
        data = build_epub(["First chapter text.", "Second chapter text."])
        assert detect_mime(data, "book.epub") == "application/epub+zip"
        text, mime, err = extract_any(data, "book.epub")
        assert err is None and mime == "application/epub+zip"
        assert text.index("First chapter") < text.index("Second chapter")

    def test_detect_without_mimetype_entry_by_extension(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        from tests.fixtures.builders import build_epub
        data = build_epub(["x"], mimetype_entry=False)
        assert detect_mime(data, "book.epub") == "application/epub+zip"
        # without the extension hint it stays a plain zip (archive path)
        assert detect_mime(data, None) == "application/zip"

    def test_metadata_dc_fields(self):
        from nifi_extracttext_processor_spark.formats.epub import (
            epub_metadata,
        )
        from tests.fixtures.builders import build_epub
        md = epub_metadata(build_epub(["x"], title="Moby",
                                      creator="H. M."))
        assert md["dc:title"] == "Moby"
        assert md["dc:creator"] == "H. M."
        assert md["dc:language"] == "en"
        # non-EPUB zip: empty, never raises
        from tests.fixtures.builders import build_docx
        assert epub_metadata(build_docx(["hi"])) == {}

    def test_member_reads_are_budget_capped(self, monkeypatch):
        """An EPUB-flagged DEFLATE bomb must hit the expanded-bytes
        budget via the streaming capped read, not expand via
        zf.read() (which trusts the member's declared size)."""
        import io
        import zipfile
        import pytest
        from nifi_extracttext_processor_spark.formats import epub as ep
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("big.xhtml", b"A" * 10000)
        with zipfile.ZipFile(io.BytesIO(buf.getvalue())) as zf:
            with pytest.raises(ValueError, match="budget"):
                ep._read_capped(zf, "big.xhtml", 999)
            assert (ep._read_capped(zf, "big.xhtml", 10000)
                    == b"A" * 10000)
        # functional: the chapter path enforces the running budget
        from tests.fixtures.builders import build_epub
        monkeypatch.setattr(ep, "MAX_DECOMPRESSED_BYTES", 16)
        with pytest.raises(ValueError, match="budget"):
            ep.extract_epub_text(
                build_epub(["chapter far larger than sixteen bytes"]))

    def test_corrupt_epub_routes_to_failure(self):
        from nifi_extracttext_processor_spark.formats import extract_any
        from tests.fixtures.builders import build_epub
        import io
        import zipfile
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(zipfile.ZipInfo("mimetype"),
                        "application/epub+zip",
                        compress_type=zipfile.ZIP_STORED)
            zf.writestr("META-INF/container.xml", "<not-xml")
        text, mime, err = extract_any(buf.getvalue(), "bad.epub")
        assert text == "" and err is not None


class TestEpubMimetypeVariants:
    def test_trailing_newline_in_mimetype_entry(self):
        """Real-world EPUBs often write 'application/epub+zip\\n' —
        detection must strip before comparing (review fix)."""
        import io
        import zipfile

        from nifi_extracttext_processor_spark.formats import detect_mime
        from tests.fixtures.builders import build_epub
        base = build_epub(["x"])
        # rebuild with a newline-suffixed mimetype entry
        src = zipfile.ZipFile(io.BytesIO(base))
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(zipfile.ZipInfo("mimetype"),
                        "application/epub+zip\r\n",
                        compress_type=zipfile.ZIP_STORED)
            for n in src.namelist():
                if n != "mimetype":
                    zf.writestr(n, src.read(n))
        assert detect_mime(buf.getvalue(), None) == "application/epub+zip"


class TestPdfPredefinedCmaps:
    """Round-7 A6 honesty fix: Type0 fonts with a PREDEFINED CMap and
    no ToUnicode. Unicode-valued encodings (Uni*-UCS2/UTF16-H/V)
    decode as UTF-16BE; any other predefined CMap raises at first USE
    (failure route) instead of silently mojibaking a CJK crawl."""

    @staticmethod
    def _pdf(font_body: bytes, content: bytes,
             extra_objs: "list[bytes] | None" = None) -> bytes:
        import io
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> "
            b"/Contents 4 0 R >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (
                len(content), content),
            font_body,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        ] + (extra_objs or [])
        out = io.BytesIO()
        out.write(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, start=1):
            offsets.append(out.tell())
            out.write(b"%d 0 obj\n" % i)
            out.write(body)
            out.write(b"\nendobj\n")
        xref_at = out.tell()
        out.write(b"xref\n0 %d\n" % (len(objs) + 1))
        out.write(b"0000000000 65535 f \n")
        for off in offsets:
            out.write(b"%010d 00000 n \n" % off)
        out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
                  b"%d\n%%%%EOF\n" % (len(objs) + 1, xref_at))
        return out.getvalue()

    def test_ucs2_cmap_decodes_utf16be(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        jp = "日本語テキスト"
        hexs = jp.encode("utf-16-be").hex().encode("ascii")
        pdf = self._pdf(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Mincho "
            b"/Encoding /UniJIS-UCS2-H >>",
            b"BT /F1 12 Tf <" + hexs + b"> Tj ET")
        assert jp in extract_pdf_text(pdf)

    def test_utf16_cmap_variant_decodes(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        kr = "한국어"
        hexs = kr.encode("utf-16-be").hex().encode("ascii")
        pdf = self._pdf(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+Batang "
            b"/Encoding /UniKS-UTF16-V >>",
            b"BT /F1 12 Tf <" + hexs + b"> Tj ET")
        assert kr in extract_pdf_text(pdf)

    def test_charset_encoding_cmaps_decode_via_stdlib(self):
        """r8: encoding CMaps name a national charset as their source
        code space (ISO 32000-2 §9.7.5.2) — show-string bytes decode
        with the stdlib codec, no Adobe CMap tables needed."""
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        cases = [
            (b"/90ms-RKSJ-H", "あい日本語", "cp932"),
            (b"/EUC-H", "漢字かな", "euc_jp"),
            (b"/GBK-EUC-H", "中文文本", "gbk"),
            (b"/ETen-B5-V", "中文字", "big5"),
            (b"/KSCms-UHC-H", "한국어", "cp949"),
        ]
        for enc, text, codec in cases:
            hexs = text.encode(codec).hex().encode("ascii")
            pdf = self._pdf(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /X+CJK "
                b"/Encoding " + enc + b" >>",
                b"BT /F1 12 Tf <" + hexs + b"> Tj ET")
            assert text in extract_pdf_text(pdf), (enc, codec)

    def test_identity_without_tounicode_still_raises(self):
        """Identity-H codes ARE font-internal CIDs — no charset
        identity exists, so showing text still routes to failure."""
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        for enc in (b"/Identity-H", b"/Identity-V",
                    b"/SomeFuture-CMap-H"):
            pdf = self._pdf(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /X+CJK "
                b"/Encoding " + enc + b" >>",
                b"BT /F1 12 Tf <82A082A2> Tj ET")
            with pytest.raises(ValueError,
                               match="unsupported predefined CMap"):
                extract_pdf_text(pdf)

    def test_declared_but_unused_font_does_not_raise(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        pdf = self._pdf(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /X+CJK "
            b"/Encoding /Identity-H >>",
            b"BT /F2 12 Tf (plain western text) Tj ET")
        assert "plain western text" in extract_pdf_text(pdf)

    def test_spark_routes_cjk_failure(self, spark, tmp_path):
        """End-to-end A6: the unsupported-CMap doc lands on the
        failure route with empty text, others on success."""
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_text, route_by_error,
        )
        from nifi_extracttext_processor_spark.sources.binary_files import (
            read_documents,
        )
        bad = self._pdf(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /X+CJK "
            b"/Encoding /Identity-H >>",
            b"BT /F1 12 Tf <82A082A2> Tj ET")
        good = self._pdf(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+M "
            b"/Encoding /UniJIS-UCS2-H >>",
            b"BT /F1 12 Tf <"
            + "良い".encode("utf-16-be").hex().encode() + b"> Tj ET")
        d = tmp_path / "docs"
        d.mkdir()
        (d / "bad.pdf").write_bytes(bad)
        (d / "good.pdf").write_bytes(good)
        ok, fail = route_by_error(
            extract_text(read_documents(spark, str(d))))
        ok_rows = {r["filename"]: r["text"] for r in ok.collect()}
        fail_rows = {r["filename"]: r["error"] for r in fail.collect()}
        assert "good.pdf" in ok_rows and "良い" in ok_rows["good.pdf"]
        assert "bad.pdf" in fail_rows
        assert "unsupported predefined CMap" in fail_rows["bad.pdf"]


class TestPdfToUnicodeCid:
    """Locks in _parse_tounicode_cmap breadth (pdf.py): a subsetted
    Type0/CID font with 2-byte codes, bfchar incl. a surrogate-pair
    destination, and bfrange in BOTH contiguous-base and array-dst
    forms."""

    @staticmethod
    def _cid_pdf() -> bytes:
        import io
        cmap = (b"/CIDInit /ProcSet findresource begin\n"
                b"begincmap\n"
                b"1 begincodespacerange\n<0000> <FFFF>\n"
                b"endcodespacerange\n"
                b"2 beginbfchar\n"
                b"<0041> <0048>\n"            # 0x0041 -> 'H'
                b"<0042> <D835DC9C>\n"        # 0x0042 -> U+1D49C (pair)
                b"endbfchar\n"
                b"2 beginbfrange\n"
                b"<0100> <0102> <0065>\n"     # -> e, f, g
                b"<0200> <0202> [<0058> <0059> <005A>]\n"  # -> X, Y, Z
                b"endbfrange\nendcmap\nend\n")
        content = (b"BT /F1 12 Tf "
                   b"<0041 0042 0100 0101 0102 0200 0201 0202> Tj ET")
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (
                len(content), content),
            b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Foo "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (
                len(cmap), cmap),
        ]
        out = io.BytesIO()
        out.write(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, start=1):
            offsets.append(out.tell())
            out.write(b"%d 0 obj\n" % i)
            out.write(body)
            out.write(b"\nendobj\n")
        xref_at = out.tell()
        out.write(b"xref\n0 %d\n" % (len(objs) + 1))
        out.write(b"0000000000 65535 f \n")
        for off in offsets:
            out.write(b"%010d 00000 n \n" % off)
        out.write(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
                  b"%d\n%%%%EOF\n" % (len(objs) + 1, xref_at))
        return out.getvalue()

    def test_type0_two_byte_codes_and_surrogate_pair(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        text = extract_pdf_text(self._cid_pdf())
        assert "H\U0001D49Cefg" in text  # bfchar + surrogate + range
        assert "XYZ" in text             # bfrange with array dst

    def test_codes_missing_from_two_byte_cmap_dropped(self):
        """A 2-byte code with no CMap entry must vanish, not emit the
        latin-1 fallback bytes (that fallback is 1-byte-CMap only)."""
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        data = self._cid_pdf().replace(b"<0041 0042", b"<0999 0041 0042")
        text = extract_pdf_text(data)
        assert "H\U0001D49Cefg" in text
        assert "\x09" not in text and "\x99" not in text


class TestAnimationAndDensityMeta:
    def test_gif_animation_surface(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        from tests.test_operators import TestGifAnimation as GA
        # 3 frames, 25cs delay each, NETSCAPE loop block (infinite)
        frames = [(0, 0, 1, 1, [i % 4], 0, None) for i in range(3)]
        base = GA._agif(1, 1, frames)
        gif = bytearray(base)
        # splice a NETSCAPE2.0 app-extension right after the GCT and
        # rewrite GCE delay fields to 25cs
        netscape = (b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
        insert_at = 13 + 3 * 4  # header + 4-entry GCT
        gif[insert_at:insert_at] = netscape
        out = bytes(gif)
        out = out.replace(b"\x21\xf9\x04\x00\x00\x00\x00\x00",
                          b"\x21\xf9\x04\x00\x19\x00\x00\x00")
        md = image_dimensions(out)
        assert md["gif:FrameCount"] == "3"
        assert md["gif:LoopCount"] == "0"
        assert md["gif:AnimationDuration"] == "0.75"
        # single-frame GIF: no animation keys
        md1 = image_dimensions(GA._agif(1, 1, frames[:1]))
        assert md1["gif:FrameCount"] == "1"
        assert "gif:LoopCount" not in md1
        assert "gif:AnimationDuration" not in md1

    def test_jfif_density_surface(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                + bytes([1, 2]) + bytes([1])        # version, units=dpi
                + struct.pack(">HH", 300, 150) + bytes([0, 0]))
        sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
               + struct.pack(">HH", 4, 6) + bytes([1, 0x11, 0]))
        md = image_dimensions(b"\xff\xd8" + app0 + sof + b"\xff\xd9")
        assert md["tiff:XResolution"] == "300"
        assert md["tiff:YResolution"] == "150"
        assert md["tiff:ImageWidth"] == "6"
        # units=0 (aspect ratio only): no resolution keys
        app0_ar = app0.replace(bytes([1]) + struct.pack(">HH", 300, 150),
                               bytes([0]) + struct.pack(">HH", 300, 150))
        md0 = image_dimensions(b"\xff\xd8" + app0_ar + sof + b"\xff\xd9")
        assert "tiff:XResolution" not in md0


class TestAvContainerMeta:
    """Golden tests for the MP4/FLAC/Ogg container metadata walks
    (formats/av_meta.py) over hand-built minimal-but-valid files."""

    # ---------------------------------------------------------- MP4

    @staticmethod
    def _box(typ: bytes, body: bytes) -> bytes:
        import struct
        return struct.pack(">I", 8 + len(body)) + typ + body

    @classmethod
    def _mp4(cls, brand=b"isom", timescale=1000, duration=2500,
             w=320, h=240, handler=b"vide", codec=b"avc1",
             tkhd_ver=0):
        import struct
        box = cls._box
        ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
        mvhd = box(b"mvhd", bytes(4) + bytes(8)
                   + struct.pack(">II", timescale, duration)
                   + bytes(80))
        if tkhd_ver:
            tk = (bytes([1]) + bytes(3) + bytes(16)
                  + struct.pack(">I", 1) + bytes(4)
                  + struct.pack(">Q", duration) + bytes(16)
                  + bytes(36) + struct.pack(">II", w << 16, h << 16))
        else:
            tk = (bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
                  + struct.pack(">I", duration) + bytes(16)
                  + bytes(36) + struct.pack(">II", w << 16, h << 16))
        tkhd = box(b"tkhd", tk)
        hdlr = box(b"hdlr", bytes(8) + handler + bytes(12) + b"\x00")
        if handler == b"soun":
            entry = box(codec, bytes(8) + bytes(8)
                        + struct.pack(">HH", 2, 16) + bytes(4)
                        + struct.pack(">I", 44100 << 16))
        else:
            entry = box(codec, bytes(78))
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return ftyp + moov

    def test_mp4_video_golden(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        md = mp4_metadata(self._mp4())
        assert md["xmpDM:duration"] == "2.5"
        assert md["tiff:ImageWidth"] == "320"
        assert md["tiff:ImageLength"] == "240"
        assert md["xmpDM:videoCompressor"] == "avc1"
        assert md["xmpDM:majorBrand"] == "isom"

    def test_mp4_tkhd_v1_dims(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        md = mp4_metadata(self._mp4(w=1920, h=1080, tkhd_ver=1))
        assert md["tiff:ImageWidth"] == "1920"
        assert md["tiff:ImageLength"] == "1080"

    def test_m4a_audio_golden(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata, mp4_mime,
        )
        m4a = self._mp4(brand=b"M4A ", handler=b"soun", codec=b"mp4a",
                        w=0, h=0)
        assert mp4_mime(m4a) == "audio/mp4"
        md = mp4_metadata(m4a)
        assert md["xmpDM:audioCompressor"] == "mp4a"
        assert md["xmpDM:audioSampleRate"] == "44100"
        assert md["channels"] == "2"
        assert "tiff:ImageWidth" not in md

    def test_mp4_mime_detection(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        assert detect_mime(self._mp4()) == "video/mp4"
        assert detect_mime(self._mp4(brand=b"qt  ")) == "video/quicktime"

    def test_mp4_malformed_fails_closed(self):
        import struct
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        # box size overruns the file: walk stops, partial (brand) kept
        bad = (self._box(b"ftyp", b"isom" + bytes(4))
               + struct.pack(">I", 999) + b"moov" + bytes(8))
        md = mp4_metadata(bad)
        assert md == {"xmpDM:majorBrand": "isom"}
        assert mp4_metadata(b"") == {}
        assert mp4_metadata(b"\x00" * 32) == {}

    def test_media_metadata_operator_mp4(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        df = spark.createDataFrame(
            [("a.mp4", bytearray(self._mp4()))], "filename string, content binary")
        row = media_metadata(df).collect()[0]
        assert row.metadata["Content-Type"] == "video/mp4"
        assert row.metadata["xmpDM:duration"] == "2.5"
        assert row.metadata["tiff:ImageWidth"] == "320"

    # --------------------------------------------------------- FLAC

    @staticmethod
    def _flac(rate=44100, nch=2, bps=16, total=441000, tags=None):
        import struct
        si = struct.pack(">HH", 1024, 1024) + bytes(6)
        bits = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
        si += bits.to_bytes(8, "big") + bytes(16)
        blocks = bytes([0x00]) + len(si).to_bytes(3, "big") + si
        if tags is not None:
            vendor = b"t"
            body = struct.pack("<I", len(vendor)) + vendor
            body += struct.pack("<I", len(tags))
            for kv in tags:
                body += struct.pack("<I", len(kv)) + kv
            blocks += bytes([0x84]) + len(body).to_bytes(3, "big") + body
        else:
            blocks = bytes([0x80]) + blocks[1:]  # mark STREAMINFO last
        return b"fLaC" + blocks

    def test_flac_golden(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.av_meta import (
            flac_metadata,
        )
        f = self._flac(tags=[b"TITLE=Song", b"ARTIST=Band",
                             b"ALBUM=LP", b"ignored=x"])
        assert detect_mime(f) == "audio/x-flac"
        md = flac_metadata(f)
        assert md["xmpDM:audioSampleRate"] == "44100"
        assert md["channels"] == "2"
        assert md["bits"] == "16"
        assert md["xmpDM:duration"] == "10.0"
        assert md["dc:title"] == "Song"
        assert md["xmpDM:artist"] == "Band"
        assert md["xmpDM:album"] == "LP"

    def test_flac_96k_24bit(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            flac_metadata,
        )
        md = flac_metadata(self._flac(rate=96000, nch=1, bps=24,
                                      total=96000 * 3))
        assert md["xmpDM:audioSampleRate"] == "96000"
        assert md["bits"] == "24"
        assert md["xmpDM:duration"] == "3.0"

    def test_flac_truncated_fails_closed(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            flac_metadata,
        )
        f = self._flac()
        assert flac_metadata(f[:20]) == {}   # STREAMINFO cut short
        assert flac_metadata(b"fLaC") == {}
        assert flac_metadata(b"nope") == {}

    # ---------------------------------------------------------- Ogg

    @staticmethod
    def _ogg_page(serial, seq, granule, packets, htype=0):
        import struct
        segs = b""
        body = b""
        for p in packets:
            n = len(p)
            while n >= 255:
                segs += bytes([255])
                n -= 255
            segs += bytes([n])
            body += p
        return (b"OggS" + bytes([0, htype])
                + struct.pack("<q", granule)
                + struct.pack("<III", serial, seq, 0)
                + bytes([len(segs)]) + segs + body)

    @classmethod
    def _ogg_vorbis(cls, rate=44100, nch=2, granule=441000, tags=None):
        import struct
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([nch])
                 + struct.pack("<I", rate) + bytes(12) + bytes([0x2C, 1]))
        vendor = b"t"
        cm = struct.pack("<I", len(vendor)) + vendor
        tags = tags or []
        cm += struct.pack("<I", len(tags))
        for kv in tags:
            cm += struct.pack("<I", len(kv)) + kv
        comment = b"\x03vorbis" + cm + b"\x01"
        return (cls._ogg_page(7, 0, 0, [ident], htype=2)
                + cls._ogg_page(7, 1, 0, [comment])
                + cls._ogg_page(7, 2, granule, [b"\x00" * 10], htype=4))

    def test_ogg_vorbis_golden(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.av_meta import (
            ogg_metadata,
        )
        o = self._ogg_vorbis(tags=[b"TITLE=OggSong"])
        assert detect_mime(o) == "audio/vorbis"
        md = ogg_metadata(o)
        assert md["xmpDM:audioCompressor"] == "Vorbis"
        assert md["xmpDM:audioSampleRate"] == "44100"
        assert md["channels"] == "2"
        assert md["xmpDM:duration"] == "10.0"
        assert md["dc:title"] == "OggSong"

    def test_ogg_opus_golden(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.av_meta import (
            ogg_metadata,
        )
        head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                + struct.pack("<I", 48000) + bytes(3))
        tags = b"OpusTags" + struct.pack("<I", 1) + b"t" + struct.pack("<I", 0)
        o = (self._ogg_page(9, 0, 0, [head], htype=2)
             + self._ogg_page(9, 1, 0, [tags])
             + self._ogg_page(9, 2, 96000, [b"\x00"], htype=4))
        assert detect_mime(o) == "audio/opus"
        md = ogg_metadata(o)
        assert md["xmpDM:audioCompressor"] == "Opus"
        assert md["xmpDM:audioSampleRate"] == "48000"
        # granule includes the 312-sample pre-skip (RFC 7845 §4.2)
        assert md["xmpDM:duration"] == "1.994"

    def test_ogg_malformed_fails_closed(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            ogg_metadata, ogg_mime,
        )
        assert ogg_metadata(b"OggS") == {}
        assert ogg_mime(b"OggS\x00" + bytes(40)) == "application/ogg"
        assert ogg_metadata(b"notogg") == {}


class TestWebpPngTextXmp:
    """Round-6 metadata breadth: WebP dims (3 bitstream flavors), PNG
    text chunks (tEXt/zTXt/iTXt incl. bounded inflate), JPEG APP1 XMP
    packets."""

    @staticmethod
    def _riff(chunks):
        import struct
        body = b"WEBP"
        for cid, payload in chunks:
            body += cid + struct.pack("<I", len(payload)) + payload
            if len(payload) % 2:
                body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_webp_lossy_vp8(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        p = (bytes(3) + b"\x9d\x01\x2a"
             + struct.pack("<HH", 320, 240) + bytes(4))
        webp = self._riff([(b"VP8 ", p)])
        assert detect_mime(webp) == "image/webp"
        assert image_dimensions(webp) == {"tiff:ImageWidth": "320",
                                          "tiff:ImageLength": "240"}

    def test_webp_lossless_vp8l(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        w, h = 100, 60
        bits = (w - 1) | ((h - 1) << 14)
        p = b"\x2f" + struct.pack("<I", bits) + bytes(4)
        md = image_dimensions(self._riff([(b"VP8L", p)]))
        assert md == {"tiff:ImageWidth": "100", "tiff:ImageLength": "60"}

    def test_webp_extended_vp8x_animated(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        p = (bytes([0x02]) + bytes(3)
             + (1919).to_bytes(3, "little") + (1079).to_bytes(3, "little"))
        md = image_dimensions(self._riff([(b"VP8X", p)]))
        assert md["tiff:ImageWidth"] == "1920"
        assert md["tiff:ImageLength"] == "1080"
        assert md["webp:Animation"] == "true"

    @staticmethod
    def _png_with(chunks_after_ihdr):
        import struct
        import zlib

        def chunk(cid, body):
            return (struct.pack(">I", len(body)) + cid + body
                    + struct.pack(">I", zlib.crc32(cid + body)))
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + b"".join(chunk(c, b) for c, b in chunks_after_ihdr)
                + chunk(b"IEND", b""))

    def test_png_text_chunks(self):
        import zlib
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        itxt = (b"Description\x00" + bytes([0, 0]) + b"en\x00"
                + b"Desc\x00" + "café ☕".encode("utf-8"))
        png = self._png_with([
            (b"tEXt", b"Title\x00My Chart"),
            (b"zTXt", b"Software\x00\x00" + zlib.compress(b"plotlib 1.0")),
            (b"iTXt", itxt),
            (b"tEXt", b"CustomKey\x00v"),
        ])
        md = image_dimensions(png)
        assert md["dc:title"] == "My Chart"
        assert md["png:Software"] == "plotlib 1.0"
        assert md["dc:description"] == "café ☕"
        assert md["png:CustomKey"] == "v"
        assert md["tiff:ImageWidth"] == "4"

    def test_png_ztxt_bomb_bounded(self):
        import zlib
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        bomb = zlib.compress(b"A" * 50_000_000)  # ~48 KB compressed
        png = self._png_with([(b"zTXt", b"Comment\x00\x00" + bomb)])
        md = image_dimensions(png)
        # inflate is capped at 4096: value present but bounded
        assert len(md.get("png:Comment", "")) <= 4096

    def test_jpeg_xmp_packet(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        xml = b"""<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
      xmlns:dc="http://purl.org/dc/elements/1.1/"
      xmlns:xmp="http://ns.adobe.com/xap/1.0/"
      xmp:CreatorTool="shotwell 0.30">
   <dc:title><rdf:Alt><rdf:li xml:lang="x-default">Sunset</rdf:li>
   </rdf:Alt></dc:title>
   <dc:creator><rdf:Seq><rdf:li>A. Artist</rdf:li></rdf:Seq></dc:creator>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
<?xpacket end="w"?>"""
        sig = b"http://ns.adobe.com/xap/1.0/\x00"
        app1 = (b"\xff\xe1"
                + struct.pack(">H", 2 + len(sig) + len(xml)) + sig + xml)
        sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
               + struct.pack(">HH", 4, 6) + bytes([1, 0x11, 0]))
        md = image_dimensions(b"\xff\xd8" + app1 + sof + b"\xff\xd9")
        assert md["dc:title"] == "Sunset"
        assert md["dc:creator"] == "A. Artist"
        assert md["xmp:CreatorTool"] == "shotwell 0.30"
        assert md["tiff:ImageWidth"] == "6"

    def test_jpeg_xmp_malformed_xml_ignored(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        sig = b"http://ns.adobe.com/xap/1.0/\x00"
        bad = b"<unclosed"
        app1 = (b"\xff\xe1"
                + struct.pack(">H", 2 + len(sig) + len(bad)) + sig + bad)
        sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
               + struct.pack(">HH", 4, 6) + bytes([1, 0x11, 0]))
        md = image_dimensions(b"\xff\xd8" + app1 + sof + b"\xff\xd9")
        assert md["tiff:ImageWidth"] == "6"
        assert "dc:title" not in md


class TestAvifIlstId3v22:
    """Round-6 metadata breadth 2: HEIF/AVIF dims (ispe), iTunes ilst
    tags, ID3v2.2 frames."""

    def test_avif_dims_and_mime(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        box = TestAvContainerMeta._box
        ispe = box(b"ispe", bytes(4) + struct.pack(">II", 1024, 768))
        meta = box(b"meta", bytes(4) + box(b"iprp", box(b"ipco", ispe)))
        avif = box(b"ftyp", b"avif" + bytes(4) + b"mif1") + meta
        assert detect_mime(avif) == "image/avif"
        md = mp4_metadata(avif)
        assert md["tiff:ImageWidth"] == "1024"
        assert md["tiff:ImageLength"] == "768"

    def test_avif_through_media_metadata_operator(self, spark):
        import struct
        from nifi_extracttext_processor_spark.operators.extract import (
            media_metadata,
        )
        box = TestAvContainerMeta._box
        ispe = box(b"ispe", bytes(4) + struct.pack(">II", 64, 32))
        meta = box(b"meta", bytes(4) + box(b"iprp", box(b"ipco", ispe)))
        avif = box(b"ftyp", b"heic" + bytes(4) + b"mif1") + meta
        df = spark.createDataFrame([("p.heic", bytearray(avif))],
                                   "filename string, content binary")
        row = media_metadata(df).collect()[0]
        assert row.metadata["Content-Type"] == "image/heic"
        assert row.metadata["tiff:ImageWidth"] == "64"

    def test_m4a_ilst_tags(self):
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        box = TestAvContainerMeta._box

        def tag(atom, text):
            payload = (bytes(4) + bytes(4) + text.encode("utf-8"))
            return box(atom, box(b"data", payload))

        ilst = box(b"ilst", tag(b"\xa9nam", "Track Title")
                   + tag(b"\xa9ART", "Artist") + tag(b"\xa9alb", "LP"))
        meta = box(b"meta", bytes(4) + ilst)
        udta = box(b"udta", meta)
        moov = box(b"moov", udta)
        m4a = box(b"ftyp", b"M4A " + bytes(4) + b"isom") + moov
        md = mp4_metadata(m4a)
        assert md["dc:title"] == "Track Title"
        assert md["xmpDM:artist"] == "Artist"
        assert md["xmpDM:album"] == "LP"

    def test_id3v22_frames(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            mp3_metadata,
        )

        def frame(fid, text):
            payload = b"\x00" + text.encode("latin-1")
            return fid + len(payload).to_bytes(3, "big") + payload

        body = (frame(b"TT2", "Old Song") + frame(b"TP1", "Old Band")
                + frame(b"TAL", "Old LP"))
        size = len(body)
        hdr = (b"ID3" + bytes([2, 0, 0])
               + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                        (size >> 7) & 0x7F, size & 0x7F]))
        md = mp3_metadata(hdr + body)
        assert md["dc:title"] == "Old Song"
        assert md["xmpDM:artist"] == "Old Band"
        assert md["xmpDM:album"] == "Old LP"


class TestAvMetaReviewFixes:
    """Regression tests for the round-6 self-review findings on the
    container-metadata additions."""

    def test_mvhd_v1_truncated_body_fails_soft(self):
        import struct
        box = TestAvContainerMeta._box
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        # v1 mvhd with only 28 body bytes: the ts/dur read needs 32 —
        # must yield no duration, never raise, and keep walking
        mvhd = box(b"mvhd", bytes([1]) + bytes(3) + bytes(24))
        tkhd_body = (bytes(4) + bytes(8) + struct.pack(">I", 1)
                     + bytes(4) + struct.pack(">I", 5) + bytes(16)
                     + bytes(36) + struct.pack(">II", 8 << 16, 4 << 16))
        trak = box(b"trak", box(b"tkhd", tkhd_body))
        mp4 = (box(b"ftyp", b"isom" + bytes(4))
               + box(b"moov", mvhd + trak))
        md = mp4_metadata(mp4)
        assert "xmpDM:duration" not in md
        assert md["tiff:ImageWidth"] == "8"   # walk continued

    def test_mvhd_v1_short_body_not_parsed_as_v0(self):
        box = TestAvContainerMeta._box
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        # 24-byte v1 body: v0-offset bytes are modification time, not
        # timescale/duration — must NOT produce a garbage duration
        mvhd = box(b"mvhd", bytes([1]) + bytes(3)
                   + b"\x00\x00\x03\xe8" * 5)
        mp4 = box(b"ftyp", b"isom" + bytes(4)) + box(b"moov", mvhd)
        assert "xmpDM:duration" not in mp4_metadata(mp4)

    def test_ilst_multivalue_data_box_bounded(self):
        import struct
        box = TestAvContainerMeta._box
        from nifi_extracttext_processor_spark.formats.av_meta import (
            mp4_metadata,
        )
        d1 = box(b"data", bytes(8) + b"First")
        d2 = box(b"data", bytes(8) + b"Second")
        ilst = box(b"ilst", box(b"\xa9nam", d1 + d2))
        m4a = (box(b"ftyp", b"M4A " + bytes(4))
               + box(b"moov", box(b"udta", box(
                   b"meta", bytes(4) + ilst))))
        md = mp4_metadata(m4a)
        assert md["dc:title"] == "First"   # second box must not leak

    def test_flac_with_id3v2_prefix(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.av_meta import (
            flac_metadata,
        )
        flac = TestAvContainerMeta._flac()
        pad = b"\x00" * 20
        id3 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, len(pad)]) + pad
        tagged = id3 + flac
        assert detect_mime(tagged) == "audio/x-flac"
        md = flac_metadata(tagged)
        assert md["xmpDM:audioSampleRate"] == "44100"

    def test_opus_duration_subtracts_preskip(self):
        import struct
        from nifi_extracttext_processor_spark.formats.av_meta import (
            ogg_metadata,
        )
        T = TestAvContainerMeta
        head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                + struct.pack("<I", 48000) + bytes(3))
        tags = (b"OpusTags" + struct.pack("<I", 1) + b"t"
                + struct.pack("<I", 0))
        o = (T._ogg_page(9, 0, 0, [head], htype=2)
             + T._ogg_page(9, 1, 0, [tags])
             + T._ogg_page(9, 2, 96000 + 312, [b"\x00"], htype=4))
        assert ogg_metadata(o)["xmpDM:duration"] == "2.0"

    def test_jpeg_xmp_after_sof_still_captured(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        from tests.test_formats import TestWebpPngTextXmp
        sig = b"http://ns.adobe.com/xap/1.0/\x00"
        xml = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/">'
               b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
               b'22-rdf-syntax-ns#"><rdf:Description rdf:about=""'
               b' xmlns:xmp="http://ns.adobe.com/xap/1.0/"'
               b' xmp:CreatorTool="late-writer"/></rdf:RDF></x:xmpmeta>')
        exif = TestImageMetadata._exif_jpeg() if hasattr(
            TestImageMetadata, "_exif_jpeg") else None
        app1_xmp = (b"\xff\xe1"
                    + struct.pack(">H", 2 + len(sig) + len(xml))
                    + sig + xml)
        sof_body = (bytes([8]) + struct.pack(">HH", 4, 6)
                    + bytes([1, 0x11, 0]))
        sof = (b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body))
               + sof_body)
        # XMP AFTER the frame header: the walk must not early-exit
        md = image_dimensions(b"\xff\xd8" + sof + app1_xmp + b"\xff\xd9")
        assert md["xmp:CreatorTool"] == "late-writer"
        assert md["tiff:ImageWidth"] == "6"


class TestJp2IcoSvg:
    """Round-6 metadata breadth 3: JPEG 2000 (container + raw
    codestream), ICO, SVG."""

    def test_jp2_container_dims(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        ftyp = struct.pack(">I", 20) + b"ftypjp2 " + bytes(8)
        ihdr = (struct.pack(">I", 22) + b"ihdr"
                + struct.pack(">II", 480, 640)   # height, width
                + struct.pack(">H", 3) + bytes([7, 7, 0, 0]))
        jp2h = struct.pack(">I", 8 + len(ihdr)) + b"jp2h" + ihdr
        jp2 = sig + ftyp + jp2h
        assert detect_mime(jp2) == "image/jp2"
        md = image_dimensions(jp2)
        assert md["tiff:ImageWidth"] == "640"
        assert md["tiff:ImageLength"] == "480"
        assert md["tiff:BitsPerSample"] == "8"

    def test_j2k_codestream_dims(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        # SOC + SIZ marker + Lsiz + Rsiz(0) + Xsiz/Ysiz/XOsiz/YOsiz
        # (ISO 15444-1 A.5.1 — Rsiz precedes the sizes)
        j2k = (b"\xff\x4f\xff\x51"
               + struct.pack(">HH", 47, 0)
               + struct.pack(">IIII", 800, 600, 0, 0))
        assert detect_mime(j2k + bytes(40)) == "image/jp2"
        md = image_dimensions(j2k + bytes(40))
        assert md == {"tiff:ImageWidth": "800",
                      "tiff:ImageLength": "600"}

    def test_ico_largest_entry(self):
        import struct
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        hdr = struct.pack("<HHH", 0, 1, 2)
        e1 = bytes([16, 16]) + bytes(6) + struct.pack("<II", 100, 38)
        e2 = bytes([0, 0]) + bytes(6) + struct.pack("<II", 100, 138)
        ico = hdr + e1 + e2 + bytes(16)
        assert detect_mime(ico) == "image/vnd.microsoft.icon"
        md = image_dimensions(ico)
        assert md["tiff:ImageWidth"] == "256"   # 0 byte means 256
        assert md["tiff:ImageLength"] == "256"

    def test_svg_dims_and_title(self):
        from nifi_extracttext_processor_spark.formats import detect_mime
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        svg = (b'<?xml version="1.0"?>\n'
               b'<svg xmlns="http://www.w3.org/2000/svg" width="120px"'
               b' height="80">\n<title>Logo</title><rect/></svg>')
        assert detect_mime(svg) == "image/svg+xml"
        md = image_dimensions(svg)
        assert md["tiff:ImageWidth"] == "120"
        assert md["tiff:ImageLength"] == "80"
        assert md["dc:title"] == "Logo"

    def test_svg_viewbox_fallback(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="100%"'
               b' viewBox="0 0 512 256"><rect/></svg>')
        md = image_dimensions(svg)
        assert md["tiff:ImageWidth"] == "512"
        assert md["tiff:ImageLength"] == "256"


class TestImageMetaReview2Fixes:
    """Regression tests for the second self-review pass."""

    def test_svg_stroke_width_not_matched_as_width(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" '
               b'stroke-width="3" width="100" height="50"><rect/></svg>')
        md = image_dimensions(svg)
        assert md["tiff:ImageWidth"] == "100"

    def test_svg_malformed_numbers_fail_soft(self):
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        for w in (b".", b"12.3.4", b"1e999"):
            svg = (b'<svg width="' + w + b'" height="10" '
                   b'viewBox="0 0 1e999 5"><rect/></svg>')
            assert isinstance(image_dimensions(svg), dict)

    def test_gif_with_embedded_svg_bytes_stays_gif(self):
        import struct
        from nifi_extracttext_processor_spark.formats.image_meta import (
            image_dimensions,
        )
        gif = (b"GIF89a" + struct.pack("<HH", 9, 7) + bytes([0, 0, 0])
               + b"\x21\xfe\x05<svg \x00"      # comment block w/ "<svg "
               + b"\x3b")
        md = image_dimensions(gif)
        assert md["tiff:ImageWidth"] == "9"    # GIF wins, not SVG

    def test_incremental_empty_catalog_bootstraps(self, spark):
        from nifi_extracttext_processor_spark.operators.clustering import (
            semantic_dedup_incremental,
        )
        batch = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
        empty = batch.filter("vec_id < 0")
        kept = {r["vec_id"] for r in semantic_dedup_incremental(
            batch, empty, k=2, iters=1, threshold=0.99).collect()}
        assert kept == {1, 3}   # within-batch min-id rule only

    def test_ivf_centroid_count_mismatch_raises(self, spark, tmp_path):
        from nifi_extracttext_processor_spark.operators.similarity import (
            build_ivf_index,
        )
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
        import pytest as _pt
        with _pt.raises(ValueError, match="n_cells"):
            build_ivf_index(df, str(tmp_path / "x"), n_cells=16,
                            centroids=[[1.0, 0.0]])

    def test_mfcc_high_rate_frames_not_truncated(self):
        import math
        import struct
        from nifi_extracttext_processor_spark.operators.multimodal import (
            decode_audio_pcm, mfcc_features,
        )
        rate = 44100
        n = int(rate * 0.3)
        pcm = b"".join(struct.pack(
            "<h", int(0.5 * 32767 * math.sin(2 * math.pi * 440 * t / rate)))
            for t in range(n))
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(pcm)) + pcm)
        r, _, mono = decode_audio_pcm(wav)
        m = mfcc_features(mono, r)
        assert len(m) == 8
        assert all(math.isfinite(v) for v in m)


class TestCryptoPrimitives:
    """FIPS-197 Appendix C and classic RC4 vectors — external ground
    truth for the pure-stdlib primitives behind PDF decryption."""

    def test_aes_fips197_vectors(self):
        from nifi_extracttext_processor_spark.formats.crypto import AES
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        cases = [
            (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
            (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
            (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
        ]
        for key, ct_hex in cases:
            ct = AES(key).encrypt_block(pt)
            assert ct.hex() == ct_hex
            assert AES(key).decrypt_block(ct) == pt

    def test_rc4_vector(self):
        from nifi_extracttext_processor_spark.formats.crypto import rc4
        assert rc4(b"Key", b"Plaintext").hex().upper() == \
            "BBF316E8D940AF0AD3"
        assert rc4(b"Key", rc4(b"Key", b"abc")) == b"abc"

    def test_cbc_roundtrip_and_padding(self):
        from nifi_extracttext_processor_spark.formats.crypto import (
            aes_cbc_decrypt, aes_cbc_encrypt,
        )
        key, iv = bytes(16), bytes(range(16))
        for msg in (b"", b"x", b"16-bytes-block!!", b"y" * 100):
            enc = aes_cbc_encrypt(key, iv, msg)
            assert aes_cbc_decrypt(key, iv + enc) == msg


class TestEncryptedPdf:
    """Standard-security PDF decryption with an empty user password —
    the Tika/PDFBox transparent-open behavior (most 'protected' PDFs
    restrict editing, not reading)."""

    LINES = ["Classified hello", "second secret line"]

    def _want(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        from tests.fixtures.builders import build_pdf
        return extract_pdf_text(build_pdf(self.LINES))

    @pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128",
                                      "aes-256"])
    def test_all_modes_decrypt_to_plaintext(self, mode):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(self.LINES, mode)
        assert b"Classified" not in enc        # actually encrypted
        assert extract_pdf_text(enc) == self._want()

    @pytest.mark.parametrize("mode", ["rc4-128", "aes-256"])
    def test_real_password_routes_to_failure(self, mode):
        from nifi_extracttext_processor_spark.formats import extract_any
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(self.LINES, mode,
                                  user_password=b"hunter2")
        with pytest.raises(ValueError, match="password"):
            extract_pdf_text(enc)
        text, _mime, err = extract_any(enc, "locked.pdf")
        assert err is not None and text == ""  # A6 failure route

    def test_unencrypted_pdf_unaffected(self):
        from nifi_extracttext_processor_spark.formats.pdf_crypt import (
            decryptor_for,
        )
        from tests.fixtures.builders import build_pdf
        assert decryptor_for(build_pdf(self.LINES)) is None

    def test_pubkey_handler_rejected(self):
        from nifi_extracttext_processor_spark.formats.pdf import (
            extract_pdf_text,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(self.LINES, "rc4-128")
        enc = enc.replace(b"/Filter /Standard",
                          b"/Filter /Adobe.PubSec")
        with pytest.raises(ValueError, match="security handler"):
            extract_pdf_text(enc)

    def test_spark_e2e_encrypted_doc(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_text, route_by_error,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(self.LINES, "aes-128")
        locked = build_encrypted_pdf(self.LINES, "aes-128",
                                     user_password=b"x")
        df = spark.createDataFrame(
            [("open.pdf", bytearray(enc)),
             ("locked.pdf", bytearray(locked))],
            "filename string, content binary")
        ok, fail = route_by_error(extract_text(df))
        ok_rows = {r["filename"]: r["text"] for r in ok.collect()}
        assert "Classified hello" in ok_rows["open.pdf"]
        assert [r["filename"] for r in fail.collect()] == ["locked.pdf"]

    def test_vectorized_cbc_matches_scalar_blocks(self):
        """The numpy-parallel CBC decrypt must agree byte-for-byte
        with the scalar block cipher (the 100 TB throughput path vs
        the definitional one)."""
        from nifi_extracttext_processor_spark.formats.crypto import (
            AES, aes_cbc_decrypt, aes_cbc_encrypt,
        )
        key, iv = bytes(range(32)), bytes(range(16))
        msg = bytes((i * 37 + 11) % 256 for i in range(1600))
        enc = aes_cbc_encrypt(key, iv, msg, add_padding=False)
        vec = aes_cbc_decrypt(key, iv + enc, strip_padding=False)
        a = AES(key)
        out = bytearray()
        prev = iv
        for o in range(0, len(enc), 16):
            blk = enc[o:o + 16]
            d = a.decrypt_block(blk)
            out += bytes(x ^ y for x, y in zip(d, prev))
            prev = blk
        assert vec == bytes(out) == msg


class TestEncryptedPdfInfo:
    @pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128",
                                      "aes-256"])
    def test_info_title_decrypts(self, mode):
        from nifi_extracttext_processor_spark.formats.metadata import (
            pdf_info,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(["body"], mode,
                                  info_title="Top Secret Title")
        assert b"Top Secret Title" not in enc
        assert pdf_info(enc)["dc:title"] == "Top Secret Title"

    def test_locked_doc_yields_no_metadata(self):
        from nifi_extracttext_processor_spark.formats.metadata import (
            pdf_info,
        )
        from tests.fixtures.builders import build_encrypted_pdf
        enc = build_encrypted_pdf(["x"], "rc4-128",
                                  user_password=b"pw", info_title="T")
        assert pdf_info(enc) == {}

    def test_plain_doc_info_still_works(self):
        # the unencrypted path through the same code must not regress
        from nifi_extracttext_processor_spark.formats.metadata import (
            pdf_info,
        )
        from tests.fixtures.builders import build_pdf
        pdf = build_pdf(["x"])
        pdf = pdf.replace(
            b"trailer\n<<",
            b"8 0 obj\n<< /Title (Open Title) >>\nendobj\n"
            b"trailer\n<< /Info 8 0 R")
        assert pdf_info(pdf)["dc:title"] == "Open Title"


class TestEncryptedOoxml:
    """MS-OFFCRYPTO agile + standard encryption with the default
    password list (Excel's 'VelvetSweatshop' write-protection) — the
    Tika/POI transparent-open behavior."""

    PARAS = ["Hidden paragraph one", "and a second secret"]

    @pytest.mark.parametrize("scheme", ["agile", "standard"])
    def test_decrypts_and_extracts(self, scheme):
        from nifi_extracttext_processor_spark.formats import (
            detect_mime, extract_any,
        )
        from tests.fixtures.builders import build_encrypted_docx
        enc = build_encrypted_docx(self.PARAS, scheme)
        assert b"Hidden paragraph" not in enc
        assert detect_mime(enc) == "application/x-tika-ooxml-protected"
        text, _mime, err = extract_any(enc, "prot.docx")
        assert err is None
        assert "Hidden paragraph one" in text
        assert "second secret" in text

    @pytest.mark.parametrize("scheme", ["agile", "standard"])
    def test_real_password_routes_to_failure(self, scheme):
        from nifi_extracttext_processor_spark.formats import extract_any
        from tests.fixtures.builders import build_encrypted_docx
        enc = build_encrypted_docx(self.PARAS, scheme,
                                   password="actual-secret")
        text, _mime, err = extract_any(enc, "locked.docx")
        assert text == "" and err is not None
        assert "password" in err

    def test_empty_password_in_default_list(self):
        from nifi_extracttext_processor_spark.formats import extract_any
        from tests.fixtures.builders import build_encrypted_docx
        enc = build_encrypted_docx(self.PARAS, "agile", password="")
        text, _mime, err = extract_any(enc, "p.docx")
        assert err is None and "Hidden paragraph one" in text

    def test_sha1_agile_variant(self):
        # hashAlgorithm dispatch beyond the SHA512 default: build an
        # agile doc whose XML declares SHA1 by patching the builder's
        # output is fragile — instead verify the hash registry accepts
        # the documented names
        from nifi_extracttext_processor_spark.formats.ooxml_crypt import (
            _HASHES,
        )
        for name in ("SHA1", "SHA256", "SHA384", "SHA512", "SHA-512"):
            assert _HASHES[name] is not None

    def test_spark_e2e_mixed_batch(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_text, route_by_error,
        )
        from tests.fixtures.builders import build_encrypted_docx
        ok_doc = build_encrypted_docx(self.PARAS, "agile")
        locked = build_encrypted_docx(self.PARAS, "standard",
                                      password="x")
        df = spark.createDataFrame(
            [("open.docx", bytearray(ok_doc)),
             ("locked.docx", bytearray(locked))],
            "filename string, content binary")
        ok, fail = route_by_error(extract_text(df))
        ok_rows = {r["filename"]: r["text"] for r in ok.collect()}
        assert "Hidden paragraph one" in ok_rows["open.docx"]
        assert [r["filename"] for r in fail.collect()] == ["locked.docx"]


class TestTruncationContractAllFormats:
    """VERDICT r10 task 6: the Java truncation contract — text-mode
    output is EXACTLY text[:cap] for cap >= 0 (Test.java:275-297's
    MAX_TEXT_LENGTH=100 bound generalized to every format and to the
    boundary caps 0 / 1 / len-1 / len / len+1), -1 unlimited, and the
    HTML branch never applies the cap (A4, :158-172)."""

    @staticmethod
    def _fixtures():
        from tests.fixtures.builders import (
            build_doc, build_docx, build_eml, build_epub, build_msg,
            build_odp, build_ods, build_odt, build_pdf, build_ppt,
            build_pptx, build_rtf, build_xls, build_xlsx,
        )
        body = ["The quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs"]
        return {
            "t.pdf": build_pdf(body),
            "t.pdf.z": build_pdf(body, compress=True),
            "t.doc": build_doc(" ".join(body)),
            "t.docx": build_docx(body),
            "t.xlsx": build_xlsx([body]),
            "t.xls": build_xls(body),
            "t.pptx": build_pptx([body]),
            "t.ppt": build_ppt(body),
            "t.rtf": build_rtf(body),
            "t.odt": build_odt(body),
            "t.ods": build_ods([body]),
            "t.odp": build_odp([body]),
            "t.eml": build_eml("subj", "a@x", "b@y", "\n".join(body)),
            "t.msg": build_msg("subj", "a@x", "b@y", "\n".join(body)),
            "t.epub": build_epub(body),
            "t.html": b"<html><body><p>" + " ".join(body).encode()
                      + b"</p></body></html>",
            "t.txt": " ".join(body).encode(),
        }

    @pytest.mark.parametrize("name", sorted(_fixtures.__func__()))
    def test_boundary_caps(self, name):
        data = self._fixtures()[name]
        fname = name.removesuffix(".z")
        full, mime, err = extract_any(data, fname)
        assert err is None, (name, err)
        assert len(full) > 4, (name, full)
        n = len(full)
        for cap in (0, 1, n // 2, n - 1, n, n + 1, n + 1000):
            text, _, err = extract_any(data, fname, max_text_length=cap)
            assert err is None, (name, cap, err)
            assert text == full[:cap], (name, cap)
        # -1 = unlimited (the default)
        again, _, _ = extract_any(data, fname, max_text_length=-1)
        assert again == full

    @pytest.mark.parametrize("name", sorted(_fixtures.__func__()))
    def test_html_mode_ignores_cap(self, name):
        data = self._fixtures()[name]
        fname = name.removesuffix(".z")
        html, _, err = extract_any(data, fname, max_text_length=1,
                                   output_mode="html")
        assert err is None, (name, err)
        assert len(html) > 1, name  # cap never applied on the A4 branch
