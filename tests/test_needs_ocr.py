"""Image-only-PDF (scanned document) detection: pdf_has_images /
pdf_needs_ocr goldens and the flag_needs_ocr / route_needs_ocr
operator surface. The reference's Tika stack hands these documents to
Tesseract (OCRParser warning in its surefire output); this engine has
no OCR, so image-only PDFs must surface on a distinct route instead
of passing silently with empty text."""

import pytest
from pyspark.sql import Row

from nifi_extracttext_processor_spark.formats.pdf import (
    extract_pdf_text,
    pdf_has_images,
    pdf_needs_ocr,
)
from nifi_extracttext_processor_spark.operators.extract import (
    extract_text,
    flag_needs_ocr,
    route_needs_ocr,
)
from tests.fixtures.builders import build_pdf, build_scanned_pdf


class TestDetector:
    def test_scanned_pdf_needs_ocr(self):
        data = build_scanned_pdf()
        assert extract_pdf_text(data).strip() == ""
        assert pdf_has_images(data)
        assert pdf_needs_ocr(data)

    def test_text_pdf_does_not(self):
        data = build_pdf(["Hello world"])
        assert not pdf_has_images(data)
        assert not pdf_needs_ocr(data)

    def test_ocr_text_layer_does_not(self):
        # image + invisible text layer = already OCRed upstream
        data = build_scanned_pdf(text_layer=["recognized text"])
        assert pdf_has_images(data)
        assert not pdf_needs_ocr(data)
        assert "recognized text" in extract_pdf_text(data)

    def test_corrupt_pdf_is_false(self):
        assert not pdf_needs_ocr(b"%PDF-1.4 garbage")
        assert not pdf_has_images(b"not a pdf")


class TestOperator:
    @pytest.fixture(scope="class")
    def flagged(self, spark):
        rows = [
            Row(filename="scan.pdf", content=bytearray(
                build_scanned_pdf())),
            Row(filename="text.pdf", content=bytearray(
                build_pdf(["Real text"]))),
            Row(filename="bad.pdf", content=bytearray(
                b"%PDF-1.4 garbage")),
        ]
        df = spark.createDataFrame(rows)
        return flag_needs_ocr(
            extract_text(df, keep_content=True)).cache()

    def test_flags(self, flagged):
        got = {r["filename"]: r["needs_ocr"] for r in
               flagged.collect()}
        assert got == {"scan.pdf": True, "text.pdf": False,
                       "bad.pdf": False}

    def test_route(self, flagged):
        ready, ocr = route_needs_ocr(flagged)
        assert {r["filename"] for r in ocr.collect()} == {"scan.pdf"}
        assert {r["filename"] for r in ready.collect()} == {
            "text.pdf", "bad.pdf"}

    def test_requires_content(self, spark, flagged):
        with pytest.raises(ValueError, match="keep_content"):
            flag_needs_ocr(flagged.drop("content"))
