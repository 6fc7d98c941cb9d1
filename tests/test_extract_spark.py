"""Spark-level Tier A tests: the reference's 7 processor tests ported to
DataFrame semantics (ExtractTextProcessorTest.java via SURVEY §5), plus
routing/enrichment quirks A6–A9."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from nifi_extracttext_processor_spark.operators.extract import (
    detect_mime_col, extract_text, media_metadata, route_by_error,
)
from tests.fixtures.builders import build_doc, build_docx, build_pdf

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("filename", StringType()),
    StructField("content", BinaryType()),
])


@pytest.fixture(scope="module")
def docs_df(spark, reference_fixture):
    rows = [
        Row(doc_id=0, filename="simple.pdf",
            content=bytearray(reference_fixture("simple.pdf"))),
        Row(doc_id=1, filename="simple.doc",
            content=bytearray(reference_fixture("simple.doc"))),
        Row(doc_id=2, filename="simple.docx",
            content=bytearray(reference_fixture("simple.docx"))),
        Row(doc_id=3, filename="corrupt.bin",
            content=bytearray(b"\x00\x01\xff\xfe garbage")),
        Row(doc_id=4, filename="missing.pdf", content=None),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_extract_goldens(docs_df):
    out = {r["filename"]: r for r in
           extract_text(docs_df).collect()}
    assert out["simple.pdf"]["text"].strip().startswith("A Simple PDF File")
    assert out["simple.doc"]["text"].strip().startswith(
        "A Simple WORD DOC File")
    assert out["simple.docx"]["text"].strip().startswith(
        "A Simple WORD DOCX File")


def test_attribute_enrichment(docs_df):
    out = {r["filename"]: r for r in extract_text(docs_df).collect()}
    r = out["simple.pdf"]
    assert r["mime_type"] == "text/plain"           # Test.java:155
    assert r["orig_mime_type"] == "application/pdf"  # :158
    r = out["simple.doc"]
    assert r["orig_mime_type"] == "application/msword"  # :216
    r = out["simple.docx"]
    assert r["orig_mime_type"].startswith(
        "application/vnd.openxmlformats")  # :241


def test_html_mode(docs_df):
    out = {r["filename"]: r for r in
           extract_text(docs_df, output_mode="html").collect()}
    r = out["simple.pdf"]
    assert r["mime_type"] == "text/html"  # :188-191
    assert r["text"].startswith('<html xmlns=')
    assert "A Simple PDF File" in r["text"]


def test_routing_and_error_quirks(docs_df):
    ok, fail = route_by_error(extract_text(docs_df))
    ok_names = {r["filename"] for r in ok.collect()}
    fail_rows = {r["filename"]: r for r in fail.collect()}
    assert ok_names == {"simple.pdf", "simple.doc", "simple.docx"}
    assert set(fail_rows) == {"corrupt.bin", "missing.pdf"}
    # A6 quirk: failure rows have empty text and NO mime attributes
    for r in fail_rows.values():
        assert r["text"] == ""
        assert r["mime_type"] is None
        assert r["orig_mime_type"] is None
    # A7: null content gets the null-guard message
    assert fail_rows["missing.pdf"]["error"] == "Input file was null"


def test_max_text_length(spark, reference_fixture):
    df = spark.createDataFrame(
        [Row(doc_id=0, filename="big.pdf",
             content=bytearray(reference_fixture("big.pdf")))], DOC_SCHEMA)
    full = extract_text(df).collect()[0]["text"]
    assert len(full) > 100  # Test.java:265
    capped = extract_text(df, max_text_length=100).collect()[0]["text"]
    assert len(capped) <= 100  # :295


def test_detect_mime_col(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, filename="a.pdf", content=bytearray(build_pdf(["x"]))),
        Row(doc_id=1, filename="a.docx",
            content=bytearray(build_docx(["y"]))),
        Row(doc_id=2, filename="a.doc", content=bytearray(build_doc("z"))),
    ], DOC_SCHEMA)
    got = {r["filename"]: r["orig_mime_type"]
           for r in detect_mime_col(df).collect()}
    assert got["a.pdf"] == "application/pdf"
    assert got["a.doc"] == "application/msword"
    assert "wordprocessingml" in got["a.docx"]


def test_media_metadata_caps(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, filename="a.pdf",
             content=bytearray(build_pdf(["x"])))], DOC_SCHEMA)
    md = media_metadata(df).collect()[0]["metadata"]
    assert md["Content-Type"] == "application/pdf"
    assert md["resourceName"] == "a.pdf"
    assert int(md["Content-Length"]) > 0
    assert all(len(v) <= 2048 for v in md.values())


def test_extraction_plan_is_narrow(docs_df):
    """Extraction must not shuffle — embarrassingly parallel at 100 TB."""
    plan = extract_text(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_media_metadata_widened(spark, reference_fixture):
    """B3 Tika-surface widening: PDF Info dict, OOXML core props, HTML
    title all land in the metadata map (reference template region
    56409-tika.xml:1761; caps 5000/2048 still honored)."""
    from tests.fixtures.builders import build_pptx
    html = b"<html><head><title>Page Title</title></head><body>x</body></html>"
    df = spark.createDataFrame([
        Row(doc_id=0, filename="big.pdf",
            content=bytearray(reference_fixture("big.pdf"))),
        Row(doc_id=1, filename="d.pptx",
            content=bytearray(build_pptx([["Hello"]]))),
        Row(doc_id=2, filename="p.html", content=bytearray(html)),
    ], DOC_SCHEMA)
    md = {r["filename"]: r["metadata"] for r in media_metadata(df).collect()}
    # PDF Info dictionary (real reference fixture values)
    assert md["big.pdf"]["dc:title"] == "Hortonworks DataFlow - Getting Started"
    assert md["big.pdf"]["pdf:Producer"] == "Apache FOP Version 1.0"
    assert md["big.pdf"]["xmp:CreatorTool"] == "Cloud API Docs Plugin"
    # OOXML package without docProps still yields base attrs, no crash
    assert md["d.pptx"]["Content-Type"].endswith("presentation")
    # HTML title
    assert md["p.html"]["dc:title"] == "Page Title"


def test_media_metadata_legacy_summary_info(spark, reference_fixture):
    """OLE SummaryInformation ([MS-OLEPS]) surfaces for legacy Office
    files — values asserted against the real reference simple.doc."""
    df = spark.createDataFrame(
        [Row(doc_id=0, filename="simple.doc",
             content=bytearray(reference_fixture("simple.doc")))],
        DOC_SCHEMA)
    md = media_metadata(df).collect()[0]["metadata"]
    assert md["meta:last-author"] == "Willy Demis"
    assert md["extended-properties:Application"] == \
        "Microsoft Macintosh Word"
    assert md["dcterms:modified"] == "2018-02-21T20:00:00Z"


def test_media_metadata_odf_and_eml(spark):
    """Round-2 metadata widening: ODF meta.xml and RFC-822 headers."""
    import io
    import zipfile

    from tests.fixtures.builders import build_eml

    buf = io.BytesIO()
    meta = (
        '<?xml version="1.0"?>'
        '<office:document-meta'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:meta="urn:oasis:names:tc:opendocument:xmlns:meta:1.0"'
        ' xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<office:meta><dc:title>Deck Title</dc:title>'
        '<dc:creator>Alex Writer</dc:creator>'
        '<meta:generator>TestSuite/1.0</meta:generator>'
        '</office:meta></office:document-meta>')
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:text><text:p>hi</text:p></office:text>'
        '</office:body></office:document-content>')
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("mimetype"),
                    "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
        zf.writestr("meta.xml", meta)
    eml = build_eml("Quarterly Report", "alice@example.com",
                    "bob@example.com", "body text")
    df = spark.createDataFrame([
        Row(doc_id=0, filename="t.odt", content=bytearray(buf.getvalue())),
        Row(doc_id=1, filename="m.eml", content=bytearray(eml)),
    ], DOC_SCHEMA)
    md = {r["filename"]: r["metadata"] for r in media_metadata(df).collect()}
    assert md["t.odt"]["dc:title"] == "Deck Title"
    assert md["t.odt"]["dc:creator"] == "Alex Writer"
    assert md["t.odt"]["meta:generator"] == "TestSuite/1.0"
    assert md["m.eml"]["dc:title"] == "Quarterly Report"
    assert md["m.eml"]["Message-From"] == "alice@example.com"
    assert md["m.eml"]["Content-Type"] == "message/rfc822"
