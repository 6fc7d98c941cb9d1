"""Pure-Python (stdlib-only) document format parsers.

These are deliberately Spark-free: the Spark operators in
``operators.extract`` call them inside Arrow-batched ``mapInPandas``
workers. Keeping them import-light makes the Python worker fork cheap.

Dispatcher semantics mirror the reference processor
(/root/reference/.../ExtractTextProcessor.java:145-199):
detect MIME → parse → on any error return ('', error_message) with the
empty-content-on-failure quirk preserved.
"""

from __future__ import annotations

from . import mime as m
from .email_msg import extract_eml_text
from .html import html_to_text, render_xhtml
from .legacy_doc import extract_doc_text, extract_xls_text
from .legacy_ppt import extract_ppt_text
from .mime import detect_mime
from .ooxml import extract_docx_text, extract_pptx_text, extract_xlsx_text
from .opendoc import extract_odf_text
from .pdf import extract_pdf_text
from .plain_xml import extract_xml_text
from .rtf import extract_rtf_text

__all__ = [
    "detect_mime", "extract_any", "extract_pdf_text", "extract_docx_text",
    "extract_xlsx_text", "extract_doc_text", "extract_xls_text",
    "extract_pptx_text", "extract_ppt_text", "extract_rtf_text",
    "extract_odf_text", "extract_eml_text", "extract_xml_text",
    "html_to_text", "render_xhtml",
]


# Bounds on transparent decompression (Tika's CompressorParser has the
# same class of guard: memory-limit on expanded entries). A small .gz can
# expand ~1000x; without a cap a decompression bomb OOMs the Arrow
# extraction task.
MAX_DECOMPRESSED_BYTES = 1 << 30  # 1 GiB of expanded content
MAX_COMPRESS_DEPTH = 2            # .gz-of-.gz / zip-in-zip, no deeper
MAX_ARCHIVE_ENTRIES = 1000        # entries visited per zip/tar


def _decompress_capped(data: bytes, make_dec, magic: bytes,
                       cap: int | None = None) -> bytes:
    """Decompress ALL members of a (possibly concatenated) stream under
    one shared byte cap. gzip/bz2/xz files may hold multiple members
    (``cat a.gz b.gz``, pigz, pbzip2, multi-stream xz); the stdlib
    *Decompressor objects stop at the first member boundary, so loop on
    ``unused_data`` until the trailer isn't another member header."""
    cap = MAX_DECOMPRESSED_BYTES if cap is None else int(cap)
    out = b""
    remaining = data
    while remaining.startswith(magic):
        dec = make_dec()
        out += dec.decompress(remaining, cap + 1 - len(out))
        if len(out) > cap:
            raise ValueError(
                f"compressed content exceeds {cap} decompressed bytes")
        if not dec.eof:
            break  # truncated final member: keep the partial content
        remaining = dec.unused_data
    return out


def extract_any(
    data: bytes | None,
    filename: str | None = None,
    max_text_length: int = -1,
    output_mode: str = "text",
    _depth: int = 0,
) -> tuple[str, str, str | None]:
    """Detect + extract. Returns (text, detected_mime, error).

    Faithful quirks (ExtractTextProcessor.java):
      * error → text='' and error set (:178-191 — content written anyway)
      * max_text_length applies ONLY in text mode (:173-176; the html
        branch at :158-172 never calls setMaxStringLength)
      * -1 = unlimited (:83-86)
    """
    if data is None:
        return "", m.MIME_BIN, "Input file was null"  # :194-197
    detected = m.MIME_BIN
    try:
        detected = detect_mime(data, filename)
        if detected == m.MIME_PDF:
            text = extract_pdf_text(data)
        elif detected == m.MIME_DOC:
            text = extract_doc_text(data)
        elif detected == m.MIME_DOCX:
            text = extract_docx_text(data)
        elif detected == m.MIME_XLSX:
            text = extract_xlsx_text(data)
        elif detected == m.MIME_XLS:
            text = extract_xls_text(data)
        elif detected == m.MIME_PPTX:
            text = extract_pptx_text(data)
        elif detected == m.MIME_PPT:
            text = extract_ppt_text(data)
        elif detected == m.MIME_RTF:
            text = extract_rtf_text(data)
        elif detected == m.MIME_HTML:
            text = html_to_text(data)
        elif detected in (m.MIME_ODT, m.MIME_ODS, m.MIME_ODP):
            text = extract_odf_text(data)
        elif detected == m.MIME_EPUB:
            from .epub import extract_epub_text
            text = extract_epub_text(data)
        elif detected == m.MIME_XML:
            text = extract_xml_text(data)
        elif detected == m.MIME_EML:
            text = extract_eml_text(data)
        elif detected == m.MIME_MSG:
            from .msg import extract_msg_text
            text = extract_msg_text(data)
        elif detected in (m.MIME_GZIP, m.MIME_BZIP2, m.MIME_XZ):
            # Tika's CompressorParser: transparently extract the wrapped
            # entry; the reported type stays the compressor's. Expansion
            # is capped (decompression-bomb guard) and nesting bounded.
            if _depth >= MAX_COMPRESS_DEPTH:
                raise ValueError(
                    f"compressed nesting deeper than {MAX_COMPRESS_DEPTH}")
            if detected == m.MIME_GZIP:
                import zlib
                make_dec = lambda: zlib.decompressobj(wbits=31)  # gzip
                magic, suffix = b"\x1f\x8b", ".gz"
            elif detected == m.MIME_BZIP2:
                import bz2
                make_dec = bz2.BZ2Decompressor
                magic, suffix = b"BZh", ".bz2"
            else:
                import lzma
                make_dec = lzma.LZMADecompressor
                magic, suffix = b"\xfd7zXZ\x00", ".xz"
            inner = _decompress_capped(data, make_dec, magic)
            inner_name = (filename or "").removesuffix(suffix) or None
            text, _, inner_err = extract_any(
                inner, inner_name, -1, "text", _depth=_depth + 1)
            if inner_err:
                raise ValueError(
                    f"compressed inner content failed: {inner_err}")
        elif detected == m.MIME_OOXML_PROTECTED:
            # MS-OFFCRYPTO agile/standard encryption with the default
            # password list (Excel's "VelvetSweatshop" auto-open);
            # wrong-password docs raise -> failure route
            from .ooxml_crypt import decrypt_ooxml
            inner = decrypt_ooxml(data)
            text, _, inner_err = extract_any(
                inner, filename, -1, "text", _depth=_depth + 1)
            if inner_err:
                raise ValueError(
                    f"decrypted package failed: {inner_err}")
        elif detected in (m.MIME_ZIP, m.MIME_TAR):
            text = _extract_archive(data, detected, _depth)
        elif detected.startswith(("image/", "audio/")):
            # Tika's Image/Audio parsers emit metadata but no text
            # content (OCR/ASR explicitly out of scope — SURVEY §7);
            # header attributes surface via B3 media_metadata instead
            text = ""
        elif detected in (m.MIME_TEXT, m.MIME_CSV, m.MIME_JSON):
            text = data.decode("utf-8", "replace")
        else:
            raise ValueError(f"unsupported content type: {detected}")
        if output_mode == "html":
            return render_xhtml(text, title=filename or ""), detected, None
        if max_text_length >= 0:
            text = text[:max_text_length]
        return text, detected, None
    except Exception as exc:  # noqa: BLE001 — route-to-failure semantics
        return "", detected, f"{type(exc).__name__}: {exc}"


def _extract_archive(data: bytes, detected: str, depth: int) -> str:
    """Tika PackageParser behavior: recurse into zip/tar entries and
    concatenate the extracted text of each parseable member in archive
    order (unparseable members are skipped, like Tika's best-effort
    embedded-document extraction). Bounded: entry count, total expanded
    bytes, and nesting depth.
    """
    import io
    import tarfile
    import zipfile

    if depth >= MAX_COMPRESS_DEPTH:
        raise ValueError(
            f"compressed nesting deeper than {MAX_COMPRESS_DEPTH}")
    parts: list[str] = []
    budget = MAX_DECOMPRESSED_BYTES
    seen = 0
    if detected == m.MIME_ZIP:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                seen += 1
                if seen > MAX_ARCHIVE_ENTRIES:
                    break
                if info.file_size > budget:
                    raise ValueError(
                        "archive content exceeds "
                        f"{MAX_DECOMPRESSED_BYTES} expanded bytes")
                budget -= info.file_size
                inner = zf.read(info)
                text, _, err = extract_any(inner, info.filename, -1,
                                           "text", _depth=depth + 1)
                if err is None and text.strip():
                    parts.append(text.rstrip("\n"))
    else:  # tar
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                seen += 1
                if seen > MAX_ARCHIVE_ENTRIES:
                    break
                if member.size > budget:
                    raise ValueError(
                        "archive content exceeds "
                        f"{MAX_DECOMPRESSED_BYTES} expanded bytes")
                budget -= member.size
                f = tf.extractfile(member)
                if f is None:
                    continue
                inner = f.read()
                text, _, err = extract_any(inner, member.name, -1,
                                           "text", _depth=depth + 1)
                if err is None and text.strip():
                    parts.append(text.rstrip("\n"))
    return "\n".join(parts) + ("\n" if parts else "")
