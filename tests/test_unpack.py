"""Archive unpacking (operators/unpack.py): zip/tar/gzip explosion,
bomb/caps fail-closed behavior, passthrough, and e2e composition with
extract_text.
"""
from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pytest

from nifi_extracttext_processor_spark.operators.unpack import (
    unpack_archives,
)


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _df(spark, rows):
    return spark.createDataFrame(
        [(p, c, p.rsplit("/", 1)[-1]) for p, c in rows],
        "path string, content binary, filename string")


class TestUnpack:
    def test_zip_and_tar_members(self, spark):
        z = _zip_bytes([("a.txt", b"alpha"), ("sub/b.txt", b"beta")])
        t = _tar_bytes([("x.txt", b"xray")])
        out = unpack_archives(_df(spark, [("/d/a.zip", z),
                                          ("/d/t.tar", t)])).collect()
        got = {r["member_name"]: (r["path"], bytes(r["content"]),
                                  r["filename"], r["member_index"])
               for r in out}
        assert got["a.txt"] == ("/d/a.zip!a.txt", b"alpha", "a.txt", 0)
        assert got["sub/b.txt"][1] == b"beta"
        assert got["sub/b.txt"][2] == "b.txt"
        assert got["x.txt"] == ("/d/t.tar!x.txt", b"xray", "x.txt", 0)
        assert all(r["unpack_error"] is None for r in out)

    def test_gzip_and_passthrough(self, spark):
        g = gzip.compress(b"plain body")
        out = unpack_archives(_df(spark, [
            ("/d/doc.txt.gz", g),
            ("/d/plain.txt", b"not an archive")])).collect()
        got = {r["path"]: r for r in out}
        assert bytes(got["/d/doc.txt.gz!doc.txt"]["content"]) == \
            b"plain body"
        p = got["/d/plain.txt"]
        assert p["member_name"] is None
        assert bytes(p["content"]) == b"not an archive"

    def test_member_cap_and_bomb(self, spark):
        big = _zip_bytes([("big.bin", b"\0" * 5000),
                          ("ok.txt", b"fine")])
        out = unpack_archives(
            _df(spark, [("/d/b.zip", big)]),
            max_member_bytes=1000).collect()
        got = {r["member_name"]: r for r in out}
        assert "exceeds cap" in got["big.bin"]["unpack_error"]
        assert bytes(got["big.bin"]["content"]) == b""
        assert got["ok.txt"]["unpack_error"] is None
        # member-count cap
        many = _zip_bytes([(f"m{i}.txt", b"x") for i in range(10)])
        out2 = unpack_archives(_df(spark, [("/d/m.zip", many)]),
                               max_members=3).collect()
        assert len(out2) == 3

    def test_damaged_container_fails_closed(self, spark):
        bad = b"PK\x03\x04" + b"\xff" * 40
        out = unpack_archives(_df(spark, [("/d/bad.zip", bad)])).collect()
        assert len(out) == 1
        assert out[0]["unpack_error"] is not None
        assert bytes(out[0]["content"]) == b""

    def test_total_bytes_cap(self, spark):
        """Members individually under the member cap but collectively
        over the archive cap: decoded-so-far members are kept, the
        remainder is skipped, ONE marker row records why (r7 VERDICT
        'What's wrong #1' — the 10,000 x 64 MB composite bomb)."""
        many = _zip_bytes([(f"m{i}.bin", b"x" * 400) for i in range(10)])
        out = unpack_archives(
            _df(spark, [("/d/bomb.zip", many)]),
            max_member_bytes=1000, max_total_bytes=1000).collect()
        members = [r for r in out if r["member_name"] is not None]
        markers = [r for r in out if r["member_name"] is None]
        # 2 x 400 B fit; the 3rd would blow the 1000 B budget
        assert [r["member_name"] for r in members] == ["m0.bin", "m1.bin"]
        assert all(r["unpack_error"] is None for r in members)
        assert len(markers) == 1
        assert "archive total exceeds cap" in markers[0]["unpack_error"]
        assert bytes(markers[0]["content"]) == b""
        # tar path: declared sizes stop BEFORE inflating
        many_t = _tar_bytes([(f"t{i}.bin", b"y" * 400) for i in range(10)])
        out_t = unpack_archives(
            _df(spark, [("/d/bomb.tar", many_t)]),
            max_member_bytes=1000, max_total_bytes=1000).collect()
        got = [r["member_name"] for r in out_t]
        assert got == ["t0.bin", "t1.bin", None]
        assert "archive total exceeds cap" in out_t[-1]["unpack_error"]

    def test_multi_member_gzip(self, spark):
        """cat a.gz b.gz is ONE logical stream (gunzip semantics); the
        first-member-only r7 behavior silently dropped the rest."""
        g = gzip.compress(b"first half ") + gzip.compress(b"second half")
        out = unpack_archives(
            _df(spark, [("/d/cat.txt.gz", g)])).collect()
        assert len(out) == 1
        assert bytes(out[0]["content"]) == b"first half second half"
        assert out[0]["unpack_error"] is None

    def test_partial_container_is_atomic(self, spark):
        """A container that raises mid-iteration drops its decoded
        members and emits ONE error row — downstream must never see a
        partial member set that looks complete (r7 ADVICE)."""
        full = _tar_bytes([("ok.txt", b"A" * 600),
                           ("gone.txt", b"B" * 600)])
        # cut inside the second member's data region: first member
        # decodes, then tarfile raises on the truncated read
        cut = full[: 512 + 1024 + 512 + 100]
        out = unpack_archives(_df(spark, [("/d/trunc.tar", cut)])).collect()
        assert len(out) == 1
        assert out[0]["member_name"] is None
        assert out[0]["unpack_error"] is not None
        assert bytes(out[0]["content"]) == b""

    def test_flush_chunks_preserve_rows(self, spark):
        """Several archives whose combined payload exceeds the archive
        budget exercise the chunked-yield path; rows must be complete
        and identical to the unchunked result."""
        rows = [(f"/d/a{i}.zip",
                 _zip_bytes([(f"f{i}.txt", bytes([65 + i]) * 300)]))
                for i in range(6)]
        out = unpack_archives(_df(spark, rows), max_total_bytes=500,
                              max_member_bytes=400).collect()
        got = sorted((r["member_name"], bytes(r["content"]))
                     for r in out)
        assert got == [(f"f{i}.txt", bytes([65 + i]) * 300)
                       for i in range(6)]

    def test_composes_with_extract(self, spark, tmp_path):
        from tests.fixtures.builders import build_pdf
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_text,
        )
        from nifi_extracttext_processor_spark.sources.binary_files import (
            read_documents,
        )
        z = _zip_bytes([("inner.pdf", build_pdf(["Hello from zip"])),
                        ("note.txt", b"plain note")])
        (tmp_path / "bundle.zip").write_bytes(z)
        docs = read_documents(spark, str(tmp_path))
        out = {r["filename"]: r["text"] for r in
               extract_text(unpack_archives(docs)).collect()}
        assert out["inner.pdf"].startswith("Hello from zip")
        assert out["note.txt"] == "plain note"

    def test_composes_with_streaming(self, spark, tmp_path):
        """unpack_archives is map-only, so it composes with the file
        stream source unchanged."""
        src = tmp_path / "src"
        src.mkdir()
        z = _zip_bytes([("a.txt", b"streamed alpha")])
        (src / "bundle.zip").write_bytes(z)
        stream = (spark.readStream.format("binaryFile")
                  .schema("path string, modificationTime timestamp, "
                          "length long, content binary")
                  .load(str(src)))
        out = unpack_archives(stream)
        q = (out.writeStream.format("memory").queryName("unpack_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT member_name, content FROM unpack_t").collect()
        assert [(r["member_name"], bytes(r["content"]))
                for r in rows] == [("a.txt", b"streamed alpha")]
