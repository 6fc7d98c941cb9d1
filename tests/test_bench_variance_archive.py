"""bench_variance._archive_notes must never destroy a curated round
archive: the r16 optimization session lost hand-written band analysis
to the old unconditional overwrite (restored from git) and the
protocol's whole point is that prior medians survive. Fresh archive =
written whole; existing archive = new measurement APPENDED under a
dated header with the curated content intact."""

from __future__ import annotations

import os

from bench_variance import _archive_notes

LINES = ["# BENCH_NOTES — run-to-run variance protocol", "",
         "Last measured: 2026-08-18, 3 runs.", "",
         "| q | median s |", "|---|---|", "| top_terms | 0.4 |"]


def test_fresh_archive_written_whole(tmp_path):
    rpath = str(tmp_path / "BENCH_NOTES_r99.md")
    _archive_notes(rpath, LINES, "2026-08-18")
    body = open(rpath).read()
    assert body == "\n".join(LINES)


def test_existing_archive_appended_not_overwritten(tmp_path):
    rpath = str(tmp_path / "BENCH_NOTES_r99.md")
    curated = ("# BENCH_NOTES_r99\n\n## hand-written band analysis\n"
               "the medians that must survive\n")
    with open(rpath, "w") as f:
        f.write(curated)
    _archive_notes(rpath, LINES, "2026-08-18")
    body = open(rpath).read()
    # curated content intact, byte-for-byte, at the top
    assert body.startswith(curated)
    # new measurement present under a dated append header
    assert "## regenerated measurement (2026-08-18)" in body
    assert "| top_terms | 0.4 |" in body
    # the appended section must not re-introduce a top-level title
    assert body.count("# BENCH_NOTES — run-to-run variance") == 0


def test_append_is_idempotent_per_invocation(tmp_path):
    rpath = str(tmp_path / "BENCH_NOTES_r99.md")
    _archive_notes(rpath, LINES, "2026-08-17")
    _archive_notes(rpath, LINES, "2026-08-18")
    body = open(rpath).read()
    assert body.count("## regenerated measurement") == 1
    assert "(2026-08-18)" in body
    assert os.path.exists(rpath)
