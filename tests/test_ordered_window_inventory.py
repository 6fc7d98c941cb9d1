"""Ordered-window inventory pin (VERDICT r15 task 5).

The r15 quantization-guard sweep adjudicated every ordering site in
the package (guard-gated value collapses, bounded-by-construction
domains, per-key event-time sequences, pinned-tiebreak top-k, and two
documented exemptions); SURVEY.md's Round-16 "Ordered-window guard
sweep" table records the disposition per file. This test pins the
per-file `.orderBy(` site counts so a NEW ordering site (a potential
unguarded value-grain collapse or an accidental single-partition
global sort) fails the suite until it is adjudicated in the SURVEY
table and the count here is updated.

Counts include DataFrame-level `.orderBy(` (presentation sorts and
top-k preludes) on purpose: a global DataFrame sort is exactly as
scale-relevant as a global window.
"""

import os

import nifi_extracttext_processor_spark as pkg

ROOT = os.path.dirname(os.path.abspath(pkg.__file__))

# file -> number of ".orderBy(" occurrences adjudicated in SURVEY.md
# Round-16 "Ordered-window guard sweep" (updating a count REQUIRES
# re-adjudicating the file's new/changed sites there first).
ADJUDICATED = {
    "operators/abtest.py": 4,
    "operators/attribution.py": 5,
    "operators/basket.py": 1,
    "operators/chunk.py": 1,
    "operators/clustering.py": 2,
    "operators/collocations.py": 1,
    "operators/contrastive.py": 1,
    "operators/corpus.py": 6,
    "operators/corpus_compare.py": 5,
    "operators/dedup.py": 2,
    "operators/diff.py": 1,
    "operators/drift.py": 3,
    "operators/evalmetrics.py": 10,
    "operators/expectations.py": 1,
    "operators/featsel.py": 2,
    "operators/fusion.py": 5,
    "operators/graph.py": 1,
    "operators/histogram.py": 2,
    "operators/image_dedup.py": 1,
    "operators/kn_lm.py": 1,
    "operators/lm.py": 3,  # r17: top_k orderBy duplicated
    # into the legacy n<2 branch (SURVEY sweep table, class P)
    "operators/models.py": 3,
    "operators/paths.py": 3,
    "operators/privacy.py": 1,
    "operators/profile.py": 8,
    "operators/quantization.py": 4,
    "operators/ranking.py": 2,
    "operators/ranktest.py": 6,
    "operators/scd.py": 2,
    "operators/search.py": 3,
    "operators/selection.py": 1,
    "operators/sessions.py": 13,
    "operators/similarity.py": 11,
    "operators/sketch.py": 4,
    "operators/survival.py": 14,
    "operators/temporal.py": 3,
    "operators/text_analysis.py": 11,
    "operators/textrank.py": 1,
    "operators/timeseries.py": 19,
    "operators/tokenize.py": 2,
    "operators/winnow.py": 1,
    "operators/wsample.py": 2,
    "plans/entity_resolution.py": 2,
    "streaming/pipeline.py": 2,
}


def _scan() -> dict:
    found = {}
    for dirpath, _dirs, files in os.walk(ROOT):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            n = open(p, encoding="utf-8").read().count(".orderBy(")
            if n:
                found[os.path.relpath(p, ROOT)] = n
    return found


def test_every_ordering_site_is_adjudicated():
    found = _scan()
    new_files = {f: n for f, n in found.items() if f not in ADJUDICATED}
    assert not new_files, (
        f"new files with ordering sites {new_files}: adjudicate them "
        "in SURVEY.md's ordered-window sweep table, then add here")
    grew = {f: (ADJUDICATED[f], n) for f, n in found.items()
            if n > ADJUDICATED[f]}
    assert not grew, (
        f"ordering sites ADDED {grew} (adjudicated, found): a new "
        "Window.orderBy/DataFrame.orderBy needs a guard, a bounded "
        "domain, or a recorded exemption in SURVEY.md's sweep table "
        "BEFORE bumping the pinned count")


def test_inventory_has_no_stale_rows():
    found = _scan()
    stale = {f: (n, found.get(f, 0)) for f, n in ADJUDICATED.items()
             if found.get(f, 0) != n}
    # shrinking/removed counts are also drift — keep the pin exact
    assert not stale, (
        f"inventory drift {stale} (pinned, found): update the pin and "
        "the SURVEY sweep table together")
