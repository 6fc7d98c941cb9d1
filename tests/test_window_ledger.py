"""Machine-checked driver-window composition + rotation-debt ledger
(VERDICT r10 task 3). Replaces prose-tracking of the 50-slot window:
every invariant the rotation policy promises is asserted here from the
actual artifacts (registration order, ROTATIONS history, and the
CORRECTNESS_r*.json files the driver wrote)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from window_ledger import WINDOW_SIZE, build_ledger, load_correctness

# The documented rows-only carve-outs (non-SQL-expressible; the driver
# records a weaker rows-only check for these). Adding a 6th requires a
# written rationale at its registration site AND here.
ROWS_ONLY_CARVEOUTS = {
    "bpe_tokenize", "unigram_tokenize", "approx_top_terms",
    "pca_reduce", "graph_coreness",
}

# r11 rotation (VERDICT r10 task 1): the three strongest below-window
# semantic oracles enter the window this round.
R11_IN = {"orders_diff", "bloom_pruned_join", "entity_resolve_incremental"}
R11_OUT = {"nbayes_predict", "audio_match_pairs", "topic_clusters"}


@pytest.fixture(scope="module")
def ledger():
    return build_ledger()


def test_window_is_first_50_and_fully_oracle_backed(ledger):
    names = list(entry.queries())
    window = names[:WINDOW_SIZE]
    assert ledger["window"] == window
    assert len(window) == WINDOW_SIZE
    # r11 upgraded the last rows-only window row (topic_clusters) to an
    # oracle-backed one; the window must stay 100% oracle-backed now.
    missing = [n for n in window if n not in entry.oracle_sql()]
    assert missing == [], f"rows-only rows in window: {missing}"


def test_rows_only_set_is_exactly_the_carveouts():
    rows_only = set(entry.queries()) - set(entry.oracle_sql())
    assert rows_only == ROWS_ONLY_CARVEOUTS


def test_r11_rotation_applied(ledger):
    window = set(ledger["window"])
    assert R11_IN <= window
    assert not (R11_OUT & window)
    # evicted queries stay registered with their oracle parity intact
    for n in R11_OUT - {"topic_clusters"}:  # topic_clusters is rows-only
        assert n in entry.oracle_sql(), n
    assert R11_OUT <= set(entry.queries())
    r11 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 11]
    assert dict(r11) == {"nbayes_predict": "orders_diff",
                         "audio_match_pairs": "bloom_pruned_join",
                         "topic_clusters": "entity_resolve_incremental"}


def test_rotations_reverse_replay_to_consistent_base(ledger):
    """Reverse-applying the recorded swaps must succeed (every named
    query still registered) and put each rotated-IN query back below
    the window — i.e. the history genuinely explains the composition."""
    names = list(entry.queries())
    for rnd, out, inn in reversed(ledger["rotations"]):
        i, j = names.index(inn), names.index(out)
        assert i < j, (rnd, out, inn)
        names[i], names[j] = names[j], names[i]
    base_window = set(names[:WINDOW_SIZE])
    for rnd, out, inn in ledger["rotations"]:
        # in the pre-r9 base order every later-rotated-in query sat
        # below the window unless a prior swap moved it
        assert out in set(names), out
        assert inn in set(names), inn
    assert R11_IN & base_window == set()


def test_no_correctness_key_was_silently_dropped():
    """Every query the driver ever verified must still be registered —
    renaming/removing one would silently erase its audit trail. Rounds
    1-2 predate the r3 registration consolidation (redundant early-era
    entries were merged under names recorded in SURVEY's r3 notes), so
    the invariant is pinned from r3 forward."""
    registered = set(entry.queries())
    for rnd, rows in load_correctness().items():
        if rnd < 3:
            continue
        missing = set(rows) - registered
        assert not missing, f"round {rnd} keys gone: {missing}"


def test_rotated_in_queries_were_backlog(ledger):
    """The r11 IN-rotations specifically drain the never-driver-seen
    backlog: none of them may appear in any past CORRECTNESS file."""
    for n in R11_IN:
        assert ledger["rows"][n]["rounds_seen"] == [], n


def test_backlog_and_summary_shape(ledger):
    s = ledger["summary"]
    assert s["registered"] == len(entry.queries())
    assert s["window_oracle_backed"] == WINDOW_SIZE
    assert s["ever_driver_seen"] + s["never_driver_seen_backlog"] \
        + sum(1 for n in ledger["window"]
              if not ledger["rows"][n]["rounds_seen"]) == s["registered"]
    # evicted-but-previously-green queries keep their parity in pytest:
    for n, r in ledger["rows"].items():
        if r["rounds_seen"] and not r["in_window_now"]:
            assert r["oracle_backed"] or n in ROWS_ONLY_CARVEOUTS, n
