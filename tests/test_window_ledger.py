"""Machine-checked driver-window composition + rotation-debt ledger
(VERDICT r10 task 3). Replaces prose-tracking of the 50-slot window:
every invariant the rotation policy promises is asserted here from the
actual artifacts (registration order, ROTATIONS history, and the
CORRECTNESS_r*.json files the driver wrote).

Regression note (VERDICT r11 what's-wrong #1): the backlog invariant
must be asserted as "never driver-seen BEFORE the rotation's own round",
never as "seen in no artifact at all" — the driver writes
CORRECTNESS_r{N}.json for round N *after* the builder's final suite run,
so an absolute emptiness assertion goes red the moment the round's own
artifact lands. Every assertion below is therefore cut off at each
rotation's recorded round tag, so artifact arrival can never re-break
the suite.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from window_ledger import WINDOW_SIZE, build_ledger, load_correctness

# The documented rows-only carve-outs (non-SQL-expressible; the driver
# records a weaker rows-only check for these). Adding ANY member back
# requires a written rationale at its registration site AND here.
# r13 drained the set from 5 to 2; r14 drained it to EMPTY
# (VERDICT r13 task 6) via the pca_reduce precedent — frozen-literal
# inference state with an exact SQL twin, training pytest-pinned:
#   - bpe_tokenize: re-registered over FROZEN_BPE_MERGES (64 merges,
#     trained once on sf0.01, checked in); twin = chained
#     leftmost-first replace() rewrites over US-delimited symbol
#     strings (tokenize_fixed.bpe_apply_fixed_sql). The merge LOOP
#     stays pytest-vs-reference in tests/test_tokenize.py.
#   - unigram_tokenize: re-registered over FROZEN_UNIGRAM_VOCAB (262
#     pieces); twin = 12-position unrolled Viterbi DP with
#     (score, piece_len, n_pieces) struct argmax + error() past the
#     unroll (tokenize_fixed.unigram_apply_fixed_sql). EM training
#     stays pytest-pinned in tests/test_unigram.py.
# Historical r13 rationale (superseded):
#   - approx_top_terms: re-registered as the two-pass MG-candidates ->
#     exact-recount variant, deterministic under the pytest-asserted
#     f_k > n/capacity membership bound; twin = the exact aggregate.
#   - pca_reduce: re-registered with deterministic literal
#     (mean, components) projected by the unrolled-Catalyst expr path;
#     twin = pca_project_sql (bit-exact left-fold chain). The eigen
#     FIT stays pytest-vs-numpy.
#   - graph_coreness: h-index rounds unrolled 8x for the SF-invariant
#     37-node seed graph (measured fixpoint: 4 sweeps; idempotent
#     beyond it); twin = core_numbers_unrolled_sql.
ROWS_ONLY_CARVEOUTS: set[str] = set()

# r12 rotation (VERDICT r11 tasks 2+3): throughput raised to 9 swaps so
# the backlog falls below 90 and keeps falling.
R12_PAIRS = {
    "zorder_key": "hilbert_key",
    "decontaminate": "contamination_report",
    "dedup_lines": "hll_token_distinct",
    "repetition_stats": "ab_bootstrap_ci",
    "sentence_split": "events_km_survival",
    "multimodal_av": "binary_eval_metrics",
    "pack_sequences": "fuzzy_edit_join",
    "top_terms": "rrf_fuse_topk",
    "events_interval_join": "events_funnel",
}
R12_IN = set(R12_PAIRS.values())
R12_OUT = set(R12_PAIRS)

# r13 rotation (VERDICT r12 task 3): 10 swaps, every incoming row
# pre-verified at sf0.001 + sf0.01 under the dtype-exact battery.
R13_PAIRS = {
    "scrub_pii": "events_km_logrank",
    "lang_quality": "ab_bootstrap_ratio",
    "token_fingerprint": "ab_jackknife",
    "gopher_flags": "ab_post_stratified",
    "dedup_exact": "kmv_audience_overlap",
    "ann_topk": "ab_msprt_value",
    "events_sessionize": "events_retention",
    "events_window_agg": "events_transitions",
    "multimodal_image": "attribution_position",
    "warc_roundtrip": "time_to_convert_hist",
}
R13_IN = set(R13_PAIRS.values())
R13_OUT = set(R13_PAIRS)

# queries first registered in r14 (backlog INFLOW, not debt)
R14_NEW = {
    "survival_report",
    "experiment_report",
    "events_km_greenwood",
    "events_competing_risks",
    "events_cusum",
    "eval_brier_decomposition",
    "zipf_fit_by_lang",
    "ab_kruskal_wallis",
    "events_seasonal_decompose",
    "ab_mood_median",
    "events_durbin_watson",
    "events_runs_test",
}

# r14 rotation (VERDICT r13 tasks 1+5): 16 swaps — the pytest-seasoned
# r13 inflow, the two-round-seasoned r12 statistical tail, and the two
# composed-plan rows. Every incoming row pre-verified dtype-exact at
# sf0.001 + sf0.01 this round; every eviction has >= 2 prior greens.
R14_PAIRS = {
    "host_pagerank": "doc_link_components_large",
    "binary_eval_metrics": "eval_roc_auc",
    "contamination_report": "ab_ca_trend",
    "ab_bootstrap_ci": "ab_brown_forsythe",
    "hll_token_distinct": "events_nelson_aalen",
    "fuzzy_edit_join": "events_km_rmst",
    "events_funnel": "events_pettitt",
    "hilbert_key": "corr_spearman_events",
    "kn_perplexity": "ab_wilcoxon_signed",
    "events_scd2": "ab_mann_whitney",
    "bm25_topk": "bh_fdr_sweep",
    "robots_filter": "ab_cuped_adjusted",
    "semantic_dedup": "ab_srm_guardrail",
    "exact_substring_dedup": "ab_diff_in_diff",
    "bloom_pruned_join": "survival_report",
    "image_phash_pairs": "experiment_report",
}
R14_IN = set(R14_PAIRS.values())
R14_OUT = set(R14_PAIRS)

# r15 rotation (VERDICT r14 task 2): CONSOLIDATION — zero new
# operators, 15 swaps (the max the >=2-prior-greens bar allows; every
# other non-anchor window row is an r14 debut with one green). The
# incoming rows are exactly VERDICT r14's priority list.
R15_PAIRS = {
    "events_km_survival": "events_km_greenwood",
    "events_km_logrank": "events_competing_risks",
    "events_transitions": "events_cusum",
    "events_retention": "events_seasonal_decompose",
    "time_to_convert_hist": "events_durbin_watson",
    "orders_diff": "events_runs_test",
    "ab_post_stratified": "ab_kruskal_wallis",
    "ab_msprt_value": "ab_mood_median",
    "ab_bootstrap_ratio": "ab_odds_ratio",
    "ab_jackknife": "ab_paired_t",
    "attribution_position": "ab_mh_odds_ratio",
    "kmv_audience_overlap": "eval_brier_decomposition",
    "k_anonymity_audit": "zipf_fit_by_lang",
    "rrf_fuse_topk": "bpe_tokenize",
    "entity_resolve_incremental": "unigram_tokenize",
}
R15_IN = set(R15_PAIRS.values())
R15_OUT = set(R15_PAIRS)

# r16 rotation (VERDICT r15 tasks 1+2): 19 swaps — 15 never-driver-
# seen rows in (core-SQL trio + semantic_dedup_incremental first) AND
# 4 of the oldest STALE greens re-rotated (~1/3 of the swap budget).
# Evictions: the 16 r14-debut rows with exactly 2 greens, plus three
# 10-to-14-green family reps whose seat transfers to the incoming
# stale sibling of the same family.
R16_PAIRS = {
    "quality_score": "tfidf_top_terms",
    "dedup_near_pairs": "dedup_clusters",
    "ann_topk_ivf_indexed": "ann_topk_lsh_indexed",
    "ab_mann_whitney": "knn_recall",
    "corr_spearman_events": "sql_window_rank",
    "bh_fdr_sweep": "sql_having_bigspenders",
    "eval_roc_auc": "sql_above_avg_orders",
    "doc_link_components_large": "semantic_dedup_incremental",
    "ab_ca_trend": "fs_link_scores",
    "ab_brown_forsythe": "revenue_theil",
    "events_nelson_aalen": "events_anomaly",
    "events_km_rmst": "events_top_paths",
    "events_pettitt": "events_changepoints",
    "ab_cuped_adjusted": "ab_group_sequential",
    "ab_srm_guardrail": "events_robust_trend",
    "ab_wilcoxon_signed": "user_rfm",
    "ab_diff_in_diff": "growth_accounting_daily",
    "survival_report": "profile_events",
    "experiment_report": "dsir_weights",
}
R16_IN = set(R16_PAIRS.values())
R16_OUT = set(R16_PAIRS)
# The 4 STALE-green re-rotations (previously driver-green at r5-r7,
# below window since; VERDICT r15 task 2 directs paying down stale
# attestations alongside the never-seen drain). These legitimately
# HAVE pre-r16 driver rows — test_rotated_in_queries_were_backlog
# exempts exactly this documented set.
R16_STALE_IN = {
    "tfidf_top_terms", "dedup_clusters",
    "ann_topk_lsh_indexed", "knn_recall",
}

R17_PAIRS = {
    "ab_odds_ratio": "chunk_documents",
    "ab_paired_t": "dedup_by_url",
    "ab_kruskal_wallis": "length_histogram",
    "events_cusum": "corpus_summary",
    "eval_brier_decomposition": "ab_bootstrap_ci",
    "ab_mood_median": "char_lm_score",
    "ab_mh_odds_ratio": "fuzzy_edit_join",
    "zipf_fit_by_lang": "doc_link_components",
    "events_competing_risks": "graph_coreness",
    "events_durbin_watson": "host_hits",
    "events_runs_test": "lm_buckets",
    "events_seasonal_decompose": "pretrain_mix_select",
    "unigram_tokenize": "fuzzy_jaccard_join",
    "tfidf_top_terms": "bm25_pairs",
    "knn_recall": "lang_id_ngram",
    "dedup_clusters": "pq_topk",
    "ann_topk_lsh_indexed": "calibration_ece",
}
R17_IN = set(R17_PAIRS.values())
R17_OUT = set(R17_PAIRS)
# 7 STALE re-attestations (scheduled anchors + the rows whose code
# this round touched — they return so the driver hashes the current
# plans); the other 10 are never-seen drains.
R17_STALE_IN = {
    "chunk_documents", "dedup_by_url", "length_histogram",
    "corpus_summary", "ab_bootstrap_ci", "char_lm_score",
    "fuzzy_edit_join",
}

# queries first registered in r13 (backlog INFLOW, not debt)
R13_NEW = {
    "doc_link_components_large",
    "events_nelson_aalen",
    "events_km_rmst",
    "ab_ca_trend",
    "events_pettitt",
    "eval_roc_auc",
    "corr_spearman_events",
    "ab_wilcoxon_signed",
    "ab_brown_forsythe",
    "events_pivot_monthly",
}


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


def _evicted_after(ledger, rnd):
    """Rows a LATER recorded rotation evicted — rN-in rows stay seated
    only until some later round's swap takes the seat back."""
    return {o for r2, o, _i in ledger["rotations"] if r2 > rnd}


def _readmitted_after(ledger, rnd):
    """Rows a LATER recorded rotation brought back into the window —
    the stale-green re-attestation path (r16 onward) makes
    "out at rN" non-terminal, so the per-round eviction asserts must
    exempt exactly the recorded re-admissions."""
    return {i for r2, _o, i in ledger["rotations"] if r2 > rnd}


def test_r12_rotation_applied(ledger):
    window = set(ledger["window"])
    # r12-in rows stay in the window until a LATER recorded rotation
    # evicts them (they then must have had >= 2 greens — asserted in
    # the later round's own test); the historical swap record and the
    # driver artifact both still prove the r12 composition.
    later_out = R14_OUT | R15_OUT | R16_OUT
    assert R12_IN - later_out <= window
    for n in R12_IN & later_out:
        assert 12 in ledger["rows"][n]["rounds_seen"], n
    assert not (R12_OUT & window - _readmitted_after(ledger, 12))
    # evicted queries stay registered with their oracle parity intact
    for n in R12_OUT:
        assert n in entry.oracle_sql(), n
    assert R12_OUT <= set(entry.queries())
    r12 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 12]
    assert dict(r12) == R12_PAIRS


def test_r13_rotation_applied(ledger):
    window = set(ledger["window"])
    # r13-in rows stay until a LATER recorded rotation evicts them
    # (the r15 consolidation evicted ten, each with >= 2 greens —
    # asserted in test_r15_rotation_applied)
    assert R13_IN - R15_OUT - R16_OUT <= window
    for n in R13_IN & (R15_OUT | R16_OUT):
        assert 13 in ledger["rows"][n]["rounds_seen"], n
    assert not (R13_OUT & window - _readmitted_after(ledger, 13))
    for n in R13_OUT:
        assert n in entry.oracle_sql(), n
    assert R13_OUT <= set(entry.queries())
    r13 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 13]
    assert dict(r13) == R13_PAIRS
    # r13 policy bar: >= 2 prior green rounds for every eviction
    for out in R13_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"]
                  if r < 13]
        assert len(greens) >= 2, (out, greens)


def test_r14_rotation_applied(ledger):
    window = set(ledger["window"])
    # r14-in rows stay until a LATER recorded rotation evicts them
    # (the r16 rotation evicted 16, each with exactly 2 greens —
    # asserted in test_r16_rotation_applied)
    assert R14_IN - R16_OUT <= window
    for n in R14_IN & R16_OUT:
        assert 14 in ledger["rows"][n]["rounds_seen"], n
    assert not (R14_OUT & window - _readmitted_after(ledger, 14))
    for n in R14_OUT:
        assert n in entry.oracle_sql(), n
    assert R14_OUT <= set(entry.queries())
    r14 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 14]
    assert dict(r14) == R14_PAIRS
    # policy bar: >= 2 prior green rounds for every eviction
    for out in R14_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"]
                  if r < 14]
        assert len(greens) >= 2, (out, greens)


def test_r15_rotation_applied(ledger):
    window = set(ledger["window"])
    assert R15_IN - _evicted_after(ledger, 15) <= window
    assert not (R15_OUT & window - _readmitted_after(ledger, 15))
    for n in R15_OUT:
        assert n in entry.oracle_sql(), n
    assert R15_OUT <= set(entry.queries())
    r15 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 15]
    assert dict(r15) == R15_PAIRS
    # policy bar: >= 2 prior green rounds for every eviction
    for out in R15_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"]
                  if r < 15]
        assert len(greens) >= 2, (out, greens)


def test_r16_rotation_applied(ledger):
    window = set(ledger["window"])
    assert R16_IN - _evicted_after(ledger, 16) <= window
    assert not (R16_OUT & window - _readmitted_after(ledger, 16))
    for n in R16_OUT:
        assert n in entry.oracle_sql(), n
    assert R16_OUT <= set(entry.queries())
    r16 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 16]
    assert dict(r16) == R16_PAIRS
    # policy bar: >= 2 prior green rounds for every eviction
    for out in R16_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"]
                  if r < 16]
        assert len(greens) >= 2, (out, greens)
    # the never-seen 15 genuinely drain the backlog; the stale 4 are
    # re-attestations with r5-r7 greens on record
    for n in R16_IN - R16_STALE_IN:
        assert not ledger["rows"][n]["rounds_green"] or \
            min(ledger["rows"][n]["rounds_green"]) >= 16, n
    for n in R16_STALE_IN:
        greens = ledger["rows"][n]["rounds_green"]
        assert greens and min(greens) < 16, (n, greens)


def test_r17_rotation_applied(ledger):
    window = set(ledger["window"])
    assert R17_IN <= window
    assert not (R17_OUT & window - _readmitted_after(ledger, 17))
    for n in R17_OUT:
        assert n in entry.oracle_sql(), n
    assert R17_OUT <= set(entry.queries())
    r17 = [(o, i) for rnd, o, i in ledger["rotations"] if rnd == 17]
    assert dict(r17) == R17_PAIRS
    # policy bar: >= 2 prior green rounds for every eviction
    for out in R17_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"]
                  if r < 17]
        assert len(greens) >= 2, (out, greens)
    # 10 never-seen drains; 7 stale re-attestations with old greens
    for n in R17_IN - R17_STALE_IN:
        assert not ledger["rows"][n]["rounds_green"] or \
            min(ledger["rows"][n]["rounds_green"]) >= 17, n
    for n in R17_STALE_IN:
        greens = ledger["rows"][n]["rounds_green"]
        assert greens and min(greens) < 17, (n, greens)
    # family continuity the rotation note promises
    assert "events_km_greenwood" in window      # survival rep stays
    assert "bpe_tokenize" in window             # frozen-tokenizer rep


def test_r15_consolidation_zero_inflow(ledger):
    """r15 registered ZERO new queries (VERDICT r14 task 2: hold
    inflow near zero for a round): the registry stays at 244 and the
    backlog shrinks by exactly the 15 rotated-in rows: 137 -> 122."""
    assert ledger["summary"]["registered"] == 244
    assert ledger["summary"]["never_driver_seen_backlog"] <= 122


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
        assert out in set(names), out
        assert inn in set(names), inn
    assert R12_IN & base_window == set()
    assert R13_IN & base_window == set()
    assert R14_IN & base_window == set()
    assert R15_IN & base_window == set()
    assert R16_IN & base_window == set()
    # r17 stale re-attestations may have been ORIGINAL window members
    # (rotated out r6-r14); only the never-seen drains must replay to
    # below the base window
    assert (R17_IN - R17_STALE_IN) & base_window == set()


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
    """Every rotated-IN query drains the never-driver-seen backlog:
    none may appear in any CORRECTNESS artifact from BEFORE its own
    rotation round. (Cut off at the rotation round, not at "ever" —
    the driver writes the rotation round's own artifact after the
    builder ships, which is expected and fine; see module docstring.)

    Exception from r16 (VERDICT r15 task 2): documented STALE-GREEN
    re-rotations — rows previously driver-green, parked below the
    window >= 3 rounds, brought back for re-attestation. Each must be
    listed in its round's R*_STALE_IN set; anything else with early
    rows is still a policy violation."""
    stale_ok = R16_STALE_IN | R17_STALE_IN
    for rnd, _out, inn in ledger["rotations"]:
        if inn in stale_ok:
            continue
        early = [r for r in ledger["rows"][inn]["rounds_seen"] if r < rnd]
        assert early == [], (inn, rnd, early)


def test_every_evicted_query_had_a_green_round(ledger):
    """Rotation policy: a window slot may be evicted only after the
    query it held was driver-verified green at least once (r12 policy:
    the current round's evictions all have >= 2). Asserted from the
    artifacts for every executed rotation."""
    for rnd, out, _inn in ledger["rotations"]:
        greens = [r for r in ledger["rows"][out]["rounds_green"] if r < rnd]
        assert greens, f"{out} evicted at r{rnd} with no prior green round"
    # the r12 batch specifically: >= 2 prior green rounds each
    for out in R12_OUT:
        greens = [r for r in ledger["rows"][out]["rounds_green"] if r < 12]
        assert len(greens) >= 2, (out, greens)


# queries first registered in r12 (new surface, legitimately
# never-driver-seen — they are the backlog's INFLOW, not its debt)
R12_NEW = {
    "ab_mann_whitney", "bh_fdr_sweep", "ab_ratio_delta",
    "attribution_position", "lexical_diversity_by_lang",
    "cohen_kappa_docs", "data_quality_orders",
    "time_to_convert_hist", "ab_post_stratified",
    "fim_transform_docs", "epoch_shuffle_docs", "ab_jackknife",
    "growth_accounting_daily", "session_stats_daily",
    "multiclass_eval", "embedding_outliers", "ab_covariate_balance",
    "user_rfm", "target_encode_events", "events_cube",
    "dedup_savings", "token_fertility_by_lang",
    "events_funnel_windowed", "revenue_concentration",
    "lang_source_association", "cohort_ltv_daily",
    "join_fanout_orders", "benford_values",
    "kmv_doc_distinct", "kmv_audience_overlap",
    "ab_msprt_value", "ab_power_events",
    "events_ses_forecast", "events_lead_lag",
    "revenue_decomposition", "events_ks_value",
    "doc_link_components", "ab_anova_value", "doc_link_bfs",
    "events_holt_forecast", "user_interarrival",
    "events_forecast_backtest", "custkey_topk_turnover",
    "ab_diff_in_diff", "fs_link_scores", "revenue_theil",
    "ab_group_sequential", "events_robust_trend", "ab_odds_ratio",
    "user_conv_shrunk", "ab_paired_t", "ab_mh_odds_ratio",
}


def test_backlog_is_draining(ledger):
    """VERDICT r11 task 3 'done' bar: the PRE-r12 backlog (98 at r11
    close) drains to <= 89 after the r12 rotation, and the recorded
    r12 throughput is 6+ swaps. New registrations this round are
    excluded from the drain measure (they are inflow); the gross
    bound still caps total backlog at drained-debt + inflow."""
    backlog = set(ledger["backlog"])
    assert len(backlog - R12_NEW - R13_NEW - R14_NEW) <= 89
    assert len(backlog) <= 89 + len(R12_NEW) + len(R13_NEW) \
        + len(R14_NEW)
    assert sum(1 for rnd, _, _ in ledger["rotations"] if rnd == 12) >= 6
    # r13 drain bar (VERDICT r12 task 3): >= 9 swaps, pre-r13 backlog
    # falls from 141 at r12 close to <= 131 (10 rotated in); new r13
    # registrations are inflow, measured separately
    assert sum(1 for rnd, _, _ in ledger["rotations"] if rnd == 13) >= 9
    assert len(backlog - R13_NEW - R14_NEW) <= 131
    assert len(backlog) <= 131 + len(R13_NEW) + len(R14_NEW)
    # r14 drain bar (VERDICT r13 task 1): >= 14 swaps, backlog < 130
    # after rotating 16 in (new r14 registrations are inflow)
    assert sum(1 for rnd, _, _ in ledger["rotations"] if rnd == 14) >= 14
    assert len(backlog - R14_NEW) <= 127
    # r16 drain bar (VERDICT r15 task 1): 19 swaps, 15 of them
    # never-driver-seen -> backlog 122 -> 107 with zero inflow
    assert sum(1 for rnd, _, _ in ledger["rotations"] if rnd == 16) >= 19
    assert len(backlog) <= 107


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
