"""Composed survival-analysis plan: ONE call assembling the package's
full time-to-event battery over a single durations frame — the
"retention report" a lifecycle platform renders per cohort, wired so
a user gets the methodology (curve + hazard + the horizon scalar +
the two-arm comparison) without knowing each operator's name.

All outputs are LAZY DataFrames sharing one mergeable km_counts
collapse where the estimators allow it (km / nelson_aalen read the
SAME per-(group, duration) count state — computed once, reused).
With share_state=True (default) the shared collapse is materialized
eagerly at assembly (one bounded action; see survival_report);
everything else executes only when the caller shows/collects a
section. Sections:

  km          km_from_counts           — the survival curve S(t)
  band        km_greenwood_from_counts — Greenwood SE + ±z band on
                                         the same curve (r14)
  hazard      nelson_aalen_from_counts — cumulative hazard H(t) (the
                                         additive read of the same
                                         state; exp(-H) left to
                                         callers — libm exp is not
                                         cross-engine exact)
  rmst        km_rmst                  — area under S(t) to horizon τ:
                                         "mean active days in the
                                         first τ", defined even when
                                         median survival is not
  logrank     km_logrank               — only when variant_col +
                                         control/treatment given:
                                         did the arms' curves differ
                                         (the A/B readout for
                                         durations)

The input contract is the family's: one row per subject with a
bucketed duration (user_durations produces it from raw events) and a
0/1 event flag (1 = observed event, 0 = right-censored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import survival as sv


def survival_report(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    tau: float = 30.0,
    group_by: "list[str] | None" = None,
    variant_col: "str | None" = None,
    control: "str | None" = None,
    treatment: "str | None" = None,
    round_dp: int = 4,
    share_state: bool = True,
) -> "dict[str, DataFrame]":
    """Assemble the lazy readout dict described in the module
    docstring. `logrank` appears only when `variant_col`, `control`
    and `treatment` are all provided.

    `share_state=True` (default) lifecycle-persists the two frames
    every section reads — the caller's durations frame and the
    km_counts collapse — so consuming all sections (or their keyed
    join, the driver row) computes the subject scan ONCE instead of
    once per section: Catalyst's ReuseExchange does not fire across
    the sections' slightly-different downstream projections (measured
    r14: the un-persisted 4-section join re-scanned events 4x). The
    frames are registered with lifecycle.track_persist, so a
    long-running session reclaims them with release_all().

    RELEASE CONTRACT (r14 default change, ADVICE-noted): because
    share_state now defaults to True, a previously pure
    plan-assembly call acquires cached state as a side effect. After
    consuming the sections, call
    ``operators.lifecycle.release_all()`` (idempotent; safe even if
    the session crashed mid-consume — see the lifecycle tests in
    tests/test_survival.py) or pass
    ``share_state=False`` to keep the call pure. Sessions that
    never release simply hold the two bounded persists until
    teardown — correct but memory-resident."""
    gb = list(group_by or [])
    if share_state:
        from ..operators.lifecycle import track_persist
        df = track_persist(df)
    counts = sv.km_counts(df, duration_col, event_col, gb)
    if share_state:
        counts = track_persist(counts)
        # materialize the shared state NOW (one bounded action: the
        # collapse is <= |groups| x |distinct durations| rows). The
        # sections' consumers — typically a multi-way join whose
        # broadcast sides build CONCURRENTLY — would otherwise race
        # on the not-yet-materialized caches and each recompute the
        # full subject scan (r16, same failure shape as the dsir
        # model fan-out); computing counts once here also warms the
        # durations cache it reads through.
        counts.count()
    out: "dict[str, DataFrame]" = {
        "km": sv.km_from_counts(counts, gb, round_dp),
        "band": sv.km_greenwood_from_counts(counts, gb,
                                            round_dp=round_dp),
        "hazard": sv.nelson_aalen_from_counts(counts, gb, round_dp),
        "rmst": sv.km_rmst(df, duration_col, event_col, tau, gb,
                           round_dp),
    }
    if variant_col and control is not None and treatment is not None:
        out["logrank"] = sv.km_logrank(
            df, duration_col, event_col, variant_col, control,
            treatment, group_by=gb, round_dp=round_dp)
    return out
