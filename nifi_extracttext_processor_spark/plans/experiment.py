"""Composed experiment-analysis plan: ONE call that assembles the
package's full A/B readout battery over a single experiment frame —
the "experiment report" a metrics platform renders per experiment,
wired here so a user gets the methodology (guardrails first, robust
variants beside the plain test, peek-safe monitors beside the
fixed-horizon readout) without knowing each operator's name.

All outputs are LAZY DataFrames sharing the one filtered input scan;
nothing executes until the caller shows/collects a section. Sections:

  srm            ab_srm_check        — guardrail: was the split itself
                                       broken? (read FIRST; a failed
                                       SRM invalidates everything below)
  balance        ab_covariate_balance — randomization health on the
                                        caller's covariates
  welch          ab_welch_test        — the fixed-horizon primary
  winsorized     ab_welch_test_winsorized — heavy-tail robustness twin
  quantile_lift  ab_quantile_lift     — distributional movement
  msprt          ab_msprt             — the peek-safe monitor
  anova          ab_anova             — k-arm omnibus (ALL variants,
                                        not just control/treatment)
  did            ab_diff_in_diff      — only when ts_col + split given:
                                        nets out shared time shocks
  power          ab_power_mde         — the control arm's baseline as
                                        next-experiment planning input
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import abtest as ab


def experiment_report(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
    expected_ratios: "dict[str, float] | None" = None,
    covariates: "list[str] | None" = None,
    group_by: "list[str] | None" = None,
    ts_col: "str | None" = None,
    split: "str | None" = None,
    tau2: float = 1.0,
    trim: float = 0.05,
    quantiles: "list[float] | None" = None,
    mde_rel: float = 0.05,
    share_state: bool = True,
) -> "dict[str, DataFrame]":
    """Assemble the lazy readout dict described in the module
    docstring. `expected_ratios` defaults to a 50/50
    control/treatment split for the SRM guardrail; `did` appears
    only when both `ts_col` and `split` are provided.

    `share_state=True` (default) lifecycle-persists the experiment
    frame so consuming all sections (or their keyed join, the driver
    row) scans the source ONCE instead of once per section — the
    same measured ReuseExchange gap survival_report closes
    (plans/survival.py); reclaim with lifecycle.release_all()."""
    gb = list(group_by or [])
    if share_state:
        from ..operators.lifecycle import track_persist
        df = track_persist(df)
        # materialize now: the sections' consumers (a multi-way join
        # whose broadcast sides build concurrently) would race on the
        # lazy cache and each recompute the source scan (r16, same
        # fix as survival_report)
        df.count()
    out: "dict[str, DataFrame]" = {}
    ratios = expected_ratios or {control: 0.5, treatment: 0.5}
    out["srm"] = ab.ab_srm_check(df, variant_col, ratios,
                                 group_by=gb)
    if covariates:
        # covariate balance reads across the whole experiment (no
        # per-group split — SMDs are covariate-level by design)
        out["balance"] = ab.ab_covariate_balance(
            df, variant_col, covariates, control, treatment)
    out["welch"] = ab.ab_welch_test(df, variant_col, value_col,
                                    control, treatment, group_by=gb)
    out["winsorized"] = ab.ab_welch_test_winsorized(
        df, variant_col, value_col, control, treatment,
        group_by=gb, trim=trim)
    out["quantile_lift"] = ab.ab_quantile_lift(
        df, variant_col, value_col, control, treatment,
        probs=tuple(quantiles or (0.5, 0.9, 0.99)), group_by=gb)
    out["msprt"] = ab.ab_msprt(df, variant_col, value_col, control,
                               treatment, group_by=gb, tau2=tau2)
    out["anova"] = ab.ab_anova(df, variant_col, value_col,
                               group_by=gb)
    if ts_col is not None and split is not None:
        out["did"] = ab.ab_diff_in_diff(
            df, variant_col, value_col, ts_col, control, treatment,
            split, group_by=gb)
    out["power"] = ab.ab_power_mde(
        df.filter(F.col(variant_col) == control), value_col,
        group_by=gb, mde_rel=mde_rel)
    return out
