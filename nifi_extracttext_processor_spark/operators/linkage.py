"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
1969) — the weighting layer ABOVE the candidate-pair machinery this
package already has (fuzzy_join's q-gram edit joins, the
entity_resolution blocking plan): given candidate pairs with per-field
agreement flags and a labeled sample, learn each field's evidential
weight and score every pair as a log-likelihood ratio.

    m_i = P(field i agrees | pair is a match)
    u_i = P(field i agrees | pair is a non-match)
    w_agree_i    = log2(m_i / u_i)          (> 0: agreement is evidence FOR)
    w_disagree_i = log2((1−m_i) / (1−u_i))  (< 0: disagreement against)
    score(pair)  = Σ_i  agree_i ? w_agree_i : w_disagree_i

A rare field agreeing (low u — e.g. exact email) earns a large
positive weight; a common field agreeing (high u — e.g. same country)
earns almost none. That calibration is what plain "count matching
fields" scoring lacks.

Estimation here is the supervised form (labeled sample in, Laplace
0.5 smoothing so no weight is ±∞); the classic unsupervised EM
(Winkler 1988) needs iterative driver-side refitting of the same
sufficient statistics and is out of scope — the labeled path is what
a pipeline with any adjudicated pairs runs first anyway.

Scale shape: fs_weights is ONE conditional-sum aggregate over the
labeled pairs (2·F sufficient counts, F = #fields). fs_score_pairs
embeds the ≤F learned weights as LITERALS in a narrow projection
(the ≤P-row planner rule — no join against a weights table), so
scoring 10^12 candidate pairs is one zero-shuffle map. log2 runs at
weight-DERIVATION time over an F-row table, rounded (the
kn_perplexity precedent); scoring itself is pure float addition of
embedded constants.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround



def fs_weights(
    labeled: DataFrame,
    agree_cols: "list[str]",
    label_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """(field, n_match, n_nonmatch, m, u, w_agree, w_disagree) from a
    labeled pair sample. `agree_cols` are boolean/0-1 agreement
    flags; `label_col` is boolean/0-1 (1 = adjudicated match). NULL
    agreement flags count as disagreement for that field's estimate
    (conservative); NULL labels are excluded. Laplace 0.5 smoothing
    keeps every weight finite."""
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    lab = F.col(label_col).cast("int")
    base = labeled.filter(lab.isNotNull()) \
        .select(lab.alias("__m"),
                *[F.coalesce(F.col(c).cast("int"), F.lit(0))
                  .alias(c) for c in agree_cols])
    aggs = [F.sum("__m").alias("__nm"),
            F.sum(1 - F.col("__m")).alias("__nu")]
    for c in agree_cols:
        aggs.append(F.sum(F.col(c) * F.col("__m")).alias("a_" + c))
        aggs.append(F.sum(F.col(c) * (1 - F.col("__m")))
                    .alias("b_" + c))
    one = base.agg(*aggs)
    rows = []
    for c in agree_cols:
        m = (F.col("a_" + c).cast("double") + 0.5) \
            / (F.col("__nm").cast("double") + 1.0)
        u = (F.col("b_" + c).cast("double") + 0.5) \
            / (F.col("__nu").cast("double") + 1.0)
        rows.append(F.struct(
            F.lit(c).alias("field"),
            F.col("__nm").alias("n_match"),
            F.col("__nu").alias("n_nonmatch"),
            dround(m, round_dp).alias("m"),
            dround(u, round_dp).alias("u"),
            (dround(F.log2(m / u), round_dp) + F.lit(0.0))
            .alias("w_agree"),
            (dround(F.log2((F.lit(1.0) - m) / (F.lit(1.0) - u)),
                     round_dp) + F.lit(0.0)).alias("w_disagree")))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def fs_weights_sql(
    table: str,
    agree_cols: "list[str]",
    label_col: str,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of fs_weights (same conditional sums, same
    smoothing and log2 arithmetic, rows via UNION ALL per field)."""
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    from ..sqlutil import sql_lit
    lab = f"CAST({label_col} AS INT)"
    aggs = [f"sum({lab}) AS nm", f"sum(1 - {lab}) AS nu"]
    for c in agree_cols:
        flag = f"coalesce(CAST({c} AS INT), 0)"
        aggs.append(f"sum({flag} * {lab}) AS a_{c}")
        aggs.append(f"sum({flag} * (1 - {lab})) AS b_{c}")
    arms = []
    for i, c in enumerate(agree_cols):
        m = f"((CAST(a_{c} AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))"
        u = f"((CAST(b_{c} AS DOUBLE) + 0.5) / (CAST(nu AS DOUBLE) + 1.0))"
        arms.append(f"""
  SELECT {i} AS ord, {sql_lit(c)} AS field, nm AS n_match,
         nu AS n_nonmatch,
         round({m}, {round_dp}) AS m, round({u}, {round_dp}) AS u,
         round(log2({m} / {u}), {round_dp}) + 0.0 AS w_agree,
         round(log2((1.0 - {m}) / (1.0 - {u})), {round_dp}) + 0.0
           AS w_disagree
  FROM one""")
    union = " UNION ALL ".join(arms)
    return f"""
WITH one AS (
  SELECT {', '.join(aggs)} FROM {table}
  WHERE {label_col} IS NOT NULL
)
SELECT field, n_match, n_nonmatch, m, u, w_agree, w_disagree
FROM ({union}) ORDER BY ord
"""


def fs_score_pairs(
    pairs: DataFrame,
    weights: "dict[str, tuple[float, float]]",
    round_dp: int = 4,
) -> DataFrame:
    """pairs + fs_score: Σ per field of (agree ? w_agree :
    w_disagree), with the learned weights passed as the PLAIN DICT
    {field: (w_agree, w_disagree)} — derive it once via
    `{r['field']: (r['w_agree'], r['w_disagree']) for r in
    fs_weights(...).collect()}` (an F-row driver read, the ≤P-row
    planner rule) and the scorer embeds the constants into a
    zero-shuffle narrow projection. NULL agreement flags contribute
    the disagreement weight (matching fs_weights' conservative
    estimate)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    score = None
    for c, (wa, wd) in weights.items():
        term = F.when(F.coalesce(F.col(c).cast("int"), F.lit(0))
                      == 1, F.lit(float(wa))) \
            .otherwise(F.lit(float(wd)))
        score = term if score is None else score + term
    return pairs.withColumn("fs_score",
                            dround(score, round_dp) + F.lit(0.0))


def fs_match_threshold(
    target_odds: float = 1000.0,
    prior_odds: float = 1e-6,
) -> float:
    """The decision threshold in score space: classify a pair as a
    match when posterior odds exceed `target_odds`, i.e. when
    fs_score ≥ log2(target_odds / prior_odds). A pure-Python
    planning helper (repr-exact constant both engines can embed)."""
    if target_odds <= 0 or prior_odds <= 0:
        raise ValueError("odds must be positive")
    return math.log2(target_odds / prior_odds)
