"""Model-evaluation metrics: binary-classifier quality (confusion
matrix, precision/recall/F1, ties-averaged rank AUC), ranked-retrieval
quality (P@k, R@k, MRR, MAP, NDCG@k — Järvelin & Kekäläinen 2002),
and probability calibration (reliability bins + expected calibration
error, Naeini 2015). The measurement half of the classifier/search
families: `classifier.py`/`nbayes.py` produce scores, `search.py`/
`similarity.py` produce rankings — these operators grade them, which
is how a 100 TB pipeline decides whether a quality filter or retrieval
index is good enough to gate data on.

AUC is the Mann-Whitney rank statistic with midranks for ties
(identical to the trapezoidal ROC area):

    AUC = (Σ_{i: y_i=1} r_i  −  P(P+1)/2) / (P·N)

where r_i is the AVERAGE rank of row i under ascending score (rank of
the tie group's first member + (ties−1)/2), P/N = positive/negative
counts. Degenerate inputs (P=0 or N=0) yield NULL, never a division
error. NDCG uses binary relevance, so the ideal DCG has the closed
form Σ_{i=1..min(k,R)} 1/log2(i+1) — no second sort.

Scale design: `binary_metrics` first collapses to one row per
DISTINCT score via groupBy (map-side partial aggregation), so the one
global ordered window runs over the distinct-score domain — thousands
of rows for any realistic score grid — never over the raw pairs; the
midrank sum is reconstructed exactly from tie-group sizes and
cumulative offsets. Payloads never enter the plan, and no stage moves
all N rows through a single task (the sketch alternative — binned ROC
over `calibration_bins` — remains the documented approximation for a
continuous high-cardinality score at 100 TB). The distinct-score
contract is ENFORCED (VERDICT r13): `binary_metrics` and `roc_auc`
gate the collapse through guards.guard_max_distinct, raising loudly
from the parallel count aggregate before the single-task ordered
window would materialize; `max_distinct=None` opts out for domains
bounded by construction. `ranking_metrics` sorts
each query's result list once (one keyed window) and reduces per
query: shuffle carries (query, score, flag) triples, and every
per-query output is a bounded aggregate. Calibration collapses to
n_bins integer triples map-side before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from .guards import DEFAULT_MAX_DISTINCT, guard_max_distinct


def binary_metrics(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    threshold: float = 0.5,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """One row: n, n_pos, n_neg, tp/fp/tn/fn at `threshold`
    (score >= threshold predicts positive), accuracy, precision,
    recall, f1, auc — ratios rounded to 6 dp, NULL where the
    denominator is empty. NULL labels/scores are excluded."""
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    pairs = (df.select(y.alias("y"), s.alias("s"))
             .filter(F.col("y").isNotNull() & F.col("s").isNotNull()))
    # Collapse to one row per DISTINCT score first (map-side combine),
    # so the only global sort is over distinct scores — bounded by the
    # score domain, not the row count. Each tie group's midrank is
    # before + (c+1)/2 where `before` = rows with strictly smaller
    # score, so Σ_{positives} midrank = Σ_s p(s)·(before(s)+(c(s)+1)/2)
    # needs nothing finer than the grouped frame.
    grp = pairs.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("y").alias("p"))
    grp = guard_max_distinct(grp, [], max_distinct, "binary_metrics")
    w_before = (Window.orderBy("s")
                .rowsBetween(Window.unboundedPreceding, -1))
    cum = grp.withColumn(
        "before", F.coalesce(F.sum("c").over(w_before), F.lit(0)))
    pred = (F.col("s") >= float(threshold)).cast("int")
    neg = F.col("c") - F.col("p")
    agg = cum.agg(
        F.sum("c").alias("n"),
        F.sum("p").alias("n_pos"),
        F.sum(neg).alias("n_neg"),
        F.sum(F.col("p") * pred).alias("tp"),
        F.sum(neg * pred).alias("fp"),
        F.sum(neg * (1 - pred)).alias("tn"),
        F.sum(F.col("p") * (1 - pred)).alias("fn"),
        F.sum(F.col("p")
              * (F.col("before") + (F.col("c") + 1) / 2.0))
        .alias("sum_rank_pos"))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    auc = F.try_divide(
        F.col("sum_rank_pos")
        - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0,
        F.col("n_pos").cast("double") * F.col("n_neg"))
    return agg.select(
        "n", "n_pos", "n_neg", "tp", "fp", "tn", "fn",
        dround(F.try_divide(tp + F.col("tn"), F.col("n")), 6)
        .alias("accuracy"),
        dround(prec, 6).alias("precision"),
        dround(rec, 6).alias("recall"),
        dround(F.try_divide(2 * prec * rec, prec + rec), 6)
        .alias("f1"),
        dround(auc, 6).alias("auc"))


def binary_metrics_sql(
    scored: str,
    label_col: str = "label",
    score_col: str = "score",
    threshold: float = 0.5,
) -> str:
    """DuckDB twin over a CTE/table `scored(label, score)`: identical
    midrank construction, confusion counts, 6 dp rounding."""
    th = float(threshold)
    return f"""
WITH pairs AS (
  SELECT CAST({label_col} AS INT) AS y,
         CAST({score_col} AS DOUBLE) AS s
  FROM {scored}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
), ranked AS (
  SELECT y, s,
         rank() OVER (ORDER BY s)
           + (count(*) OVER (PARTITION BY s) - 1) / 2.0 AS ar,
         CAST(s >= {th!r} AS INT) AS pred
  FROM pairs
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg,
         CAST(sum(y * pred) AS BIGINT) AS tp,
         CAST(sum((1 - y) * pred) AS BIGINT) AS fp,
         CAST(sum((1 - y) * (1 - pred)) AS BIGINT) AS tn,
         CAST(sum(y * (1 - pred)) AS BIGINT) AS fn,
         sum(ar * y) AS sum_rank_pos
  FROM ranked
)
SELECT n, n_pos, n_neg, tp, fp, tn, fn,
       round((tp + tn) / CAST(n AS DOUBLE), 6) AS accuracy,
       round(tp / nullif(CAST(tp + fp AS DOUBLE), 0), 6)
         AS precision,
       round(tp / nullif(CAST(tp + fn AS DOUBLE), 0), 6) AS recall,
       round(2.0 * (tp / nullif(CAST(tp + fp AS DOUBLE), 0))
                 * (tp / nullif(CAST(tp + fn AS DOUBLE), 0))
             / nullif(tp / nullif(CAST(tp + fp AS DOUBLE), 0)
                      + tp / nullif(CAST(tp + fn AS DOUBLE), 0), 0),
             6) AS f1,
       round((sum_rank_pos - n_pos * (n_pos + 1) / 2.0)
             / nullif(CAST(n_pos AS DOUBLE) * n_neg, 0), 6) AS auc
FROM agg
"""


def ranking_metrics(
    df: DataFrame,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "relevant",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval metrics over ranked result lists (rank =
    score desc, id asc as the deterministic tie-break): n_results,
    n_rel, precision_at_k (denominator k, the fixed-cutoff
    convention), recall_at_k, mrr (reciprocal rank of the FIRST
    relevant result), ap (mean of precision@hit over all relevant
    hits), ndcg_at_k (binary relevance, closed-form ideal). Queries
    with no relevant results emit NULL recall/mrr/ap/ndcg. Ordered by
    query id."""
    if k < 1:
        raise ValueError("k must be >= 1")
    q = F.col(query_col)
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.col(id_col))
    rel = F.col(rel_col).cast("int")
    rows = (df
            .withColumn("pos", F.row_number().over(w))
            .withColumn("relv", rel)
            .withColumn("cum_rel", F.sum(rel).over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    in_k = F.col("pos") <= k
    per_q = rows.groupBy(q.alias("query_id")).agg(
        F.count("*").alias("n_results"),
        F.sum("relv").alias("n_rel"),
        F.sum(F.when(in_k, F.col("relv")).otherwise(0))
        .alias("rel_at_k"),
        F.min(F.when(F.col("relv") == 1, F.col("pos")))
        .alias("first_rel_pos"),
        F.sum(F.when(F.col("relv") == 1,
                     F.col("cum_rel") / F.col("pos")))
        .alias("sum_prec_at_hits"),
        F.sum(F.when(in_k & (F.col("relv") == 1),
                     1.0 / F.log2(F.col("pos") + 1)).otherwise(0.0))
        .alias("dcg"))
    idcg = F.aggregate(
        F.sequence(F.lit(1),
                   F.least(F.lit(k), F.col("n_rel")).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1))
    return (per_q.select(
        "query_id", "n_results", "n_rel",
        dround(F.col("rel_at_k") / float(k), 6)
        .alias("precision_at_k"),
        dround(F.try_divide(F.col("rel_at_k"), F.col("n_rel")), 6)
        .alias("recall_at_k"),
        dround(F.try_divide(F.lit(1.0), F.col("first_rel_pos")), 6)
        .alias("mrr"),
        dround(F.try_divide(F.col("sum_prec_at_hits"),
                             F.col("n_rel")), 6).alias("ap"),
        dround(F.when(F.col("n_rel") > 0,
                       F.col("dcg") / idcg), 6).alias("ndcg_at_k"))
        .orderBy("query_id"))


def ranking_metrics_sql(
    results: str,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "relevant",
    id_col: str = "doc_id",
    k: int = 10,
) -> str:
    """DuckDB twin over `results(query, score, relevant, id)`: same
    ranking tie-break, cutoffs, closed-form ideal DCG (correlated
    generate_series sum), NULL semantics, 6 dp rounding."""
    kk = int(k)
    return f"""
WITH ranked AS (
  SELECT {query_col} AS query_id,
         CAST({rel_col} AS INT) AS relv,
         row_number() OVER (PARTITION BY {query_col}
                            ORDER BY {score_col} DESC, {id_col})
           AS pos,
         sum(CAST({rel_col} AS INT)) OVER (
             PARTITION BY {query_col}
             ORDER BY {score_col} DESC, {id_col}
             ROWS UNBOUNDED PRECEDING) AS cum_rel
  FROM {results}
), per_q AS (
  SELECT query_id, count(*) AS n_results,
         CAST(sum(relv) AS BIGINT) AS n_rel,
         CAST(sum(CASE WHEN pos <= {kk} THEN relv ELSE 0 END)
              AS BIGINT) AS rel_at_k,
         min(CASE WHEN relv = 1 THEN pos END) AS first_rel_pos,
         sum(CASE WHEN relv = 1
                  THEN cum_rel / CAST(pos AS DOUBLE) END)
           AS sum_prec_at_hits,
         sum(CASE WHEN pos <= {kk} AND relv = 1
                  THEN 1.0 / log2(pos + 1.0) ELSE 0.0 END) AS dcg
  FROM ranked GROUP BY 1
), ideal AS (
  -- closed-form ideal DCG, one row per possible cutoff 1..k
  -- (generate_series must be uncorrelated in DuckDB)
  SELECT i AS m, sum(1.0 / log2(i + 1.0)) OVER (ORDER BY i) AS idcg
  FROM generate_series(1, {kk}) AS t(i)
)
SELECT query_id, n_results, n_rel,
       round(rel_at_k / {float(kk)!r}, 6) AS precision_at_k,
       round(rel_at_k / nullif(CAST(n_rel AS DOUBLE), 0), 6)
         AS recall_at_k,
       round(1.0 / first_rel_pos, 6) AS mrr,
       round(sum_prec_at_hits / nullif(CAST(n_rel AS DOUBLE), 0), 6)
         AS ap,
       round(CASE WHEN n_rel > 0 THEN dcg / ideal.idcg END, 6)
         AS ndcg_at_k
FROM per_q LEFT JOIN ideal ON ideal.m = least({kk}, per_q.n_rel)
ORDER BY query_id
"""


def pr_curve(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Precision-recall sweep: one row per DISTINCT score, treating
    that score as the threshold (predict positive when score >=
    threshold) — threshold, tp, fp, fn, precision, recall, f1 (6 dp,
    NULL where the denominator is empty), ordered by threshold
    descending. NULL labels/scores are excluded.

    Scale: rows collapse to (score, n, n_pos) pairs in ONE
    map-side-combinable agg, then one global window over DISTINCT
    scores accumulates the confusion counts — the shuffle carries one
    tuple per distinct score, not per row. For continuous scores at
    100 TB, quantize upstream (round the score, or sweep
    `calibration_bins` edges) to bound the distinct count; the sweep
    itself is exact for whatever score set it is given."""
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    per_score = (df.filter(y.isNotNull() & s.isNotNull())
                 .groupBy(s.alias("threshold"))
                 .agg(F.count("*").alias("n_at"),
                      F.sum(y).alias("pos_at")))
    w = (Window.orderBy(F.desc("threshold"))
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = (per_score
           .withColumn("tp", F.sum("pos_at").over(w))
           .withColumn("np", F.sum("n_at").over(w))
           .withColumn("p_all", F.sum("pos_at").over(tot)))
    tp = F.col("tp")
    fp = F.col("np") - tp
    fn = F.col("p_all") - tp
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    return (cum.select(
        "threshold", tp.alias("tp"), fp.alias("fp"), fn.alias("fn"),
        dround(prec, 6).alias("precision"),
        dround(rec, 6).alias("recall"),
        dround(F.try_divide(2 * prec * rec, prec + rec), 6)
        .alias("f1"))
        .orderBy(F.desc("threshold")))


def pr_curve_sql(
    scored: str,
    label_col: str = "label",
    score_col: str = "score",
) -> str:
    """DuckDB twin over `scored(label, score)`: identical distinct-
    threshold sweep, cumulative confusion counts, 6 dp rounding."""
    return f"""
WITH pairs AS (
  SELECT CAST({label_col} AS INT) AS y,
         CAST({score_col} AS DOUBLE) AS s
  FROM {scored}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
), per_score AS (
  SELECT s AS threshold, count(*) AS n_at,
         CAST(sum(y) AS BIGINT) AS pos_at
  FROM pairs GROUP BY 1
), cum AS (
  SELECT threshold,
         sum(pos_at) OVER (ORDER BY threshold DESC
                           ROWS UNBOUNDED PRECEDING) AS tp,
         sum(n_at) OVER (ORDER BY threshold DESC
                         ROWS UNBOUNDED PRECEDING) AS np,
         sum(pos_at) OVER () AS p_all
  FROM per_score
)
SELECT threshold, CAST(tp AS BIGINT) AS tp,
       CAST(np - tp AS BIGINT) AS fp,
       CAST(p_all - tp AS BIGINT) AS fn,
       round(tp / nullif(CAST(np AS DOUBLE), 0), 6) AS precision,
       round(tp / nullif(CAST(p_all AS DOUBLE), 0), 6) AS recall,
       round(2.0 * (tp / nullif(CAST(np AS DOUBLE), 0))
                 * (tp / nullif(CAST(p_all AS DOUBLE), 0))
             / nullif(tp / nullif(CAST(np AS DOUBLE), 0)
                      + tp / nullif(CAST(p_all AS DOUBLE), 0), 0), 6)
         AS f1
FROM cum ORDER BY threshold DESC
"""


def best_threshold(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """One row: the `pr_curve` operating point with the highest F1
    (ties broken by the HIGHEST threshold — the stricter classifier).
    F1 is a ratio of integers computed identically in both engines,
    so exact ties are engine-independent. All-one-class inputs yield
    NULL f1 rows; the sweep still returns the highest threshold."""
    curve = pr_curve(df, label_col, score_col)
    return (curve.orderBy(F.desc_nulls_last("f1"),
                          F.desc("threshold"))
            .limit(1))


def best_threshold_sql(
    scored: str,
    label_col: str = "label",
    score_col: str = "score",
) -> str:
    return (pr_curve_sql(scored, label_col, score_col).rstrip()
            .removesuffix("ORDER BY threshold DESC")
            + "ORDER BY f1 DESC NULLS LAST, threshold DESC LIMIT 1\n")


def calibration_bins(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram: per fixed-width score bin over [0,1)
    (scores at exactly 1.0 clamp into the top bin), the row count,
    mean predicted score (confidence), observed positive fraction
    (accuracy), and |gap|; 6 dp. Empty bins are absent (no spine —
    the diagram reads missing as no-mass)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (df.filter(y.isNotNull() & s.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count("*").alias("n"),
                 dround(F.avg(s), 6).alias("confidence"),
                 dround(F.avg(y), 6).alias("accuracy"),
                 dround(F.abs(F.avg(y) - F.avg(s)), 6).alias("gap"))
            .orderBy("bin"))


def calibration_bins_sql(
    scored: str,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> str:
    nb = int(n_bins)
    return f"""
WITH pairs AS (
  SELECT CAST({label_col} AS INT) AS y,
         CAST({score_col} AS DOUBLE) AS s
  FROM {scored}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
)
SELECT CAST(least(floor(s * {nb}), {nb - 1}) AS INT) AS bin,
       count(*) AS n,
       round(avg(s), 6) AS confidence,
       round(avg(y), 6) AS accuracy,
       round(abs(avg(y) - avg(s)), 6) AS gap
FROM pairs GROUP BY 1 ORDER BY 1
"""


def expected_calibration_error(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """One row: n, n_bins_used, ece = Σ (n_b/N)·|acc_b − conf_b|
    (computed from UNROUNDED bin stats, result rounded to 6 dp)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    bins = (df.filter(y.isNotNull() & s.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count("*").alias("nb"),
                 F.avg(s).alias("conf"), F.avg(y).alias("acc")))
    return bins.agg(
        F.sum("nb").alias("n"),
        F.count("*").alias("n_bins_used"),
        dround(F.sum(F.col("nb") * F.abs(F.col("acc")
                                          - F.col("conf")))
                / F.sum("nb"), 6).alias("ece"))


def expected_calibration_error_sql(
    scored: str,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> str:
    nb = int(n_bins)
    return f"""
WITH pairs AS (
  SELECT CAST({label_col} AS INT) AS y,
         CAST({score_col} AS DOUBLE) AS s
  FROM {scored}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
), bins AS (
  SELECT CAST(least(floor(s * {nb}), {nb - 1}) AS INT) AS bin,
         count(*) AS nb, avg(s) AS conf, avg(y) AS acc
  FROM pairs GROUP BY 1
)
SELECT CAST(sum(nb) AS BIGINT) AS n, count(*) AS n_bins_used,
       round(sum(nb * abs(acc - conf)) / sum(nb), 6) AS ece
FROM bins
"""


def cohen_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n, po, kappa) — Cohen's kappa (Cohen 1960)
    inter-rater agreement between two label columns: the
    chance-corrected readout for "do my two quality classifiers /
    annotator pools / model-vs-human labels actually agree", where
    raw percent-agreement is inflated by class imbalance (two raters
    calling everything 'clean' agree 100% and mean nothing).

        kappa = (po − pe) / (1 − pe)
              = (n·agree − Σ_k na_k·nb_k) / (n² − Σ_k na_k·nb_k)

    — the second form is what both engines compute: EXACT integer
    numerator and denominator, ONE IEEE division (no intermediate
    probabilities to drift). po ships as agree/n for the reader.
    Rows with a NULL on either side are excluded (not ratings).
    Degenerate cells (pe = 1: both raters constant on the same
    label) emit NULL kappa — agreement is undefined, not perfect.

    Scale shape: one count/agree aggregate + one per-(group, label)
    marginal aggregate (shuffle carries distinct labels), joined
    groups-sized. Labels compare verbatim (any atomic type). The
    exact rational nΣo − Σnₐn_b over n² − Σnₐn_b carries as
    decimal(38,0) / HUGEINT (r15: n² wraps int64 at ~3·10⁹ rows)."""
    gb = list(group_by or [])
    a, b = F.col(rater_a_col), F.col(rater_b_col)
    base = df.filter(a.isNotNull() & b.isNotNull())
    tot = base.groupBy(*gb).agg(
        F.count("*").alias("n"),
        F.sum((a == b).cast("long")).alias("__agree"))
    labels = (base.select(*gb, a.alias("__lab"),
                          F.lit(1).alias("__ia"),
                          F.lit(0).alias("__ib"))
              .unionByName(
                  base.select(*gb, b.alias("__lab"),
                              F.lit(0).alias("__ia"),
                              F.lit(1).alias("__ib"))))
    marg = (labels.groupBy(*gb, "__lab")
            .agg(F.sum("__ia").alias("__na"),
                 F.sum("__ib").alias("__nb"))
            .groupBy(*gb)
            .agg(F.sum(F.col("__na").cast("decimal(38,0)")
                       * F.col("__nb").cast("decimal(38,0)"))
                 .alias("__pe")))
    j = tot.join(marg, gb) if gb else tot.crossJoin(marg)
    # n*agree and n*n ~ N^2 wrap int64 at ~3e9 rows — decimal operands
    decl = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = decl(F.col("n")) * decl(F.col("__agree")) - F.col("__pe")
    den = decl(F.col("n")) * decl(F.col("n")) - F.col("__pe")
    out = j.select(
        *gb, "n",
        dround(F.col("__agree").cast("double")
                / F.col("n").cast("double"), round_dp).alias("po"),
        # + 0.0: signed-zero normalization (kruskal_wallis note) —
        # agreement just below chance gives a tiny-negative kappa
        # that rounds to -0.0 on one engine and 0.0 on the other
        (dround(F.when(den != 0,
                        num.cast("double") / den.cast("double")),
                 round_dp) + F.lit(0.0)).alias("kappa"))
    return out.orderBy(*gb) if gb else out


def cohen_kappa_sql(
    table: str,
    rater_a_expr: str,
    rater_b_expr: str,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of cohen_kappa (same exact-integer rational,
    same single division)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    join = ("USING (" + ", ".join(gb) + ")") if gb else "ON TRUE"
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}{rater_a_expr} AS a, {rater_b_expr} AS b
  FROM {table}
  WHERE {rater_a_expr} IS NOT NULL AND {rater_b_expr} IS NOT NULL
),
tot AS (
  SELECT {gsel}count(*) AS n,
         sum(CAST(a = b AS BIGINT)) AS agree
  FROM base {gkey}
),
labels AS (
  SELECT {gsel}a AS lab, 1 AS ia, 0 AS ib FROM base
  UNION ALL
  SELECT {gsel}b AS lab, 0 AS ia, 1 AS ib FROM base
),
marg AS (
  SELECT {gsel}sum(CAST(na AS HUGEINT) * nb) AS pe FROM (
    SELECT {gsel}lab, sum(ia) AS na, sum(ib) AS nb
    FROM labels GROUP BY {gsel}lab
  ) {gkey}
)
SELECT {gsel}n,
       round(agree::DOUBLE / n::DOUBLE, {round_dp}) AS po,
       round(CASE WHEN CAST(n AS HUGEINT) * n - pe != 0
                  THEN (CAST(n AS HUGEINT) * agree - pe)::DOUBLE
                       / (CAST(n AS HUGEINT) * n - pe)::DOUBLE END,
             {round_dp}) + 0.0 AS kappa
FROM tot JOIN marg {join}
{order}
"""


def multiclass_metrics(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    round_dp: int = 4,
) -> DataFrame:
    """(class, support, n_predicted, tp, precision, recall, f1) —
    one row per class (union of true and predicted label sets), the
    standard multiclass classifier report (language-ID, source
    routing, quality tiers — anything past binary_metrics' scope).

        precision = tp / n_predicted     recall = tp / support
        f1 = 2·tp / (support + n_predicted)

    — note f1's single-division identity (harmonic mean collapses),
    so every output is ONE exact-integer rational. Classes with no
    predictions (or no support) get NULL precision (recall), f1 = 0
    by the identity when tp = 0 and the denominator > 0. NULL
    labels/preds are excluded (not classifications).

    Scale: three label-keyed integer aggs (support, predicted, tp)
    full-outer-joined on the bounded class set."""
    l, p = F.col(label_col), F.col(pred_col)
    base = df.filter(l.isNotNull() & p.isNotNull())
    sup = (base.groupBy(l.cast("string").alias("class"))
           .agg(F.count("*").alias("support"),
                F.sum((l == p).cast("long")).alias("tp")))
    prd = (base.groupBy(p.cast("string").alias("class"))
           .agg(F.count("*").alias("n_predicted")))
    j = sup.join(prd, "class", "full")
    support = F.coalesce("support", F.lit(0))
    npred = F.coalesce("n_predicted", F.lit(0))
    tp = F.coalesce("tp", F.lit(0))
    return (j.select(
        "class",
        support.alias("support"),
        npred.alias("n_predicted"),
        tp.alias("tp"),
        dround(F.when(npred > 0,
                       tp.cast("double") / npred.cast("double")),
                round_dp).alias("precision"),
        dround(F.when(support > 0,
                       tp.cast("double") / support.cast("double")),
                round_dp).alias("recall"),
        dround(F.when(support + npred > 0,
                       F.lit(2.0) * tp.cast("double")
                       / (support + npred).cast("double")),
                round_dp).alias("f1"))
        .orderBy("class"))


def multiclass_metrics_sql(
    table: str,
    label_expr: str = "label",
    pred_expr: str = "pred",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of multiclass_metrics (same three aggregates,
    same single-division identities)."""
    return f"""
WITH base AS (
  SELECT CAST({label_expr} AS VARCHAR) AS l,
         CAST({pred_expr} AS VARCHAR) AS p
  FROM {table}
  WHERE {label_expr} IS NOT NULL AND {pred_expr} IS NOT NULL
),
sup AS (
  SELECT l AS class, count(*) AS support,
         sum(CAST(l = p AS BIGINT)) AS tp
  FROM base GROUP BY l
),
prd AS (
  SELECT p AS class, count(*) AS n_predicted FROM base GROUP BY p
),
j AS (
  SELECT coalesce(sup.class, prd.class) AS class,
         coalesce(support, 0) AS support,
         coalesce(n_predicted, 0) AS n_predicted,
         CAST(coalesce(tp, 0) AS BIGINT) AS tp
  FROM sup FULL OUTER JOIN prd ON sup.class = prd.class
)
SELECT class, support, n_predicted, tp,
       round(CASE WHEN n_predicted > 0
                  THEN tp::DOUBLE / n_predicted::DOUBLE END,
             {round_dp}) AS precision,
       round(CASE WHEN support > 0
                  THEN tp::DOUBLE / support::DOUBLE END,
             {round_dp}) AS recall,
       round(CASE WHEN support + n_predicted > 0
                  THEN 2.0 * tp::DOUBLE
                       / (support + n_predicted)::DOUBLE END,
             {round_dp}) AS f1
FROM j ORDER BY class
"""


def multiclass_summary(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    round_dp: int = 4,
) -> DataFrame:
    """(n, n_classes, accuracy, macro_precision, macro_recall,
    macro_f1) — the one-row rollup over multiclass_metrics. Accuracy
    (= micro-F1 for single-label multiclass) is one exact rational;
    the macro averages sum per-class doubles, so they fold in CLASS
    order (the km_logrank discipline) before the single division.
    Classes with NULL precision/recall contribute 0 to their macro
    term (the scikit-learn zero_division=0 convention)."""
    per = multiclass_metrics(df, label_col, pred_col,
                             round_dp=18)  # fold on unrounded values
    term = F.struct(
        F.col("class"),
        F.coalesce("precision", F.lit(0.0)).alias("pr"),
        F.coalesce("recall", F.lit(0.0)).alias("rc"),
        F.coalesce("f1", F.lit(0.0)).alias("f"))
    folded = (per.withColumn("__t", term)
              .agg(F.sum("tp").alias("__tp"),
                   F.sum("support").alias("__n"),
                   F.count("*").alias("n_classes"),
                   F.expr(
                       "aggregate(array_sort(collect_list(__t)),"
                       " named_struct('pr', CAST(0.0 AS DOUBLE),"
                       "              'rc', CAST(0.0 AS DOUBLE),"
                       "              'f', CAST(0.0 AS DOUBLE)),"
                       " (acc, x) -> named_struct("
                       "   'pr', acc.pr + x.pr,"
                       "   'rc', acc.rc + x.rc,"
                       "   'f', acc.f + x.f))").alias("__s")))
    k = F.col("n_classes").cast("double")
    return folded.select(
        F.col("__n").alias("n"), "n_classes",
        dround(F.col("__tp").cast("double")
                / F.col("__n").cast("double"), round_dp)
        .alias("accuracy"),
        dround(F.col("__s.pr") / k, round_dp).alias("macro_precision"),
        dround(F.col("__s.rc") / k, round_dp).alias("macro_recall"),
        dround(F.col("__s.f") / k, round_dp).alias("macro_f1"))


def multiclass_summary_sql(
    table: str,
    label_expr: str = "label",
    pred_expr: str = "pred",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of multiclass_summary (same class-ordered fold
    over unrounded per-class values)."""
    inner = multiclass_metrics_sql(table, label_expr, pred_expr,
                                   round_dp=18)
    return f"""
WITH per AS ({inner}),
folded AS (
  SELECT sum(tp) AS tps, sum(support) AS n, count(*) AS n_classes,
         list_reduce(
           list_prepend({{'pr': 0.0::DOUBLE, 'rc': 0.0::DOUBLE,
                          'f': 0.0::DOUBLE}},
                        list({{'pr': coalesce(precision, 0.0),
                               'rc': coalesce(recall, 0.0),
                               'f': coalesce(f1, 0.0)}}
                             ORDER BY class)),
           (a, x) -> {{'pr': a.pr + x.pr, 'rc': a.rc + x.rc,
                       'f': a.f + x.f}}) AS fl
  FROM per
)
SELECT n, n_classes,
       round(tps::DOUBLE / n::DOUBLE, {round_dp}) AS accuracy,
       round(fl.pr / n_classes::DOUBLE, {round_dp})
         AS macro_precision,
       round(fl.rc / n_classes::DOUBLE, {round_dp}) AS macro_recall,
       round(fl.f / n_classes::DOUBLE, {round_dp}) AS macro_f1
FROM folded
"""


def roc_auc(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n_pos, n_neg, auc) — threshold-free ranking quality
    via the Mann-Whitney identity AUC = P(score⁺ > score⁻) (+½ per
    tie): the one binary-classifier number that needs no threshold
    choice, completing this module's threshold metrics
    (binary_metrics / pr_curve / best_threshold judge A SINGLE
    operating point; AUC judges the whole ranking — the quality-
    classifier comparison number the C4/Gopher filter family
    reports).

    The ranktest discipline end-to-end: collapse to DISTINCT scores
    first (per score: count, positives), then midranks as 2×-integer
    prefix sums — 2·R⁺ = Σ_s pos_s·(2·left_s + cnt_s + 1) is an
    exact integer accumulated as decimal(38,0) / HUGEINT (r15:
    2R⁺ ~ 2N² silently wrapped int64 at ~2·10⁹ rows per group), and

        AUC = (2·R⁺ − n⁺·(n⁺+1)) / (2·n⁺·n⁻)

    is ONE closing IEEE division. Shuffle carries distinct score
    values, never rows (SCORE CONTRACT: quantize continuous scores
    to a practical grain so distinct values stay bounded). NULL auc
    when either class is empty."""
    gb = list(group_by or [])
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    base = (df.filter(y.isNotNull() & s.isNotNull())
            .select(*gb, y.alias("__y"), s.alias("__s")))
    per_s = (base.groupBy(*gb, "__s")
             .agg(F.count("*").alias("cnt"),
                  F.sum("__y").alias("pos")))
    per_s = guard_max_distinct(per_s, gb, max_distinct, "roc_auc")
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    left = F.coalesce(
        F.sum("cnt").over(
            wg.orderBy("__s")
            .rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    # 2R+ = pos*(2*left+cnt+1) ~ 2N^2 would silently wrap int64 at
    # ~2e9 rows per group — carry as decimal(38,0) / HUGEINT (the
    # kruskal_wallis accumulation discipline, r15)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    contrib = dec(F.col("pos")) * dec(F.lit(2) * left + F.col("cnt")
                                      + F.lit(1))
    agg = (per_s.withColumn("__c", contrib)
           .groupBy(*gb)
           .agg(F.sum("__c").alias("__r2"),
                F.sum("pos").alias("n_pos"),
                F.sum(F.col("cnt") - F.col("pos")).alias("n_neg")))
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        dround((F.col("__r2").cast("double")
                 - npos * (npos + F.lit(1.0)))
                / (F.lit(2.0) * npos * nneg), round_dp))
    return agg.select(
        *gb,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        auc.alias("auc"))


def roc_auc_sql(
    table: str,
    label_col: str = "label",
    score_col: str = "score",
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of roc_auc (same distinct-score collapse, same
    2×-integer midrank prefix sums, same single closing division)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({label_col} AS INT) AS y,
         CAST({score_col} AS DOUBLE) AS s
  FROM {table}
  WHERE {label_col} IS NOT NULL AND {score_col} IS NOT NULL
),
per_s AS (
  SELECT {gsel}s, count(*) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM base GROUP BY {gsel}s
),
ranked AS (
  SELECT {gsel}pos, cnt,
         coalesce(sum(cnt) OVER ({part} ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS lft
  FROM per_s
),
agg AS (
  SELECT {gsel}CAST(sum(CAST(pos AS HUGEINT)
                      * (2 * lft + cnt + 1)) AS HUGEINT) AS r2,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(cnt - pos) AS BIGINT) AS n_neg
  FROM ranked {gkey}
)
SELECT {gsel}n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN round((r2::DOUBLE
                        - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0))
                       / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE),
                       {round_dp})
       END AS auc
FROM agg
"""


def brier_decomposition(
    df: DataFrame,
    label_col: str = "label",
    prob_col: str = "prob",
    n_bins: int = 10,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> DataFrame:
    """(group..., n, brier, reliability, resolution, uncertainty) —
    the Murphy (1973) decomposition of the Brier score over `n_bins`
    equal-width probability bins:

        reliability = (1/N) Σ_b n_b (p̄_b − ȳ_b)²   (calibration gap)
        resolution  = (1/N) Σ_b n_b (ȳ_b − ȳ)²     (discrimination)
        uncertainty = ȳ (1 − ȳ)

    — the WHY behind expected_calibration_error: two models with the
    same ECE can differ hugely in resolution, and this is the readout
    that says whether a quality-filter classifier is useless-but-
    calibrated or sharp. `brier` itself is the raw unbinned mean
    squared error; the identity brier = rel − res + unc holds exactly
    only when forecasts sit on the bin means (the within-bin variance
    term is the residual — pinned in pytest both ways).

    Exactness: probabilities quantize to the 1e-6 integer grid FIRST
    (the wilcoxon discipline), so every per-bin sufficient statistic
    (n_b, Σy, Σp_q, Σ(p_q − 1e6·y)²) is an exact decimal integer and
    binning ((p_q·n_bins) DIV 1e6, clamped) is integer arithmetic —
    tie structure engine-exact. The two bin-level Σ of doubles fold
    in BIN ORDER (the multiclass_summary discipline) before the
    single closing division chain. Shuffle carries (group, bin)
    cells, never rows."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    gb = list(group_by or [])
    y = F.col(label_col).cast("int")
    p = F.col(prob_col).cast("double")
    pq = F.round(p * 1e6).cast("decimal(38,0)")
    base = (df.filter(y.isNotNull() & p.isNotNull())
            .select(*gb, y.alias("__y"), pq.alias("__pq")))
    # binning on the QUANTIZED grid via the same floor-double chain
    # the twin spells — exact for pq <= 1e6 and n_bins <= 1e3 (the
    # product stays far under 2^53)
    binc = F.least(
        F.floor(F.col("__pq").cast("double") * n_bins / 1e6)
        .cast("long"),
        F.lit(int(n_bins - 1)))
    yq6 = F.col("__y").cast("decimal(38,0)") * F.lit(1000000)
    per_bin = (base
               .withColumn("__b", binc)
               .groupBy(*gb, "__b")
               .agg(F.count("*").alias("nb"),
                    F.sum("__y").alias("sy"),
                    F.sum("__pq").alias("sp"),
                    F.sum((F.col("__pq") - yq6)
                          * (F.col("__pq") - yq6)).alias("ssq")))
    cell = F.struct(F.col("__b").alias("b"),
                    F.col("nb").cast("long").alias("n"),
                    F.col("sy").cast("decimal(38,0)").alias("sy"),
                    F.col("sp").alias("sp"))
    agg = (per_bin.withColumn("__c", cell)
           .groupBy(*gb)
           .agg(F.sum("nb").alias("__nn"),
                F.sum("sy").alias("__sy"),
                F.sum("ssq").alias("__ssq"),
                F.collect_list("__c").alias("__cells")))
    nn = F.col("__nn").cast("double")
    # bin-ordered folds; N and SY close over the lambda
    rel6 = F.expr(
        "aggregate(array_sort(__cells), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + CAST((x.sp - x.sy * 1000000)"
        "                    * (x.sp - x.sy * 1000000) AS DOUBLE)"
        "              / CAST(x.n AS DOUBLE))")
    res = F.expr(
        "aggregate(array_sort(__cells), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + CAST((CAST(__nn AS DECIMAL(38,0)) * x.sy"
        "                     - CAST(x.n AS DECIMAL(38,0))"
        "                       * CAST(__sy AS DECIMAL(38,0)))"
        "                    * (CAST(__nn AS DECIMAL(38,0)) * x.sy"
        "                     - CAST(x.n AS DECIMAL(38,0))"
        "                       * CAST(__sy AS DECIMAL(38,0)))"
        "                    AS DOUBLE) / CAST(x.n AS DOUBLE))")
    brier = F.col("__ssq").cast("double") / (nn * F.lit(1e12))
    reliability = rel6 / (nn * F.lit(1e12))
    resolution = res / (nn * nn * nn)
    sy = F.col("__sy").cast("double")
    uncertainty = sy * (nn - sy) / (nn * nn)
    return agg.select(
        *gb,
        F.col("__nn").cast("long").alias("n"),
        dround(brier, round_dp).alias("brier"),
        dround(reliability, round_dp).alias("reliability"),
        dround(resolution, round_dp).alias("resolution"),
        dround(uncertainty, round_dp).alias("uncertainty"))


def brier_decomposition_sql(
    table: str,
    label_col: str = "label",
    prob_col: str = "prob",
    n_bins: int = 10,
    group_by: "list[str] | None" = None,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of brier_decomposition (same 1e-6 quantization,
    same integer binning, same bin-ordered identity-seeded folds,
    same closing division chains)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    psel = (", ".join(f"p.{k}" for k in gb) + ", ") if gb else ""
    jcond = " AND ".join(f"p.{k} = t.{k}" for k in gb) if gb \
        else "TRUE"
    return f"""
WITH base AS (
  SELECT {gsel}CAST({label_col} AS INT) AS y,
         CAST(round(CAST({prob_col} AS DOUBLE) * 1e6)
              AS DECIMAL(38,0)) AS pq
  FROM {table}
  WHERE {label_col} IS NOT NULL AND {prob_col} IS NOT NULL
),
binned AS (
  SELECT {gsel}y, pq,
         least(CAST(floor(pq::DOUBLE * {n_bins} / 1e6) AS BIGINT),
               {n_bins - 1}) AS b
  FROM base
),
per_bin AS (
  SELECT {gsel}b, count(*) AS nb,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(pq) AS DECIMAL(38,0)) AS sp,
         CAST(sum((pq - CAST(y AS DECIMAL(38,0)) * 1000000)
                  * (pq - CAST(y AS DECIMAL(38,0)) * 1000000))
              AS DECIMAL(38,0)) AS ssq
  FROM binned GROUP BY {gsel}b
),
tot AS (
  SELECT {gsel}CAST(sum(nb) AS BIGINT) AS nn,
         CAST(sum(sy) AS DECIMAL(38,0)) AS syt,
         CAST(sum(ssq) AS DECIMAL(38,0)) AS ssqt
  FROM per_bin {gkey}
),
folded AS (
  SELECT {psel}max(t.nn) AS nn, max(t.syt) AS syt,
         max(t.ssqt) AS ssqt,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST((p.sp - p.sy * 1000000)
                       * (p.sp - p.sy * 1000000) AS DOUBLE)
                  / CAST(p.nb AS DOUBLE) ORDER BY p.b)),
             (a, x) -> a + x) AS rel6,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST((CAST(t.nn AS DECIMAL(38,0)) * p.sy
                        - CAST(p.nb AS DECIMAL(38,0)) * t.syt)
                       * (CAST(t.nn AS DECIMAL(38,0)) * p.sy
                          - CAST(p.nb AS DECIMAL(38,0)) * t.syt)
                       AS DOUBLE) / CAST(p.nb AS DOUBLE)
                  ORDER BY p.b)),
             (a, x) -> a + x) AS res
  FROM per_bin p JOIN tot t ON {jcond}
  {("GROUP BY " + ", ".join("p." + k for k in gb)) if gb else ""}
)
SELECT {gsel}nn AS n,
       round(ssqt::DOUBLE / (nn::DOUBLE * 1e12), {round_dp})
         AS brier,
       round(rel6 / (nn::DOUBLE * 1e12), {round_dp}) AS reliability,
       round(res / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE),
             {round_dp}) AS resolution,
       round(syt::DOUBLE * (nn::DOUBLE - syt::DOUBLE)
             / (nn::DOUBLE * nn::DOUBLE), {round_dp}) AS uncertainty
FROM folded
"""
