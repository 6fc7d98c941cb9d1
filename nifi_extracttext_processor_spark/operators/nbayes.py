"""Multinomial Naive Bayes text classifier — the multi-class
complement to the binary LR quality filter (operators/classifier.py).

LLM-corpus pipelines need multi-CLASS labeling, not just a quality
gate: domain tagging for mixture construction (RedPajama/Dolma assign
every document a source/domain before token-share mixing), topic
routing, and language-family buckets. Multinomial NB (McCallum &
Nigam 1998) is the standard cheap baseline for exactly this job, and
— unlike logistic regression — BOTH its training and its scoring are
pure aggregations, so the whole train→predict pipeline is
SQL-expressible and DuckDB-oracle-replayable end to end (the LR
classifier could only oracle its scoring half).

Scale design (what survives 100×):

- TRAIN is two aggregations over one token explode: per-(class,
  bucket) counts (map-side combinable, the only wide shuffle, rows
  bounded by k·n_buckets) and per-class doc counts. The corpus total
  is a 1-row broadcast. Nothing ever collects to the driver; the
  model stays distributed as two small DataFrames (conditional
  log-probs for SEEN buckets only + per-class prior/default row).
- SCORE is pure Catalyst, zero UDF: token explode → hash bucket →
  per-doc (id, bucket) counts (the only corpus-wide shuffle, id+int
  rows, never text) → ×k class expansion AFTER the count agg (k is
  the number of classes, single digits to low hundreds) → BROADCAST
  joins against the model → one (id, label) sum → struct-max argmax.
  Token-less docs fall back to the prior argmax via a 1-row
  broadcast scalar, never dropped.
- Hashing bounds the model at k·n_buckets regardless of corpus
  vocabulary; `xxhash64` is the scale path, `md5` the engine-portable
  twin (the split_by_hash / classifier dual).

Smoothing: Laplace add-alpha over the hashed vocabulary,
logp(bucket|c) = ln((cnt + α) / (tok_c + α·B)); buckets unseen in a
class score the class default ln(α / (tok_c + α·B)) — so every
(doc, class) log-joint is finite and classes never win by -inf
forfeit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


from .classifier import _TOKEN_SPLIT_RE, _bucket_col


def _class_tokens(df, label_col, id_col, text_col):
    return (df.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          _TOKEN_SPLIT_RE)).alias("term"))
        .filter(F.length("term") > 0))


def train_naive_bayes(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    hash_method: str = "xxhash64",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Returns (cond_df, class_df):
      cond_df  (label, bucket, logp) — conditional log-probs for
               buckets SEEN in the class (≤ k·n_buckets rows).
      class_df (label, logprior, logp_default) — one row per class;
               logp_default covers buckets unseen in that class.
    Rows with NULL labels are rejected (a silent NULL class would
    absorb every unlabeled doc). Classes whose docs are all empty
    still get a row (prior + all-default conditionals)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if df.filter(F.col(label_col).isNull()).limit(1).count():
        raise ValueError("train_naive_bayes: NULL labels present")
    b = float(n_buckets)
    a = float(alpha)
    toks = (_class_tokens(df, label_col, id_col, text_col)
            .withColumn("bucket", _bucket_col(hash_method, n_buckets)))
    cond_counts = (toks.groupBy("label", "bucket")
                   .agg(F.count("*").cast("double").alias("cnt")))
    tok_totals = (cond_counts.groupBy("label")
                  .agg(F.sum("cnt").alias("tok")))
    docs = (df.groupBy(F.col(label_col).alias("label"))
            .agg(F.count("*").cast("double").alias("d")))
    total = docs.agg(F.sum("d").alias("n"))
    class_df = (docs.crossJoin(F.broadcast(total))
                .join(tok_totals, "label", "left")
                .select(
                    "label",
                    F.log(F.col("d") / F.col("n")).alias("logprior"),
                    F.log(F.lit(a) / (F.coalesce("tok", F.lit(0.0))
                                      + F.lit(a * b)))
                    .alias("logp_default")))
    cond_df = (cond_counts.join(tok_totals, "label")
               .select("label", "bucket",
                       F.log((F.col("cnt") + F.lit(a))
                             / (F.col("tok") + F.lit(a * b)))
                       .alias("logp")))
    return cond_df, class_df


def score_naive_bayes(
    df: DataFrame,
    cond_df: DataFrame,
    class_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    hash_method: str = "xxhash64",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Predict per doc: (id_col, *keep_cols, pred_label,
    logjoint) where logjoint = ln p(class) + Σ cnt·ln p(bucket|class)
    for the winning class, rounded to 4 dp. Argmax ties break to the
    LARGER label (struct-max; the twin replays with ORDER BY logjoint
    DESC, label DESC). Token-less docs predict the prior argmax."""
    counts = (df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          _TOKEN_SPLIT_RE)).alias("term"))
        .filter(F.length("term") > 0)
        .withColumn("bucket", _bucket_col(hash_method, n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("cnt")))
    # ×k expansion AFTER the per-doc count agg; both model sides ride
    # broadcasts so the corpus never joins wide
    ll = (counts
          .crossJoin(F.broadcast(class_df.select("label",
                                                 "logp_default")))
          .join(F.broadcast(cond_df), ["label", "bucket"], "left")
          .withColumn("lp", F.coalesce("logp", "logp_default"))
          .groupBy(id_col, "label")
          .agg(F.sum(F.col("cnt") * F.col("lp")).alias("ll")))
    joint = (ll.join(F.broadcast(class_df.select("label", "logprior")),
                     "label")
             .withColumn("logjoint", F.col("ll") + F.col("logprior")))
    best = (joint.groupBy(id_col)
            .agg(F.max(F.struct("logjoint", "label")).alias("m"))
            .select(id_col,
                    F.col("m.label").alias("pred_label"),
                    F.col("m.logjoint").alias("lj")))
    # token-less fallback: the prior argmax, one broadcast scalar row
    prior = (class_df
             .agg(F.max(F.struct("logprior", "label")).alias("pm"))
             .select(F.col("pm.label").alias("__pl"),
                     F.col("pm.logprior").alias("__pj")))
    return (df.select(id_col, *keep_cols)
            .join(best, id_col, "left")
            .crossJoin(F.broadcast(prior))
            .select(id_col, *keep_cols,
                    F.coalesce("pred_label", "__pl")
                    .alias("pred_label"),
                    dround(F.coalesce("lj", "__pj"), 4)
                    .alias("logjoint")))


def naive_bayes_sql(
    table: str = "documents",
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 10,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of train_naive_bayes(md5) + score_naive_bayes on
    the same table (the driver self-classification shape): identical
    bucketing, smoothing, prior arithmetic, argmax tie-break, and
    rounding."""
    a = float(alpha)
    b = float(n_buckets)
    bucket = (f"CAST(CAST(('0x' || substr(md5(t.term), 1, 8)) AS BIGINT)"
              f" % {n_buckets} AS INTEGER)")
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, {label_col} AS label, {bucket} AS bucket
  FROM {table}, unnest(list_filter(
         string_split_regex(lower(trim({text_col})),
                            '{_TOKEN_SPLIT_RE}'),
         x -> len(x) > 0)) AS t(term)
), cond_counts AS (
  SELECT label, bucket, CAST(count(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY 1, 2
), tok_totals AS (
  SELECT label, sum(cnt) AS tok FROM cond_counts GROUP BY 1
), docs AS (
  SELECT {label_col} AS label, CAST(count(*) AS DOUBLE) AS d
  FROM {table} GROUP BY 1
), total AS (SELECT sum(d) AS n FROM docs),
classes AS (
  SELECT docs.label, ln(d / n) AS logprior,
         ln({a!r} / (coalesce(tok, 0.0) + {a * b!r})) AS logp_default
  FROM docs CROSS JOIN total
  LEFT JOIN tok_totals ON tok_totals.label = docs.label
), cond AS (
  SELECT c.label, c.bucket,
         ln((cnt + {a!r}) / (tok + {a * b!r})) AS logp
  FROM cond_counts c JOIN tok_totals USING (label)
), counts AS (
  SELECT id, bucket, CAST(count(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY 1, 2
), ll AS (
  SELECT ct.id, cl.label,
         sum(ct.cnt * coalesce(co.logp, cl.logp_default))
           + any_value(cl.logprior) AS logjoint
  FROM counts ct
  CROSS JOIN classes cl
  LEFT JOIN cond co ON co.label = cl.label AND co.bucket = ct.bucket
  GROUP BY 1, 2
), best AS (
  SELECT id, label AS pred_label, logjoint,
         row_number() OVER (PARTITION BY id
                            ORDER BY logjoint DESC, label DESC) AS rn
  FROM ll
), prior AS (
  SELECT label AS pl, logprior AS pj FROM classes
  ORDER BY logprior DESC, label DESC LIMIT 1
)
SELECT d.{id_col},
       coalesce(b.pred_label, prior.pl) AS pred_label,
       round(coalesce(b.logjoint, prior.pj), 4) AS logjoint
FROM (SELECT {id_col} FROM {table}) d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id = d.{id_col}
CROSS JOIN prior
"""


def reference_naive_bayes(
    docs: list[tuple[str, list[int]]],
    n_buckets: int,
    alpha: float = 1.0,
) -> tuple[dict[tuple[str, int], float], dict[str, tuple[float, float]]]:
    """Independent pure-Python NB on explicit (label, bucket-list)
    rows — the test oracle for train_naive_bayes. Returns
    ({(label, bucket): logp}, {label: (logprior, logp_default)})."""
    import math
    from collections import Counter

    nd = Counter(lbl for lbl, _ in docs)
    n = sum(nd.values())
    cc: Counter = Counter()
    tok: Counter = Counter()
    for lbl, bks in docs:
        for bk in bks:
            cc[(lbl, bk)] += 1
            tok[lbl] += 1
    cond = {k: math.log((v + alpha) / (tok[k[0]] + alpha * n_buckets))
            for k, v in cc.items()}
    cls = {lbl: (math.log(nd[lbl] / n),
                 math.log(alpha / (tok.get(lbl, 0) + alpha * n_buckets)))
           for lbl in nd}
    return cond, cls
