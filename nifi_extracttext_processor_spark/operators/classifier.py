"""Linear text quality classifier — the fastText/CCNet filtering shape
without MLlib or external models.

The GPT-3 / CCNet data pipelines filter web text with a linear
classifier trained to separate a "high quality" reference corpus
(Wikipedia/books) from raw crawl (Brown et al. 2020 appendix A;
Wenzek et al. 2020). This module reproduces that shape natively on
Spark: hashed bag-of-words features -> logistic regression trained by
distributed sparse gradient aggregation -> a broadcast-weight scoring
pass over the corpus.

Scale design (what survives 100x):

- TRAIN: the labeled set (typically 10^5-10^7 docs, tiny next to the
  corpus) is featurized ONCE into per-doc sparse (buckets, counts)
  arrays — one map-side-combinable (id, bucket) shuffle — and
  persisted. Each GD iteration is then a map-only Arrow pass emitting
  per-partition SPARSE gradient partials (one row per active bucket
  per partition, combined map-side), so the per-iteration shuffle and
  driver transfer are bounded by n_buckets, never by rows. The dense
  weight vector (n_buckets+1 float64, ~0.5 MB at 2^16) broadcasts per
  iteration.
- SCORE: the corpus-side pass is pure Catalyst — explode tokens,
  hash-bucket, join the BROADCAST weight table, one (id) sum — zero
  Python, and the corpus never shuffles anything wider than
  (id, bucket) rows. For very large n_buckets an Arrow kernel path
  (`method="arrow"`) ships the weights as one numpy broadcast and
  scores each batch with a dict lookup, keeping plan size O(1).

Hashing: `xxhash64` (JVM built-in) is the scale path;
`md5` (conv(substr(md5,1,8))) is the engine-portable twin the DuckDB
oracle can replay — the same dual the split_by_hash family uses.

Oracle story: training is iterative (genuinely non-SQL-expressible),
so its contract is pytest (loss decreases, separates a synthetic
corpus, matches an independent numpy LR on the same features).
SCORING is fully SQL-expressible: score_text_sql replays the
md5-bucket + weight-lookup + logit arithmetic in DuckDB, and the
driver query uses deterministic integer-arithmetic pseudo-weights so
both engines compute bit-identical logits with no VALUES payload.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


# house token convention (top_terms / tfidf / hashed_tf / bm25)
_TOKEN_SPLIT_RE = r"\s+"

_KNUTH = 2654435761  # Knuth multiplicative constant for pseudo-weights
_PSEUDO_MOD = 1000003


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          _TOKEN_SPLIT_RE)).alias("term"))
        .filter(F.length("term") > 0))


def _bucket_col(hash_method: str, n_buckets: int):
    if hash_method == "xxhash64":
        return F.pmod(F.xxhash64(F.col("term")),
                      F.lit(n_buckets)).cast("int")
    if hash_method == "md5":
        return (F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
                .cast("long") % n_buckets).cast("int")
    raise ValueError(f"unknown hash_method {hash_method!r}")


def hashed_doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    hash_method: str = "xxhash64",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc sparse features: (id_col, *extra_cols, buckets
    array<int>, counts array<double>). Docs with no tokens keep a row
    with empty arrays (left join back — never dropped). One
    map-side-combinable shuffle; bucket order inside the arrays is
    ascending so downstream arithmetic is deterministic."""
    toks = _tokens(df, id_col, text_col)
    counts = (toks.withColumn("bucket", _bucket_col(hash_method,
                                                    n_buckets))
              .groupBy(id_col, "bucket")
              .agg(F.count("*").cast("double").alias("cnt")))
    arrs = (counts
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(
                F.struct("bucket", "cnt"))).alias("bc"))
            .select(id_col,
                    F.col("bc.bucket").alias("buckets"),
                    F.col("bc.cnt").alias("counts")))
    keep = [id_col, *extra_cols]
    return (df.select(*keep)
            .join(arrs, id_col, "left")
            .withColumn("buckets", F.coalesce(
                "buckets", F.array().cast("array<int>")))
            .withColumn("counts", F.coalesce(
                "counts", F.array().cast("array<double>"))))


def train_text_classifier(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    hash_method: str = "xxhash64",
    n_iter: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> tuple[list[float], float, list[float]]:
    """Binary logistic regression by full-batch gradient descent.

    Returns (weights[n_buckets], bias, loss_history). label_col must
    be 0/1 and id_col unique per row (duplicate ids would double-join
    their features). Features are L1-normalized per doc (fastText convention:
    mean of bucket one-hots) so document length doesn't dominate.

    Per iteration: broadcast dense w -> map-only Arrow pass emits
    sparse per-partition gradient partials (bucket, g) plus the
    (loss, bias-grad, n) scalars under bucket=-1/-2 conventions ->
    one <=n_buckets-row combine -> driver dense update. Nothing
    driver-side ever exceeds O(n_buckets)."""
    import numpy as np

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    feats = hashed_doc_features(
        df, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        hash_method=hash_method, extra_cols=(label_col,))
    feats = (feats
             .select(F.col(label_col).cast("double").alias("y"),
                     "buckets", "counts")
             .filter(F.size("buckets") > 0)
             .persist())
    try:
        n_docs = feats.count()
        if n_docs == 0:
            raise ValueError("train_text_classifier: no non-empty docs")
        w = np.zeros(n_buckets, dtype=np.float64)
        b = 0.0
        sc = df.sparkSession.sparkContext
        history: list[float] = []
        for _ in range(n_iter):
            bw = sc.broadcast((w, b))

            def part(batches):
                import pandas as pd
                W, B = bw.value
                grad: dict[int, float] = {}
                gb = 0.0
                loss = 0.0
                for pdf in batches:
                    for y, bks, cts in zip(pdf["y"], pdf["buckets"],
                                           pdf["counts"]):
                        bks = np.asarray(bks, dtype=np.int64)
                        cts = np.asarray(cts, dtype=np.float64)
                        x = cts / cts.sum()        # L1 normalize
                        z = float(W[bks] @ x) + B
                        p = 1.0 / (1.0 + math.exp(-z))
                        # clamped log-loss (numerical floor 1e-12)
                        q = min(max(p if y > 0.5 else 1.0 - p,
                                    1e-12), 1.0)
                        loss -= math.log(q)
                        d = p - y
                        gb += d
                        for j, xj in zip(bks, x):
                            grad[int(j)] = grad.get(int(j), 0.0) + d * xj
                rows = [(k, v) for k, v in grad.items()]
                rows.append((-1, gb))
                rows.append((-2, loss))
                yield pd.DataFrame(rows, columns=["bucket", "g"])

            partials = (feats.mapInPandas(part, "bucket int, g double")
                        .groupBy("bucket").agg(F.sum("g").alias("g"))
                        .collect())
            bw.destroy()
            gdict = {r["bucket"]: r["g"] for r in partials}
            loss = gdict.pop(-2, 0.0) / n_docs
            gb = gdict.pop(-1, 0.0) / n_docs
            g = np.zeros_like(w)
            for j, v in gdict.items():
                g[j] = v / n_docs
            g += l2 * w
            w -= lr * g
            b -= lr * gb
            history.append(loss + 0.5 * l2 * float(w @ w))
        return w.tolist(), float(b), history
    finally:
        feats.unpersist()


def score_text(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_method: str = "xxhash64",
    method: str = "catalyst",
    normalize: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every doc: logit = w . x + b (x L1-normalized counts when
    `normalize`), prob = sigmoid(logit), both rounded to 4 dp.
    Token-less docs score the bias alone (never dropped).

    method="catalyst": zero-UDF — tokens explode, hash-bucket, join
    the BROADCAST (bucket, w) table (only nonzero weights ship), one
    per-doc sum. method="arrow": the dense weight vector rides one
    SparkContext broadcast into a map-only kernel — plan size O(1) in
    n_buckets, for weight tables too big to enumerate as a relation.
    Identical results (equivalence-tested)."""
    n_buckets = len(weights)
    if n_buckets < 1:
        raise ValueError("empty weight vector")
    if method == "arrow":
        return _score_arrow(df, weights, bias, id_col, text_col,
                            hash_method, normalize, keep_cols)
    if method != "catalyst":
        raise ValueError(f"unknown method {method!r}")
    spark = df.sparkSession
    wrows = [(j, float(wj)) for j, wj in enumerate(weights)
             if wj != 0.0]
    wdf = spark.createDataFrame(wrows or [(0, 0.0)],
                                "bucket int, w double")
    toks = _tokens(df, id_col, text_col)
    counts = (toks.withColumn("bucket", _bucket_col(hash_method,
                                                    n_buckets))
              .groupBy(id_col, "bucket")
              .agg(F.count("*").cast("double").alias("cnt")))
    dots = (counts
            .join(F.broadcast(wdf), "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.coalesce("w", F.lit(0.0)))
                 .alias("dot"),
                 F.sum("cnt").alias("tot")))
    logit = (F.when(F.col("tot") > 0,
                    F.col("dot") / F.col("tot") if normalize
                    else F.col("dot"))
             .otherwise(F.lit(0.0)) + F.lit(float(bias)))
    out = (df.select(id_col, *keep_cols)
           .join(dots, id_col, "left")
           .withColumn("logit", dround(
               F.coalesce(logit, F.lit(float(bias))), 4))
           .withColumn("prob", dround(
               F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 4))
           .drop("dot", "tot"))
    return out


def _score_arrow(df, weights, bias, id_col, text_col, hash_method,
                 normalize, keep_cols):
    import numpy as np

    if hash_method != "xxhash64":
        raise ValueError("arrow scoring implements the xxhash64 scale "
                         "path; use catalyst for md5 oracle replay")
    n_buckets = len(weights)
    # hash JVM-side (same xxhash64 as the catalyst path), dot in Arrow
    feats = hashed_doc_features(
        df, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        hash_method=hash_method, extra_cols=keep_cols)
    bw = df.sparkSession.sparkContext.broadcast(
        np.asarray(weights, dtype=np.float64))
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in feats.schema.fields
              if f.name not in ("buckets", "counts")]
    schema = ", ".join(fields + ["logit double", "prob double"])
    bias_f = float(bias)
    do_norm = bool(normalize)

    def run(batches):
        W = bw.value
        for pdf in batches:
            logits = []
            for bks, cts in zip(pdf["buckets"], pdf["counts"]):
                bks = np.asarray(bks, dtype=np.int64)
                cts = np.asarray(cts, dtype=np.float64)
                if len(bks) == 0:
                    z = bias_f
                else:
                    x = cts / cts.sum() if do_norm else cts
                    z = float(W[bks] @ x) + bias_f
                logits.append(round(z, 4))
            out = pdf.drop(columns=["buckets", "counts"])
            out["logit"] = logits
            out["prob"] = [round(1.0 / (1.0 + math.exp(-z)), 4)
                           for z in logits]
            yield out

    return feats.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# oracle-portable scoring twins
# ---------------------------------------------------------------------------

def pseudo_weight_expr(bucket_expr: str) -> str:
    """Deterministic pseudo-weight in [-0.5, 0.5) from a bucket id via
    pure integer arithmetic — bit-identical in Spark SQL and DuckDB,
    no literal weight payload. Used by the driver query so the oracle
    can replay scoring without replaying training."""
    return (f"(CAST(({bucket_expr}) * {_KNUTH} % {_PSEUDO_MOD} "
            f"AS DOUBLE) / {_PSEUDO_MOD} - 0.5)")


def score_pseudo(
    df: DataFrame,
    n_buckets: int = 1 << 10,
    bias: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The driver-registered scoring query: md5 buckets + pseudo
    weights, emitting (id, n_tokens, logit, label_pred). Exercises the
    exact plan shape of score_text(method='catalyst') — explode,
    bucket, weight lookup (here an expression instead of a broadcast
    relation), per-doc normalized sum — with arithmetic DuckDB can
    replay bit-for-bit (no exp; the logit is multiply-add only)."""
    toks = _tokens(df, id_col, text_col)
    bucket = _bucket_col("md5", n_buckets)
    w = F.expr(pseudo_weight_expr("bucket"))
    counts = (toks.withColumn("bucket", bucket)
              .groupBy(id_col, "bucket")
              .agg(F.count("*").cast("double").alias("cnt")))
    dots = (counts.withColumn("w", w)
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("dot"),
                 F.sum("cnt").alias("tot")))
    return (df.select(id_col)
            .join(dots, id_col, "left")
            .withColumn("n_tokens", F.coalesce(
                F.col("tot"), F.lit(0.0)).cast("long"))
            .withColumn("logit", dround(
                F.when(F.col("tot") > 0, F.col("dot") / F.col("tot"))
                .otherwise(F.lit(0.0)) + F.lit(float(bias)), 4))
            .withColumn("label_pred",
                        (F.col("logit") > 0).cast("boolean"))
            .select(id_col, "n_tokens", "logit", "label_pred"))


def score_pseudo_sql(
    table: str = "documents",
    n_buckets: int = 1 << 10,
    bias: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of score_pseudo (same md5 bucket, same pseudo
    weights, same normalization and rounding)."""
    bucket = (f"CAST(CAST(('0x' || substr(md5(t.term), 1, 8)) AS BIGINT)"
              f" % {n_buckets} AS INTEGER)")
    return f"""
WITH toks AS (
  SELECT {id_col}, t.term AS term
  FROM {table}, unnest(string_split_regex(lower(trim({text_col})),
                                          '{_TOKEN_SPLIT_RE}')) AS t(term)
  WHERE len(t.term) > 0
), counts AS (
  SELECT {id_col}, {bucket} AS bucket,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM toks t GROUP BY 1, 2
), dots AS (
  SELECT {id_col},
         sum(cnt * {pseudo_weight_expr('bucket')}) AS dot,
         sum(cnt) AS tot
  FROM counts GROUP BY 1
)
SELECT d.{id_col},
       CAST(coalesce(tot, 0.0) AS BIGINT) AS n_tokens,
       round(CASE WHEN tot > 0 THEN dot / tot ELSE 0.0 END
             + {float(bias)!r}, 4) AS logit,
       (round(CASE WHEN tot > 0 THEN dot / tot ELSE 0.0 END
              + {float(bias)!r}, 4) > 0) AS label_pred
FROM (SELECT {id_col} FROM {table}) d
LEFT JOIN dots USING ({id_col})
"""


def reference_lr(
    features: list[tuple[float, list[int], list[float]]],
    n_buckets: int,
    n_iter: int,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> tuple[list[float], float, list[float]]:
    """Independent dense-numpy LR on explicit (y, buckets, counts)
    rows — the test oracle for train_text_classifier. Plain
    full-batch GD, same L1 normalization, same clamped loss."""
    import numpy as np

    X = np.zeros((len(features), n_buckets), dtype=np.float64)
    y = np.zeros(len(features), dtype=np.float64)
    for i, (yi, bks, cts) in enumerate(features):
        y[i] = yi
        c = np.asarray(cts, dtype=np.float64)
        X[i, np.asarray(bks, dtype=np.int64)] = c / c.sum()
    w = np.zeros(n_buckets)
    b = 0.0
    hist = []
    for _ in range(n_iter):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        q = np.clip(np.where(y > 0.5, p, 1.0 - p), 1e-12, 1.0)
        loss = float(-np.log(q).mean())
        d = p - y
        g = X.T @ d / len(y) + l2 * w
        gb = float(d.mean())
        w -= lr * g
        b -= lr * gb
        hist.append(loss + 0.5 * l2 * float(w @ w))
    return w.tolist(), float(b), hist


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    prior_weight: float = 10.0,
    out_col: str = "te",
    round_dp: int = 6,
) -> DataFrame:
    """Leave-one-out target encoding with prior smoothing (the
    Micci-Barreca 2001 categorical encoder, LOO variant): each row's
    category is replaced by the mean target of the OTHER rows in its
    category, shrunk toward the global mean,

        te_i = (S_c − y_i + m·ȳ) / (n_c − 1 + m)

    — excluding the row's own y is what keeps the feature from
    leaking its own label into training (plain category-mean encoding
    memorizes singleton categories perfectly). n_c = 1 rows collapse
    to exactly the smoothed prior. NULL y rows get the prior-smoothed
    category mean WITHOUT the LOO subtraction (they contribute no
    label to leak; they're also excluded from S_c/n_c).

    Exactness: S_c and the global sum are exact-grid decimals;
    each te is one fixed-association IEEE chain. Scale: one
    category-keyed agg broadcast back onto the rows (categories are
    bounded); zero UDF."""
    if prior_weight < 0:
        raise ValueError("prior_weight must be >= 0")
    y = F.col(y_col).cast("double")
    q = F.round(y * 1e6).cast("decimal(38,0)")
    per_c = (df.filter(y.isNotNull())
             .groupBy(F.col(cat_col).alias("__c"))
             .agg(F.sum(q).alias("__sc"),
                  F.count("*").alias("__nc")))
    g = (df.filter(y.isNotNull())
         .agg(F.sum(q).alias("__sg"), F.count("*").alias("__ng")))
    j = (df.join(F.broadcast(per_c),
                 df[cat_col] == F.col("__c"), "left")
         .crossJoin(F.broadcast(g)))
    m = F.lit(float(prior_weight))
    gmean = (F.col("__sg").cast("double")
             / (F.col("__ng").cast("double") * F.lit(1e6)))
    sc = F.coalesce(F.col("__sc"), F.lit(0).cast("decimal(38,0)")) \
        .cast("double") / F.lit(1e6)
    nc = F.coalesce(F.col("__nc"), F.lit(0)).cast("double")
    # try_divide: singleton category at prior_weight=0 has a zero
    # denominator — NULL, never the row's own label (ANSI raises)
    te_loo = F.try_divide(sc - y + m * gmean, nc - F.lit(1.0) + m)
    te_prior = F.try_divide(sc + m * gmean, nc + m)
    te = F.when(y.isNotNull(), te_loo).otherwise(te_prior)
    return (j.withColumn(out_col, dround(te, round_dp))
            .drop("__c", "__sc", "__nc", "__sg", "__ng"))


def target_encode_loo_sql(
    table: str,
    cat_col: str,
    y_col: str,
    prior_weight: float = 10.0,
    out_col: str = "te",
    round_dp: int = 6,
    select: str = "*",
) -> str:
    """DuckDB twin of target_encode_loo (same grid sums, same
    chain)."""
    m = float(prior_weight)
    return f"""
WITH per_c AS (
  SELECT {cat_col} AS c,
         sum(CAST(round(CAST({y_col} AS DOUBLE) * 1e6) AS HUGEINT))
           AS sc,
         count(*) AS nc
  FROM {table} WHERE {y_col} IS NOT NULL GROUP BY {cat_col}
),
g AS (
  SELECT sum(CAST(round(CAST({y_col} AS DOUBLE) * 1e6) AS HUGEINT))
           AS sg,
         count(*) AS ng
  FROM {table} WHERE {y_col} IS NOT NULL
)
SELECT {select},
       round(CASE WHEN t.{y_col} IS NOT NULL THEN
               CASE WHEN coalesce(nc, 0)::DOUBLE - 1.0 + {m!r} != 0
                 THEN ((coalesce(sc, 0::HUGEINT)::DOUBLE / 1e6)
                       - CAST(t.{y_col} AS DOUBLE)
                       + {m!r} * (sg::DOUBLE / (ng::DOUBLE * 1e6)))
                      / (coalesce(nc, 0)::DOUBLE - 1.0 + {m!r}) END
             ELSE
               CASE WHEN coalesce(nc, 0)::DOUBLE + {m!r} != 0
                 THEN ((coalesce(sc, 0::HUGEINT)::DOUBLE / 1e6)
                       + {m!r} * (sg::DOUBLE / (ng::DOUBLE * 1e6)))
                      / (coalesce(nc, 0)::DOUBLE + {m!r}) END
             END, {round_dp}) AS {out_col}
FROM {table} t
LEFT JOIN per_c ON t.{cat_col} = per_c.c
CROSS JOIN g
"""
