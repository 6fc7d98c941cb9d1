"""Character n-gram language-model quality scoring — the CCNet-style
perplexity filter (Wenzek et al. 2020 trains a KenLM on Wikipedia and
buckets Common Crawl by perplexity; the same shape here with a
corpus-trained char-level add-k model, zero external models).

Everything is Catalyst-native — no UDFs anywhere:

  * `train_char_lm`: one explode over the reference corpus → two
    map-side-combinable counts (n-gram, context prefix) + a scalar
    vocabulary size. The result is SMALL (≤ |charset|^n rows, and
    `top_k`-capped for the 100 TB path) — it broadcasts.
  * `lm_score`: per-document average negative log-likelihood under the
    trained model. Plan: one narrow n-gram explode over the corpus,
    two BROADCAST left joins against the model (the corpus never
    shuffles for the lookup), then a map-side-combinable
    sum/count agg keyed by doc id — the only exchange carries
    (doc_id, partial sums), never text.

Smoothing: add-k (Lidstone), p(g | ctx) = (c(g) + k) / (c(ctx) + k·V)
with V = distinct characters in the training corpus; unseen n-grams
and unseen contexts fall out of the same formula with c = 0, so the
score is total over arbitrary input. Scores are deterministic
(round-6 after the average) and replayed exactly by the DuckDB twin
`char_lm_score_sql`.

100 TB notes: training is one shuffle on short strings (the n-gram
key); `top_k` bounds the broadcast table when the charset is large
(CJK corpora) — dropped tail n-grams score through the smoothing
floor, a documented approximation the default `top_k=None` disables.
Scoring adds no joins wider than the broadcast and one partial agg;
a 1000-executor run is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .rounding import dround



def _char_ngrams(text_col: str, n: int) -> Column:
    """All character n-grams of `text_col` as an array (empty when the
    text is shorter than n; NULL text treated as empty). Pure Catalyst:
    sequence + transform + substring. NOTE: the per-position substring
    runs INTERPRETED inside the lambda and the gram-string array is
    materialized per row — hot paths should use _exploded_char_ngrams
    (explode positions, substring flat under codegen) instead."""
    c = f"coalesce({text_col}, '')"
    return F.expr(
        f"CASE WHEN length({c}) >= {n} THEN "
        f"transform(sequence(0, length({c}) - {n}), "
        f"i -> substring({c}, i + 1, {n})) "
        f"ELSE array() END")


def _exploded_char_ngrams(
    df: DataFrame,
    text_col: str,
    n: int,
    keep: "tuple[str, ...]" = (),
    outer: bool = False,
    alias: str = "ngram",
) -> DataFrame:
    """(keep..., <alias>) with one row per character n-gram: the
    POSITIONS are exploded first and the gram substring is computed as
    a flat projection — codegen'd, no per-row gram-string array —
    where explode(_char_ngrams(...)) evaluates the substring inside an
    interpreted higher-order lambda and materializes the array. Same
    grams in the same order (positions 1..len-n+1); with outer=True an
    empty/short text yields one NULL-gram row (substring null-
    propagates from the null position), matching explode_outer over
    the array form."""
    c = f"coalesce({text_col}, '')"
    idx = F.expr(
        f"CASE WHEN length({c}) >= {n} THEN "
        f"sequence(1, length({c}) - {n - 1}) "
        f"ELSE CAST(array() AS array<int>) END")
    gen = F.explode_outer(idx) if outer else F.explode(idx)
    ex = df.select(*keep, F.col(text_col), gen.alias("__i"))
    return ex.select(*keep,
                     F.expr(f"substring({c}, __i, {n})").alias(alias))


def train_char_lm(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    top_k: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Count char n-grams and their (n-1)-char context prefixes over a
    reference corpus. Returns (ngram_counts(ngram, cnt),
    context_counts(ctx, ctx_cnt), vocab_size).

    `top_k` keeps only the most frequent n-grams (ties broken by
    n-gram value for determinism) — the bounded-broadcast scale path;
    context counts stay complete (they are ≤ |charset|^(n-1)).

    One corpus pass (r17): the old form exploded the corpus THREE
    times (n-grams, (n-1)-grams, 1-grams). Context and vocabulary
    derive exactly from the bounded n-gram count table plus narrow
    per-document tail projections instead:

      * ctx: every (n-1)-gram occurrence at position i <= len-n+1 is
        the prefix of the n-gram at i, so ctx_cnt = sum of cnt over
        n-grams sharing the prefix, PLUS one occurrence per document
        for the final position len-n+2 (exists iff len >= n-1 —
        documents shorter than n have no n-gram and contribute only
        that tail gram). Integer sums — count-identical to the
        (n-1)-gram explode.
      * vocab: distinct chars = first chars of the observed n-grams
        (positions 1..len-n+1) ∪ chars of each document's last
        min(n-1, len) characters (positions len-n+2..len; the whole
        text when len < n). Set-identical to the 1-gram explode.

    The n-gram table is lifecycle-persisted (it feeds the returned
    counts, the ctx derivation and the vocab scalar — and it is the
    same bounded table callers already broadcast into lm_score)."""
    if n < 2:
        grams = _exploded_char_ngrams(df, text_col, n)
        counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt"))
        if top_k is not None:
            counts = (counts
                      .orderBy(F.desc("cnt"), F.asc("ngram"))
                      .limit(top_k))
        ctx = (_exploded_char_ngrams(df, text_col, n - 1, alias="ctx")
               .groupBy("ctx").agg(F.count("*").alias("ctx_cnt")))
        vocab = (_exploded_char_ngrams(df, text_col, 1, alias="ch")
                 .agg(F.countDistinct("ch").alias("v"))
                 .collect()[0]["v"])
        return counts, ctx, int(vocab)

    from .lifecycle import track_persist

    grams = _exploded_char_ngrams(df, text_col, n)
    full = track_persist(
        grams.groupBy("ngram").agg(F.count("*").alias("cnt")))
    cexp = f"coalesce({text_col}, '')"
    tail = f"substring({cexp}, greatest(length({cexp}) - {n - 2}, 1))"
    # the one (n-1)-gram position no n-gram prefix covers
    ctx_extra = (df.select(F.expr(
        f"CASE WHEN length({cexp}) >= {n - 1} THEN "
        f"substring({cexp}, length({cexp}) - {n - 2}, {n - 1}) END")
        .alias("ctx"))
        .filter(F.col("ctx").isNotNull())
        .withColumn("cnt", F.lit(1).cast("long")))
    ctx = (full.select(
        F.expr(f"substring(ngram, 1, {n - 1})").alias("ctx"), "cnt")
        .unionByName(ctx_extra)
        .groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt")))
    first_chars = full.select(
        F.expr("substring(ngram, 1, 1)").alias("ch"))
    tail_chars = df.select(F.explode(F.expr(
        f"CASE WHEN length({cexp}) >= 1 THEN "
        f"transform(sequence(1, length({tail})), "
        f"i -> substring({tail}, i, 1)) "
        f"ELSE array() END")).alias("ch"))
    vocab = (first_chars.unionByName(tail_chars)
             .agg(F.countDistinct("ch").alias("v"))
             .collect()[0]["v"])
    counts = full
    if top_k is not None:
        counts = (counts
                  .orderBy(F.desc("cnt"), F.asc("ngram"))
                  .limit(top_k))
    return counts, ctx, int(vocab)


def lm_score(
    df: DataFrame,
    ngram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: float = 1.0,
) -> DataFrame:
    """Per-document average negative log-likelihood (natural log) under
    the add-k char n-gram model → (id_col, n_ngrams, nll). Lower nll =
    more in-distribution; documents shorter than n chars score NULL
    (no evidence). Filter with e.g. `.filter("nll <= 6.0")` — the
    CCNet head/middle/tail cut is a quantile on this column."""
    v = int(vocab_size)
    # explode_OUTER keeps documents shorter than n as a single
    # NULL-ngram row, so they surface with a NULL score from the SAME
    # aggregation — no join-back, no second shuffle
    exploded = (_exploded_char_ngrams(df, text_col, n,
                                      keep=(id_col,), outer=True)
                .withColumn("ctx", F.expr(f"substring(ngram, 1, {n - 1})")))
    joined = (exploded
              .join(F.broadcast(ngram_counts), "ngram", "left")
              .join(F.broadcast(context_counts), "ctx", "left"))
    logp = F.when(
        F.col("ngram").isNotNull(),
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
             + F.lit(k))
            / (F.coalesce(F.col("ctx_cnt"), F.lit(0)).cast("double")
               + F.lit(k * v))))
    return (joined
            .groupBy(id_col)
            .agg(F.count("ngram").alias("n_ngrams"),
                 dround(-F.sum(logp) / F.count("ngram"), 6)
                 .alias("nll")))


def char_lm_self_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: float = 1.0,
    top_k: int | None = None,
) -> DataFrame:
    """Train on the corpus and score every document against it — the
    outlier-detection usage (high nll = text unlike the corpus:
    boilerplate, foreign-language, mojibake). One pass composition of
    train_char_lm + lm_score. The input is _spread once up front:
    char-n-gram cost tracks rows, not file bytes, so a single-file
    local input must fan out before the explodes (no-op on wide
    scans). A spread that actually happened is persisted (lifecycle-
    tracked): train + score are two separate traversals and exchange
    output is not reused across actions."""
    from .dedup import _spread
    from .lifecycle import track_persist

    spread = _spread(df)
    if spread is not df:
        spread = track_persist(spread)
    df = spread
    counts, ctx, vocab = train_char_lm(df, text_col, n=n, top_k=top_k)
    return lm_score(df, counts, ctx, vocab, id_col=id_col,
                    text_col=text_col, n=n, k=k)


def char_lm_score_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n: int = 3,
    k: float = 1.0,
) -> str:
    """DuckDB twin of char_lm_self_score (top_k=None): identical
    n-gram enumeration, add-k arithmetic and round-6 average."""
    c = f"coalesce({text_expr}, '')"

    def grams(m: int) -> str:
        return (f"CASE WHEN length({c}) >= {m} THEN "
                f"list_transform(range(0, length({c}) - {m} + 1), "
                f"i -> substr({c}, i + 1, {m})) "
                f"ELSE [] END")

    return f"""
WITH grams AS (
  SELECT {id_col}, unnest({grams(n)}) AS ngram FROM {table}
), counts AS (
  SELECT ngram, count(*) AS cnt FROM grams GROUP BY ngram
), ctxs AS (
  SELECT ctx, count(*) AS ctx_cnt FROM (
    SELECT unnest({grams(n - 1)}) AS ctx FROM {table}
  ) GROUP BY ctx
), vocab AS (
  SELECT count(DISTINCT ch) AS v FROM (
    SELECT unnest({grams(1)}) AS ch FROM {table}
  )
), scored AS (
  SELECT g.{id_col},
         count(*) AS n_ngrams,
         sum(ln((coalesce(c.cnt, 0) + {k}) /
                (coalesce(x.ctx_cnt, 0) + {k} * v.v))) AS sum_logp
  FROM grams g
  LEFT JOIN counts c USING (ngram)
  LEFT JOIN ctxs x ON x.ctx = substr(g.ngram, 1, {n - 1})
  CROSS JOIN vocab v
  GROUP BY g.{id_col}
)
SELECT d.{id_col},
       coalesce(s.n_ngrams, 0) AS n_ngrams,
       round(-s.sum_logp / s.n_ngrams, 6) AS nll
FROM {table} d LEFT JOIN scored s USING ({id_col})
"""


def lm_buckets(
    scored: DataFrame,
    nll_col: str = "nll",
    mode: str = "approx",
    relative_error: float = 0.001,
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing on the LM score: the
    best-scoring third of documents is `head`, then `middle`, `tail`
    (Wenzek et al. 2020 split Common Crawl exactly this way and train
    preferentially on head+middle). Rows with NULL score (sub-n-char
    docs) get a NULL bucket.

    mode='exact': percent_rank over a global sort — replayable
    row-for-row by the DuckDB twin, but the sort funnels through one
    task; use for oracle checks and small corpora.
    mode='approx' (default): two thresholds from approxQuantile
    (Greenwald-Khanna sketch, one pass, driver gets 2 doubles) then a
    narrow comparison projection — the 100 TB path, no global sort,
    bucket boundaries within `relative_error` of exact.
    """
    nn = scored.filter(F.col(nll_col).isNotNull())
    nulls = (scored.filter(F.col(nll_col).isNull())
             .withColumn("lm_bucket", F.lit(None).cast("string")))
    if mode == "exact":
        from pyspark.sql import Window

        pr = F.percent_rank().over(Window.orderBy(nll_col))
        bucketed = nn.withColumn(
            "lm_bucket",
            F.when(pr * 3 < 1, F.lit("head"))
             .when(pr * 3 < 2, F.lit("middle"))
             .otherwise(F.lit("tail")))
    elif mode == "approx":
        q = nn.approxQuantile(nll_col, [1 / 3, 2 / 3],
                              relative_error)
        if len(q) < 2:  # zero non-null scores: approxQuantile -> []
            bucketed = nn.withColumn(
                "lm_bucket", F.lit(None).cast("string"))
        else:
            lo, hi = q
            bucketed = nn.withColumn(
                "lm_bucket",
                F.when(F.col(nll_col) <= lo, F.lit("head"))
                 .when(F.col(nll_col) <= hi, F.lit("middle"))
                 .otherwise(F.lit("tail")))
    else:
        raise ValueError(f"bad mode {mode}")
    return bucketed.unionByName(nulls)


def lm_buckets_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n: int = 3,
    k: float = 1.0,
) -> str:
    """DuckDB twin of char_lm_self_score → lm_buckets(mode='exact'):
    same ranking (percent_rank over non-null scores only) and the
    same integer-safe third-cut comparisons."""
    inner = char_lm_score_sql(table, id_col, text_expr, n=n, k=k)
    return f"""
WITH scored AS ({inner}),
ranked AS (
  SELECT *, percent_rank() OVER (ORDER BY nll) AS pr
  FROM scored WHERE nll IS NOT NULL
)
SELECT {id_col}, n_ngrams, nll,
       CASE WHEN pr * 3 < 1 THEN 'head'
            WHEN pr * 3 < 2 THEN 'middle'
            ELSE 'tail' END AS lm_bucket
FROM ranked
UNION ALL
SELECT {id_col}, n_ngrams, nll, NULL AS lm_bucket
FROM scored WHERE nll IS NULL
"""
