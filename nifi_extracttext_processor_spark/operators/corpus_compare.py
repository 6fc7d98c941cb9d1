"""Corpus-vs-corpus comparison: which TERMS distinguish corpus A from
corpus B (Monroe, Colaresi & Quinn 2008 "Fightin' Words" — log-odds
with an informative Dirichlet prior), and how well a tokenizer's
vocabulary covers a corpus (OOV rate). The vocabulary-level
complements to drift.py (numeric distributions) and featsel.py
(labeled per-document classes): here the unit is the corpus pair —
"did this month's crawl change register", "what leaks into split B
that split A lacks", "is this vocab stale for this source".

Log-odds construction (the paper's δ and z):

    δ_w = ln( (y_aw + α_w) / (n_a + α0 − y_aw − α_w) )
        − ln( (y_bw + α_w) / (n_b + α0 − y_bw − α_w) )
    σ²_w ≈ 1/(y_aw + α_w) + 1/(y_bw + α_w)
    z_w  = δ_w / σ_w

with the prior α_w = prior_scale · (y_aw + y_bw) / (n_a + n_b)
(the combined corpus as the Dirichlet direction — the paper's
informative choice, which shrinks rare-word noise that raw log-odds
and PMI amplify). Positive z → A-distinctive, negative → B.

Scale shape: two token-count aggregations (map-side combinable,
vocab-bounded) + one full-outer join on the word key + narrow scalar
arithmetic; top-k lands as TakeOrderedAndProject. Nothing carries
text past tokenization. Determinism: per-word scalar ln/sqrt chains
(no big transcendental sums), round-4 outputs, |z| desc + word
tie-break — the DuckDB twin replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


from .classifier import _TOKEN_SPLIT_RE


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0)
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("y")))


def log_odds_terms(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    prior_scale: float = 100.0,
    min_count: int = 5,
    top_k: int = 50,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k |z| terms: (word, y_a, y_b, delta, z) ordered by |z|
    desc then word. `min_count` drops words whose COMBINED count is
    below it (prior shrinkage already handles moderate rarity; the
    floor keeps hapax noise out of the cut)."""
    if prior_scale <= 0:
        raise ValueError("prior_scale must be > 0")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    ca = _word_counts(a, text_col).withColumnRenamed("y", "y_a")
    cb = _word_counts(b, text_col).withColumnRenamed("y", "y_b")
    j0 = (ca.join(cb, "word", "full_outer")
          .select("word",
                  F.coalesce("y_a", F.lit(0)).alias("y_a"),
                  F.coalesce("y_b", F.lit(0)).alias("y_b")))
    from .lifecycle import track_persist
    j0 = track_persist(j0)
    # n_a/n_b are the paper's n = TOTAL corpus tokens, so they aggregate
    # the UNFILTERED counts; min_count only prunes which words get
    # scored/cut (previously totals summed surviving words only, which
    # biased delta/z when the filter pruned much mass).
    tot = j0.agg(F.sum("y_a").alias("n_a"),
                 F.sum("y_b").alias("n_b"))
    j = j0.filter(F.col("y_a") + F.col("y_b") >= min_count)
    d = j.crossJoin(F.broadcast(tot))
    alpha_w = (F.lit(float(prior_scale))
               * (F.col("y_a") + F.col("y_b"))
               / (F.col("n_a") + F.col("n_b")))
    alpha0 = F.lit(float(prior_scale))

    def side(y, n):
        num = y + alpha_w
        den = n + alpha0 - y - alpha_w
        return F.log(num / den)

    delta = (side(F.col("y_a"), F.col("n_a"))
             - side(F.col("y_b"), F.col("n_b")))
    var = (1.0 / (F.col("y_a") + alpha_w)
           + 1.0 / (F.col("y_b") + alpha_w))
    z = delta / F.sqrt(var)
    return (d.select("word", "y_a", "y_b",
                     (dround(delta, round_dp) + F.lit(0.0)).alias("delta"),
                     (dround(z, round_dp) + F.lit(0.0)).alias("z"))
            .orderBy(F.desc(F.abs(dround(z, round_dp))), "word")
            .limit(top_k))


def log_odds_terms_sql(
    a_table: str,
    b_table: str,
    text_expr: str = "text",
    prior_scale: float = 100.0,
    min_count: int = 5,
    top_k: int = 50,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of log_odds_terms (identical tokenization, prior,
    arithmetic, rounding, and cut order)."""
    def wc(table):
        return f"""
  SELECT word, count(*) AS y FROM (
    SELECT unnest(list_filter(
        string_split_regex(lower(trim({text_expr})),
                           '{_TOKEN_SPLIT_RE}'),
        x -> len(x) > 0)) AS word
    FROM {table}
  ) GROUP BY word"""
    return f"""
WITH ca AS ({wc(a_table)}), cb AS ({wc(b_table)}),
j0 AS (
  SELECT coalesce(ca.word, cb.word) AS word,
         coalesce(ca.y, 0) AS y_a, coalesce(cb.y, 0) AS y_b
  FROM ca FULL OUTER JOIN cb ON ca.word = cb.word
),
-- totals from the UNFILTERED counts (the paper's n = total tokens);
-- min_count prunes only which words get scored/cut
tot AS (SELECT sum(y_a)::DOUBLE AS n_a, sum(y_b)::DOUBLE AS n_b
        FROM j0),
j AS (SELECT * FROM j0 WHERE y_a + y_b >= {int(min_count)}),
scored AS (
  SELECT word, y_a, y_b,
         ln((y_a + aw) / (n_a + {float(prior_scale)!r} - y_a - aw))
         - ln((y_b + aw) / (n_b + {float(prior_scale)!r} - y_b - aw))
           AS delta,
         sqrt(1.0 / (y_a + aw) + 1.0 / (y_b + aw)) AS sd
  FROM (
    SELECT word, y_a, y_b, n_a, n_b,
           {float(prior_scale)!r} * (y_a + y_b) / (n_a + n_b) AS aw
    FROM j CROSS JOIN tot
  )
)
SELECT word, y_a, y_b, round(delta, {round_dp}) + 0.0 AS delta,
       round(delta / sd, {round_dp}) + 0.0 AS z
FROM scored
ORDER BY abs(round(delta / sd, {round_dp})) DESC, word
LIMIT {int(top_k)}
"""


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_tokens, n_oov, oov_rate) — the fraction of token
    OCCURRENCES outside `vocab` (1-column `word` table; broadcast).
    The tokenizer/vocab health check: a rising OOV rate on a new
    source means the vocab (or the lang-id routing) is stale. Groups
    whose documents produce ZERO tokens still appear (left-join back
    from the distinct group keys) with n_tokens=0, n_oov=0 and a NULL
    rate via try_divide — the explode alone would silently drop
    them."""
    gb = list(group_by or [])
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0)
    exploded = df.select(*gb, F.explode(toks).alias("word"))
    v = F.broadcast(vocab.select(F.col(vocab.columns[0])
                                 .alias("word")).distinct()
                    .withColumn("__in_v", F.lit(1)))
    agg = (exploded.join(v, "word", "left")
           .groupBy(*gb)
           .agg(F.count("*").alias("n_tokens"),
                F.sum(F.when(F.col("__in_v").isNull(), 1)
                      .otherwise(0)).alias("n_oov")))
    if gb:
        # re-attach zero-token groups the explode dropped (group-key
        # table is groups-bounded, not data-bounded)
        agg = (df.select(*gb).distinct()
               .join(agg, gb, "left")
               .select(*gb,
                       F.coalesce("n_tokens", F.lit(0))
                       .alias("n_tokens"),
                       F.coalesce("n_oov", F.lit(0)).alias("n_oov")))
    return agg.select(*gb, "n_tokens", "n_oov",
                      dround(F.try_divide(F.col("n_oov"),
                                           F.col("n_tokens")),
                              round_dp).alias("oov_rate"))


def oov_rate_sql(
    table: str,
    vocab_query: str,
    text_expr: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of oov_rate (`vocab_query` yields 1 column
    `word`; same zero-token-group left-join-back contract)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    agg = f"""
SELECT {gsel}count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov
FROM (
  SELECT {gsel}unnest(list_filter(
      string_split_regex(lower(trim({text_expr})),
                         '{_TOKEN_SPLIT_RE}'),
      x -> len(x) > 0)) AS word
  FROM {table}
) t
LEFT JOIN (SELECT DISTINCT word FROM ({vocab_query})) v
  USING (word)
{gkey}"""
    if not gb:
        return f"""
SELECT n_tokens, n_oov,
       round(n_oov::DOUBLE / nullif(n_tokens, 0), {round_dp})
         AS oov_rate
FROM ({agg})
"""
    gcols = ", ".join(gb)
    return f"""
SELECT {gcols},
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.n_oov, 0) AS n_oov,
       round(coalesce(a.n_oov, 0)::DOUBLE
             / nullif(coalesce(a.n_tokens, 0), 0), {round_dp})
         AS oov_rate
FROM (SELECT DISTINCT {gcols} FROM {table}) g
LEFT JOIN ({agg}) a USING ({gcols})
"""


def vocab_coverage(
    df: DataFrame,
    coverages: "list[float]",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Vocabulary coverage curve — "how many distinct words cover X%
    of all token occurrences": for each requested coverage level,
    (coverage, vocab_size, covered_rate) where vocab_size is the
    SMALLEST frequency-ranked prefix of the vocabulary whose
    cumulative occurrence share reaches the level, and covered_rate
    the share it actually achieves. The tokenizer-design number (how
    big must a word-level vocab be; how heavy is the tail BPE must
    absorb) beside oov_rate's fixed-vocab health check.

    Scale shape: one token-count agg (vocab-bounded), then a GLOBAL
    frequency ranking + prefix sum — both via the two-pass
    distributed construction (ranking.distributed_row_number for the
    rank; per-partition sums + broadcast offsets for the cumsum), so
    no single-task sort even at 10^8 distinct words. Ties break
    (count desc, word asc) — deterministic, twin-replayed."""
    from pyspark.sql import Window

    from .ranking import distributed_row_number

    for c in coverages:
        if not 0.0 < c <= 1.0:
            raise ValueError(f"coverage {c} outside (0, 1]")
    counts = _word_counts(df, text_col)
    ranked = distributed_row_number(
        counts, [F.desc("y"), F.asc("word")], "__rk")
    # distributed prefix sum over the SAME range partitioning: local
    # cumsum keyed by the rank's partition id would need a second
    # repartition; instead reuse __rk — a window over rank bands is
    # still global, so do the two-pass explicitly: band = __rk div B
    band = (F.col("__rk") / F.lit(65536)).cast("long")
    banded = ranked.withColumn("__band", band)
    from .lifecycle import track_persist
    banded = track_persist(banded)
    band_tot = (banded.groupBy("__band")
                .agg(F.sum("y").alias("__bs")))
    wb = (Window.orderBy("__band")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = band_tot.withColumn(
        "__off", F.coalesce(F.sum("__bs").over(wb), F.lit(0)))
    ww = (Window.partitionBy("__band").orderBy("__rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (banded.join(F.broadcast(offsets.select("__band", "__off")),
                       "__band")
           .withColumn("__cum", F.col("__off") + F.sum("y").over(ww)))
    total = counts.agg(F.sum("y").alias("__tot"))
    qdf = cum.crossJoin(F.broadcast(total)).crossJoin(
        F.broadcast(df.sparkSession.createDataFrame(
            [(float(c),) for c in coverages], "coverage double")))
    hit = qdf.filter(
        F.col("__cum") >= F.col("coverage") * F.col("__tot"))
    wq = Window.partitionBy("coverage").orderBy("__rk")
    return (hit.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") == 1)
            .select("coverage",
                    (F.col("__rk") + 1).alias("vocab_size"),
                    dround(F.col("__cum") / F.col("__tot"),
                            round_dp).alias("covered_rate"))
            .orderBy("coverage"))


def vocab_coverage_sql(
    table: str,
    coverages: "list[float]",
    text_expr: str = "text",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of vocab_coverage (plain window cumsum — the
    single-engine formulation the distributed construction must
    equal)."""
    qvals = ", ".join(f"({c!r}::DOUBLE)" for c in coverages)
    return f"""
WITH counts AS (
  SELECT word, count(*) AS y FROM (
    SELECT unnest(list_filter(
        string_split_regex(lower(trim({text_expr})),
                           '{_TOKEN_SPLIT_RE}'),
        x -> len(x) > 0)) AS word
    FROM {table}
  ) GROUP BY word
),
ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY y DESC, word ASC) AS rk,
         sum(y) OVER (ORDER BY y DESC, word ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) AS cum
  FROM counts
),
tot AS (SELECT sum(y)::DOUBLE AS t FROM counts),
hit AS (
  SELECT q.coverage, rk, cum,
         row_number() OVER (PARTITION BY q.coverage ORDER BY rk)
           AS rn
  FROM ranked CROSS JOIN tot
  CROSS JOIN (VALUES {qvals}) q(coverage)
  WHERE cum >= q.coverage * t
)
SELECT coverage, rk AS vocab_size,
       round(cum / (SELECT t FROM tot), {round_dp}) AS covered_rate
FROM hit WHERE rn = 1
ORDER BY coverage
"""
