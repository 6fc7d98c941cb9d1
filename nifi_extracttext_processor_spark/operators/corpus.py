"""Corpus-level training-data preparation operators (north-star
extension suite): benchmark decontamination, corpus-wide line dedup,
fixed-token-budget sequence packing, and deterministic stratified
sampling.

All four are pure Catalyst plans (zero Python UDFs) with DuckDB SQL
twins for the oracle gate. Scale notes per operator:

- decontaminate: the benchmark n-gram set (eval suites, ~MBs even for
  hundreds of benchmarks) is broadcast; the corpus side shuffles only
  (doc_id) rows for matched n-grams — the 100 TB of text never moves.
- dedup_lines: the only shuffles carry (line_hash, doc_id, pos) triples
  and the surviving lines for reassembly; per-line payloads, map-side
  combined.
- pack_sequences: the running token sum is windowed PER BUCKET (docs are
  hash-bucketed first), so there is no global sort / single-partition
  window — each of the B buckets packs independently in parallel.
- stratified_sample: a narrow filter on an md5-derived uniform draw;
  zero shuffle, fully deterministic (same rows survive on any cluster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nifi_extracttext_processor_spark.operators.dedup import (
    shingles, shingles_sql,
)

_M32 = 4294967296  # 2^32


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------


def benchmark_ngrams(benchmark: DataFrame, text_col: str = "text",
                     n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark/eval set → 1-column
    DataFrame ``ng``. Small by construction (eval suites are MBs);
    callers broadcast it."""
    return (benchmark
            .select(F.explode(shingles(text_col, n)).alias("ng"))
            .distinct())


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark contamination: how many word n-gram
    *occurrences* in the doc match the (distinct) eval-set n-grams,
    plus a boolean flag. Doc-side n-grams are intentionally NOT
    deduplicated — a doc repeating one eval n-gram k times counts k —
    so the number doubles as a severity signal; the boolean flag is
    what filtering uses.

    The standard LLM training-data decontamination shape (n-gram overlap
    against held-out benchmarks, as popularized by the GPT-3 appendix):
    docs carrying verbatim eval-set n-grams are flagged for removal so
    the model is not trained on its own test set.

    Plan shape: benchmark n-grams are broadcast (collect-free — Spark's
    broadcast join ships the small side to every executor); the corpus
    explodes its n-grams, inner-joins the broadcast set, and aggregates
    matched counts by doc. Only (doc_id) keys of MATCHED n-grams
    shuffle; clean docs contribute nothing to the shuffle. A final
    left join restores the zero rows.
    """
    bench = F.broadcast(benchmark_ngrams(benchmark, text_col, n))
    doc_ngrams = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("ng"))
    hits = (doc_ngrams.join(bench, "ng")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    return (df.select(id_col)
            .join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
                (F.coalesce("n_contaminated", F.lit(0)) > 0)
                .alias("contaminated")))


def decontaminate_filter(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Remove contaminated docs (left_anti against the matched set) —
    the production form: the full rows of clean docs pass through
    without their text ever shuffling."""
    bench = F.broadcast(benchmark_ngrams(benchmark, text_col, n))
    dirty = (df.select(F.col(id_col),
                       F.explode(shingles(text_col, n)).alias("ng"))
             .join(bench, "ng")
             .select(id_col).distinct())
    return df.join(dirty, id_col, "left_anti")


def decontaminate_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 97 = 0",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n: int = 8,
) -> str:
    sh = shingles_sql(text_expr, n)
    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({sh}) AS ng FROM {table} WHERE {bench_pred}
), doc_ngrams AS (
  SELECT {id_col}, unnest({sh}) AS ng FROM {table}
), hits AS (
  SELECT {id_col}, count(*) AS n_contaminated
  FROM doc_ngrams JOIN bench USING (ng) GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN hits h USING ({id_col})
"""


# ---------------------------------------------------------------------------
# corpus-wide line (sentence) dedup — CCNet-style
# ---------------------------------------------------------------------------

SENTENCE_RE = r"[.!?]\s+"  # re2-safe: identical split in Spark and DuckDB


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level line dedup (the CCNet / common-crawl boilerplate
    killer): every sentence that appears anywhere else in the corpus is
    kept only at its FIRST occurrence (min (doc_id, position)); each doc
    is reassembled from its surviving sentences in original order.

    Returns (doc_id, n_kept, clean_text). Docs whose every sentence was
    seen earlier elsewhere drop out entirely.

    Plan: posexplode sentences (narrow) → min(struct(doc,pos)) per
    normalized-sentence hash (map-side partial agg; only
    (hash, doc, pos) shuffles) → semi-join keeps winners → groupBy doc
    reassembles. The full text shuffles exactly once, as its surviving
    sentence fragments.
    """
    sent = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), SENTENCE_RE))
         .alias("pos", "sentence"))
    sent = sent.withColumn(
        "h", F.md5(F.regexp_replace(F.lower(F.trim("sentence")),
                                    r"\s+", " ")))
    first = (sent.groupBy("h")
             .agg(F.min(F.struct(id_col, "pos")).alias("keep")))
    kept = (sent.join(first, "h")
            .filter((F.col(id_col) == F.col("keep." + id_col))
                    & (F.col("pos") == F.col("keep.pos"))))
    return (kept.groupBy(id_col)
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "sentence"))),
                         lambda s: s["sentence"]),
                     ". ").alias("clean_text")))


def dedup_lines_sql(table: str = "documents", id_col: str = "doc_id",
                    text_expr: str = "text") -> str:
    return f"""
WITH sent AS (
  SELECT {id_col}, pos - 1 AS pos, sentence,
         md5(regexp_replace(lower(trim(sentence)), '\\s+', ' ', 'g')) AS h
  FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array({text_expr}, '[.!?]\\s+')) AS sentence,
           generate_subscripts(
             regexp_split_to_array({text_expr}, '[.!?]\\s+'), 1) AS pos
    FROM {table})
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY {id_col}, pos) AS rn
    FROM sent) WHERE rn = 1
)
SELECT {id_col}, count(*) AS n_kept,
       string_agg(sentence, '. ' ORDER BY pos) AS clean_text
FROM kept GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# fixed-token-budget sequence packing
# ---------------------------------------------------------------------------


def _u32(col: Column) -> Column:
    """First 32 bits of md5 of a column, as a uniform long in [0, 2^32).
    Portable: DuckDB reproduces every value exactly."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10) \
            .cast("long")


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc to a training sequence of ~`budget` tokens:
    docs are hash-bucketed, ordered by id within their bucket, and a
    running token sum cuts sequence boundaries (the standard
    concatenate-and-chunk packing used to build pretraining batches).

    Returns (doc_id, bucket, seq_no, n_tokens). seq_no is the sequence
    index WITHIN the bucket that the doc's first token lands in.

    Scale: the window is partitioned by bucket — with n_buckets sized to
    the cluster (e.g. 16k at 100 TB) every bucket packs independently;
    there is no global sort and no single-partition window. Bucket
    assignment is md5-deterministic, so reruns and the DuckDB twin
    produce identical packings.

    Skew contract: unlike keyed windows (sessionize, asof_join), the
    partition key here is a HASH of the id, not a data attribute — no
    input distribution can produce a hot partition. Per-window row
    count is Binomial(n_docs, 1/n_buckets): tightly concentrated at
    n_docs/n_buckets (±a few σ = sqrt(n_docs/n_buckets)), so the
    per-task bound is set directly by choosing n_buckets ≈
    n_docs/target_partition_rows. Tested in
    tests/test_operators.py (TestPackSequencesSkew).
    """
    toks = df.select(
        F.col(id_col),
        _u32(F.col(id_col)).alias("u"),
        F.size(F.split(F.col(text_col), r"\s+")).cast("long")
         .alias("n_tokens"))
    toks = toks.withColumn("bucket", F.col("u") % n_buckets).drop("u")
    from pyspark.sql.window import Window
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (toks
            .withColumn("cum", F.sum("n_tokens").over(w))
            .select(id_col, "bucket",
                    F.floor((F.col("cum") - F.col("n_tokens")) / budget)
                     .alias("seq_no"),
                    "n_tokens"))


def pack_sequences_sql(
    table: str = "documents",
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         ('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::BIGINT
           % {n_buckets} AS bucket,
         len(string_split_regex({text_expr}, '\\s+'))::BIGINT AS n_tokens
  FROM {table}
)
SELECT {id_col}, bucket,
       floor((sum(n_tokens) OVER (PARTITION BY bucket ORDER BY {id_col}
              ROWS UNBOUNDED PRECEDING) - n_tokens)
             / {budget})::BIGINT AS seq_no,
       n_tokens
FROM toks
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling / corpus mixing
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    DETERMINISTIC uniform draw md5(id) — the corpus-mixing primitive
    (sample wikipedia at 3x, common-crawl at 0.8x, ...). Unlike
    df.sample(), the survivor set is stable across reruns, partitionings
    and engines, so downstream incremental jobs see a consistent corpus.

    The draw is compared against integer thresholds rate*2^32 (computed
    once here, embedded as a CASE) — no float comparison at row scope,
    exact DuckDB parity. Narrow filter: zero shuffle.
    """
    u = _u32(F.col(id_col))
    thresh: Column = F.lit(int(default_rate * _M32))
    expr = None
    for s, r in sorted(rates.items()):
        cond = F.col(strata_col) == s
        t = F.lit(int(r * _M32))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    if expr is not None:
        thresh = expr.otherwise(thresh)
    return df.filter(u < thresh)


def stratified_sample_sql(
    table: str = "documents",
    rates: dict[str, float] | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> str:
    rates = rates or {}
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * _M32)}" for s, r in sorted(rates.items()))
    return f"""
SELECT * FROM {table}
WHERE ('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::BIGINT
      < (CASE {strata_col} {cases} ELSE {int(default_rate * _M32)} END)
"""
