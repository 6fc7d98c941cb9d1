"""Distributed BM25 full-text retrieval over the documents corpus.

The missing sibling of tfidf_top_terms: given a free-text query, rank
documents by Okapi BM25 (the Lucene/Elasticsearch default scoring
function, Robertson & Zaragoza 2009) and return the global top-k.
A 100 TB corpus-diagnostics staple: "show me what the crawl says
about X" without standing up a search cluster, and the retrieval
half of contamination/audit checks (find training docs that match a
benchmark prompt).

Reference parity note: the NiFi flow (56409-tika.xml) has no search
surface; this is a north-star extension on the `documents` table
(BASELINE.json similarity-search family), text-side counterpart to
the embedding ANN ops in operators/similarity.py.

Scale shape (what survives 100×, r16 restructure for bm25_topk):
- ONE corpus scan, ZERO corpus-sized shuffles: a fixed q-term query
  compiles to q + 1 codegen'd regexp_count columns (per-term tf via
  token-anchored literals + dl), so the scan emits a narrow
  (id, dl, tf_1..q) frame — no token array materialization, no
  explode, no (doc, term) shuffle, no df join.
- All global state — N, avgdl, and per-term df — is ONE 1-row
  aggregate over that frame, broadcast via crossJoin (the house
  pattern from tfidf_top_terms); scoring is then map-only.
- bm25_score_pairs (dynamic query TABLE, not a fixed string) keeps
  the relational (doc, term) shape — per-term columns cannot encode
  a runtime-variable term set.
- Global top-k is orderBy().limit(k) = TakeOrdered (per-partition
  heap + driver merge of k·parts rows), never a full sort.

Everything is Catalyst expressions — zero UDF — and every arithmetic
step has a DuckDB twin (bm25_topk_sql) rounded to 4 dp for the
oracle hash gate.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


# the house whitespace-token convention (top_terms / tfidf_top_terms /
# hashed_tf_embedding all share it) — keep BM25 on the same one so a
# term means the same thing across the text-analysis family
_TOKEN_SPLIT_RE = r"\s+"


def _rx_token(term: str) -> str:
    """Anchored literal-token pattern: matches `term` exactly where it
    is a maximal non-whitespace run (i.e. a whitespace-split token).
    \\Q..\\E quoting survives any regex metacharacter in the term; an
    embedded literal \\E is split around (the standard escape). The
    lookarounds are zero-width, so adjacent occurrences ("a a a") all
    count — unlike a consuming (^|\\s)..(\\s|$) form."""
    quoted = "\\Q" + term.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    return r"(?<!\S)" + quoted + r"(?!\S)"


def _query_terms(query: str) -> list[str]:
    """Lower-cased unique query terms, first-occurrence order."""
    seen: dict[str, None] = {}
    for t in re.split(r"\s+", query.strip().lower()):
        if t:
            seen.setdefault(t, None)
    if not seen:
        raise ValueError("BM25 query has no terms")
    return list(seen)


def _slim_scan(df, id_col, text_col, terms):
    """Tokenize ONCE and reduce each doc to (id, dl, query-term
    tokens): dl is computed before any explode, and only tokens in
    `terms` survive, so the persisted intermediate is tiny relative
    to the corpus (<= q matched tokens per doc plus two scalars).
    Registered with operators.lifecycle (MEMORY_AND_DISK via the
    default level) so long sessions can release it."""
    from pyspark.storagelevel import StorageLevel

    from .lifecycle import track_persist

    base = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))),
                _TOKEN_SPLIT_RE).alias("toks"))
    slim = base.select(
        F.col(id_col),
        F.size(F.filter("toks", lambda t: F.length(t) > 0)).alias("dl"),
        F.filter("toks", lambda t: t.isin(terms)).alias("qtoks"))
    return track_persist(slim, StorageLevel.MEMORY_AND_DISK)


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Global top-k documents for `query` under Okapi BM25.

    score(d) = sum over query terms t present in d of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene idf variant  idf(t) = ln(1 + (N - df + 0.5) /
    (df + 0.5))  (always positive, robust to df > N/2).

    Returns (id_col, n_terms_matched, score) with score rounded to
    4 dp; ties break on id_col ascending so top-k is deterministic.
    Documents matching no query term never appear.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = _query_terms(query)

    # r16 restructure (guide §1.2/§2.4): for a FIXED q-term query the
    # whole (doc, term) relational pipeline — tokenize-all array, two
    # interpreted lambda filters, explode, groupBy(id, term) shuffle,
    # df aggregate, broadcast join — collapses to ONE codegen'd
    # projection of q per-term regexp_count columns (tf_i = matches of
    # the token-anchored literal, identical to "count of
    # whitespace-split tokens equal to term_i"; dl = count of \S+
    # runs, identical to the non-empty-token count) plus ONE 1-row
    # aggregate (N, avgdl, df_i = docs with tf_i > 0). Zero shuffles
    # scale with the corpus: scan → project → 1-row agg broadcast →
    # map score → TakeOrdered. tf/dl/df/N/avgdl take the exact same
    # integer/double values as the r7 explode path, and each term's
    # contrib is the same double; the per-doc sum runs in fixed term
    # order (the r7 path's ≤q-row hash-agg arrival order was not
    # contractual; IEEE addition is commutative, so ≤2-term docs are
    # bit-identical by construction and the battery pins the rest).
    lowered = F.lower(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.regexp_count(lowered, F.lit(r"\S+")).alias("dl"),
        *[F.regexp_count(lowered, F.lit(_rx_token(t))).alias(f"__tf{i}")
          for i, t in enumerate(terms)])
    # both the stats subtree and the scoring pass read this narrow
    # (id, dl, tf_1..q) frame — persist it, not the corpus text
    # (O(docs · q) ints, spill-backed; registered with lifecycle)
    from pyspark.storagelevel import StorageLevel

    from .lifecycle import track_persist
    base = track_persist(base, StorageLevel.MEMORY_AND_DISK)

    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0)
                .cast("long")).alias(f"__df{i}")
          for i in range(len(terms))])

    scored = base.crossJoin(F.broadcast(stats))
    norm = (F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))

    def _contrib(i: int):
        tf, dfq = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = F.log(F.lit(1.0)
                    + (F.col("n_docs") - dfq + F.lit(0.5))
                    / (dfq + F.lit(0.5)))
        c = idf * (tf * F.lit(k1 + 1.0) / (tf + norm))
        # adding literal 0.0 for unmatched terms is IEEE-identical to
        # skipping them: every real contrib is > 0 (idf > 0 always
        # under the Lucene variant), so no -0.0 can arise
        return F.when(tf > 0, c).otherwise(F.lit(0.0))

    def _matched(i: int):
        return F.when(F.col(f"__tf{i}") > 0, F.lit(1).cast("long")) \
                .otherwise(F.lit(0).cast("long"))

    score_sum = _contrib(0)
    n_matched = _matched(0)
    for i in range(1, len(terms)):
        score_sum = score_sum + _contrib(i)
        n_matched = n_matched + _matched(i)
    per_doc = (scored
               .select(id_col, n_matched.alias("n_terms_matched"),
                       dround(score_sum, 4).alias("score"))
               .filter(F.col("n_terms_matched") > 0))
    return (per_doc
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def bm25_topk_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_topk — same tokens, same idf variant, same
    rounding, same tie-break."""
    terms = _query_terms(query)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH base AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower(trim({text_col})),
                                        '{_TOKEN_SPLIT_RE}'),
                     t -> len(t) > 0) AS toks
  FROM {table}
), base_dl AS (
  SELECT {id_col}, toks, len(toks) AS dl FROM base
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base_dl
), matched AS (
  SELECT {id_col}, dl, t.term AS term
  FROM base_dl, unnest(toks) AS t(term)
  WHERE t.term IN ({in_list})
), tf_t AS (
  SELECT {id_col}, term, count(*) AS tf, min(dl) AS dl
  FROM matched GROUP BY 1, 2
), df_t AS (
  SELECT term, count(*) AS df FROM tf_t GROUP BY 1
), contribs AS (
  SELECT tf_t.{id_col},
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {k1 + 1.0!r}
              / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))
           AS contrib
  FROM tf_t JOIN df_t USING (term) CROSS JOIN stats
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_terms_matched,
       round(sum(contrib), 4) AS score
FROM contribs
GROUP BY {id_col}
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""


def bm25_score_pairs(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    max_literal_terms: int = 20_000,
) -> DataFrame:
    """Batch retrieval: top-k docs for EACH query in `queries_df`
    (query_id_col, query_col), one corpus scan for all queries.

    The query table is assumed small (it broadcasts); the corpus side
    still filters to the union of all query terms before any shuffle,
    and per-query top-k uses a row_number window keyed by query —
    partition-parallel, never a global sort. Used for benchmark
    decontamination audits: queries = benchmark prompts, hits = docs
    to inspect.

    Up to `max_literal_terms` distinct query terms, the union term
    list is collected and inlined so the corpus side runs the same
    single-tokenization slim scan as bm25_topk (the r7 double-scan
    fix). Beyond the cap — where a driver collect and an isin()
    literal of that size risk driver memory and Catalyst plan blowup
    — it degrades gracefully to TWO corpus scans with the term
    filter as a broadcast semi-join: slower, never fatal.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    qterms = (queries_df.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col(query_col))), _TOKEN_SPLIT_RE),
                lambda t: F.length(t) > 0))).alias("term"))
        .distinct())
    # probe with limit(cap + 1): the collect is bounded even when the
    # "small by contract" query table turns out not to be
    probe = (qterms.select("term").distinct()
             .limit(max_literal_terms + 1).collect())
    if not probe:
        raise ValueError("BM25 queries have no terms")
    if len(probe) <= max_literal_terms:
        all_terms = [r["term"] for r in probe]
        slim = _slim_scan(df, id_col, text_col, all_terms)
        stats = slim.agg(F.count("*").alias("n_docs"),
                         F.avg("dl").alias("avgdl"))
        # a term shared by several queries fans out only at join time
        corpus_terms = slim.select(id_col, "dl",
                                   F.explode("qtoks").alias("term"))
    else:
        base = df.select(
            F.col(id_col),
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))),
                        _TOKEN_SPLIT_RE),
                lambda t: F.length(t) > 0).alias("toks"))
        withdl = base.select(id_col,
                             F.size("toks").alias("dl"), "toks")
        stats = withdl.agg(F.count("*").alias("n_docs"),
                           F.avg("dl").alias("avgdl"))
        corpus_terms = (withdl
                        .select(id_col, "dl",
                                F.explode("toks").alias("term"))
                        .join(F.broadcast(
                            qterms.select("term").distinct()), "term"))
    tf = (corpus_terms.groupBy(id_col, "term")
          .agg(F.count("*").alias("tf"), F.first("dl").alias("dl")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(F.broadcast(qterms), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = (F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)
                     / (F.col("tf") + norm))
    per_pair = (scored.withColumn("contrib", contrib)
                .groupBy(query_id_col, id_col)
                .agg(F.count("*").cast("long").alias("n_terms_matched"),
                     dround(F.sum("contrib"), 4).alias("score")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col))
    return (per_pair.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(query_id_col, id_col, "n_terms_matched", "score",
                    F.col("rk").cast("long").alias("rk")))


def bm25_score_pairs_sql(
    queries: list[tuple[str, str]],
    k: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_score_pairs for a literal query list
    [(query_id, query_text), ...]."""
    if not queries:
        raise ValueError("empty query list")
    vals = ", ".join(
        "('" + qid.replace("'", "''") + "', '"
        + q.replace("'", "''") + "')" for qid, q in queries)
    return f"""
WITH qraw AS (
  SELECT * FROM (VALUES {vals}) AS q(query_id, query)
), qterms AS (
  SELECT DISTINCT query_id, t.term AS term
  FROM qraw, unnest(list_filter(
         string_split_regex(lower(trim(query)), '{_TOKEN_SPLIT_RE}'),
         x -> len(x) > 0)) AS t(term)
), base_dl AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower(trim({text_col})),
                                        '{_TOKEN_SPLIT_RE}'),
                     t -> len(t) > 0) AS toks
  FROM {table}
), base2 AS (
  SELECT {id_col}, toks, len(toks) AS dl FROM base_dl
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base2
), corpus_terms AS (
  SELECT {id_col}, dl, t.term AS term
  FROM base2, unnest(toks) AS t(term)
  WHERE t.term IN (SELECT term FROM qterms)
), tf_t AS (
  SELECT {id_col}, term, count(*) AS tf, min(dl) AS dl
  FROM corpus_terms GROUP BY 1, 2
), df_t AS (
  SELECT term, count(*) AS df FROM tf_t GROUP BY 1
), contribs AS (
  SELECT qterms.query_id, tf_t.{id_col},
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {k1 + 1.0!r}
              / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))
           AS contrib
  FROM tf_t JOIN df_t USING (term) JOIN qterms USING (term)
  CROSS JOIN stats
), per_pair AS (
  SELECT query_id, {id_col},
         CAST(count(*) AS BIGINT) AS n_terms_matched,
         round(sum(contrib), 4) AS score
  FROM contribs GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, {id_col} ASC) AS rk
  FROM per_pair
)
SELECT query_id, {id_col}, n_terms_matched, score,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {k}
"""


def bm25_reference(
    docs: list[tuple[str, str]],
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[str, float]:
    """Pure-Python BM25 for test goldens: {doc_id: score} over every
    doc matching >= 1 query term. Independent of the Spark path (plain
    loops, no shared helpers beyond the token convention)."""
    terms = _query_terms(query)
    toks = {
        d: [t for t in re.split(r"\s+", text.strip().lower()) if t]
        for d, text in docs
    }
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n if n else 0.0
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out: dict[str, float] = {}
    for d, v in toks.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl))
        if hit:
            out[d] = round(s, 4)
    return out


# ---------------------------------------------------------------------------
# persisted BM25 index — the repeated-query path
# ---------------------------------------------------------------------------

_INDEX_BUCKETS = 256   # term-hash partitions: a q-term query prunes to
                       # <= q of these regardless of corpus size


def _term_bucket(col):
    return F.pmod(F.xxhash64(col), F.lit(_INDEX_BUCKETS)).cast("int")


def build_bm25_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Materialize the BM25 posting list partitioned by term-hash
    bucket, plus df (document-frequency) and corpus-stats sidecars —
    the same persisted-index pattern as build_lsh_index /
    build_ivf_index: pay the corpus scan ONCE, then every query reads
    only the <= q partitions its terms hash into (partition pruning,
    plan-asserted in tests) instead of re-tokenizing 100 TB.

    Layout under `path`:
      postings/  (term, doc_id, tf, dl) partitioned by bucket=pmod(
                 xxhash64(term), 256)
      dfreq/     (term, df) partitioned the same way — ALWAYS
                 recomputed from the full written postings and
                 overwritten, so it stays coherent under append
      stats/     one (n_docs, sum_dl) row PER build segment; readers
                 aggregate (sum / sum-of-sums) so appends add a row
                 instead of double-counting a duplicated scalar

    mode='append' adds a new batch of documents; batches must be
    doc-disjoint (appending the same doc_id twice double-counts it,
    the same contract as the dedup catalogs).

    Tokenization is the house convention, so bm25_topk over the raw
    corpus and bm25_query_index over this index return IDENTICAL
    results (equivalence-tested)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    base = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))),
                _TOKEN_SPLIT_RE).alias("toks"))
    base = base.withColumn(
        "dl", F.size(F.filter("toks", lambda t: F.length(t) > 0)))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.sum("dl").cast("double").alias("sum_dl"))
    postings = (base
                .select(id_col, "dl", F.explode("toks").alias("term"))
                .filter(F.length("term") > 0)
                .groupBy(id_col, "term")
                .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
                .withColumn("bucket", _term_bucket(F.col("term"))))
    (postings.repartition("bucket")
     .write.mode(mode).partitionBy("bucket")
     .parquet(path.rstrip("/") + "/postings"))
    # df derives from the full WRITTEN postings (describes bytes on
    # disk, the write_corpus_shards read-back posture) and is always
    # overwritten — under append, per-segment df rows would otherwise
    # split a term's count across duplicate rows and understate df
    spark = df.sparkSession
    written = spark.read.parquet(path.rstrip("/") + "/postings")
    (written.groupBy("term").agg(F.count("*").alias("df"))
     .withColumn("bucket", _term_bucket(F.col("term")))
     .repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(path.rstrip("/") + "/dfreq"))
    stats.write.mode(mode).parquet(path.rstrip("/") + "/stats")


def bm25_query_index(
    spark,
    path: str,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k against a build_bm25_index layout. The bucket IN-filter
    reaches the parquet scan as a partition filter, so only the
    <= len(query terms) matching directories are read — query cost is
    independent of corpus size (given bounded posting lists per
    term)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = _query_terms(query)
    buckets = sorted({
        r["b"] for r in spark.createDataFrame(
            [(t,) for t in terms], "term string")
        .select(_term_bucket(F.col("term")).alias("b")).collect()})
    p = path.rstrip("/")
    postings = (spark.read.parquet(p + "/postings")
                .filter(F.col("bucket").isin(buckets))
                .filter(F.col("term").isin(terms)))
    dfreq = (spark.read.parquet(p + "/dfreq")
             .filter(F.col("bucket").isin(buckets))
             .filter(F.col("term").isin(terms))
             .select("term", "df"))
    # one (n_docs, sum_dl) row per build segment: aggregate so an
    # appended index reads as one corpus
    stats = (spark.read.parquet(p + "/stats")
             .agg(F.sum("n_docs").alias("n_docs"),
                  (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl")))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = (F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)
                     / (F.col("tf") + norm))
    per_doc = (postings
               .join(F.broadcast(dfreq), "term")
               .crossJoin(F.broadcast(stats))
               .withColumn("contrib", contrib)
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_terms_matched"),
                    dround(F.sum("contrib"), 4).alias("score")))
    return (per_doc
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
