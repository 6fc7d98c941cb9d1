"""Document chunking: fixed token windows with overlap, and
sentence-aware budget chunks — the retrieval/context-window prep
step (RAG indexing, long-doc embedding, sliding-window LM eval)
that `pack_sequences` deliberately is NOT: packing concatenates
MANY docs into fixed training blocks and never overlaps; chunking
splits ONE doc into query-sized pieces whose provenance (doc_id,
chunk_id) must survive.

Two operators, different boundary contracts:

`chunk_tokens` — sliding window over the whitespace token stream:
chunk i covers tokens [i·stride, i·stride + max_tokens) with
stride = max_tokens − overlap; the final chunk may be short, and a
doc with ≤ max_tokens tokens yields exactly one chunk. Chunk text
is the window's tokens re-joined with single spaces (whitespace
normalization is part of the contract — both engines replay it
bit-for-bit). Fully NARROW: tokens never leave their row; the
chunk structs are built by a `transform` over a `sequence` and
exploded once — zero shuffle, zero UDF, output rows ≈
input_tokens/stride.

`chunk_sentences` — sentences (the shared SENTENCE_RE split) are
assigned to token-offset buckets: sentence s lands in chunk
floor(tokens_before_s / budget). That formulation is DETERMINISTIC
and window-expressible in both engines (a greedy reset-per-chunk
rule is a sequential recursion neither replays); per-chunk totals
therefore vary around the budget — a chunk closes once the running
total crosses its bucket edge, so it can overshoot by up to one
sentence, and an over-budget sentence spans bucket edges alone.
Cost: one keyed sort (the cumulative count) + one keyed
re-aggregation; the shuffle carries each sentence ONCE — the same
weight class as pack_sequences' corpus shuffle, and the price of
linear-time prefix sums (the narrow alternative is an O(n²)-per-doc
array fold that melts on long-doc tails).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import SENTENCE_RE

_WS = r"\s+"


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Overlapping fixed-size token windows per document:
    (id_col, chunk_id, n_tokens, chunk_text), chunk_id 0-based.
    Empty/whitespace-only/NULL docs emit no chunks."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), _WS),
                    lambda t: F.length(t) > 0)
    d = df.select(F.col(id_col).alias("__id"), toks.alias("__ts"))
    n = F.size("__ts")
    # 1 + ceil((n - max_tokens) / stride) chunks, integer-exact
    nc = F.when(n <= 0, F.lit(0)).when(n <= max_tokens, F.lit(1)) \
        .otherwise(1 + F.floor((n - max_tokens + stride - 1)
                               / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), nc - 1),
        lambda i: F.struct(
            i.cast("long").alias("cid"),
            F.least(F.lit(max_tokens), n - i * stride)
             .cast("long").alias("nt"),
            F.array_join(F.slice("__ts", i * stride + 1, max_tokens),
                         " ").alias("txt")))
    return (d.filter(n > 0)
            .select("__id", F.explode(chunks).alias("c"))
            .select(F.col("__id").alias(id_col),
                    F.col("c.cid").alias("chunk_id"),
                    F.col("c.nt").alias("n_tokens"),
                    F.col("c.txt").alias("chunk_text")))


def chunk_tokens_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 32,
) -> str:
    """DuckDB twin of chunk_tokens (same window arithmetic, same
    single-space re-join)."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    st = max_tokens - overlap
    return f"""
WITH t AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex(trim({text_col}), '{_WS}'),
                     x -> len(x) > 0) AS ts
  FROM {table}
),
c AS (
  SELECT id, len(ts) AS n,
         unnest(range(0, CASE
           WHEN len(ts) <= {max_tokens} THEN 1
           ELSE 1 + (len(ts) - {max_tokens} + {st} - 1) // {st}
         END)) AS cid,
         ts
  FROM t WHERE len(ts) > 0
)
SELECT id AS {id_col}, cid AS chunk_id,
       least({max_tokens}, n - cid * {st}) AS n_tokens,
       array_to_string(ts[cid * {st} + 1 : cid * {st} + {max_tokens}],
                       ' ') AS chunk_text
FROM c
"""


def chunk_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 256,
) -> DataFrame:
    """Sentence-aware chunks: (id_col, chunk_id, n_sentences,
    n_tokens, chunk_text); sentences join with single spaces in
    document order. Interior terminator punctuation is consumed by
    the split (the sentence_split convention — only the final
    sentence keeps its terminator). See module docstring for the
    token-offset bucket contract (approximate budget,
    sentence-atomic)."""
    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    sents = (df.select(F.col(id_col).alias("__id"),
                       F.posexplode(F.split(F.col(text_col),
                                            SENTENCE_RE))
                       .alias("__sno", "__s"))
             .filter(F.length(F.trim("__s")) > 0))
    ntok = F.size(F.filter(F.split(F.trim("__s"), _WS),
                           lambda t: F.length(t) > 0))
    w = (Window.partitionBy("__id").orderBy("__sno")
         .rowsBetween(Window.unboundedPreceding, -1))
    s = sents.select(
        "__id", "__sno", "__s",
        ntok.alias("__nt"),
        F.coalesce(F.sum(ntok).over(w), F.lit(0)).alias("__before"))
    g = s.withColumn("__cid",
                     F.floor(F.col("__before") / budget_tokens))
    return (g.groupBy("__id", "__cid")
            .agg(F.count("*").alias("n_sentences"),
                 F.sum("__nt").alias("n_tokens"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("__sno", "__s"))),
                         lambda x: F.trim(x["__s"])), " ")
                 .alias("chunk_text"))
            .select(F.col("__id").alias(id_col),
                    F.col("__cid").alias("chunk_id"),
                    "n_sentences", "n_tokens", "chunk_text"))


def chunk_sentences_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 256,
) -> str:
    """DuckDB twin of chunk_sentences (same split, same strictly-
    prior cumulative frame, same bucket floor and ordered re-join)."""
    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    return f"""
WITH sp AS (
  SELECT {id_col} AS id,
         unnest(range(len(string_split_regex({text_col},
                                             '{SENTENCE_RE}'))))
           AS sno,
         unnest(string_split_regex({text_col}, '{SENTENCE_RE}')) AS s
  FROM {table}
),
sent AS (
  SELECT id, sno, s,
         len(list_filter(string_split_regex(trim(s), '{_WS}'),
                         x -> len(x) > 0)) AS nt
  FROM sp WHERE len(trim(s)) > 0
),
cum AS (
  SELECT id, sno, s, nt,
         coalesce(sum(nt) OVER (
           PARTITION BY id ORDER BY sno
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM sent
)
SELECT id AS {id_col},
       CAST(before // {budget_tokens} AS BIGINT) AS chunk_id,
       count(*) AS n_sentences,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       string_agg(trim(s), ' ' ORDER BY sno) AS chunk_text
FROM cum
GROUP BY 1, 2
"""
