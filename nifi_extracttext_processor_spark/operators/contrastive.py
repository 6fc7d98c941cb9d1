"""Deterministic negative sampling for contrastive training pairs —
the data-side half of embedding-model training (SimCLR/CLIP-style
batches, sentence-transformer triplets, reranker training): every
anchor document needs k "random other" documents, and at corpus
scale the naive approach (crossJoin + sample) is both quadratic and
nondeterministic.

Construction: one global row_number over (id) gives every doc a
dense rank in [0, N); draw j for anchor a jumps to rank
(rank(a) + offset) mod N with offset = u32(hash(id#j#seed)) mod
(N−1) + 1 — never 0, so a doc can never draw itself, and each draw
is uniform over the other N−1 docs. Partner resolution is ONE keyed
join on integer ranks.

Determinism / oracle: rank order and offsets are pure functions of
the ids and seed — reruns, other clusters, and the DuckDB twin
produce the SAME pairs (md5 hash variant for the oracle; xxhash64
default at scale).

Scale shape: the global rank comes from ranking.distributed_row_number
over the id projection (range repartition + keyed local window +
broadcast prefix offsets — no single-task sort; ids move, documents
never);
the explode is k rows per anchor of three longs; the partner join
is an integer-keyed hash join. Optional `positives` exclusion
anti-joins known-positive pairs in both orientations so a negative
can never be a labeled positive (the standard contamination bug in
contrastive sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _u32(col, md5: bool):
    if md5:
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10) \
            .cast("long")
    return F.pmod(F.xxhash64(col), F.lit(1 << 32))


def sample_negative_pairs(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    seed: int = 0,
    positives: DataFrame | None = None,
    md5: bool = False,
) -> DataFrame:
    """(anchor_id, negative_id, draw) — k deterministic negatives per
    anchor, uniform over the other documents, self-pair impossible.
    `positives` (id1, id2) removes labeled-positive pairs in either
    orientation (those draws are dropped, not re-drawn — the per-
    anchor count then dips below k with probability ~k·|pos|/N, the
    documented trade for keeping every draw a pure function of
    (id, j, seed))."""
    from .ranking import distributed_row_number

    if k < 1:
        raise ValueError("k must be >= 1")
    ranked = distributed_row_number(
        df.select(F.col(id_col)), [F.asc(id_col)], "__r")
    n = ranked.count()
    if n < 2:
        raise ValueError("need at least 2 rows to draw negatives")
    draws = ranked.select(
        F.col(id_col).alias("anchor_id"), "__r",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("draw"))
    off = _u32(F.concat(F.col("anchor_id").cast("string"),
                        F.lit("#"), F.col("draw").cast("string"),
                        F.lit(f"#{seed}")), md5) % F.lit(n - 1) \
        + F.lit(1)
    draws = draws.withColumn(
        "__tr", (F.col("__r") + off) % F.lit(n)).drop("__r")
    partners = ranked.select(F.col(id_col).alias("negative_id"),
                             F.col("__r").alias("__tr"))
    out = (draws.join(partners, "__tr")
           .select("anchor_id", "negative_id", "draw"))
    if positives is not None:
        p = positives.select(F.col(positives.columns[0]).alias("a"),
                             F.col(positives.columns[1]).alias("b"))
        both = p.unionAll(p.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
        out = out.join(
            both.withColumnRenamed("a", "anchor_id")
                .withColumnRenamed("b", "negative_id"),
            ["anchor_id", "negative_id"], "left_anti")
    return out


def sample_negative_pairs_sql(
    table: str,
    k: int = 4,
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB twin of sample_negative_pairs(md5=True, no positives):
    same ranks, same offsets, same pairs."""
    return f"""
WITH ranked AS (
  SELECT {id_col},
         row_number() OVER (ORDER BY {id_col}) - 1 AS r
  FROM {table}
),
n_t AS (SELECT count(*) AS n FROM ranked),
draws AS (
  SELECT ranked.{id_col} AS anchor_id, ranked.r, d.draw, n_t.n
  FROM ranked CROSS JOIN n_t,
       LATERAL (SELECT CAST(unnest(range(0, {k})) AS INTEGER)
                  AS draw) d
),
jumped AS (
  SELECT anchor_id, draw,
         (r + (('0x' || substr(md5(anchor_id::VARCHAR || '#' ||
                draw::VARCHAR || '#{seed}'), 1, 8))::BIGINT
               % (n - 1)) + 1) % n AS tr
  FROM draws
)
SELECT j.anchor_id, p.{id_col} AS negative_id, j.draw
FROM jumped j JOIN ranked p ON p.r = j.tr
"""


def mine_hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    positives: DataFrame | None = None,
    overfetch: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining — the quality upgrade over
    sample_negative_pairs' uniform draws: for every anchor, the k
    corpus vectors MOST SIMILAR to it that are not itself and not a
    labeled positive (the standard in-batch-negatives improvement for
    contrastive/reranker training — random negatives are too easy,
    the model stops learning; SimCSE/DPR practice). Returns
    (anchor_id, negative_id, cosine, rk) with rk = 1..k by similarity.

    Construction: exact k-NN join (broadcast anchors, one corpus
    scan) overfetched to k+overfetch candidates, then self-pairs and
    positives (both orientations) are dropped and the survivors
    re-ranked per anchor. Per-anchor count dips below k only when
    more than `overfetch` of its neighbors were filtered (documented;
    raise overfetch for dense positive sets).

    Scale: inherits knn_join's posture — the corpus never shuffles,
    the rank window is keyed by anchor. For corpus sizes where a
    broadcast NLJ is wrong, mine from similarity.knn_join_lsh
    candidates instead (same filtering applies)."""
    from pyspark.sql import Window

    from .similarity import knn_join

    if k < 1:
        raise ValueError("k must be >= 1")
    if overfetch < 1:
        raise ValueError("overfetch must be >= 1")
    knn = knn_join(anchors, corpus, k=k + overfetch,
                   qid_col=id_col, cid_col=id_col, vec_col=vec_col)
    cand = (knn.filter(F.col("query_id") != F.col("match_id"))
            .select(F.col("query_id").alias("anchor_id"),
                    F.col("match_id").alias("negative_id"),
                    "cosine"))
    if positives is not None:
        p = positives.select(F.col(positives.columns[0]).alias("a"),
                             F.col(positives.columns[1]).alias("b"))
        both = p.unionAll(p.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
        cand = cand.join(
            F.broadcast(both.withColumnRenamed("a", "anchor_id")
                        .withColumnRenamed("b", "negative_id")),
            ["anchor_id", "negative_id"], "left_anti")
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id"))
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def mine_hard_negatives_sql(
    k: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_pred: str = "vec_id < 8",
) -> str:
    """DuckDB twin (anchors/corpus split one table by `anchor_pred`,
    no positives): full cosine ranking, self-pairs dropped, identical
    re-rank."""
    v = f"{vec_col}::DOUBLE[]"
    qv = f"q.{vec_col}::DOUBLE[]"
    dot = (f"list_sum(list_transform(list_zip(c.{vec_col}::DOUBLE[], "
           f"{qv}), p -> p[1] * p[2]))")
    na = (f"sqrt(list_sum(list_transform(c.{vec_col}::DOUBLE[], "
          "x -> x * x)))")
    nb = f"sqrt(list_sum(list_transform({qv}, x -> x * x)))"
    cos = (f"CASE WHEN {na} > 0 AND {nb} > 0 "
           f"THEN {dot} / ({na} * {nb}) ELSE 0.0 END")
    return f"""
SELECT anchor_id, negative_id, cosine, rk FROM (
  SELECT q.{id_col} AS anchor_id, c.{id_col} AS negative_id,
         round({cos}, 4) AS cosine,
         CAST(row_number() OVER (PARTITION BY q.{id_col}
                            ORDER BY round({cos}, 4) DESC,
                                     c.{id_col} ASC) AS INTEGER) AS rk
  FROM (SELECT * FROM {table} WHERE {anchor_pred}) q
  CROSS JOIN {table} c
  WHERE q.{id_col} <> c.{id_col}
) WHERE rk <= {int(k)}
"""
