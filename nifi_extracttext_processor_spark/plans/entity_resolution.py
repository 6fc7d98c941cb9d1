"""Entity resolution — the composed record-linkage plan (Fellegi &
Sunter 1969 shape; Christen 2012's block→compare→cluster→survive
pipeline) built entirely from existing operators: fuzzy blocking +
verification (operators/fuzzy_join.py, signature-filtered so no
all-pairs stage ever runs), connected components over the match pairs
(operators/dedup.py components_from_pairs — label propagation, min-id
labels), and a deterministic canonical-record pick per cluster
(completeness desc, id asc). The dedup family answers "are these the
same DOCUMENT"; this answers "are these the same ENTITY" for dirty
reference data (names, addresses, merchant strings) where exact
fingerprints never match.

Output: one row per input record — (id, cluster_id, n_members,
is_canonical). Records with NULL or over-long keys are unmatchable by
contract (the fuzzy_join exclusion) and surface as singleton
clusters, never dropped.

Scale shape: blocking pairs come from the q-gram signature join
(ids+keys only), components shuffle (id, label) pairs per round, the
canonical pick is ONE keyed window over (cluster, completeness, id).
Payloads move once, at the final enrichment join.

Oracle: the DuckDB twin replays the quadratic levenshtein pairs (the
lossless-signature equality argument from fuzzy_join), a recursive-
CTE min-label reachability (same fixpoint as label propagation), and
the identical canonical ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_entities(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    max_dist: int = 2,
    q: int = 2,
    attr_cols: "list[str] | None" = None,
) -> DataFrame:
    """(id_col, cluster_id, n_members, is_canonical) — see module
    docstring. `attr_cols` drive the completeness half of the
    canonical order (none → min id wins)."""
    from ..operators.dedup import components_from_pairs
    from ..operators.fuzzy_join import edit_similarity_join

    attrs = list(attr_cols or [])
    pairs = edit_similarity_join(df, id_col=id_col, key_col=key_col,
                                 max_dist=max_dist, q=q)
    labels = components_from_pairs(df.select(id_col), pairs,
                                   id_col=id_col)
    nz = sum((F.col(a).isNotNull().cast("int") for a in attrs),
             F.lit(0))
    enriched = (df.select(id_col, *attrs)
                .join(labels, id_col)
                .withColumn("__nz", nz))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__nz"), F.asc(id_col))
    wc = Window.partitionBy("cluster_id")
    return (enriched
            .withColumn("n_members", F.count("*").over(wc))
            .withColumn("is_canonical",
                        F.row_number().over(w) == 1)
            .select(id_col, "cluster_id", "n_members",
                    "is_canonical"))


def resolve_entities_sql(
    table: str,
    id_col: str = "doc_id",
    key_expr: str = "key",
    max_dist: int = 2,
    attr_cols: "list[str] | None" = None,
    max_key_len: int = 512,  # fuzzy_join.MAX_KEY_LEN
) -> str:
    """DuckDB twin: quadratic levenshtein pairs + recursive-CTE
    min-label reachability + identical canonical ordering."""
    attrs = list(attr_cols or [])
    nz = (" + ".join(f"CAST({a} IS NOT NULL AS INT)" for a in attrs)
          or "0")
    return f"""
WITH RECURSIVE k AS (
  SELECT {id_col} AS id, {key_expr} AS s FROM {table}
  WHERE {key_expr} IS NOT NULL
    AND length({key_expr}) <= {max_key_len}
),
pairs AS (
  SELECT a.id AS id1, b.id AS id2
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.s, b.s) <= {max_dist}
),
edges AS (
  SELECT id1, id2 FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs
),
cc AS (
  SELECT {id_col} AS id, {id_col} AS label FROM {table}
  UNION
  SELECT e.id1, c.label FROM edges e JOIN cc c ON c.id = e.id2
),
lab AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
comp AS (
  SELECT t.{id_col} AS id, lab.cluster_id, {nz} AS nz
  FROM (SELECT * FROM {table}) t JOIN lab ON lab.id = t.{id_col}
)
SELECT id AS {id_col}, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         AS n_members,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY nz DESC, id ASC) = 1
         AS is_canonical
FROM comp
"""


def link_entities(
    dirty: DataFrame,
    master: DataFrame,
    dirty_id: str = "dirty_id",
    dirty_key: str = "key",
    master_id: str = "master_id",
    master_key: str = "key",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """The R×S record-linkage leg beside resolve_entities' self-dedup:
    assign every dirty record its BEST master match — (dirty_id,
    master_id, dist, n_candidates), one row per dirty record that
    matched anything (unmatched records are the caller's anti-join).
    Best = min dist, then min master id (deterministic). Candidates
    come from the signature-blocked edit lookup (fuzzy_join.py) — no
    all-pairs stage; the best-pick is one keyed window over the match
    pairs."""
    from pyspark.sql import Window

    from ..operators.fuzzy_join import edit_similarity_lookup

    pairs = edit_similarity_lookup(
        dirty, master, left_id=dirty_id, left_key=dirty_key,
        right_id=master_id, right_key=master_key,
        max_dist=max_dist, q=q)
    w = Window.partitionBy(dirty_id).orderBy(
        F.asc("dist"), F.asc(master_id))
    wc = Window.partitionBy(dirty_id)
    return (pairs
            .withColumn("n_candidates", F.count("*").over(wc))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(dirty_id, master_id, "dist",
                    F.col("n_candidates").cast("long")
                    .alias("n_candidates")))


def link_entities_sql(
    dirty_table: str,
    master_table: str,
    dirty_id: str = "dirty_id",
    dirty_key: str = "key",
    master_id: str = "master_id",
    master_key: str = "key",
    max_dist: int = 2,
    max_key_len: int = 512,  # fuzzy_join.MAX_KEY_LEN
) -> str:
    """DuckDB twin of link_entities (naive R×S + the same best-pick
    ordering)."""
    return f"""
WITH la AS (
  SELECT {dirty_id} AS lid, {dirty_key} AS s FROM {dirty_table}
  WHERE {dirty_key} IS NOT NULL
    AND length({dirty_key}) <= {max_key_len}
), rb AS (
  SELECT {master_id} AS rid, {master_key} AS s FROM {master_table}
  WHERE {master_key} IS NOT NULL
    AND length({master_key}) <= {max_key_len}
), pairs AS (
  SELECT la.lid, rb.rid,
         CAST(levenshtein(la.s, rb.s) AS INTEGER) AS dist
  FROM la JOIN rb ON levenshtein(la.s, rb.s) <= {max_dist}
)
SELECT lid AS {dirty_id}, rid AS {master_id}, dist, n_candidates
FROM (
  SELECT lid, rid, dist,
         CAST(count(*) OVER (PARTITION BY lid) AS BIGINT)
           AS n_candidates,
         row_number() OVER (PARTITION BY lid
                            ORDER BY dist ASC, rid ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""


def resolve_entities_incremental(
    batch: DataFrame,
    catalog: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Incremental entity resolution — the catalog pattern the dedup
    family already uses (dedup/image/audio incremental catalogs),
    applied to clusters: given yesterday's resolved `catalog`
    (id_col, key_col, cluster_id) and a new `batch` (id_col,
    key_col), return updated (id_col, key_col, cluster_id) rows for
    the batch PLUS every member of a touched cluster — the caller
    overwrites exactly those clusters and appends the rest (the
    compact_catalog posture). Untouched clusters are never read past
    the banded signature join, so the work is bounded by
    |batch| + |touched members|, not catalog size.

    Correctness invariant (pytest-pinned): applying increments batch
    by batch yields EXACTLY the clustering a from-scratch
    resolve_entities over the union produces — cluster ids are min
    reachable ids, so they are stable unless a new record genuinely
    bridges clusters (which merges them, as it must).

    Construction: within-batch pairs (self signature join) + batch→
    catalog pairs (R×S signature lookup) + one (member → cluster_id)
    edge per touched member (cluster_id IS a member id — the min —
    so these edges reconnect each touched cluster without replaying
    its internal pairs); components over batch ∪ touched ids only."""
    from pyspark.sql import functions as F

    from ..operators.dedup import components_from_pairs
    from ..operators.fuzzy_join import (
        edit_similarity_join,
        edit_similarity_lookup,
    )
    from ..operators.lifecycle import track_persist

    bb = edit_similarity_join(batch, id_col=id_col, key_col=key_col,
                              max_dist=max_dist, q=q) \
        .select(F.col("id1"), F.col("id2"))
    cat = catalog.select(F.col(id_col).alias("__cid"),
                         F.col(key_col).alias("__ckey"),
                         "cluster_id")
    bc = edit_similarity_lookup(
        batch, cat.withColumnRenamed("__cid", "cat_id"),
        left_id=id_col, left_key=key_col,
        right_id="cat_id", right_key="__ckey",
        max_dist=max_dist, q=q)
    bc = track_persist(bc.select(F.col(id_col).alias("id1"),
                                 F.col("cat_id").alias("id2")))
    touched = (bc.select(F.col("id2").alias("__cid"))
               .join(cat, "__cid")
               .select("cluster_id").distinct())
    members = track_persist(
        cat.join(F.broadcast(touched), "cluster_id")
        .select(F.col("__cid"), F.col("__ckey"), "cluster_id"))
    # reconnect each touched cluster through its min-id rep
    member_edges = (members
                    .filter(F.col("__cid") != F.col("cluster_id"))
                    .select(F.col("__cid").alias("id1"),
                            F.col("cluster_id").alias("id2")))
    edges = bb.unionByName(bc).unionByName(member_edges)
    nodes = (batch.select(F.col(id_col))
             .unionByName(members.select(F.col("__cid")
                                         .alias(id_col)))
             .distinct())
    labels = components_from_pairs(nodes, edges, id_col=id_col)
    keys = (batch.select(F.col(id_col), F.col(key_col))
            .unionByName(members.select(
                F.col("__cid").alias(id_col),
                F.col("__ckey").alias(key_col)))
            .distinct())
    return keys.join(labels, id_col).select(id_col, key_col,
                                            "cluster_id")
