"""Market-basket mining: frequent itemsets and association rules
(Agrawal & Srikant 1994's Apriori, in its distributed SON shape —
Savasere/Omiecinski/Navathe 1995) over per-document term SETS. The
corpus-analysis reading: which terms co-occur in the same document
far more often than independence predicts — the set-based complement
of `collocations` (which scores ADJACENT pairs only).

Event model: a basket is one document's DISTINCT token set; the
support of an itemset is the number of baskets containing all its
members. Rules x→y are scored by

    support    = n(x,y) / N
    confidence = n(x,y) / n(x)
    lift       = n(x,y)·N / (n(x)·n(y))

with N = total baskets. Both directions of every frequent pair are
emitted (confidence is asymmetric).

Scale design (the Apriori/SON monotonicity argument): items below
min_support cannot appear in any frequent pair, so the frequent-1
table is computed FIRST (one map-side-combinable agg over the token
stream) and broadcast back as a single collected array in a 1-row
crossJoin — each basket is then narrowed by array_intersect before
any pair is generated. Pair generation itself is a per-row
higher-order transform (no self-join, no shuffle): for a basket with
m surviving items it emits m·(m−1)/2 ordered pairs, so the cost knob
is min_support (which bounds m by the global frequent-item count).
The only wide operations are the item/pair count aggregations —
map-side combinable, keyed on strings, never carrying text. Rule
scoring joins the (tiny) pair table against the (tiny) frequent-1
table; the basket stream is never revisited. Top-k lands as
TakeOrderedAndProject.

Triples reuse the same monotonicity one level up: only items that
appear in at least one frequent PAIR can appear in a frequent
triple, so baskets are re-narrowed by the pair-survivor item set
before the cubic per-row generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


from .classifier import _TOKEN_SPLIT_RE


def _baskets(df: DataFrame, text_col: str) -> DataFrame:
    """One row per document: its sorted DISTINCT token set."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0)
    return df.select(
        F.sort_array(F.array_distinct(toks)).alias("items"))


def _narrow_to(baskets: DataFrame, keep: DataFrame,
               min_size: int) -> DataFrame:
    """Intersect every basket with the broadcast 1-row `keep` array
    (column `ki`); drop baskets too small to generate anything."""
    return (baskets.crossJoin(F.broadcast(keep))
            .select(F.sort_array(
                F.array_intersect("items", "ki")).alias("fs"))
            .filter(F.size("fs") >= min_size))


def _pairs_in_row(col: str):
    """All i<j pairs of a sorted array column, generated row-local
    (nested higher-order transform — no join, no shuffle)."""
    a = F.col(col)
    return F.flatten(F.transform(
        a,
        lambda x, i: F.transform(
            F.slice(a, i + 2, F.size(a)),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))


def _pairs_from_baskets(baskets: DataFrame,
                        min_support: int) -> DataFrame:
    """Frequent-pair mining over a pre-built (ideally persisted)
    baskets frame — shared by `frequent_pairs` and
    `frequent_triples` so level 3 never re-tokenizes the corpus."""
    freq1 = (baskets.select(F.explode("items").alias("item"))
             .groupBy("item").agg(F.count("*").alias("n1"))
             .filter(F.col("n1") >= min_support))
    keep = freq1.agg(F.sort_array(F.collect_list("item")).alias("ki"))
    narrowed = _narrow_to(baskets, keep, 2)
    return (narrowed
            .select(F.explode(_pairs_in_row("fs")).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b").agg(F.count("*").alias("n_pair"))
            .filter(F.col("n_pair") >= min_support))


def frequent_pairs(
    df: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
) -> DataFrame:
    """(a, b, n_pair) for every a<b token pair contained in at least
    `min_support` documents, with both members individually frequent
    (the Apriori candidate set)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    from .lifecycle import track_persist

    baskets = track_persist(_baskets(df, text_col))
    return _pairs_from_baskets(baskets, min_support)


def association_rules(
    df: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-k single-antecedent rules by lift:
    (antecedent, consequent, n_pair, support, confidence, lift) with
    support/confidence/lift rounded to 4 dp and the deterministic
    ordering (lift desc, antecedent, consequent)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from .lifecycle import track_persist

    baskets = track_persist(_baskets(df, text_col))
    n_docs = baskets.agg(F.count("*").alias("nd"))
    freq1 = track_persist(
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item").agg(F.count("*").alias("n1"))
        .filter(F.col("n1") >= min_support))
    keep = freq1.agg(F.sort_array(F.collect_list("item")).alias("ki"))
    pairs = (_narrow_to(baskets, keep, 2)
             .select(F.explode(_pairs_in_row("fs")).alias("p"))
             .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .groupBy("a", "b").agg(F.count("*").alias("n_pair"))
             .filter(F.col("n_pair") >= min_support))
    both = (pairs.select(F.col("a").alias("antecedent"),
                         F.col("b").alias("consequent"), "n_pair")
            .unionAll(pairs.select(
                F.col("b").alias("antecedent"),
                F.col("a").alias("consequent"), "n_pair")))
    n_ante = freq1.select(F.col("item").alias("antecedent"),
                          F.col("n1").alias("na"))
    n_cons = freq1.select(F.col("item").alias("consequent"),
                          F.col("n1").alias("nc"))
    scored = (both.join(F.broadcast(n_ante), "antecedent")
              .join(F.broadcast(n_cons), "consequent")
              .crossJoin(F.broadcast(n_docs))
              .select(
                  "antecedent", "consequent", "n_pair",
                  dround(F.col("n_pair") / F.col("nd"), 4)
                  .alias("support"),
                  dround(F.col("n_pair") / F.col("na"), 4)
                  .alias("confidence"),
                  dround(F.col("n_pair") * F.col("nd")
                          / (F.col("na") * F.col("nc")), 4)
                  .alias("lift")))
    return (scored
            .orderBy(F.desc("lift"), "antecedent", "consequent")
            .limit(top_k))


def association_rules_sql(
    table: str = "documents",
    text_col: str = "text",
    min_support: int = 5,
    top_k: int = 100,
) -> str:
    """DuckDB twin: the per-doc distinct-token baskets are re-paired
    by an equi-self-join on a synthetic basket id (equivalent to the
    row-local generation because items are distinct per basket), with
    the identical frequent-1 pruning, both-direction rule emission,
    4 dp rounding, and (lift desc, antecedent, consequent) cut."""
    ms = int(min_support)
    return f"""
WITH baskets AS (
  SELECT row_number() OVER () AS bid,
         list_distinct(list_filter(
             string_split_regex(lower(trim({text_col})),
                                '{_TOKEN_SPLIT_RE}'),
             x -> len(x) > 0)) AS items
  FROM {table}
), toks AS (
  SELECT bid, unnest(items) AS item FROM baskets
), freq1 AS (
  SELECT item, count(*) AS n1 FROM toks GROUP BY 1
  HAVING count(*) >= {ms}
), ftoks AS (
  SELECT t.bid, t.item FROM toks t JOIN freq1 USING (item)
), pairs AS (
  SELECT x.item AS a, y.item AS b, count(*) AS n_pair
  FROM ftoks x JOIN ftoks y ON x.bid = y.bid AND x.item < y.item
  GROUP BY 1, 2 HAVING count(*) >= {ms}
), total AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM baskets),
rules AS (
  SELECT a AS antecedent, b AS consequent, n_pair FROM pairs
  UNION ALL
  SELECT b AS antecedent, a AS consequent, n_pair FROM pairs
)
SELECT antecedent, consequent, n_pair,
       round(n_pair / nd, 4) AS support,
       round(n_pair / fa.n1, 4) AS confidence,
       round(n_pair * nd / (fa.n1 * fc.n1), 4) AS lift
FROM rules
JOIN freq1 fa ON fa.item = antecedent
JOIN freq1 fc ON fc.item = consequent
CROSS JOIN total
ORDER BY round(n_pair * nd / (fa.n1 * fc.n1), 4) DESC,
         antecedent, consequent
LIMIT {int(top_k)}
"""


def frequent_triples(
    df: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
) -> DataFrame:
    """(a, b, c, n_triple) for every a<b<c triple contained in at
    least `min_support` documents. Apriori level 3: baskets are
    narrowed to items surviving in at least one frequent PAIR before
    the cubic row-local generation (itemset monotonicity: a frequent
    triple's three sub-pairs are all frequent)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    from .lifecycle import track_persist

    baskets = track_persist(_baskets(df, text_col))
    pairs = _pairs_from_baskets(baskets, min_support)
    pair_items = (pairs.select(F.col("a").alias("item"))
                  .unionAll(pairs.select(F.col("b").alias("item")))
                  .distinct())
    keep = pair_items.agg(
        F.sort_array(F.collect_list("item")).alias("ki"))
    narrowed = _narrow_to(baskets, keep, 3)
    fs = F.col("fs")
    triples = F.flatten(F.flatten(F.transform(
        fs,
        lambda x, i: F.transform(
            F.slice(fs, i + 2, F.size(fs)),
            lambda y, j: F.transform(
                F.slice(fs, i + j + 3, F.size(fs)),
                lambda z: F.struct(x.alias("a"), y.alias("b"),
                                   z.alias("c")))))))
    return (narrowed.select(F.explode(triples).alias("t"))
            .select(F.col("t.a").alias("a"), F.col("t.b").alias("b"),
                    F.col("t.c").alias("c"))
            .groupBy("a", "b", "c")
            .agg(F.count("*").alias("n_triple"))
            .filter(F.col("n_triple") >= min_support))


def reference_rules(docs: list[str], min_support: int
                    ) -> list[tuple]:
    """Independent brute-force oracle for tests: enumerate every
    basket subset pair with itertools, no pruning."""
    import itertools
    import re

    baskets = [sorted(set(t for t in re.split(r"\s+",
                                              d.lower().strip())
                          if t)) for d in docs]
    from collections import Counter

    n1: Counter = Counter()
    npair: Counter = Counter()
    for b in baskets:
        n1.update(b)
        npair.update(itertools.combinations(b, 2))
    nd = float(len(baskets))
    out = []
    for (a, b), n in sorted(npair.items()):
        if n < min_support or n1[a] < min_support \
                or n1[b] < min_support:
            continue
        for ante, cons in ((a, b), (b, a)):
            out.append((ante, cons, n,
                        round(n / nd, 4),
                        round(n / n1[ante], 4),
                        round(n * nd / (n1[ante] * n1[cons]), 4)))
    return out
