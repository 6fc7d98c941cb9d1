"""TextRank keyword extraction (Mihalcea & Tarau 2004): per-document
word co-occurrence graphs scored by PageRank-style power iteration,
top-k words per document as its keywords — the unsupervised
complement to chi2_terms (which needs labels) and tfidf/top_terms
(which rank by frequency contrast, not graph centrality).

Graph model, per document: candidate tokens (lowercased, punctuation
stripped, stopword/short-token filtered — the paper's POS filter is
approximated by the stopword+length gate, documented stand-in) are
nodes; an undirected unweighted edge connects two DISTINCT words
that co-occur within a `window`-token span of the FILTERED sequence
(the common implementation convention, e.g. gensim/summa). Scores
follow the paper's recursion with damping d:

    WS(v) = (1 - d) + d * Σ_{u ~ v} WS(u) / deg(u)

NOTE the constant (1-d) term — unlike PageRank there is no 1/N, so
the whole iteration needs NO per-document node count and NO driver
round-trip: every stage stays lazy except the per-iteration
localCheckpoint that caps lineage depth. Words with no co-occurrence
partner (single-candidate documents) have no edges, hence no score —
they emit no keywords.

Scale design: ALL documents' graphs iterate simultaneously in one
DataFrame keyed by (doc, word) — the per-doc graphs are tiny but
there are millions of them; a per-doc grouped-map UDF would shuffle
full token payloads, while this shape shuffles only (doc, word,
double) triples after one narrow pairing pass (window-shifted
array zips, the collocations construction — no positional
self-join). The degree division is loop-invariant and pre-folded
into the edge table once (the pagerank `frac` trick), so each
iteration is ONE hash join + ONE partial-aggregatable groupBy on
(doc, word). Fixed iterations keep the DuckDB twin expressible as
an unrolled CTE chain (the pagerank/hits twin pattern).

Cited parity anchor: reference repo has no graph/NLP surface
(ExtractTextProcessor.java:134-226 is extraction only); this is an
extension operator per SURVEY §2's LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from .text_analysis import STOPWORDS_EN

_TOKEN_SPLIT_RE = r"\s+"


def _candidates(text_col: str, min_len: int,
                stopwords: tuple[str, ...]):
    toks = F.transform(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT_RE),
        lambda t: F.regexp_replace(t, "[^a-z]", ""))
    return F.filter(
        toks, lambda t: (F.length(t) >= min_len)
        & ~t.isin(*stopwords))


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    window: int = 4,
    iters: int = 4,
    damping: float = 0.85,
    min_len: int = 3,
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_dp: int = 6,
    rank_dp: int = 3,
) -> DataFrame:
    """Top-k TextRank keywords per document: (id_col, term, score,
    rank), score rounded to `round_dp`, rank deterministic by
    (rounded score desc, term). Documents whose filtered token
    sequence yields no co-occurrence edge contribute no rows."""
    if k < 1 or window < 2 or iters < 1 or min_len < 1:
        raise ValueError("need k >= 1, window >= 2, iters >= 1, "
                         "min_len >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    ts = _candidates(text_col, min_len, stopwords)
    d = df.select(F.col(id_col).alias("__doc"), ts.alias("__ts"))
    n = F.size("__ts")
    empty = F.array().cast("array<struct<a:string,b:string>>")
    zips = [F.when(n > o, F.arrays_zip(
        F.slice("__ts", 1, n - o).alias("a"),
        F.slice("__ts", 1 + o, n - o).alias("b"))).otherwise(empty)
        for o in range(1, window)]
    pairs = (d.select("__doc",
                      F.explode(F.flatten(F.array(*zips))).alias("p"))
             .select("__doc",
                     F.least("p.a", "p.b").alias("u"),
                     F.greatest("p.a", "p.b").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())
    e2 = pairs.unionByName(
        pairs.select("__doc", F.col("v").alias("u"),
                     F.col("u").alias("v")))
    deg = e2.groupBy("__doc", "u").agg(
        (F.lit(1.0) / F.count("*")).alias("__frac"))
    ef = e2.join(deg, ["__doc", "u"]).persist()
    # distinct column names per frame: scores/contribs share lineage
    # with ef through nodes, and same-name same-exprId join keys trip
    # Spark's ambiguous-self-join check even across a checkpoint
    nodes = ef.select(F.col("__doc").alias("ndoc"),
                      F.col("u").alias("nw")) \
        .distinct().persist()
    try:
        scores = (nodes.select(F.col("ndoc").alias("sdoc"),
                               F.col("nw").alias("sw"),
                               F.lit(1.0).alias("s"))
                  .localCheckpoint(eager=True))
        for _ in range(iters):
            contribs = (ef.join(scores,
                                (ef["__doc"] == scores["sdoc"])
                                & (ef["u"] == scores["sw"]))
                        .groupBy(ef["__doc"].alias("cdoc"),
                                 ef["v"].alias("cw"))
                        .agg(F.sum(F.col("s") * F.col("__frac"))
                             .alias("c")))
            scores = (nodes.join(
                contribs, (nodes["ndoc"] == contribs["cdoc"])
                & (nodes["nw"] == contribs["cw"]), "left")
                .select(nodes["ndoc"].alias("sdoc"),
                        nodes["nw"].alias("sw"),
                        (F.lit(1.0 - damping) + F.lit(damping)
                         * F.coalesce(F.col("c"), F.lit(0.0)))
                        .alias("s"))
                .localCheckpoint(eager=True))
        sr = dround("s", round_dp)
        # rank on a COARSER quantization than the display: the two
        # engines' aggregation orders differ, so scores carry ~1e-15
        # relative ULP noise — a round-6 rank boundary can straddle
        # while round-3 is stable (the displayed score still shows 6
        # dp; %.6g canonicalization absorbs its own boundary cases)
        rr = dround("s", rank_dp)
        wk = Window.partitionBy("sdoc").orderBy(rr.desc(), "sw")
        return (scores
                .withColumn("rank", F.row_number().over(wk))
                .filter(F.col("rank") <= k)
                .select(F.col("sdoc").alias(id_col),
                        F.col("sw").alias("term"),
                        sr.alias("score"), "rank"))
    finally:
        ef.unpersist()
        nodes.unpersist()


def textrank_keywords_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    window: int = 4,
    iters: int = 4,
    damping: float = 0.85,
    min_len: int = 3,
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_dp: int = 6,
    rank_dp: int = 3,
) -> str:
    """DuckDB twin: same candidate filter, same shifted-unnest
    pairing per offset, the power iteration unrolled one CTE per
    step (the pagerank_sql pattern), same (rounded score desc, term)
    cut."""
    if k < 1 or window < 2 or iters < 1 or min_len < 1:
        raise ValueError("need k >= 1, window >= 2, iters >= 1, "
                         "min_len >= 1")
    sw = ", ".join(f"'{w}'" for w in stopwords)
    dmp = repr(float(damping))
    offs = "\nUNION ALL\n".join(
        f"SELECT doc, unnest(ts[1:len(ts)-{o}]) AS a, "
        f"unnest(ts[1+{o}:len(ts)]) AS b "
        f"FROM _toks WHERE len(ts) >= {o + 1}"
        for o in range(1, window))
    parts = [f"""
_toks AS (
  SELECT {id_col} AS doc,
         list_filter(
           list_transform(
             string_split_regex(lower(trim({text_col})),
                                '{_TOKEN_SPLIT_RE}'),
             x -> regexp_replace(x, '[^a-z]', '', 'g')),
           x -> len(x) >= {min_len}
                AND NOT list_contains([{sw}], x)) AS ts
  FROM {table}
),
_raw AS (
{offs}
),
_und AS (
  SELECT DISTINCT doc, least(a, b) AS u, greatest(a, b) AS v
  FROM _raw WHERE a <> b
),
_e2 AS (
  SELECT doc, u, v FROM _und
  UNION ALL SELECT doc, v AS u, u AS v FROM _und
),
_deg AS (
  SELECT doc, u, 1.0 / count(*) AS frac FROM _e2 GROUP BY 1, 2
),
_ef AS (SELECT _e2.doc, _e2.u, _e2.v, frac
        FROM _e2 JOIN _deg USING (doc, u)),
_nodes AS (SELECT DISTINCT doc, u AS w FROM _e2),
s_0 AS (SELECT doc, w, 1.0 AS s FROM _nodes)"""]
    for i in range(1, iters + 1):
        p = f"s_{i - 1}"
        parts.append(f"""
c_{i} AS (
  SELECT _ef.doc, _ef.v AS w, sum(s * frac) AS c
  FROM _ef JOIN {p} ON _ef.doc = {p}.doc AND _ef.u = {p}.w
  GROUP BY 1, 2
),
s_{i} AS (
  SELECT _nodes.doc, _nodes.w,
         (1.0 - {dmp}) + {dmp} * coalesce(c, 0.0) AS s
  FROM _nodes LEFT JOIN c_{i} USING (doc, w)
)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT doc AS {id_col}, w AS term,
       round(s, {round_dp}) AS score, rank
FROM (
  SELECT doc, w, s,
         CAST(row_number() OVER (
           PARTITION BY doc
           ORDER BY round(s, {rank_dp}) DESC, w) AS INTEGER) AS rank
  FROM s_{iters}
)
WHERE rank <= {int(k)}
""")


def textrank_reference(tokens: list[str], window: int = 4,
                       iters: int = 4, damping: float = 0.85
                       ) -> dict[str, float]:
    """Independent plain-Python TextRank over an already-filtered
    token list — the test oracle (adjacency sets + dict-based power
    iteration, no shared code with the Spark/SQL paths)."""
    adj: dict[str, set[str]] = {}
    for i, a in enumerate(tokens):
        for b in tokens[i + 1:i + window]:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    s = {w: 1.0 for w in adj}
    for _ in range(iters):
        s = {v: (1.0 - damping) + damping
             * sum(s[u] / len(adj[u]) for u in adj[v])
             for v in adj}
    return s
