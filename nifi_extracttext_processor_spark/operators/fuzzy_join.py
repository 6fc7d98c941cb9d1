"""String similarity self-joins (fuzzy / entity-resolution joins):
edit-distance pairs and token-Jaccard pairs over a short key column
(names, titles, addresses — NOT document bodies; the near-dup family
in operators/dedup.py owns long-text similarity).

Both follow the filter-verify shape every scalable similarity join
uses (Chaudhuri 2006 SSJoin; Bayardo 2007 All-Pairs; Xiao 2008
PPJoin): a LOSSLESS signature join proposes candidates, an exact
Catalyst predicate verifies them — never an O(n²) cross join.

edit_similarity_join (ED ≤ d):
  * signatures = the first q·d + 1 distinct padded q-grams of each
    string, ordered by GLOBAL gram frequency (rarest first) — the
    Ed-Join prefix (Xiao/Wang/Lin 2008). Lossless by the q-gram
    destroy bound: one edit destroys ≤ q distinct grams, so
    ED(x,y) ≤ d ⇒ |Gx ∩ Gy| ≥ max(|Gx|, |Gy|) − q·d. Proof that the
    (q·d+1)-prefixes must then share a gram: let c* be the common
    gram that is SMALLEST in the global order. Every gram of x
    ranked before c* is non-common, and x has at most
    |Gx| − (|Gx| − q·d) = q·d non-common grams total, so c* sits at
    position ≤ q·d + 1 of x's ordered grams — inside the prefix —
    and symmetrically inside y's. (r16: prefix shortened from
    2·q·d + 1; the old bound was derived via |Gy| ≥ |Gx| − q·d
    instead of using max(|Gx|,|Gy|) directly.)
  * positional filter (PPJoin, Xiao 2008): each signature row also
    carries its 0-based position `pos` in the string's full ordered
    gram array and the array size `n`. For the globally-smallest
    common gram c*, every OTHER common gram ranks after it in both
    arrays, so |Gx ∩ Gy| ≤ min(nx − posx, ny − posy). A candidate
    row may be dropped unless
        least(nx − posx, ny − posy) ≥ greatest(nx, ny) − q·d
    because the c*-row of a true pair always satisfies it (its LHS
    bounds the true overlap from above, the RHS from below). Rows
    for later common grams may fail the test — the pair survives
    through its c*-row; dropped rows only remove duplicate routes
    to the same pair. LOW-channel rows carry pos = 0 and their real
    n ≤ q·d, which always passes (RHS ≤ 0 when both sides are LOW).
  * rarest-first ordering doubles as the skew defense: the hot grams
    ("th", "er") land at the END of the frequency order and never
    enter a signature unless the string has almost no rare grams.
  * the bound has no teeth when BOTH sides have ≤ q·d distinct grams
    (super-short or highly repetitive keys: "a" vs "" at d=1 share
    no gram at all) — those strings additionally block together in
    one shared low-gram bucket, quadratic only in their own count.
  * verify = levenshtein(s1, s2, threshold=d) — Spark's
    bounded-band implementation, O(len·d) per candidate.
  * a THIRD filter was built, measured and REVERTED in r17 (recorded
    so it is not retried): a content-based count filter — 16 probe-
    char histogram counts packed into two longs per side, candidate
    dropped when the partial L1 exceeds 2·d (lossless; pruned 97% of
    the post-positional candidates at sf0.1). It LOST ~2-3x on
    executor CPU: the ~70-node per-pair unpack/abs/sum expression
    evaluated at ~15µs/pair in the join condition (interleaved stage
    profiles: join stage 21 -> 85-107 core-s), while the banded
    levenshtein it was saving costs only ~2.5µs/pair on these short
    keys. Lesson: a pre-verify filter in a JOIN CONDITION must be an
    ORDER OF MAGNITUDE cheaper than the verify predicate itself —
    multi-lane packed-histogram compares are not, at any pruning
    rate, when the verify is an O(len·d) banded edit distance over
    attribute-length keys. tests/test_fuzzy_join.py keeps the
    boundary fixture the attempt produced (it pins the lossless
    candidate chain regardless).

jaccard_similarity_join (J ≥ t on distinct word tokens):
  * per-string prefix of size m − ceil(t·m) + 1 over the
    frequency-ordered distinct token array (All-Pairs prefix filter;
    J ≥ t ⇒ overlap ≥ ceil(t·max(m1, m2)) ≥ each side's own bound,
    and a larger prefix only widens the guarantee).
  * size filter: J ≥ t ⇒ t·m1 ≤ m2 ≤ m1/t, applied inside the join.
  * verify = |array_intersect| / |union| on the carried token arrays.

Both joins shuffle (signature, id, key-string) rows — the key string
travels with its signature because verification needs both operands;
that is bounded by the key column's length (the contract: a short
attribute, enforced by max_len), unlike the dedup family where text
never enters an Exchange.

At 100 TB the gram/token frequency table is corpus-sized, so it joins
by shuffle on the gram key (broadcast only when tiny); everything
downstream is keyed on signatures or id pairs — no O(n²) stage exists
at any scale (plan-asserted in tests: no CartesianProduct /
BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


# padding sentinels (C0 controls — cannot appear in sane key text;
# rows whose key DOES contain one are still correct, the pad chars
# merely stop being unique boundary markers and the filter stays
# lossless because padding is applied uniformly to both sides)
_PAD_L = "\x02"
_PAD_R = "\x03"

#: keys longer than this are rejected — the verify predicate carries
#: both strings through a shuffle, which is only sane for short
#: attribute-like columns
MAX_KEY_LEN = 512


def _padded_grams(col, q: int):
    """Distinct q-grams of the sentinel-padded string (array<string>).
    Padding (q−1 copies each side) gives every string, including the
    empty one, at least one gram, and makes boundary characters
    participate in exactly q grams like interior ones."""
    padded = F.concat(F.lit(_PAD_L * (q - 1)), col, F.lit(_PAD_R * (q - 1)))
    n = F.length(padded) - (q - 1)
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.substr(padded, i, F.lit(q))))


def _freq_ordered(exploded: DataFrame, unit_col: str,
                  id_col: str) -> DataFrame:
    """(id, unit) rows → (id, units array ordered by global frequency
    ascending, ties by unit). One agg for the frequency table, one
    shuffle join on the unit, one groupBy(id) to rebuild the ordered
    array — the All-Pairs canonical ordering."""
    freq = exploded.groupBy(unit_col).agg(F.count("*").alias("__f"))
    return (exploded
            .join(freq, unit_col)
            .groupBy(id_col)
            .agg(F.array_sort(
                F.collect_list(F.struct(F.col("__f"),
                                        F.col(unit_col)))).alias("__o"))
            .select(id_col,
                    F.transform("__o", lambda s: s[unit_col]).alias("units")))


def _check_key(df: DataFrame, id_col: str, key_col: str) -> DataFrame:
    return (df
            .select(F.col(id_col).alias("id"), F.col(key_col).alias("s"))
            .filter(F.col("s").isNotNull()
                    & (F.length("s") <= MAX_KEY_LEN)))


def _edit_signatures(keys: DataFrame, q: int, max_dist: int,
                     freq: DataFrame) -> DataFrame:
    """(id, s, g, pos, n) signature rows of one table against a
    SHARED gram frequency table (for a lookup both tables must sort
    grams by the same global order or the prefix lemma does not
    apply). `pos` = the gram's 0-based rank in the string's full
    frequency-ordered gram array, `n` = that array's size — the
    operands of the positional filter (module docstring).

    Includes the low-gram side channel: the destroy bound only
    guarantees a shared gram when at least one side has > q·d
    distinct grams ("a" vs "" at d=1 shares none). Strings at or
    under that count (super-short or highly repetitive keys) also
    block together in one shared bucket — quadratic in THEIR count
    only, and \\x00 cannot collide with a real gram (grams always
    have length q ≥ 1). LOW rows carry pos = 0 so the positional
    filter is vacuously true for them."""
    grams = keys.select(
        "id", F.explode(_padded_grams(F.col("s"), q)).alias("g"))
    ordered = (grams
               .join(freq, "g")
               .groupBy("id")
               .agg(F.array_sort(
                   F.collect_list(F.struct(F.col("__f"),
                                           F.col("g")))).alias("__o"))
               .select("id", F.transform(
                   "__o", lambda s: s["g"]).alias("units")))
    sig_len = q * max_dist + 1
    main = ordered.select(
        "id", F.size("units").alias("n"),
        F.posexplode(F.slice("units", 1, sig_len)).alias("pos", "g"))
    low = (ordered.filter(F.size("units") <= q * max_dist)
           .select("id", F.size("units").alias("n"),
                   F.lit(0).alias("pos"), F.lit("\x00LOW").alias("g")))
    return (main.unionAll(low).join(keys, "id")
            .select("id", "s", "g", "pos", "n"))


def _gram_freq(*gram_frames: DataFrame) -> DataFrame:
    """Global gram frequency over the union of the given (id, g)
    explosions — ONE total order shared by every side of a join."""
    u = gram_frames[0]
    for f in gram_frames[1:]:
        u = u.unionAll(f)
    return u.groupBy("g").agg(F.count("*").alias("__f"))


def edit_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(key1, key2) ≤ max_dist.
    Output: (id1, id2, dist). NULL keys and keys over MAX_KEY_LEN are
    excluded (they cannot be meaningfully fuzzy-matched; route them
    through exact dedup instead)."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    keys = _check_key(df, id_col, key_col)
    grams = keys.select(
        "id", F.explode(_padded_grams(F.col("s"), q)).alias("g"))
    # persist the signatures: BOTH sides of the self-join replay this
    # two-shuffle pipeline otherwise (measured 2× the signature cost
    # at sf0.1 before the persist)
    from .lifecycle import track_persist
    sig = track_persist(
        _edit_signatures(keys, q, max_dist, _gram_freq(grams)))
    l, r = sig.alias("l"), sig.alias("r")
    cand = (l.join(r, (F.col("l.g") == F.col("r.g"))
                   & (F.col("l.id") < F.col("r.id"))
                   & (F.abs(F.length("l.s") - F.length("r.s"))
                      <= max_dist)
                   # positional filter (lossless — module docstring):
                   # remaining-overlap upper bound must reach the
                   # destroy-bound lower bound
                   & (F.least(F.col("l.n") - F.col("l.pos"),
                              F.col("r.n") - F.col("r.pos"))
                      >= F.greatest(F.col("l.n"), F.col("r.n"))
                      - F.lit(q * max_dist)))
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"),
                    F.col("l.s").alias("s1"), F.col("r.s").alias("s2")))
    # VERIFY BEFORE DEDUP: the banded levenshtein is a narrow O(len·d)
    # predicate, while dropDuplicates is a shuffle of every candidate
    # WITH both strings — on low-selectivity blocking data (sf0.1:
    # 6.8M candidates → 320 survivors) verifying first turns the wide
    # dedup into a 320-row group-by. A pair reachable through several
    # shared grams verifies identically each time, so min() is just
    # the duplicate-collapse.
    dist = F.levenshtein("s1", "s2", max_dist)
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .groupBy("id1", "id2")
            .agg(F.min("dist").alias("dist")))


def edit_similarity_lookup(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "doc_id",
    left_key: str = "text",
    right_id: str = "doc_id",
    right_key: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Record-linkage R×S variant: every (left_id, right_id, dist)
    with levenshtein ≤ max_dist ACROSS the two tables (match a dirty
    feed against a master list). Same lossless signature blocking as
    the self-join; the gram frequency order is computed over the
    UNION of both tables so both sides sort by one global order (the
    prefix lemma requires it)."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    if left_id == right_id:
        raise ValueError(
            "left_id and right_id name the output columns and must "
            "differ — alias one side (e.g. right.withColumnRenamed)")
    lk = _check_key(left, left_id, left_key)
    rk = _check_key(right, right_id, right_key)
    lg = lk.select("id", F.explode(_padded_grams(F.col("s"), q)).alias("g"))
    rg = rk.select("id", F.explode(_padded_grams(F.col("s"), q)).alias("g"))
    # the frequency table feeds BOTH sides' signature pipelines —
    # persist it once (same motivation as the self-join's sig persist)
    from .lifecycle import track_persist
    freq = track_persist(_gram_freq(lg, rg))
    ls = _edit_signatures(lk, q, max_dist, freq).alias("l")
    rs = _edit_signatures(rk, q, max_dist, freq).alias("r")
    cand = (ls.join(rs, (F.col("l.g") == F.col("r.g"))
                    & (F.abs(F.length("l.s") - F.length("r.s"))
                       <= max_dist)
                    # positional filter (lossless — module docstring)
                    & (F.least(F.col("l.n") - F.col("l.pos"),
                               F.col("r.n") - F.col("r.pos"))
                       >= F.greatest(F.col("l.n"), F.col("r.n"))
                       - F.lit(q * max_dist)))
            .select(F.col("l.id").alias(left_id),
                    F.col("r.id").alias(right_id),
                    F.col("l.s").alias("s1"), F.col("r.s").alias("s2")))
    # verify before dedup (see edit_similarity_join)
    dist = F.levenshtein("s1", "s2", max_dist)
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") >= 0)
            .groupBy(left_id, right_id)
            .agg(F.min("dist").alias("dist")))


def edit_similarity_lookup_sql(
    left_table: str,
    right_table: str,
    left_id: str = "doc_id",
    left_key: str = "text",
    right_id: str = "doc_id",
    right_key: str = "text",
    max_dist: int = 2,
) -> str:
    """DuckDB twin of edit_similarity_lookup (naive R×S)."""
    return f"""
WITH la AS (
  SELECT {left_id} AS lid, {left_key} AS s FROM {left_table}
  WHERE {left_key} IS NOT NULL AND length({left_key}) <= {MAX_KEY_LEN}
), rb AS (
  SELECT {right_id} AS rid, {right_key} AS s FROM {right_table}
  WHERE {right_key} IS NOT NULL
    AND length({right_key}) <= {MAX_KEY_LEN}
)
SELECT la.lid AS {left_id}, rb.rid AS {right_id},
       CAST(levenshtein(la.s, rb.s) AS INTEGER) AS dist
FROM la JOIN rb ON levenshtein(la.s, rb.s) <= {max_dist}
"""


def edit_similarity_join_sql(
    table: str,
    id_col: str = "doc_id",
    key_expr: str = "text",
    max_dist: int = 2,
) -> str:
    """DuckDB twin: the naive all-pairs formulation. The signature
    stage is lossless, so the blocked Spark join and this quadratic
    oracle agree EXACTLY — that equality is the whole correctness
    argument for the filter."""
    return f"""
WITH k AS (
  SELECT {id_col} AS id, {key_expr} AS s FROM {table}
  WHERE {key_expr} IS NOT NULL AND length({key_expr}) <= {MAX_KEY_LEN}
)
SELECT a.id AS id1, b.id AS id2,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM k a JOIN k b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= {max_dist}
"""


_TOKEN_RE = r"\s+"


def _token_sets(keys: DataFrame) -> DataFrame:
    toks = F.array_distinct(F.filter(
        F.split(F.lower(F.trim(F.col("s"))), _TOKEN_RE),
        lambda t: F.length(t) > 0))
    return keys.select("id", toks.alias("t")).filter(F.size("t") > 0)


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id1 < id2) with Jaccard(tokens1, tokens2) ≥
    threshold over distinct lowercase whitespace tokens of the key.
    Output: (id1, id2, sim) with sim = round(jaccard, 6). Keys with
    zero tokens are excluded (Jaccard undefined)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    keys = _check_key(df, id_col, key_col)
    sets = _token_sets(keys)
    ordered = _freq_ordered(
        sets.select("id", F.explode("t").alias("tok")), "tok", "id")
    # prefix size per string: m - ceil(t*m) + 1 (All-Pairs)
    m = F.size("units")
    p = m - F.ceil(F.lit(threshold) * m).cast("int") + F.lit(1)
    sig = ordered.select(
        "id", F.col("units").alias("t"), m.alias("m"),
        F.explode(F.slice("units", 1, p)).alias("tok"))
    l, r = sig.alias("l"), sig.alias("r")
    cand = (l.join(r, (F.col("l.tok") == F.col("r.tok"))
                   & (F.col("l.id") < F.col("r.id"))
                   & (F.col("r.m") * threshold <= F.col("l.m"))
                   & (F.col("l.m") * threshold <= F.col("r.m")))
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"),
                    F.col("l.t").alias("t1"), F.col("r.t").alias("t2"),
                    F.col("l.m").alias("m1"), F.col("r.m").alias("m2"))
            .dropDuplicates(["id1", "id2"]))
    inter = F.size(F.array_intersect("t1", "t2"))
    sim = dround(inter / (F.col("m1") + F.col("m2") - inter), 6)
    return (cand.withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select("id1", "id2", "sim"))


def jaccard_similarity_join_sql(
    table: str,
    id_col: str = "doc_id",
    key_expr: str = "text",
    threshold: float = 0.5,
) -> str:
    """DuckDB twin (naive all-pairs; same tokenization, distinct
    tokens, same round-6 similarity)."""
    return f"""
WITH k AS (
  SELECT {id_col} AS id,
         list_distinct(list_filter(
           regexp_split_to_array(lower(trim({key_expr})), '{_TOKEN_RE}'),
           x -> length(x) > 0)) AS t
  FROM {table}
  WHERE {key_expr} IS NOT NULL AND length({key_expr}) <= {MAX_KEY_LEN}
),
k2 AS (SELECT id, t, len(t) AS m FROM k WHERE len(t) > 0)
SELECT id1, id2, sim FROM (
  SELECT a.id AS id1, b.id AS id2,
         round(len(list_intersect(a.t, b.t))::DOUBLE /
               (a.m + b.m - len(list_intersect(a.t, b.t))), 6) AS sim
  FROM k2 a JOIN k2 b ON a.id < b.id
) WHERE sim >= {threshold}
"""
