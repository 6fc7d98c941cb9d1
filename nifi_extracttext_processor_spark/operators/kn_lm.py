"""Word-level interpolated Kneser-Ney bigram language model — the
perplexity filter CCNet actually runs (Wenzek et al. 2020 scores
Common Crawl with a KenLM 5-gram KN model trained on Wikipedia; this
is the same construction at bigram order, trained on any reference
DataFrame, with zero external models). Complements the char-level
add-k model in operators/lm.py: char LM catches encoding junk and
character soup, the word-level KN model catches fluent-looking but
improbable WORD sequences (keyword stuffing, shuffled text, MT
garbage) that character statistics miss.

Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1998 interpolated
form), bigram order:

    P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1·)
             + (D · N1+(w1·) / c(w1·)) · Pcont(w2)

where c(w1·) is w1's count as a bigram CONTEXT, N1+(w1·) the number
of distinct continuations of w1, and the continuation probability
Pcont(w2) ∝ the number of distinct contexts w2 follows — the famous
"San Francisco" insight: 'Francisco' is frequent but follows only
one word, so as a novel continuation it should be unlikely.

Determinism / oracle contract (the nbayes posture — train AND score
replay in DuckDB):
  * fixed discount D (default 0.75, the standard practical choice;
    NOT the count-of-counts estimate, documented deviation — an
    estimated D would still be deterministic but adds nothing the
    driver oracle can check that the fixed one doesn't);
  * Pcont is add-one smoothed over (B + V + 1) so unseen words score
    a finite floor in BOTH the interpolation and the unseen-context
    backoff: Pcont'(w) = (N1+(·w) + 1) / (B + V + 1), V = |vocab|;
  * every probability is computed in double arithmetic in the same
    order in both engines; the per-doc average NLL rounds to 6.

100 TB shape:
  * training = one narrow bigram pairing per doc (array zip — no
    positional self-join), then three vocab-bounded map-side-
    combinable aggregations (bigram counts, context margins +
    distinct-continuation counts, continuation counts) and two
    1-row scalars (B, V);
  * `max_vocab` caps the model by (count desc, token) with OOV → the
    `<unk>` token BEFORE counting, so model tables are bounded and
    the cap is part of the replayable contract;
  * scoring = the same narrow pairing + THREE broadcast left joins
    (bigram, context, continuation — each vocab-bounded) + one
    map-side-combinable per-doc agg: text never shuffles, the only
    exchange carries (doc_id, partial sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


BOS = "<s>"
UNK = "<unk>"

_TOKEN_SPLIT = r"\s+"


def _toks(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT),
        lambda t: F.length(t) > 0)


def _map_unk(ts_col: str, words: "list[str]"):
    """OOV → <unk> over a literal sorted vocab (narrow, zero join)."""
    wl = (F.array(*[F.lit(w) for w in words]) if words
          else F.array().cast("array<string>"))
    return F.transform(
        ts_col, lambda t: F.when(F.array_contains(wl, t), t)
        .otherwise(F.lit(UNK))).alias("ts")


def train_kn_bigram(
    df: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    max_vocab: int | None = None,
) -> "tuple[DataFrame, DataFrame, DataFrame, int, int, float, list[str] | None]":
    """Train on a reference corpus. Returns
    (bigrams(w1, w2, c12), contexts(w1, c1, nf), conts(w2, nc),
    n_bigram_types B, vocab_size V, discount, vocab).

    bigrams: observed bigram counts (BOS-prefixed per doc).
    contexts: per-context total count + distinct-continuation count.
    conts: per-word distinct-context count (the KN continuation
    numerator). All three are vocab-bounded; with `max_vocab`, tokens
    outside the top-`max_vocab` (count desc, token asc) map to <unk>
    before any counting, the sorted kept-word list is returned as
    `vocab` (None when uncapped), and kn_score applies the SAME
    mapping so the model's <unk> mass is what scores OOV words."""
    if not (0.0 < discount < 1.0):
        raise ValueError("discount must be in (0, 1)")
    toks = df.select(_toks(text_col).alias("ts")) \
        .filter(F.size("ts") >= 1)
    words: "list[str] | None" = None
    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError("max_vocab must be >= 1")
        vocab_df = (toks.select(F.explode("ts").alias("w"))
                    .groupBy("w").agg(F.count("*").alias("c"))
                    .orderBy(F.desc("c"), F.asc("w")).limit(max_vocab)
                    .select("w"))
        # the capped vocab is bounded (<= max_vocab short strings) —
        # collect + literal keeps the mapping a narrow projection
        words = sorted(r["w"] for r in vocab_df.collect())
        toks = toks.select(_map_unk("ts", words))
    pairs = toks.select(F.explode(F.arrays_zip(
        F.concat(F.array(F.lit(BOS)),
                 F.slice("ts", 1, F.size("ts") - 1)).alias("w1"),
        F.col("ts").alias("w2"))).alias("p")) \
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bigrams = (pairs.groupBy("w1", "w2")
               .agg(F.count("*").alias("c12")))
    from pyspark.storagelevel import StorageLevel

    from .lifecycle import track_persist
    bigrams = track_persist(bigrams, StorageLevel.MEMORY_AND_DISK)
    contexts = (bigrams.groupBy("w1")
                .agg(F.sum("c12").alias("c1"),
                     F.count("*").alias("nf")))
    conts = bigrams.groupBy("w2").agg(F.count("*").alias("nc"))
    scalars = bigrams.agg(
        F.count("*").alias("b"),
        F.count_distinct("w2").alias("v")).first()
    return (bigrams, contexts, conts,
            int(scalars["b"]), int(scalars["v"]), float(discount),
            words)


def kn_score(
    df: DataFrame,
    model: "tuple",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id_col, n_bigrams, kn_nll): per-doc average negative
    log-likelihood (natural log, round-6) under the trained model.
    Empty docs score NULL nll with n_bigrams = 0. Set
    broadcast_model=False when the bigram table outgrows the
    broadcast threshold — the joins fall back to keyed shuffles on
    short strings."""
    bigrams, contexts, conts, b, v, d, words = model
    hint = F.broadcast if broadcast_model else (lambda x: x)
    toks = df.select(F.col(id_col), _toks(text_col).alias("ts"))
    if words is not None:
        toks = toks.select(id_col, _map_unk("ts", words))
    pairs = toks.filter(F.size("ts") >= 1).select(
        F.col(id_col),
        F.explode(F.arrays_zip(
            F.concat(F.array(F.lit(BOS)),
                     F.slice("ts", 1, F.size("ts") - 1)).alias("w1"),
            F.col("ts").alias("w2"))).alias("p")) \
        .select(id_col, F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    j = (pairs
         .join(hint(bigrams), ["w1", "w2"], "left")
         .join(hint(contexts), "w1", "left")
         .join(hint(conts), "w2", "left"))
    denom = float(b + v + 1)
    pcont = (F.coalesce(F.col("nc"), F.lit(0)) + 1.0) / F.lit(denom)
    c12 = F.coalesce(F.col("c12"), F.lit(0)).cast("double")
    c1 = F.col("c1").cast("double")
    nf = F.coalesce(F.col("nf"), F.lit(0)).cast("double")
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(c12 - F.lit(d), F.lit(0.0)) / c1
        + F.lit(d) * nf / c1 * pcont
    ).otherwise(pcont)
    scored = (j.groupBy(id_col)
              .agg(F.count("*").cast("long").alias("n_bigrams"),
                   dround(-F.avg(F.log(p)), 6).alias("kn_nll")))
    return (df.select(id_col)
            .join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0).cast("long"))
                    .alias("n_bigrams"),
                    "kn_nll"))


def kn_score_sql(
    table: str = "documents",
    ref_pred: str = "TRUE",
    id_col: str = "doc_id",
    text_expr: str = "text",
    discount: float = 0.75,
) -> str:
    """DuckDB twin of train_kn_bigram(ref = table WHERE ref_pred,
    no vocab cap) + kn_score(table) — the full train-and-score
    pipeline replayed (the nbayes posture)."""
    toks = (f"list_filter(string_split_regex(lower(trim({text_expr})),"
            f" '\\s+'), t -> length(t) > 0)")
    return f"""
WITH docs AS (
  SELECT {id_col}, {toks} AS ts FROM {table}
),
ref_pairs AS (
  SELECT CASE WHEN p.i = 1 THEN '{BOS}' ELSE d.ts[p.i - 1] END AS w1,
         d.ts[p.i] AS w2
  FROM (SELECT ts FROM (SELECT {id_col}, {toks} AS ts FROM {table}
        WHERE {ref_pred}) WHERE len(ts) >= 1) d,
       LATERAL (SELECT unnest(range(1, len(d.ts) + 1)) AS i) p
),
bigrams AS (
  SELECT w1, w2, count(*) AS c12 FROM ref_pairs GROUP BY w1, w2
),
contexts AS (
  SELECT w1, sum(c12) AS c1, count(*) AS nf FROM bigrams GROUP BY w1
),
conts AS (
  SELECT w2, count(*) AS nc FROM bigrams GROUP BY w2
),
scalars AS (
  SELECT count(*) AS b, count(DISTINCT w2) AS v FROM bigrams
),
doc_pairs AS (
  SELECT d.{id_col},
         CASE WHEN p.i = 1 THEN '{BOS}' ELSE d.ts[p.i - 1] END AS w1,
         d.ts[p.i] AS w2
  FROM (SELECT * FROM docs WHERE len(ts) >= 1) d,
       LATERAL (SELECT unnest(range(1, len(d.ts) + 1)) AS i) p
),
probs AS (
  SELECT dp.{id_col},
         CASE WHEN c.c1 IS NOT NULL THEN
           greatest(coalesce(bg.c12, 0)::DOUBLE - {discount!r}, 0.0)
             / c.c1::DOUBLE
           + {discount!r} * coalesce(c.nf, 0)::DOUBLE / c.c1::DOUBLE
             * ((coalesce(ct.nc, 0) + 1.0) / (s.b + s.v + 1.0))
         ELSE (coalesce(ct.nc, 0) + 1.0) / (s.b + s.v + 1.0)
         END AS p
  FROM doc_pairs dp
  LEFT JOIN bigrams bg USING (w1, w2)
  LEFT JOIN contexts c USING (w1)
  LEFT JOIN conts ct USING (w2)
  CROSS JOIN scalars s
),
scored AS (
  SELECT {id_col}, count(*)::BIGINT AS n_bigrams,
         round(-avg(ln(p)), 6) AS kn_nll
  FROM probs GROUP BY {id_col}
)
SELECT t.{id_col},
       coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
       sc.kn_nll
FROM {table} t LEFT JOIN scored sc USING ({id_col})
"""
