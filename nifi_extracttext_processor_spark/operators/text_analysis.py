"""Text-analysis extensions (north star, BASELINE.json): language-ID,
quality scoring, token counting, document fingerprinting.

All four are zero-UDF Catalyst expressions (whole-stage codegen,
narrow — no shuffle), each with a DuckDB-portable SQL twin for the
oracle gate. At 100 TB these are a single projection pass over the
corpus; cost scales with bytes scanned, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


# deterministic per-language stopword sets (tiny demo gazetteers —
# swap for real ones without changing the plan shape)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "了", "是", "我", "不"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]

# BPE-ish word/number/punct splitter (public GPT-2-style shape,
# simplified to what Java/duckdb regex both support)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: Column) -> Column:
    return F.split(F.lower(col), " ")


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count of a text column — the ONE definition shared
    by token_stats and pack_sequences(token_mode='bpe').

    regexp_count, not size(regexp_extract_all): both count the same
    non-overlapping left-to-right matches (NULL in, NULL out — checked
    under ANSI), but extract_all materializes every match into an
    array that exists only to be measured — pure allocation on the
    hottest corpus-wide projection (mix planning, token stats)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish token count, char count."""
    c = F.col(text_col)
    return (df
            .withColumn("n_chars_computed", F.length(c))
            # split's token count is always (#separator matches + 1)
            # (limit -1 keeps leading/trailing empties), so count the
            # separators instead of materializing the token array
            .withColumn("n_ws_tokens",
                        F.regexp_count(c, F.lit(r"\s+")) + F.lit(1))
            .withColumn("n_bpe_tokens", bpe_token_count(c)))


SENTENCE_RE = r"[.!?]\s+"  # re2-safe (no lookbehind) → portable to DuckDB


def sentence_split(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sentence",
    pos_col: str = "sent_no",
) -> DataFrame:
    """One row per sentence with 0-based position — narrow generate,
    no shuffle. Terminator punctuation between sentences is consumed
    by the split (kept only on the final sentence), identically in the
    DuckDB twin."""
    keep = [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        F.posexplode(F.split(F.col(text_col), SENTENCE_RE))
         .alias(pos_col, out_col))


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
) -> DataFrame:
    """Heuristic quality in [0,1]: length band + stopword presence +
    alpha ratio − punctuation excess (Gopher/C4-style signals)."""
    c = F.col(text_col)
    toks = _tokens(c)
    n_tok = F.size(toks)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # regexp_count of the positive class ≡ length after stripping its
    # complement (counts chars, never builds the stripped string)
    n_alpha = F.regexp_count(c, F.lit(r"[A-Za-z]"))
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    length_ok = (F.length(c) >= 50) & (F.length(c) <= 20000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(n_tok > 0, 0.3 * F.least(
            F.lit(1.0), 10.0 * n_stop / n_tok)).otherwise(F.lit(0.0))
        + F.when(F.length(c) > 0,
                 0.3 * n_alpha / F.length(c)).otherwise(F.lit(0.0))
        - F.when(F.length(c) > 0,
                 F.least(F.lit(0.3), 2.0 * n_punct / F.length(c)))
           .otherwise(F.lit(0.0)))
    return df.withColumn(
        "quality", dround(F.greatest(F.lit(0.0), score), 4))


def quality_score_sql(text_expr: str,
                      stopwords: tuple[str, ...] = STOPWORDS_EN) -> str:
    """DuckDB twin of quality_score (same constants, same rounding)."""
    sw = ", ".join(f"'{w}'" for w in stopwords)
    toks = f"string_split(lower({text_expr}), ' ')"
    n_tok = f"len({toks})"
    n_stop = f"len(list_filter({toks}, t -> list_contains([{sw}], t)))"
    n_alpha = f"length(regexp_replace({text_expr}, '[^A-Za-z]', '', 'g'))"
    n_punct = (f"length(regexp_replace({text_expr}, "
               f"'[A-Za-z0-9\\s]', '', 'g'))")
    ln = f"length({text_expr})"
    score = (
        f"(CASE WHEN {ln} >= 50 AND {ln} <= 20000 THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN {n_tok} > 0 THEN 0.3 * least(1.0, "
        f"10.0 * {n_stop} / {n_tok}) ELSE 0.0 END"
        f" + CASE WHEN {ln} > 0 THEN 0.3 * {n_alpha} / {ln} ELSE 0.0 END"
        f" - CASE WHEN {ln} > 0 THEN least(0.3, 2.0 * {n_punct} / {ln}) "
        f"ELSE 0.0 END)")
    return f"round(greatest(0.0, {score}), 4)"


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals per document (the quality rules
    that kill boilerplate / SEO-spam pages):

    - dup_sent_frac: fraction of sentences that are repeats of an
      earlier sentence in the SAME doc,
    - max_bigram_count: occurrences of the most frequent word bigram,
    - top_bigram_char_frac: characters covered by that bigram's
      occurrences / total characters (the Gopher "fraction of characters
      in the most common 2-gram" rule, made tie-proof by maximizing
      count*len directly).

    Zero-UDF, zero-shuffle: everything is higher-order array functions
    over per-doc token arrays — a single narrow projection pass at
    100 TB. The O(distinct x total) inner count is bounded by document
    length, not corpus size.
    """
    c = F.col(text_col)
    toks = _tokens(c)
    bg = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                  F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    sents = F.split(c, SENTENCE_RE)
    dup_sent = dround(
        1.0 - F.size(F.array_distinct(sents)) / F.size(sents), 6)
    counts = F.transform(
        F.array_distinct(bg),
        lambda d: F.size(F.filter(bg, lambda x: x == d)))
    char_cover = F.transform(
        F.array_distinct(bg),
        lambda d: F.size(F.filter(bg, lambda x: x == d)) * F.length(d))
    return (df
            .withColumn("dup_sent_frac", dup_sent)
            .withColumn("max_bigram_count",
                        F.coalesce(F.array_max(counts), F.lit(0))
                         .cast("long"))
            .withColumn(
                "top_bigram_char_frac",
                F.when(F.length(c) > 0, dround(
                    F.coalesce(F.array_max(char_cover), F.lit(0))
                    / F.length(c), 6)).otherwise(F.lit(0.0))))


def repetition_stats_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins of the three repetition_stats columns."""
    toks = f"string_split(lower({text_expr}), ' ')"
    bg = (f"CASE WHEN len({toks}) >= 2 THEN list_transform("
          f"range(1, len({toks})), i -> "
          f"{toks}[i] || ' ' || {toks}[i + 1]) "
          f"ELSE [] END")
    sents = f"regexp_split_to_array({text_expr}, '[.!?]\\s+')"
    counts = (f"list_transform(list_distinct({bg}), "
              f"d -> len(list_filter({bg}, x -> x = d)))")
    cover = (f"list_transform(list_distinct({bg}), "
             f"d -> len(list_filter({bg}, x -> x = d)) * length(d))")
    return {
        "dup_sent_frac": (
            f"round(1.0 - len(list_distinct({sents})) * 1.0"
            f" / len({sents}), 6)"),
        "max_bigram_count": f"coalesce(list_max({counts}), 0)::BIGINT",
        "top_bigram_char_frac": (
            f"CASE WHEN length({text_expr}) > 0 THEN "
            f"round(coalesce(list_max({cover}), 0) * 1.0"
            f" / length({text_expr}), 6) ELSE 0.0 END"),
    }


def language_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    langs: dict[str, tuple[str, ...]] = LANG_STOPWORDS,
) -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts,
    ties broken by language-code order, 'und' when nothing hits."""
    toks = _tokens(F.col(text_col))
    best = F.lit("und")
    best_hits = F.lit(0)
    for code in sorted(langs, reverse=True):  # reverse → earlier code wins tie
        sw = F.array(*[F.lit(w) for w in langs[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        take = hits >= F.greatest(best_hits, F.lit(1))
        best = F.when(take, F.lit(code)).otherwise(best)
        best_hits = F.greatest(hits, best_hits)
    return df.withColumn(out_col, best)


def language_id_sql(text_expr: str,
                    langs: dict[str, tuple[str, ...]] = LANG_STOPWORDS) -> str:
    toks = f"string_split(lower({text_expr}), ' ')"
    hit_exprs = {
        code: (f"len(list_filter({toks}, t -> list_contains(["
               + ", ".join(f"'{w}'" for w in langs[code]) + "], t)))")
        for code in langs}
    # same argmax-with-tie-break: fold in reverse code order
    expr_best, expr_hits = "'und'", "0"
    for code in sorted(langs, reverse=True):
        h = hit_exprs[code]
        expr_best = (f"CASE WHEN {h} >= greatest({expr_hits}, 1) "
                     f"THEN '{code}' ELSE {expr_best} END")
        expr_hits = f"greatest({h}, {expr_hits})"
    return expr_best


def train_lang_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """Char-n-gram language profiles (Cavnar & Trenkle 1994 — the
    textcat method): per language, the `top_k` most frequent n-grams
    with their 1-based frequency rank (ties -> n-gram asc, so
    profiles are deterministic). Train on any labeled seed corpus;
    the result is tiny (|langs| x top_k rows) and broadcasts.

    One map-side-combinable (lang, ngram) shuffle + a keyed rank
    window; reuses the lm module's _char_ngrams Catalyst expression so
    an "n-gram" means the same thing as in the char-LM family."""
    from pyspark.sql import Window

    from .lm import _exploded_char_ngrams

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    grams = _exploded_char_ngrams(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col)),
        text_col, n, keep=("lang",))
    counts = grams.groupBy("lang", "ngram").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"),
                                           F.asc("ngram"))
    return (counts.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .filter(F.col("rank") <= top_k)
            .select("lang", "ngram", "rank"))


def language_id_ngram(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 100,
    out_col: str = "lang_pred",
) -> DataFrame:
    """Profile-based language ID: rank the document's own top-k char
    n-grams, compare against each trained language profile with the
    Cavnar-Trenkle out-of-place distance (matched grams pay
    |doc_rank - lang_rank|, unmatched pay `top_k`), and take the
    argmin (ties -> lang asc). Far more robust than stopword hits on
    short/strange text; `language_id` stays as the cheap gazetteer
    pass. Docs with no n-grams (shorter than n) predict 'und'.

    Scale: the (id, ngram) count partial-aggregates map-side; both
    windows are keyed by doc; the profile and language list are
    BROADCAST (|langs| x top_k rows); the corpus never shuffles
    anything wider than (id, ngram) rows."""
    from pyspark.sql import Window

    from .lm import _exploded_char_ngrams

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    dg = (_exploded_char_ngrams(df, text_col, n, keep=(id_col,))
          .groupBy(id_col, "ngram").agg(F.count("*").alias("cnt")))
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"),
                                           F.asc("ngram"))
    dp = (dg.withColumn("drank", F.row_number().over(w).cast("long"))
          .filter(F.col("drank") <= top_k))
    g = dp.groupBy(id_col).agg(F.count("*").alias("g"))
    langs = profiles.select("lang").distinct()
    matched = (dp.join(F.broadcast(profiles), "ngram")
               .groupBy(id_col, "lang")
               .agg(F.sum(F.abs(F.col("drank") - F.col("rank")))
                    .alias("mdist"),
                    F.count("*").alias("mcnt")))
    scored = (g.crossJoin(F.broadcast(langs))
              .join(matched, [id_col, "lang"], "left")
              .withColumn("dist",
                          F.coalesce(F.col("mdist"), F.lit(0))
                          + (F.col("g")
                             - F.coalesce(F.col("mcnt"), F.lit(0)))
                          * F.lit(top_k)))
    w2 = Window.partitionBy(id_col).orderBy(F.asc("dist"),
                                            F.asc("lang"))
    pred = (scored.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") == 1)
            .select(F.col(id_col), F.col("lang").alias(out_col),
                    F.col("dist").cast("long").alias("lang_dist")))
    return (df.join(pred, id_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col),
                                            F.lit("und"))))


def language_id_ngram_sql(
    table: str = "documents",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n: int = 3,
    top_k: int = 100,
    out_col: str = "lang_pred",
) -> str:
    """DuckDB twin: train profiles on `table`'s lang_col and classify
    the same table (the self-consistency driver query) — identical
    n-gram enumeration, ranks, out-of-place distance and tie-breaks."""
    c = f"coalesce({text_expr}, '')"
    grams = (f"CASE WHEN length({c}) >= {n} THEN "
             f"list_transform(range(0, length({c}) - {n} + 1), "
             f"i -> substr({c}, i + 1, {n})) "
             f"ELSE [] END")
    return f"""
WITH lg AS (
  SELECT {lang_col} AS lang, unnest({grams}) AS ngram FROM {table}
), lc AS (
  SELECT lang, ngram, count(*) AS cnt FROM lg GROUP BY 1, 2
), profiles AS (
  SELECT lang, ngram, rank FROM (
    SELECT lang, ngram, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY cnt DESC, ngram ASC) AS BIGINT)
        AS rank
    FROM lc
  ) WHERE rank <= {top_k}
), dg AS (
  SELECT {id_col}, ngram, count(*) AS cnt FROM (
    SELECT {id_col}, unnest({grams}) AS ngram FROM {table}
  ) GROUP BY 1, 2
), dp AS (
  SELECT {id_col}, ngram, drank FROM (
    SELECT {id_col}, ngram, CAST(row_number() OVER (
        PARTITION BY {id_col} ORDER BY cnt DESC, ngram ASC) AS BIGINT)
        AS drank
    FROM dg
  ) WHERE drank <= {top_k}
), gt AS (
  SELECT {id_col}, count(*) AS g FROM dp GROUP BY 1
), langs AS (SELECT DISTINCT lang FROM profiles),
matched AS (
  SELECT dp.{id_col}, profiles.lang,
         sum(abs(drank - rank)) AS mdist, count(*) AS mcnt
  FROM dp JOIN profiles USING (ngram)
  GROUP BY 1, 2
), scored AS (
  SELECT gt.{id_col}, langs.lang,
         coalesce(mdist, 0) + (g - coalesce(mcnt, 0)) * {top_k}
           AS dist
  FROM gt CROSS JOIN langs
  LEFT JOIN matched ON matched.{id_col} = gt.{id_col}
                   AND matched.lang = langs.lang
), pred AS (
  SELECT {id_col}, lang, dist FROM (
    SELECT *, row_number() OVER (
        PARTITION BY {id_col} ORDER BY dist ASC, lang ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT t.{id_col},
       coalesce(pred.lang, 'und') AS {out_col},
       CAST(pred.dist AS BIGINT) AS lang_dist
FROM {table} t LEFT JOIN pred ON t.{id_col} = pred.{id_col}
"""


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Deterministic doc fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key (portable to any engine)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


def fingerprint_sql(text_expr: str) -> str:
    return (f"md5(regexp_replace(lower(trim({text_expr})), "
            f"'\\s+', ' ', 'g'))")


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene: redact before anything ships)
# ---------------------------------------------------------------------------

# Applied in this order (URL first so its userinfo@host part is not
# half-eaten by the email pass). Every pattern is RE2-safe (no
# lookaround) so Spark's Java regex and DuckDB agree byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "scrubbed") -> DataFrame:
    """Redact URLs/emails/IPv4s/phone numbers, with one count column per
    category (n_url, n_email, n_ipv4, n_phone). Pure regexp projection:
    narrow, zero-shuffle, whole-stage codegen."""
    out = df
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(scrubbed, F.lit(pat)).cast("long"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(out_col, scrubbed)


def scrub_pii_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins: {'scrubbed': expr, 'n_url': expr, ...}. Counts are
    evaluated against the same partially-scrubbed input as the Spark
    side (each category counts AFTER the previous replacements ran)."""
    exprs: dict[str, str] = {}
    cur = text_expr
    for name, pat, repl in PII_PATTERNS:
        exprs[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    exprs["scrubbed"] = cur
    return exprs


# ---------------------------------------------------------------------------
# corpus-level term statistics
# ---------------------------------------------------------------------------

def top_terms(df: DataFrame, text_col: str = "text",
              k: int = 20) -> DataFrame:
    """Global top-k terms by frequency (ties broken by term asc, so the
    result set is deterministic).

    Scale shape: explode is narrow; the groupBy partial-aggregates
    map-side so only distinct (term, partial_count) pairs shuffle; the
    final orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k, no global sort)."""
    return (df
            .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                      r"\s+")).alias("term"))
            .filter(F.length("term") > 0)
            .groupBy("term").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("term"))
            .limit(k))


def approx_top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    ngram: int = 1,
) -> DataFrame:
    """Heavy hitters with BOUNDED memory: Misra-Gries summaries
    (Misra & Gries 1982; mergeable per Agarwal et al. 2012).

    top_terms' exact (term, count) aggregate shuffles one row per
    DISTINCT term — at 100 TB with n-gram vocabularies that
    intermediate is itself enormous. This keeps at most `capacity`
    counters per partition: tokens stay a narrow JVM-side explode
    (house convention), one Arrow pass folds each partition into a
    <=capacity-row sketch, and only capacity x n_partitions rows ever
    shuffle. Summing partial counters preserves the MG guarantee

        f(t) - n_tokens/capacity <= est(t) <= f(t)

    so the output carries (est_count, max_count=est+n/capacity) and
    every term with true frequency > n/capacity is guaranteed present
    before the top-k cut. `ngram` > 1 switches to word n-gram heavy
    hitters — the combinatorial-vocabulary case the sketch exists
    for. est values (not membership bounds) depend on
    arrival order — this is a sketch, hence no SQL twin; the exact
    operator remains the oracle at test scale.
    """
    if k < 1 or capacity < 1:
        raise ValueError("k and capacity must be >= 1")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    arr = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                   lambda t: F.length(t) > 0)
    if ngram > 1:
        # word n-grams: THE case for the sketch — the distinct-n-gram
        # space explodes combinatorially, so the exact aggregate's
        # intermediate outgrows memory long before unigrams do
        arr = F.when(
            F.size(arr) >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - ngram),
                lambda i: F.concat_ws(" ", *[
                    F.element_at(arr, i + j + 1)
                    for j in range(ngram)]))
        ).otherwise(F.array().cast("array<string>"))
    toks = df.select(F.explode(arr).alias("term"))
    cap = int(capacity)

    def sketch(batches):
        import pandas as pd
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            # vectorized: the batch's exact (term, count) summary via
            # value_counts, then the Agarwal-et-al MERGE of two
            # summaries — add counters, and if over capacity subtract
            # the (capacity+1)-th largest value from all and drop the
            # non-positive. Orders of magnitude faster than per-token
            # Python, same f - n/cap <= est <= f guarantee.
            vc = pdf["term"].value_counts()
            n += int(vc.sum())
            for t, c in vc.items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                thresh = vals[cap]
                counters = {t: c - thresh
                            for t, c in counters.items() if c > thresh}
        rows = list(counters.items())
        rows.append((None, n))          # per-partition token total
        yield pd.DataFrame(rows, columns=["term", "cnt"])

    partials = toks.mapInPandas(sketch, "term string, cnt long")
    merged = (partials.filter(F.col("term").isNotNull())
              .groupBy("term").agg(F.sum("cnt").alias("est_count")))
    total = (partials.filter(F.col("term").isNull())
             .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_tokens")))
    return (merged.crossJoin(F.broadcast(total))
            .select("term",
                    "est_count",
                    (F.col("est_count")
                     + F.ceil(F.col("n_tokens") / F.lit(cap)))
                    .cast("long").alias("max_count"))
            .orderBy(F.desc("est_count"), F.asc("term"))
            .limit(k))


def approx_top_terms_exact(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    ngram: int = 1,
) -> DataFrame:
    """Two-pass heavy hitters with EXACT reported counts — the
    confirm pass the raw sketch omits: pass 1 is the bounded-memory
    Misra-Gries candidate scan (approx_top_terms with the top-k cut
    removed: every positive merged counter survives, so membership
    keeps the f > n/capacity guarantee), pass 2 recounts ONLY the
    candidates exactly via a broadcast semi-join + one keyed agg —
    the shuffle carries candidate terms (<= capacity x partitions),
    never the vocabulary.

    Output (term, n) is DETERMINISTIC whenever the true k-th count
    exceeds n_tokens/capacity (MG membership bound ⇒ every true
    top-k term is a candidate ⇒ the exact recount's top-k equals the
    global exact top-k) — unlike the raw sketch's est values, which
    depend on arrival order. That makes THIS variant oracle-
    replayable (twin: top_terms_sql, the plain exact aggregate);
    tests assert the bound holds on the test tables at both SFs."""
    if k < 1 or capacity < 1:
        raise ValueError("k and capacity must be >= 1")
    # pass 1: candidates = every surviving MG counter (no top-k cut)
    cand = (approx_top_terms(df, text_col, k=2 ** 31 - 1,
                             capacity=capacity, ngram=ngram)
            .select("term"))
    # pass 2: exact recount of candidates only
    arr = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                   lambda t: F.length(t) > 0)
    if ngram > 1:
        arr = F.when(
            F.size(arr) >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - ngram),
                lambda i: F.concat_ws(" ", *[
                    F.element_at(arr, i + j + 1)
                    for j in range(ngram)]))
        ).otherwise(F.array().cast("array<string>"))
    toks = df.select(F.explode(arr).alias("term"))
    return (toks.join(F.broadcast(cand), "term")
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("term"))
            .limit(k))


def top_terms_sql(table: str = "documents", text_expr: str = "text",
                  k: int = 20) -> str:
    return f"""
SELECT term, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(lower({text_expr})), '\\s+'))
        AS term FROM {table})
WHERE len(term) > 0
GROUP BY term ORDER BY n DESC, term LIMIT {k}
"""


def length_histogram(df: DataFrame, text_col: str = "text",
                     bucket_chars: int = 100,
                     max_bucket: int = 20) -> DataFrame:
    """Document-length histogram: bucket b covers
    [b*bucket_chars, (b+1)*bucket_chars), overflow clamped to
    max_bucket. One partial-agg shuffle of ≤ max_bucket+1 groups."""
    b = F.least(F.floor(F.length(F.col(text_col)) / bucket_chars),
                F.lit(max_bucket)).cast("long")
    return (df.groupBy(b.alias("bucket"))
            .agg(F.count("*").alias("n_docs"),
                 dround(F.avg(F.length(F.col(text_col))), 2)
                  .alias("avg_chars")))


def length_histogram_sql(table: str = "documents", text_expr: str = "text",
                         bucket_chars: int = 100,
                         max_bucket: int = 20) -> str:
    b = f"least(length({text_expr}) // {bucket_chars}, {max_bucket})"
    return f"""
SELECT CAST({b} AS BIGINT) AS bucket, count(*) AS n_docs,
       round(avg(length({text_expr})), 2) AS avg_chars
FROM {table} GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def tfidf_top_terms(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF
    (score = tf · ln((N+1)/(df+1)), ties → term asc).

    Scale shape: term counts partial-aggregate map-side before the
    (doc, term) shuffle; the document-frequency table derives from the
    same aggregate (no second text scan); N is a 1-row broadcast; the
    per-doc rank window is keyed by doc_id. No global sort anywhere.
    Skewed hot terms only affect the df-table join — AQE skew handling
    applies there.
    """
    from pyspark.sql import Window

    terms = (df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("term"))
        .filter(F.length("term") > 0))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count("*").alias("df"))  # rows in tf are distinct (doc, term)
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs"))  # 1 row → broadcast
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf", dround(
                  F.col("tf") * F.log((F.col("n_docs") + 1)
                                      / (F.col("df") + 1)), 4)))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(id_col, "term", "tf", "df",
                    "tfidf", F.col("rk").cast("long").alias("rk")))


def tfidf_top_terms_sql(table: str = "documents", id_col: str = "doc_id",
                        text_expr: str = "text", k: int = 3) -> str:
    """DuckDB twin (same log base e, same rounding, same tie-break)."""
    return f"""
WITH terms AS (
  SELECT {id_col},
         unnest(string_split_regex(trim(lower({text_expr})), '\\s+')) AS term
  FROM {table}
), tf_t AS (
  SELECT {id_col}, term, count(*) AS tf FROM terms
  WHERE len(term) > 0 GROUP BY 1, 2
), df_t AS (
  SELECT term, count(*) AS df FROM tf_t GROUP BY 1
), n_t AS (
  SELECT count(DISTINCT {id_col}) AS n_docs FROM {table}
), scored AS (
  SELECT tf_t.{id_col}, tf_t.term, tf, df,
         round(tf * ln((n_docs + 1) / (df + 1)), 4) AS tfidf
  FROM tf_t JOIN df_t USING (term) CROSS JOIN n_t
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
             ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT {id_col}, term, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {k}
"""


def length_percentiles(df: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Exact p50/p90/p99 of document length (1 output row).

    Exact percentile is a sort-based aggregate — fine into the tens of
    millions of rows it would see per partition-pruned slice, and it is
    what the DuckDB oracle can reproduce bit-for-bit. At full 100 TB
    corpus scope swap in percentile_approx (t-digest, mergeable sketch,
    single pass) and accept approximate answers; the histogram operator
    above is the exact-and-scalable alternative.
    """
    ln = F.length(F.col(text_col))
    pct = F.percentile(ln, F.lit([0.5, 0.9, 0.99]))
    return df.agg(
        dround(pct.getItem(0), 2).alias("p50"),
        dround(pct.getItem(1), 2).alias("p90"),
        dround(pct.getItem(2), 2).alias("p99"),
        F.count("*").alias("n_docs"))


def length_percentiles_sql(table: str = "documents",
                           text_expr: str = "text") -> str:
    q = f"quantile_cont(length({text_expr}), [0.5, 0.9, 0.99])"
    return f"""
SELECT round({q}[1], 2) AS p50, round({q}[2], 2) AS p90,
       round({q}[3], 2) AS p99, count(*) AS n_docs
FROM {table}
"""


# ---------------------------------------------------------------------------
# document chunking (training-data prep: fixed-token windows + overlap)
# ---------------------------------------------------------------------------

def chunk_documents(df: DataFrame, text_col: str = "text",
                    max_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split each document into whitespace-token windows of max_tokens
    with `overlap` tokens of context carried between consecutive
    chunks; emits (…, chunk_no, chunk, n_chunk_tokens). Zero-UDF
    narrow generate — chunking never shuffles, so it composes with the
    extraction scan at any scale.

    chunk i covers tokens [i·step, i·step+max_tokens) with
    step = max_tokens − overlap; every token lands in ≥1 chunk; empty
    docs yield no rows.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    keep = [c for c in df.columns if c != text_col]
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = (F.floor((F.greatest(n - overlap, F.lit(1)) - 1) / step)
                + 1).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, max_tokens)))
    out = (df.filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(*keep,
                   F.posexplode(chunks).alias("chunk_no", "chunk")))
    return (out
            .withColumn("chunk_no", F.col("chunk_no").cast("long"))
            .withColumn("n_chunk_tokens",
                        F.size(F.split(F.col("chunk"), " ")).cast("long")))


def chunk_documents_sql(table: str = "documents", text_expr: str = "text",
                        max_tokens: int = 64, overlap: int = 8) -> str:
    """DuckDB twin (zipped unnest of range + transformed slices)."""
    step = max_tokens - overlap
    toks = f"string_split_regex(trim({text_expr}), '\\s+')"
    n = f"len(toks)"
    nc = f"((greatest({n} - {overlap}, 1) - 1) // {step} + 1)"
    return f"""
WITH t AS (
  SELECT *, {toks} AS toks FROM {table}
  WHERE length(trim({text_expr})) > 0
), chunked AS (
  SELECT * EXCLUDE (toks),
         unnest(range({nc})) AS chunk_no,
         unnest(list_transform(range({nc}),
                i -> array_to_string(list_slice(
                     toks, i * {step} + 1, i * {step} + {max_tokens}), ' ')))
           AS chunk
  FROM t
)
SELECT * REPLACE (CAST(chunk_no AS BIGINT) AS chunk_no),
       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens
FROM chunked
"""


# ---------------------------------------------------------------------------
# URL / domain analytics
# ---------------------------------------------------------------------------

URL_RE = r"https?://[^\s]+"          # same re2-safe pattern scrub_pii uses
DOMAIN_RE = r"^https?://([^/:?#\s]+)"


def top_domains(df: DataFrame, text_col: str = "text",
                k: int = 20) -> DataFrame:
    """Top-k URL domains across the corpus — the provenance/source-mix
    report every crawl-derived training set needs (and the input to
    per-domain sampling policies, cf. stratified_sample).

    Plan: regexp_extract_all + explode (narrow), lowercase host parse,
    hash aggregate with map-side combine on the ~domain-cardinality
    key space, TakeOrdered top-k — no global sort, no text shuffle.
    Deterministic ties: count desc, domain asc.
    """
    urls = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0))
        .alias("url"))
    dom = F.lower(F.regexp_extract(F.col("url"), DOMAIN_RE, 1))
    return (urls.select(dom.alias("domain"))
            .filter(F.col("domain") != "")
            .groupBy("domain")
            .agg(F.count("*").alias("n_urls"))
            .orderBy(F.desc("n_urls"), F.asc("domain"))
            .limit(k))


def top_domains_sql(table: str = "documents", text_expr: str = "text",
                    k: int = 20) -> str:
    return f"""
WITH urls AS (
  SELECT unnest(regexp_extract_all({text_expr}, '{URL_RE}')) AS url
  FROM {table}
), doms AS (
  SELECT lower(regexp_extract(url, '{DOMAIN_RE}', 1)) AS domain FROM urls
)
SELECT domain, count(*) AS n_urls FROM doms WHERE domain <> ''
GROUP BY domain ORDER BY n_urls DESC, domain ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rule gate (Rae et al. 2021, public filter set)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(df: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule booleans + overall gate — the published
    heuristic filter battery for web-scale pretraining corpora:

      ok_word_count     50 ≤ #whitespace words ≤ 100 000
      ok_mean_word_len  3 ≤ mean word length ≤ 10
      ok_symbol_ratio   (# '#' + '...') / words < 0.1
      ok_bullet_lines   ≤ 90% of lines start with a bullet
      ok_ellipsis_lines ≤ 30% of lines end with '...'
      ok_alpha_words    ≥ 80% of words contain a letter
      ok_stopwords      ≥ 2 distinct common stopwords present
      passes            AND of all rules

    Pure Catalyst (split + higher-order filters + regexp counts): one
    narrow projection, zero shuffle, composes with the extraction scan
    at any scale. Boolean outputs → engine-exact oracle parity (floats
    stay intermediate).
    """
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    n_words = F.size(toks)
    mean_len = (F.aggregate(toks, F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x))
                / F.greatest(n_words, F.lit(1)))
    symbols = (F.regexp_count(c, F.lit("#"))
               + F.regexp_count(c, F.lit(r"\.\.\.")))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet = F.size(F.filter(lines,
                             lambda line: line.rlike(r"^\s*[-*•]")))
    ell = F.size(F.filter(lines, lambda line: line.rlike(r"\.\.\.\s*$")))
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    low = F.transform(toks, F.lower)
    n_stop = sum((F.array_contains(low, w).cast("int")
                  for w in GOPHER_STOPWORDS), F.lit(0))
    out = df.select(
        "*",
        (n_words.between(50, 100_000)).alias("ok_word_count"),
        ((mean_len >= 3) & (mean_len <= 10)).alias("ok_mean_word_len"),
        ((symbols / F.greatest(n_words, F.lit(1))) < 0.1)
        .alias("ok_symbol_ratio"),
        ((bullet / n_lines) <= 0.9).alias("ok_bullet_lines"),
        ((ell / n_lines) <= 0.3).alias("ok_ellipsis_lines"),
        ((alpha / F.greatest(n_words, F.lit(1))) >= 0.8)
        .alias("ok_alpha_words"),
        (n_stop >= 2).alias("ok_stopwords"))
    flags = ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
             "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
             "ok_stopwords"]
    passes = F.lit(True)
    for f in flags:
        passes = passes & F.col(f)
    return out.withColumn("passes", passes)


def gopher_quality_flags_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins keyed by output column (same tokenization, same
    guards, same fold order)."""
    toks = f"string_split_regex(trim({text_expr}), '\\s+')"
    n_words = f"len({toks})"
    g = f"greatest({n_words}, 1)"
    mean_len = (f"(list_sum(list_transform({toks}, w -> length(w)))"
                f"::DOUBLE / {g})")
    symbols = (f"(len(regexp_extract_all({text_expr}, '#')) + "
               f"len(regexp_extract_all({text_expr}, '\\.\\.\\.')))")
    lines = f"string_split({text_expr}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)"
    bullet = (f"len(list_filter({lines}, "
              f"l -> regexp_matches(l, '^\\s*[-*•]')))")
    ell = (f"len(list_filter({lines}, "
           f"l -> regexp_matches(l, '\\.\\.\\.\\s*$')))")
    alpha = (f"len(list_filter({toks}, "
             f"w -> regexp_matches(w, '[A-Za-z]')))")
    low = f"list_transform({toks}, w -> lower(w))"
    n_stop = " + ".join(
        f"CAST(list_contains({low}, '{w}') AS INT)"
        for w in GOPHER_STOPWORDS)
    exprs = {
        "ok_word_count": f"({n_words} BETWEEN 50 AND 100000)",
        "ok_mean_word_len": f"({mean_len} >= 3 AND {mean_len} <= 10)",
        "ok_symbol_ratio": f"(({symbols}::DOUBLE / {g}) < 0.1)",
        "ok_bullet_lines": f"(({bullet}::DOUBLE / {n_lines}) <= 0.9)",
        "ok_ellipsis_lines": f"(({ell}::DOUBLE / {n_lines}) <= 0.3)",
        "ok_alpha_words": f"(({alpha}::DOUBLE / {g}) >= 0.8)",
        "ok_stopwords": f"(({n_stop}) >= 2)",
    }
    exprs["passes"] = "(" + " AND ".join(exprs.values()) + ")"
    return exprs


# ---------------------------------------------------------------------------
# canonical URL normalization + URL-keyed dedup (CC-pipeline first line)
# ---------------------------------------------------------------------------

# tracking params stripped during canonicalization (the usual
# analytics/click-id suspects; extend per deployment). Case-insensitive
# and value-optional: '?UTM_Source=x' and a bare '?gclid' both match.
TRACKING_PARAM_RE = (
    r"(?i)^(utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)"
    r"(=|$)")
_URL_HEAD_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def canonical_url(url: Column | str) -> Column:
    """Canonical dedup key for a URL: trim, strip ``#fragment``,
    lowercase the ``scheme://host[:port]`` head (path/query case
    preserved), drop default ports (http :80 / https :443), remove
    tracking query params (TRACKING_PARAM_RE) and an emptied ``?``,
    strip trailing slashes from the path. Strings without a scheme
    head only get fragment/trailing-slash cleanup.

    The first-line dedup stage of web-crawl pipelines (CCNet /
    RefinedWeb-style URL dedup): exact-duplicate page detection at
    string-projection cost before any content hashing. Pure
    built-ins; canonical_url_sql reproduces every value.
    """
    u = F.regexp_replace(
        F.trim(F.col(url) if isinstance(url, str) else url),
        "#.*$", "")
    raw_head = F.regexp_extract(u, _URL_HEAD_RE, 0)
    head = F.lower(raw_head)
    head = F.regexp_replace(head, "^(http://[^:/]*):80$", "$1")
    head = F.regexp_replace(head, "^(https://[^:/]*):443$", "$1")
    tail = F.substr(u, F.length(raw_head) + F.lit(1))
    path = F.regexp_replace(
        F.regexp_extract(tail, "^[^?]*", 0), "/+$", "")
    query = F.substr(tail, F.length(F.regexp_extract(tail, "^[^?]*", 0))
                     + F.lit(2))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != F.lit("")))
    q2 = F.array_join(kept, "&")
    return F.when(
        raw_head == "", F.regexp_replace(u, "/+$", "")).otherwise(
        F.concat(head, path,
                 F.when(q2 != "", F.concat(F.lit("?"), q2))
                 .otherwise(F.lit(""))))


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of canonical_url (same regexes, \\1 backrefs)."""
    u = f"regexp_replace(trim({url_expr}), '#.*$', '')"
    raw_head = f"regexp_extract({u}, '{_URL_HEAD_RE}')"
    head = (f"regexp_replace(regexp_replace(lower({raw_head}), "
            f"'^(http://[^:/]*):80$', '\\1'), "
            f"'^(https://[^:/]*):443$', '\\1')")
    tail = f"substr({u}, length({raw_head}) + 1)"
    path0 = f"regexp_extract({tail}, '^[^?]*')"
    path = f"regexp_replace({path0}, '/+$', '')"
    query = f"substr({tail}, length({path0}) + 2)"
    kept = (f"list_filter(string_split({query}, '&'), "
            f"p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}') "
            f"AND p <> '')")
    q2 = f"array_to_string({kept}, '&')"
    return (f"CASE WHEN {raw_head} = '' "
            f"THEN regexp_replace({u}, '/+$', '') "
            f"ELSE {head} || {path} || "
            f"(CASE WHEN {q2} <> '' THEN '?' || {q2} ELSE '' END) END")


def dedup_by_url(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Keep the first row (min id) per canonical URL; rows with NULL
    or empty URLs are never merged (each passes through). Returns the
    input columns plus the ``canonical_url`` key column.

    Plan: one narrow canonicalization projection, a min-id agg per
    key (map-side combinable, only (curl, id) pairs shuffle) and a
    join-back — the row payload moves once, like dedup_exact.
    """
    keyed = df.withColumn("canonical_url", canonical_url(url_col))
    has_url = (F.col("canonical_url").isNotNull()
               & (F.col("canonical_url") != ""))
    winners = (keyed.filter(has_url)
               .groupBy("canonical_url")
               .agg(F.min(id_col).alias("__keep")))
    deduped = (keyed.filter(has_url)
               .join(winners, "canonical_url")
               .filter(F.col(id_col) == F.col("__keep"))
               .drop("__keep"))
    passthrough = keyed.filter(~has_url | F.col("canonical_url").isNull())
    return deduped.unionByName(passthrough)


def dedup_by_url_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    url_expr: str = "url",
) -> str:
    """DuckDB twin of dedup_by_url (same key expression)."""
    canon = canonical_url_sql(url_expr)
    return f"""
WITH keyed AS (
  SELECT *, {canon} AS canonical_url FROM {table}
), winners AS (
  SELECT canonical_url, min({id_col}) AS keep_id
  FROM keyed
  WHERE canonical_url IS NOT NULL AND canonical_url <> ''
  GROUP BY canonical_url
)
SELECT k.* FROM keyed k JOIN winners w
  ON k.canonical_url = w.canonical_url AND k.{id_col} = w.keep_id
UNION ALL
SELECT * FROM keyed
WHERE canonical_url IS NULL OR canonical_url = ''
"""


# ---------------------------------------------------------------------------
# corpus cardinality: exact vs HLL-sketched distincts
# ---------------------------------------------------------------------------

def cardinality_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rsd: float = 0.02,
) -> DataFrame:
    """One-row corpus cardinality report: exact distinct content
    fingerprints next to the HyperLogLog++ estimate
    (``approx_count_distinct`` at relative standard deviation
    ``rsd``).

    Scale rationale: exact distinct-of-text is a full shuffle of every
    fingerprint; the HLL sketch is a few KB per partition, combined
    map-side — at 100 TB the sketch is the ONLY viable first answer,
    and this operator measures what the approximation costs on real
    data before a pipeline commits to it. Estimates are
    implementation-specific (Spark's HLL++ != DuckDB's approx), so the
    driver-style value oracle only covers the exact columns; the
    estimate is bound-checked in pytest instead.
    """
    fp = F.md5(F.col(text_col).cast("string"))
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.col(id_col)).alias("n_ids"),
        F.countDistinct(fp).alias("n_distinct_exact"),
        F.approx_count_distinct(fp, rsd).alias("n_distinct_approx"))


# ---------------------------------------------------------------------------
# hashed-TF text embedding (the north-star "HashingTF" similarity input)
# ---------------------------------------------------------------------------


def hashed_tf_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """HashingTF-style bag-of-words embedding, Catalyst-native: tokens
    (same split-lower-trim convention as top_terms) md5-bucketed into
    `dim` counts, optionally l2-normalized. Output
    (id_col, embedding array<double>) feeds every vector op in the repo
    (ANN, knn_join, semantic_dedup) when no model embeddings exist —
    the north-star's HashingTF+LSH similarity path re-expressed without
    MLlib.

    100 TB shape: explode is narrow; the (id, bucket) count
    partial-aggregates map-side, so at most `dim` rows per doc shuffle;
    array assembly is map_from_entries + a transform over a constant
    sequence — no UDF anywhere. Docs with no tokens get the zero
    vector (left join back, never dropped).
    """
    toks = (df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("term"))
        .filter(F.length("term") > 0))
    bucket = (F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
              .cast("long") % dim).cast("int")
    counts = (toks.withColumn("bucket", bucket)
              .groupBy(id_col, "bucket")
              .agg(F.count("*").cast("double").alias("cnt")))
    maps = (counts.groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("bucket", "cnt"))).alias("m")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")),
                             F.lit(0.0)))
    out = (df.select(id_col)
           .join(maps, id_col, "left")
           .withColumn("embedding", vec)
           .drop("m"))
    if normalize:
        from .dedup import l2_normalize
        out = out.withColumn("embedding",
                             l2_normalize(F.col("embedding")))
    return out


def hashed_tf_embedding_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
) -> str:
    """DuckDB twin of hashed_tf_embedding (same md5-substr bucket, same
    fold arithmetic via list_transform/list_sum)."""
    bucket = (f"CAST(('0x' || substr(md5(term), 1, 8))::BIGINT "
              f"% {dim} AS INTEGER)")
    vec = (f"list_transform(range(0, {dim}), "
           f"i -> coalesce(m[i][1], 0.0))")  # map_extract yields a list
    base = f"""
WITH toks AS (
  SELECT {id_col}, t.term AS term
  FROM {table}, unnest(string_split_regex(lower(trim({text_col})),
                                          '\\s+')) AS t(term)
  WHERE len(t.term) > 0),
counts AS (
  SELECT {id_col}, {bucket} AS bucket,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM toks GROUP BY 1, 2),
maps AS (
  SELECT {id_col}, map(list(bucket), list(cnt)) AS m
  FROM counts GROUP BY {id_col}),
vecs AS (
  SELECT d.{id_col}, {vec} AS v
  FROM (SELECT {id_col} FROM {table}) d
  LEFT JOIN maps USING ({id_col}))
"""
    if normalize:
        from ..functions.portable import l2_normalize_sql
        return base + (f"SELECT {id_col}, {l2_normalize_sql('v')} "
                       f"AS embedding FROM vecs")
    return base + f"SELECT {id_col}, v AS embedding FROM vecs"


# ---------------------------------------------------------------------------
# domain extraction + blocklist filtering (the crawl safety filter)
# ---------------------------------------------------------------------------

_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#@]*@)?([^/?#:]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL ('' for scheme-less strings);
    userinfo and port stripped. Leading/trailing dots are stripped
    too: a fully-qualified 'sub.spam.test.' is the same DNS host as
    'sub.spam.test', and keeping the dot would let that spelling slip
    past suffix-equality blocklist/robots joins. Pure built-ins."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    h = F.lower(F.regexp_extract(u, _URL_HOST_RE, 2))
    return F.regexp_replace(h, r"^\.+|\.+$", "")


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop rows whose URL host matches a blocklisted domain OR any of
    its subdomains (UT1/RefinedWeb-style category blocking: blocking
    ``spam.test`` also blocks ``a.b.spam.test``).

    `blocked` is a one-column DataFrame ``domain`` (lowercase,
    registrable-domain granularity). Matching is done by exploding
    each host into its dot-suffixes (``a.b.spam.test`` → 4 suffixes)
    and semi-joining the BROADCAST blocklist on exact suffix equality
    — no regex scan, no cross join; the corpus moves through one
    narrow generate + one broadcast probe, and only blocked ids flow
    into the final anti semi-join. `keep_blocked=True` inverts
    (audit mode: what WOULD be dropped).
    """
    host = url_host(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    suffixes = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."))
    sfx = (df
           .select(F.col(id_col),
                   F.explode(F.when(host != "", suffixes)
                             .otherwise(F.array())).alias("domain")))
    blocked_ids = sfx.join(F.broadcast(blocked.select("domain")),
                           "domain", "left_semi").select(id_col)
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(blocked_ids, id_col, how)


def filter_blocked_domains_sql(
    table: str,
    blocked_values: "list[str]",
    id_col: str = "doc_id",
    url_expr: str = "url",
    keep_blocked: bool = False,
) -> str:
    """DuckDB twin of filter_blocked_domains over an inline blocklist."""
    host = (f"regexp_replace(lower(regexp_extract(trim({url_expr}), "
            f"'{_URL_HOST_RE}', 2)), '^\\.+|\\.+$', '', 'g')")
    vals = ", ".join("('" + d.replace("'", "''") + "')"
                     for d in blocked_values)
    op = "IN" if keep_blocked else "NOT IN"
    return f"""
WITH blocked(domain) AS (VALUES {vals}),
hosts AS (
  SELECT {id_col}, {host} AS host FROM {table}
),
sfx AS (
  SELECT {id_col},
         array_to_string(parts[i + 1:len(parts)], '.') AS domain
  FROM (SELECT {id_col}, string_split(host, '.') AS parts
        FROM hosts WHERE host <> ''),
       unnest(range(0, len(parts))) AS r(i)
),
blocked_ids AS (
  SELECT DISTINCT s.{id_col} FROM sfx s JOIN blocked b USING (domain)
)
SELECT t.* FROM {table} t
WHERE t.{id_col} {op} (SELECT {id_col} FROM blocked_ids)
"""


# ---------------------------------------------------------------------------
# information-theoretic quality signals: char entropy + compression ratio
# ---------------------------------------------------------------------------

def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy (nats) of the character distribution per
    document — the classic gibberish/repetition detector: natural
    prose sits ~2.8-3.2, 'aaaa...' near 0, keyboard mashing and
    base64 blobs well above 3.5. Empty/NULL text → NULL.

    Plan: explode chars → (id, ch) partial-count agg → (id) partial
    agg of -Σ p ln p — both shuffles carry (id, ch|partials) only,
    map-side combinable; no UDF. Round-6, DuckDB-replayed by
    char_entropy_sql."""
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), ""))
        .alias("ch")).filter(F.col("ch") != "")
    counts = chars.groupBy(id_col, "ch").agg(
        F.count("*").alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double")))
        .alias("sum_clnc"))
    # -Σ (c/n) ln(c/n) = ln n - (Σ c ln c) / n
    ent = (per_doc.select(
        id_col,
        dround(F.log(F.col("n").cast("double"))
                - F.col("sum_clnc") / F.col("n"), 6).alias("entropy")))
    ids = df.select(id_col)
    return ids.join(ent, id_col, "left")


def char_entropy_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of char_entropy (same ln-n − Σc·ln(c)/n form)."""
    return f"""
WITH chars AS (
  SELECT {id_col},
         unnest(string_split(coalesce({text_expr}, ''), '')) AS ch
  FROM {table}
), counts AS (
  SELECT {id_col}, ch, count(*) AS c FROM chars
  WHERE ch <> '' GROUP BY 1, 2
), per_doc AS (
  SELECT {id_col}, sum(c) AS n,
         sum(c * ln(c::DOUBLE)) AS sum_clnc
  FROM counts GROUP BY {id_col}
)
SELECT d.{id_col},
       round(ln(p.n::DOUBLE) - p.sum_clnc / p.n, 6) AS entropy
FROM {table} d LEFT JOIN per_doc p USING ({id_col})
"""


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compressed/raw byte ratio per document — the quality
    signal Gopher-class pipelines use for templated/repetitive text
    that char-level stats miss (a page of repeated PARAGRAPHS has
    normal char entropy but compresses to almost nothing). Low ratio
    (≲0.3) → repetitive; ≳1.0 → already-compressed/binary noise.
    Empty/NULL → NULL. Arrow kernel (zlib is not expressible in SQL —
    pytest-golden covered, no driver oracle), map-only."""
    import pandas as pd
    from collections.abc import Iterator as _It

    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    schema = ", ".join(fields + ["compression_ratio DOUBLE"])

    def _run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        import zlib

        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for t in pdf[text_col]:
                if t is None or t == "":
                    out.append(None)
                    continue
                raw = t.encode("utf-8")
                out.append(round(len(zlib.compress(raw, level))
                                 / len(raw), 6))
            pdf["compression_ratio"] = out
            yield pdf

    return df.mapInPandas(_run, schema=schema)


# ---------------------------------------------------------------------------
# C4 cleanup battery (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning..." §2.2 — the published rule set the C4 corpus
# was built with; the line-level half Gopher's flags do not cover)
# ---------------------------------------------------------------------------

# a small representative blocklist standing in for the paper's "List
# of Dirty, Naughty..." wordlist (ship your own via the parameter)
C4_DEFAULT_BADWORDS = ("fuck", "shit", "porn", "nigger")

_C4_TERMINAL_RE = r'[.!?"’”]\s*$'


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: "tuple[str, ...]" = C4_DEFAULT_BADWORDS,
) -> DataFrame:
    """The C4 per-page cleanup: line-level retention + page-level
    flags, pure Catalyst (split + higher-order filters), zero
    shuffle.

      clean_text     lines kept = end in terminal punctuation AND
                     have >= min_line_words words AND don't contain
                     'javascript' (case-insensitive); joined by \\n
      n_kept_lines   lines surviving
      n_sentences    terminal-punctuation sentences in clean_text
      has_lorem      page contains 'lorem ipsum'
      has_brace      page contains '{' (code/templating tell)
      has_badword    page contains a blocklist word (word-bounded)
      passes         n_sentences >= min_sentences AND none of the
                     three page flags

    The paper's remaining rule — drop repeated 3-sentence spans
    corpus-wide — is the cross-document half and lives in
    corpus.dedup_lines / corpus.exact_substring_dedup."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda line: line.rlike(_C4_TERMINAL_RE)
        & (F.size(F.filter(F.split(F.trim(line), r"\s+"),
                           lambda w: F.length(w) > 0))
           >= F.lit(int(min_line_words)))
        & ~F.lower(line).contains("javascript"))
    clean = F.concat_ws("\n", kept)
    # sentence count = terminal-punct runs followed by whitespace/end
    # (lookbehind-free so the DuckDB RE2 twin replays it exactly)
    n_sent = F.regexp_count(clean, F.lit(r"[.!?](\s|$)"))
    low = F.lower(c)
    has_bad = F.lit(False)
    for w in badwords:
        has_bad = has_bad | low.rlike(rf"\b{w}\b")
    out = df.withColumn("clean_text", clean) \
        .withColumn("n_kept_lines",
                    F.size(kept).cast("long")) \
        .withColumn("n_sentences", n_sent.cast("long")) \
        .withColumn("has_lorem", low.contains("lorem ipsum")) \
        .withColumn("has_brace", c.contains("{")) \
        .withColumn("has_badword", has_bad)
    return out.withColumn(
        "passes",
        (F.col("n_sentences") >= F.lit(int(min_sentences)))
        & ~F.col("has_lorem") & ~F.col("has_brace")
        & ~F.col("has_badword"))


def c4_clean_sql(
    text_expr: str,
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: "tuple[str, ...]" = C4_DEFAULT_BADWORDS,
) -> "dict[str, str]":
    """DuckDB twins keyed by output column (same regexes, same
    guards)."""
    c = f"coalesce({text_expr}, '')"
    lines = f"string_split({c}, chr(10))"
    kept = (f"list_filter({lines}, l -> "
            f"regexp_matches(l, '[.!?\"’”]\\s*$') AND "
            f"len(list_filter(string_split_regex(trim(l), '\\s+'), "
            f"w -> len(w) > 0)) >= {int(min_line_words)} AND "
            f"NOT contains(lower(l), 'javascript'))")
    clean = f"coalesce(array_to_string({kept}, chr(10)), '')"
    n_sent = (f"len(regexp_extract_all({clean}, "
              f"'[.!?](\\s|$)'))")
    low = f"lower({c})"
    has_bad = " OR ".join(
        f"regexp_matches({low}, '\\b{w}\\b')" for w in badwords)
    exprs = {
        "clean_text": clean,
        "n_kept_lines": f"CAST(len({kept}) AS BIGINT)",
        "n_sentences": f"CAST({n_sent} AS BIGINT)",
        "has_lorem": f"contains({low}, 'lorem ipsum')",
        "has_brace": f"contains({c}, '{{')",
        "has_badword": f"({has_bad})",
    }
    exprs["passes"] = (
        f"({exprs['n_sentences']} >= {int(min_sentences)} AND NOT "
        f"{exprs['has_lorem']} AND NOT {exprs['has_brace']} AND NOT "
        f"{exprs['has_badword']})")
    return exprs


# ---------------------------------------------------------------------------
# Luhn-validated credit-card PII (the high-precision complement to
# scrub_pii's pattern-only categories: 16 digits alone false-positive
# on order ids/timestamps; the Luhn mod-10 check (ISO/IEC 7812) is
# what real DLP scanners gate on)
# ---------------------------------------------------------------------------

_CCN_CAND_RE = r"\b\d(?:[ \-]?\d){12,18}\b"


def _luhn_ok(cand):
    """Column predicate: candidate string passes the Luhn mod-10
    checksum over its digits. Pure Catalyst (nested higher-order
    aggregate) — replayed exactly by the DuckDB twin."""
    digits = F.reverse(F.filter(
        F.split(cand, ""), lambda ch: ch.rlike("^[0-9]$")))
    total = F.aggregate(
        F.sequence(F.lit(1), F.size(digits)),
        F.lit(0),
        lambda acc, i: acc + F.when(
            i % 2 == 1,
            F.element_at(digits, i).cast("int")
        ).otherwise(
            F.when(F.element_at(digits, i).cast("int") * 2 > 9,
                   F.element_at(digits, i).cast("int") * 2 - 9)
            .otherwise(F.element_at(digits, i).cast("int") * 2)))
    return (F.size(digits) >= 13) & (total % 10 == 0)


def detect_credit_cards(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "ccn_scrubbed",
    repl: str = "<CCN>",
) -> DataFrame:
    """(input columns) + n_ccn (Luhn-VALID card numbers found),
    has_ccn, and `out_col` with each valid number replaced — numbers
    failing the checksum are left alone (they are order ids, not
    cards). Narrow projection, zero shuffle, zero UDF."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    cands = F.array_distinct(
        F.regexp_extract_all(c, F.lit(_CCN_CAND_RE), 0))
    valid = F.filter(cands, _luhn_ok)
    scrub = F.aggregate(
        valid, c,
        lambda acc, x: F.call_function("replace", acc, x,
                                       F.lit(repl)))
    return (df.withColumn("n_ccn", F.size(valid).cast("long"))
            .withColumn("has_ccn", F.size(valid) > 0)
            .withColumn(out_col, scrub))


def detect_credit_cards_sql(
    text_expr: str,
    repl: str = "<CCN>",
) -> "dict[str, str]":
    """DuckDB twins keyed by output column — same candidate regex,
    same Luhn fold, same distinct + replace order."""
    c = f"coalesce({text_expr}, '')"
    cands = f"list_distinct(regexp_extract_all({c}, '{_CCN_CAND_RE}'))"
    digits = ("list_reverse(list_transform("
              "regexp_extract_all(x, '[0-9]'), d -> d::INT))")
    luhn = (f"(len({digits}) >= 13 AND "
            f"list_sum(list_transform(range(1, len({digits}) + 1), "
            f"i -> CASE WHEN i % 2 = 1 THEN ({digits})[i] "
            f"WHEN ({digits})[i] * 2 > 9 THEN ({digits})[i] * 2 - 9 "
            f"ELSE ({digits})[i] * 2 END)) % 10 = 0)")
    valid = f"list_filter({cands}, x -> {luhn})"
    # SEED DISCIPLINE (r13, survival.km_rmst_sql): never hand
    # list_reduce a synthetic non-identity seed via list_prepend —
    # DuckDB 1.0.0 can silently drop it under some scan/plan shapes.
    # Element 1 is therefore the post-first-step state
    # (replace(text, valid[1])) and the lambda runs from element 2;
    # the zero-candidate case short-circuits to the raw text.
    scrub = (f"CASE WHEN len({valid}) = 0 THEN {c} "
             f"ELSE list_reduce("
             f"list_concat([replace({c}, ({valid})[1], '{repl}')], "
             f"({valid})[2:]), "
             f"(acc, x) -> replace(acc, x, '{repl}')) END")
    return {
        "n_ccn": f"CAST(len({valid}) AS BIGINT)",
        "has_ccn": f"(len({valid}) > 0)",
        "ccn_scrubbed": scrub,
    }


# ---------------------------------------------------------------------------
# Readability scoring (Flesch 1948 reading ease; Kincaid 1975 grade
# level) — the classic complexity signals next to the Gopher/C4
# structural flags: corpus curation uses them to bucket documents by
# audience level and to drop machine-generated word salad that passes
# length/stopword gates but reads at an impossible grade level.
# Syllables use the standard vowel-group approximation (runs of
# [aeiouy], minimum 1 per word) — deterministic and replayed
# identically by the DuckDB twin; exact dictionary syllabification is
# out of scope (no CMUdict in env), the documented determination.
# Pure narrow Catalyst higher-order expressions: zero UDF, zero
# shuffle.
# ---------------------------------------------------------------------------

_VOWEL_RUN = "[aeiouy]+"
_SENT_SPLIT = "[.!?]+"


def readability(
    df: DataFrame,
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Adds n_words, n_sentences, n_syllables, flesch_ease,
    fk_grade. Empty/NULL text → zero counts and NULL scores
    (try_divide), never errors. Sentences = [.!?]+ runs, min 1 when
    any word exists (an unpunctuated doc is one sentence)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(t), r"\s+"),
                     lambda w: F.length(w) > 0)
    n_words = F.size(words)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(_SENT_SPLIT), F.lit(0))),
        F.when(n_words > 0, F.lit(1)).otherwise(F.lit(0)))
    syl = F.aggregate(
        F.transform(words, lambda w: F.greatest(
            F.size(F.regexp_extract_all(w, F.lit(_VOWEL_RUN),
                                        F.lit(0))),
            F.lit(1))),
        F.lit(0), lambda acc, x: acc + x)
    wps = F.try_divide(n_words.cast("double"), n_sent.cast("double"))
    spw = F.try_divide(syl.cast("double"), n_words.cast("double"))
    return (df.withColumn("n_words", n_words.cast("long"))
            .withColumn("n_sentences", n_sent.cast("long"))
            .withColumn("n_syllables", syl.cast("long"))
            .withColumn("flesch_ease",
                        dround(F.lit(206.835) - F.lit(1.015) * wps
                                - F.lit(84.6) * spw, round_dp))
            .withColumn("fk_grade",
                        dround(F.lit(0.39) * wps
                                + F.lit(11.8) * spw
                                - F.lit(15.59), round_dp)))


def readability_sql(
    table: str = "documents",
    text_expr: str = "text",
    select: str = "* EXCLUDE (n_words, n_sentences, n_syllables)",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of readability (identical splits, vowel-run
    syllables, minimums, and double formula)."""
    t = f"coalesce({text_expr}, '')"
    words = (f"list_filter(string_split_regex(lower({t}), '\\s+'), "
             "w -> length(w) > 0)")
    return f"""
SELECT {select},
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (n_words::DOUBLE
                                / nullif(n_sentences, 0))
             - 84.6 * (n_syllables::DOUBLE / nullif(n_words, 0)),
             {round_dp}) AS flesch_ease,
       round(0.39 * (n_words::DOUBLE / nullif(n_sentences, 0))
             + 11.8 * (n_syllables::DOUBLE / nullif(n_words, 0))
             - 15.59, {round_dp}) AS fk_grade
FROM (
  SELECT *,
         len({words}) AS n_words,
         greatest(len(regexp_extract_all({t}, '{_SENT_SPLIT}')),
                  CASE WHEN len({words}) > 0 THEN 1 ELSE 0 END)
           AS n_sentences,
         coalesce(list_sum(list_transform({words},
             w -> greatest(len(regexp_extract_all(w, '{_VOWEL_RUN}')),
                           1))), 0)
           AS n_syllables
  FROM {table}
)
"""


# ---------------------------------------------------------------------------
# Code-vs-prose detection — the routing signal every mixed crawl
# needs before quality gates: C4/Gopher rules (terminal punctuation,
# stopword ratios) MISCLASSIFY source code as garbage prose, so code
# must be detected FIRST and routed to its own pipeline (its own
# dedup keys, its own quality rules, its own mixture weight — the
# standard pretraining-corpus posture). Heuristic line classifier:
# a line "looks like code" if it is indented 4+ spaces/a tab, ends
# in ; { } or ), or opens with a keyword common across mainstream
# languages (def/class/import/return/if(/for(/function/const/var...).
# Pure narrow Catalyst higher-order expressions; the DuckDB twin
# replays the identical regexes.
# ---------------------------------------------------------------------------

_CODE_LINE_RE = (
    r"(^(    |\t))"
    r"|([;{})]\s*$)"
    r"|(^\s*(def |class |import |from |return |if \(|for \(|while \(|"
    r"function |const |var |let |public |private |#include|using |"
    r"package ))")
_FENCE_RE = r"```"


def code_stats(
    df: DataFrame,
    text_col: str = "text",
    code_threshold: float = 0.3,
    round_dp: int = 4,
) -> DataFrame:
    """Adds n_lines, code_line_frac, n_fences, symbol_ratio, and the
    looks_code routing flag (code_line_frac >= threshold OR a fenced
    block present). NULL/empty text → zero counts, NULL fractions,
    looks_code false."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, r"\r?\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    n_code = F.size(F.filter(
        lines, lambda x: x.rlike(_CODE_LINE_RE)))
    n_fences = F.size(F.regexp_extract_all(t, F.lit(_FENCE_RE),
                                           F.lit(0)))
    n_sym = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    frac = dround(F.try_divide(n_code.cast("double"),
                                n_lines.cast("double")), round_dp)
    sym = dround(F.try_divide(n_sym.cast("double"),
                               F.length(t).cast("double")), round_dp)
    return (df.withColumn("n_lines", n_lines.cast("long"))
            .withColumn("code_line_frac", frac)
            .withColumn("n_fences", (n_fences / 2).cast("long"))
            .withColumn("symbol_ratio", sym)
            .withColumn("looks_code",
                        F.coalesce(
                            (frac >= F.lit(float(code_threshold)))
                            | (n_fences >= 2), F.lit(False))))


def code_stats_sql(
    table: str = "documents",
    text_expr: str = "text",
    select: str = "*",
    code_threshold: float = 0.3,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of code_stats (identical regexes, fractions,
    flag)."""
    t = f"coalesce({text_expr}, '')"
    lines = (f"list_filter(string_split_regex({t}, '\\r?\\n'), "
             "x -> length(trim(x)) > 0)")
    code_re = _CODE_LINE_RE.replace("'", "''")
    return f"""
SELECT {select},
       CAST(n_lines AS BIGINT) AS n_lines,
       round(n_code::DOUBLE / nullif(n_lines, 0), {round_dp})
         AS code_line_frac,
       CAST(n_fences // 2 AS BIGINT) AS n_fences,
       round(n_sym::DOUBLE / nullif(n_chars_t, 0), {round_dp})
         AS symbol_ratio,
       coalesce(round(n_code::DOUBLE / nullif(n_lines, 0),
                      {round_dp}) >= {float(code_threshold)!r}
                OR n_fences >= 2, FALSE) AS looks_code
FROM (
  SELECT *,
         len({lines}) AS n_lines,
         len(list_filter({lines},
             x -> regexp_matches(x, '{code_re}'))) AS n_code,
         len(regexp_extract_all({t}, '{_FENCE_RE}')) AS n_fences,
         length(regexp_replace({t}, '[A-Za-z0-9\\s]', '', 'g'))
           AS n_sym,
         length({t}) AS n_chars_t
  FROM {table}
)
"""


# ---------------------------------------------------------------------------
# Unicode script detection
# ---------------------------------------------------------------------------

# BMP block ranges embedded as LITERAL characters (not \u escapes) so
# the identical pattern string feeds Java regex (Spark) and RE2
# (DuckDB) — the two engines spell escape syntax differently
# (\uXXXX vs \x{XXXX}) but agree on literal character ranges. Ranges
# are the dominant writing-system blocks; Latin includes the
# supplement/extended blocks Western European text actually uses.
_SCRIPT_RANGES: "list[tuple[str, str]]" = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("cjk", "一-鿿"),
    ("kana", "぀-ヿ"),
    ("hangul", "가-힯"),
]


def script_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Per-document writing-system profile: one count column per
    script block (n_latin, n_cyrillic, ...), the dominant script
    (`script_pred`, ties broken by the fixed _SCRIPT_RANGES order,
    'other' when no block matches), and its share of script-classified
    characters (`script_frac`, NULL when none). The ROUTING signal in
    front of language-ID (lang_id's n-gram tables are per-script —
    running a Latin-trained model on CJK text is noise) and the
    mixed-script detector (Latin text salted with Cyrillic homoglyphs
    is a spam/evasion signature: high n_latin AND n_cyrillic).

    Counts via length-difference after regexp_replace per block —
    pure narrow Catalyst, zero UDF/shuffle/join; ~9 regex passes per
    document is one Arrow-free projection. BMP blocks only (documented
    — supplementary-plane CJK-B+ is vanishingly rare in web corpora
    and its code-unit semantics differ across engines)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = []
    for name, rng in _SCRIPT_RANGES:
        n = (F.length(t)
             - F.length(F.regexp_replace(t, f"[{rng}]", "")))
        cols.append(n.cast("long").alias(f"n_{name}"))
    out = df.select(F.col(id_col), *cols)
    total = None
    for name, _ in _SCRIPT_RANGES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    # dominant: walk the fixed order, keep the strict max (earlier
    # block wins ties — deterministic, twin-replayed)
    best_n = F.lit(-1).cast("long")
    best_s = F.lit("other")
    for name, _ in _SCRIPT_RANGES:
        c = F.col(f"n_{name}")
        take = c > best_n
        best_s = F.when(take, F.lit(name)).otherwise(best_s)
        best_n = F.when(take, c).otherwise(best_n)
    pred = F.when(total > 0, best_s).otherwise(F.lit("other"))
    frac = dround(F.try_divide(best_n, total), round_dp)
    return out.select(
        id_col, *[f"n_{n}" for n, _ in _SCRIPT_RANGES],
        pred.alias("script_pred"),
        F.when(total > 0, frac).alias("script_frac"))


def script_stats_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> str:
    """DuckDB twin of script_stats (identical literal ranges, same
    fixed-order strict-max tie-break; RE2 needs the explicit 'g'
    flag where Java replaces all matches by default)."""
    t = f"coalesce({text_expr}, '')"
    counts = ", ".join(
        f"(length({t}) - length(regexp_replace({t}, '[{rng}]', '', "
        f"'g')))::BIGINT AS n_{name}"
        for name, rng in _SCRIPT_RANGES)
    names = [name for name, _ in _SCRIPT_RANGES]
    total = " + ".join(f"n_{n}" for n in names)
    # fixed-order strict max as nested CASE: best = first block whose
    # count exceeds every LATER block's count (>=) and every EARLIER
    # block's count (>) — equivalent to the walk, expressed closed-form
    best_n = f"greatest({', '.join(f'n_{n}' for n in names)})"
    pred_case = "CASE " + " ".join(
        f"WHEN n_{n} = {best_n} THEN '{n}'" for n in names) \
        + " END"
    return f"""
WITH counts AS (
  SELECT {id_col}, {counts}
  FROM {table}
)
SELECT {id_col}, {', '.join(f'n_{n}' for n in names)},
       CASE WHEN ({total}) > 0 THEN {pred_case}
            ELSE 'other' END AS script_pred,
       CASE WHEN ({total}) > 0
            THEN round({best_n}::DOUBLE / ({total})::DOUBLE,
                       {round_dp}) END AS script_frac
FROM counts
"""


# ---------------------------------------------------------------------------
# Unicode confusable folding (homoglyph skeleton)
# ---------------------------------------------------------------------------

def _confusable_map() -> "tuple[str, str]":
    """1:1 confusable -> ASCII mapping (a pragmatic subset of the
    UTS #39 confusables table: the Cyrillic/Greek letters and
    fullwidth forms that actually appear in spoofed web text). Both
    engines' translate() share PostgreSQL semantics for equal-length
    from/to strings, so the fold replays exactly."""
    pairs = [
        # Cyrillic lookalikes
        ("а", "a"), ("е", "e"), ("о", "o"), ("р", "p"), ("с", "c"),
        ("у", "y"), ("х", "x"), ("і", "i"), ("ѕ", "s"), ("ј", "j"),
        ("А", "A"), ("В", "B"), ("Е", "E"), ("К", "K"), ("М", "M"),
        ("Н", "H"), ("О", "O"), ("Р", "P"), ("С", "C"), ("Т", "T"),
        ("Х", "X"), ("Ѕ", "S"), ("І", "I"), ("Ј", "J"),
        # Greek lookalikes
        ("ο", "o"), ("ν", "v"), ("Α", "A"), ("Β", "B"), ("Ε", "E"),
        ("Ζ", "Z"), ("Η", "H"), ("Ι", "I"), ("Κ", "K"), ("Μ", "M"),
        ("Ν", "N"), ("Ο", "O"), ("Ρ", "P"), ("Τ", "T"), ("Υ", "Y"),
        ("Χ", "X"),
    ]
    # fullwidth ASCII block -> ASCII
    for i in range(26):
        pairs.append((chr(0xFF21 + i), chr(ord("A") + i)))
        pairs.append((chr(0xFF41 + i), chr(ord("a") + i)))
    for i in range(10):
        pairs.append((chr(0xFF10 + i), chr(ord("0") + i)))
    frm = "".join(p[0] for p in pairs)
    to = "".join(p[1] for p in pairs)
    assert len(frm) == len(to)
    return frm, to


def fold_confusables(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "skeleton",
) -> DataFrame:
    """Homoglyph skeleton (UTS #39 practice): fold the common
    Cyrillic/Greek/fullwidth lookalikes to their ASCII targets —
    `skeleton` plus `n_folded` (how many characters changed) and
    `spoofed` (any fold happened while the text is otherwise
    Latin-ish). The REPAIR/keying half beside script_stats' mixed-
    script DETECTION: exact/near dedup keyed on the skeleton catches
    'pаypаl'-style evasion duplicates that byte-level fingerprints
    miss; n_folded > 0 on a Latin document is itself a strong spam
    signal. Pure narrow Catalyst (one translate + length
    difference) — zero UDF/shuffle/join."""
    frm, to = _confusable_map()
    t = F.coalesce(F.col(text_col), F.lit(""))
    folded = F.translate(t, frm, to)
    # n_folded = positions whose char was in the map: translate with
    # an empty `to` DELETES map chars (PostgreSQL semantics, both
    # engines), so the length difference counts them exactly
    n_src = F.length(t) - F.length(F.translate(t, frm, ""))
    return df.withColumn(out_col, folded) \
        .withColumn("n_folded", n_src.cast("long")) \
        .withColumn("spoofed", (n_src > 0) & (F.length(t) > 0)
                    & (n_src * 4 < F.length(t)))


def fold_confusables_sql(
    table: str,
    text_expr: str = "text",
    out_col: str = "skeleton",
    select: str = "*",
) -> str:
    """DuckDB twin of fold_confusables (same map, same translate
    semantics, same spoofed rule)."""
    frm, to = _confusable_map()
    f = frm.replace("'", "''")
    t2 = to.replace("'", "''")
    t = f"coalesce({text_expr}, '')"
    n_src = f"(length({t}) - length(translate({t}, '{f}', '')))"
    return f"""
SELECT {select},
       translate({t}, '{f}', '{t2}') AS {out_col},
       {n_src}::BIGINT AS n_folded,
       ({n_src} > 0 AND length({t}) > 0
        AND {n_src} * 4 < length({t})) AS spoofed
FROM {table}
"""


def lexical_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_tokens, n_types, ttr, hapax_frac, simpson_d,
    yule_k) — corpus-level lexical-richness profile, the repetition
    readout at the VOCABULARY level (repetition_stats sees intra-doc
    repeats; this sees a corpus that keeps reusing the same types —
    template farms, boilerplate floods, model-generated sludge):

        ttr        = V / N            (type-token ratio)
        hapax_frac = V1 / V           (share of once-seen types)
        simpson_d  = Σ f(f−1) / (N(N−1))   (repeat-draw probability)
        yule_k     = 10⁴ · (Σ f² − N) / N²  (Yule 1944; length-robust)

    Exactness: every numerator/denominator is an exact integer sum
    over the per-term frequency table (order-independent), each
    output ONE IEEE division, so the DuckDB twin is bit-identical
    before rounding. Scale shape: explode is narrow; the (group,
    term) aggregate partial-aggregates map-side so the shuffle
    carries distinct terms; the closing agg is groups-sized. Empty
    groups (no tokens) emit NULL ratios; N=1 groups emit NULL
    simpson_d (undefined)."""
    gb = list(group_by or [])
    terms = (df.select(
        *gb,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("term"))
        .filter(F.length("term") > 0))
    freq = terms.groupBy(*gb, "term").agg(F.count("*").alias("f"))
    f = F.col("f")
    agg = freq.groupBy(*gb).agg(
        F.sum("f").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum((f == 1).cast("long")).alias("__v1"),
        F.sum(f * (f - 1)).alias("__ff1"),
        F.sum(f * f).alias("__f2"))
    n = F.col("n_tokens").cast("double")
    v = F.col("n_types").cast("double")
    out = agg.select(
        *gb, "n_tokens", "n_types",
        dround(v / n, round_dp).alias("ttr"),
        dround(F.col("__v1").cast("double") / v, round_dp)
        .alias("hapax_frac"),
        dround(F.when(
            F.col("n_tokens") > 1,
            F.col("__ff1").cast("double") / (n * (n - F.lit(1.0)))),
            round_dp).alias("simpson_d"),
        dround(F.lit(10000.0)
                * (F.col("__f2") - F.col("n_tokens")).cast("double")
                / (n * n), round_dp).alias("yule_k"))
    return out.orderBy(*gb) if gb else out


def lexical_diversity_sql(
    table: str = "documents",
    text_expr: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of lexical_diversity (same token split, same exact
    integer sums, same single divisions)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH terms AS (
  SELECT {gsel}unnest(list_filter(
      string_split_regex(lower(trim({text_expr})), '\\s+'),
      t -> len(t) > 0)) AS term
  FROM {table}
),
freq AS (
  SELECT {gsel}term, count(*) AS f FROM terms GROUP BY {gsel}term
),
agg AS (
  SELECT {gsel}sum(f) AS n_tokens, count(*) AS n_types,
         sum(CAST(f = 1 AS BIGINT)) AS v1,
         sum(f * (f - 1)) AS ff1,
         sum(f * f) AS f2
  FROM freq {gkey}
)
SELECT {gsel}CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
       round(n_types::DOUBLE / n_tokens::DOUBLE, {round_dp}) AS ttr,
       round(v1::DOUBLE / n_types::DOUBLE, {round_dp}) AS hapax_frac,
       round(CASE WHEN n_tokens > 1 THEN ff1::DOUBLE
                  / (n_tokens::DOUBLE * (n_tokens::DOUBLE - 1.0)) END,
             {round_dp}) AS simpson_d,
       round(10000.0 * (f2 - n_tokens)::DOUBLE
             / (n_tokens::DOUBLE * n_tokens::DOUBLE),
             {round_dp}) AS yule_k
FROM agg
{order}
"""


def token_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_docs, n_chars, n_tokens, chars_per_token,
    tokens_per_doc) — tokenizer fertility by group (per language is
    the canonical cut): how many characters one token covers under
    the house BPE-ish regex (`BPE_TOKEN_RE`, the same definition
    token_stats and pack_sequences budget with). Languages whose
    fertility is poor (CJK under a whitespace-ish tokenizer) are
    under-served by a shared token budget — THE readout a
    multilingual mixing plan needs next to temperature_weights.

    Exact integer sums, one division per ratio, engine-identical
    (DuckDB counts the same regex's matches)."""
    gb = list(group_by or [])
    agg = (df.groupBy(*gb)
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.length(text_col).cast("long"))
                .alias("n_chars"),
                F.sum(bpe_token_count(F.col(text_col)).cast("long"))
                .alias("n_tokens")))
    out = agg.select(
        *gb, "n_docs", "n_chars", "n_tokens",
        dround(F.when(F.col("n_tokens") > 0,
                       F.col("n_chars").cast("double")
                       / F.col("n_tokens").cast("double")), round_dp)
        .alias("chars_per_token"),
        dround(F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double"), round_dp)
        .alias("tokens_per_doc"))
    return out.orderBy(*gb) if gb else out


def token_fertility_sql(
    table: str = "documents",
    text_expr: str = "text",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of token_fertility (same BPE_TOKEN_RE counts)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    ntok = (f"len(regexp_extract_all({text_expr}, "
            f"'{BPE_TOKEN_RE}'))::BIGINT")
    return f"""
SELECT {gsel}count(*) AS n_docs,
       CAST(sum(length({text_expr})::BIGINT) AS BIGINT)
         AS n_chars,
       CAST(sum({ntok}) AS BIGINT) AS n_tokens,
       round(CASE WHEN sum({ntok}) > 0
                  THEN sum(length({text_expr})::BIGINT)::DOUBLE
                       / sum({ntok})::DOUBLE END, {round_dp})
         AS chars_per_token,
       round(sum({ntok})::DOUBLE / count(*)::DOUBLE, {round_dp})
         AS tokens_per_doc
FROM {table}
{gkey}
{order}
"""


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 200,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_terms, slope, intercept, r2) — the Zipf (1949)
    power-law fit of the term-frequency distribution: OLS of ln(freq)
    on ln(rank) over the top-`top_k` terms (rank = freq desc, term asc
    — deterministic ties). A healthy natural-language corpus fits
    slope ≈ −1 with r² near 1; synthetic/templated/spam-heavy shards
    drift flat (|slope| ≪ 1) or step-shaped (low r²) — the corpus-
    level companion to the per-document quality scores, and the
    cheapest "did the crawl change character" drift alarm.

    Exactness: term counts are exact integers; the OLS sufficient
    statistics (Σx, Σy, Σxy, Σxx, Σyy over ln pairs) fold in RANK
    ORDER over the collected top-k list (bounded by top_k, never the
    vocabulary) so both engines add the same doubles in the same
    order; ln is libm on both sides, washed by the closing round
    (the msprt precedent). NULL slope/r2 when fewer than 2 distinct
    ranked terms or a degenerate x variance.

    Scale shape: explode → map-side-combinable (group, term) count →
    per-group rank window over DISTINCT terms capped to top_k → one
    bounded fold. Shuffle carries distinct terms, never tokens."""
    if top_k < 2:
        raise ValueError("top_k must be >= 2")
    gb = list(group_by or [])
    terms = (df
             .select(*gb,
                     F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                       r"\s+")).alias("term"))
             .filter(F.length("term") > 0)
             .groupBy(*gb, "term").agg(F.count("*").alias("n")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    rk = F.row_number().over(wg.orderBy(F.desc("n"), F.asc("term")))
    ranked = (terms.withColumn("__r", rk)
              .filter(F.col("__r") <= int(top_k)))
    pair = F.struct(F.col("__r").alias("r"),
                    F.col("n").cast("double").alias("f"))
    agg = (ranked.withColumn("__p", pair)
           .groupBy(*gb)
           .agg(F.count("*").alias("n_terms"),
                F.expr(
                    "aggregate(array_sort(collect_list(__p)),"
                    " named_struct("
                    "   'sx', CAST(0.0 AS DOUBLE),"
                    "   'sy', CAST(0.0 AS DOUBLE),"
                    "   'sxy', CAST(0.0 AS DOUBLE),"
                    "   'sxx', CAST(0.0 AS DOUBLE),"
                    "   'syy', CAST(0.0 AS DOUBLE)),"
                    " (a, e) -> named_struct("
                    "   'sx', a.sx + ln(CAST(e.r AS DOUBLE)),"
                    "   'sy', a.sy + ln(e.f),"
                    "   'sxy', a.sxy + ln(CAST(e.r AS DOUBLE))"
                    "                  * ln(e.f),"
                    "   'sxx', a.sxx + ln(CAST(e.r AS DOUBLE))"
                    "                  * ln(CAST(e.r AS DOUBLE)),"
                    "   'syy', a.syy + ln(e.f) * ln(e.f)))")
                .alias("__s")))
    nd = F.col("n_terms").cast("double")
    vx = nd * F.col("__s.sxx") - F.col("__s.sx") * F.col("__s.sx")
    vy = nd * F.col("__s.syy") - F.col("__s.sy") * F.col("__s.sy")
    cov = nd * F.col("__s.sxy") - F.col("__s.sx") * F.col("__s.sy")
    slope = F.when((F.col("n_terms") >= 2) & (vx > 0), cov / vx)
    intercept = F.when((F.col("n_terms") >= 2) & (vx > 0),
                       (F.col("__s.sy") - (cov / vx)
                        * F.col("__s.sx")) / nd)
    r2 = F.when((F.col("n_terms") >= 2) & (vx > 0) & (vy > 0),
                cov * cov / (vx * vy))
    return agg.select(
        *gb,
        F.col("n_terms").cast("long").alias("n_terms"),
        (dround(slope, round_dp) + F.lit(0.0)).alias("slope"),
        (dround(intercept, round_dp) + F.lit(0.0)).alias("intercept"),
        dround(r2, round_dp).alias("r2"))


def zipf_fit_sql(
    table: str,
    text_expr: str = "text",
    top_k: int = 200,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of zipf_fit (same tokenization split, same rank
    tie-break, same rank-ordered identity-shaped struct fold — the
    km_rmst seed discipline: element 1 is constructed as the
    post-first-step state, the Spark side's explicit zero seed is an
    identity so the states match from step 1 on)."""
    if top_k < 2:
        raise ValueError("top_k must be >= 2")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH toks AS (
  SELECT {gsel}unnest(string_split_regex(lower(trim({text_expr})),
                                         '\\s+')) AS term
  FROM {table}
),
counts AS (
  SELECT {gsel}term, count(*) AS n
  FROM toks WHERE length(term) > 0
  GROUP BY {gsel}term
),
ranked AS (
  SELECT {gsel}term, n,
         row_number() OVER ({part} ORDER BY n DESC, term ASC) AS r
  FROM counts QUALIFY r <= {int(top_k)}
),
folded AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_terms,
         list_reduce(
           list({{'sx': ln(r::DOUBLE), 'sy': ln(n::DOUBLE),
                  'sxy': ln(r::DOUBLE) * ln(n::DOUBLE),
                  'sxx': ln(r::DOUBLE) * ln(r::DOUBLE),
                  'syy': ln(n::DOUBLE) * ln(n::DOUBLE)}}
                ORDER BY r),
           (a, e) -> {{'sx': a.sx + e.sx, 'sy': a.sy + e.sy,
                       'sxy': a.sxy + e.sxy, 'sxx': a.sxx + e.sxx,
                       'syy': a.syy + e.syy}}) AS s
  FROM ranked {gkey}
)
SELECT {gsel}n_terms,
       round(CASE WHEN n_terms >= 2 AND
                  n_terms::DOUBLE * s.sxx - s.sx * s.sx > 0
             THEN (n_terms::DOUBLE * s.sxy - s.sx * s.sy)
                  / (n_terms::DOUBLE * s.sxx - s.sx * s.sx) END,
             {round_dp}) + 0.0 AS slope,
       round(CASE WHEN n_terms >= 2 AND
                  n_terms::DOUBLE * s.sxx - s.sx * s.sx > 0
             THEN (s.sy - ((n_terms::DOUBLE * s.sxy - s.sx * s.sy)
                           / (n_terms::DOUBLE * s.sxx - s.sx * s.sx))
                          * s.sx) / n_terms::DOUBLE END,
             {round_dp}) + 0.0 AS intercept,
       round(CASE WHEN n_terms >= 2 AND
                  n_terms::DOUBLE * s.sxx - s.sx * s.sx > 0 AND
                  n_terms::DOUBLE * s.syy - s.sy * s.sy > 0
             THEN (n_terms::DOUBLE * s.sxy - s.sx * s.sy)
                  * (n_terms::DOUBLE * s.sxy - s.sx * s.sy)
                  / ((n_terms::DOUBLE * s.sxx - s.sx * s.sx)
                     * (n_terms::DOUBLE * s.syy - s.sy * s.sy)) END,
             {round_dp}) AS r2
FROM folded
"""
