"""B6 NLPProcessor (entities) + B7 CoreNLPProcessor (sentiment).

The reference delegates to two custom processors backed by OpenNLP and
Stanford CoreNLP (56409-tika.xml:1512,1190 — separate repos, models not
in this container). We re-express both as DETERMINISTIC, lexicon-based
JVM-side expressions:

  * sentiment: positive/negative keyword counts → POSITIVE/NEGATIVE/
    NEUTRAL (CoreNLP's output domain, 3 labels, :1170-1171)
  * entities: gazetteer membership over tokens → names[]/locations[]

Deliberately zero-UDF: `split` + higher-order `filter`/`array_distinct`
stay inside whole-stage codegen and are expressible 1:1 in DuckDB for
the oracle gate. Swapping in a real model later = replacing one column
expression with a pandas_udf, same schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic demo lexicons — chosen to overlap the synthetic corpus
# (/root/testdata documents use a fixed OLAP-word vocabulary)
POSITIVE_WORDS = ("fast", "good", "great", "excellent", "happy", "love")
NEGATIVE_WORDS = ("slow", "bad", "terrible", "awful", "sad", "hate")
NAME_GAZETTEER = ("customer", "supplier", "user", "admin", "analyst")
LOCATION_GAZETTEER = ("table", "warehouse", "cluster", "region", "zone")


def _tokens(col: Column) -> Column:
    return F.split(F.lower(col), " ")


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordlist, t)))


def sentiment(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sentiment",
    positive: tuple[str, ...] = POSITIVE_WORDS,
    negative: tuple[str, ...] = NEGATIVE_WORDS,
) -> DataFrame:
    """B7: keyword-count polarity → {POSITIVE, NEGATIVE, NEUTRAL}."""
    toks = _tokens(F.col(text_col))
    pos = _count_in(toks, positive)
    neg = _count_in(toks, negative)
    return df.withColumn(
        out_col,
        F.when(pos > neg, F.lit("POSITIVE"))
         .when(neg > pos, F.lit("NEGATIVE"))
         .otherwise(F.lit("NEUTRAL")))


def sentiment_sql(text_expr: str, positive: tuple[str, ...] = POSITIVE_WORDS,
                  negative: tuple[str, ...] = NEGATIVE_WORDS,
                  dialect: str = "duckdb") -> str:
    """The same sentiment expression as portable SQL (oracle parity)."""
    pos_list = ", ".join(f"'{w}'" for w in positive)
    neg_list = ", ".join(f"'{w}'" for w in negative)
    if dialect == "duckdb":
        toks = f"string_split(lower({text_expr}), ' ')"
        pos = f"len(list_filter({toks}, t -> list_contains([{pos_list}], t)))"
        neg = f"len(list_filter({toks}, t -> list_contains([{neg_list}], t)))"
    else:  # spark sql
        toks = f"split(lower({text_expr}), ' ')"
        pos = (f"size(filter({toks}, t -> "
               f"array_contains(array({pos_list}), t)))")
        neg = (f"size(filter({toks}, t -> "
               f"array_contains(array({neg_list}), t)))")
    return (f"CASE WHEN {pos} > {neg} THEN 'POSITIVE' "
            f"WHEN {neg} > {pos} THEN 'NEGATIVE' ELSE 'NEUTRAL' END")


def entities(
    df: DataFrame,
    text_col: str = "text",
    names: tuple[str, ...] = NAME_GAZETTEER,
    locations: tuple[str, ...] = LOCATION_GAZETTEER,
) -> DataFrame:
    """B6: gazetteer entity extraction → names[]/locations[] columns.

    array_distinct(filter(...)) keeps first-occurrence order — the same
    order DuckDB's list_distinct does NOT guarantee, so oracle queries
    compare sorted entity lists.
    """
    toks = _tokens(F.col(text_col))
    name_list = F.array(*[F.lit(w) for w in names])
    loc_list = F.array(*[F.lit(w) for w in locations])
    return (df
            .withColumn("names", F.array_sort(F.array_distinct(
                F.filter(toks, lambda t: F.array_contains(name_list, t)))))
            .withColumn("locations", F.array_sort(F.array_distinct(
                F.filter(toks, lambda t: F.array_contains(loc_list, t))))))


def entities_sql(text_expr: str, words: tuple[str, ...],
                 dialect: str = "duckdb") -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    if dialect == "duckdb":
        toks = f"string_split(lower({text_expr}), ' ')"
        return (f"list_sort(list_distinct(list_filter({toks}, "
                f"t -> list_contains([{wl}], t))))")
    toks = f"split(lower({text_expr}), ' ')"
    return (f"array_sort(array_distinct(filter({toks}, "
            f"t -> array_contains(array({wl}), t))))")
