"""Model artifact persistence: save/load for every trainable model in
the engine (classifier weights, char-LM counts, BPE merges, unigram
log-probs, k-means centroids, language profiles).

A real pipeline trains once and scores for months across jobs; r7's
trainers all returned in-memory Python values that died with the
process. This module is the registry pattern the reference flow uses
for schemas (HortonworksSchemaRegistry in 56409-tika.xml:529 —
artifacts outlive the flow; operators/attributes.py has the schema
half) applied to models, re-using the persisted-index layout
convention from search.build_bm25_index / similarity.build_lsh_index.

Layout under `path`:
    manifest/   one JSON text line: model_type, format_version,
                config (hash method, n-gram order, vocab scalar, ...)
    <table>/    parquet per bulky payload (weights, counts, merges,
                centroids, profiles)

Everything goes through the SparkSession's Hadoop filesystem (parquet
+ .text), so paths work the same on local disk, HDFS, or S3 — no
driver-local open() that would break on a cluster. All floats travel
as IEEE doubles in parquet, so a load restores scores/assignments
byte-identically (round-trip tested across fresh sessions).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT_VERSION = 1


def _write_manifest(spark: SparkSession, path: str, model_type: str,
                    config: dict) -> None:
    payload = json.dumps({"model_type": model_type,
                          "format_version": _FORMAT_VERSION,
                          "config": config}, sort_keys=True)
    (spark.createDataFrame([(payload,)], "value string")
     .coalesce(1).write.mode("overwrite")
     .text(path.rstrip("/") + "/manifest"))


def _read_manifest(spark: SparkSession, path: str,
                   expect_type: str) -> dict:
    rows = spark.read.text(path.rstrip("/") + "/manifest").collect()
    if len(rows) != 1:
        raise ValueError(
            f"model manifest at {path} has {len(rows)} rows, want 1")
    m = json.loads(rows[0]["value"])
    if m.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported model format_version {m.get('format_version')}")
    if m.get("model_type") != expect_type:
        raise ValueError(
            f"model at {path} is {m.get('model_type')!r}, "
            f"expected {expect_type!r}")
    return m["config"]


def model_info(spark: SparkSession, path: str) -> dict:
    """Peek at a saved model without loading payloads: returns the
    full manifest dict (model_type, format_version, config)."""
    rows = spark.read.text(path.rstrip("/") + "/manifest").collect()
    if len(rows) != 1:
        raise ValueError(
            f"model manifest at {path} has {len(rows)} rows, want 1")
    return json.loads(rows[0]["value"])


# ---------------------------------------------------------------------------
# classifier (weights, bias, hash config) — classifier.train_text_classifier
# ---------------------------------------------------------------------------

def save_classifier(
    spark: SparkSession,
    path: str,
    weights: list[float],
    bias: float,
    hash_method: str = "xxhash64",
) -> None:
    """Sparse on disk: only non-zero weights become rows; n_buckets
    (the dense length) lives in the manifest, so a 2^24-bucket model
    with 100k live terms stores 100k rows."""
    n_buckets = len(weights)
    if n_buckets < 1:
        raise ValueError("empty weight vector")
    rows = [(j, float(wj)) for j, wj in enumerate(weights)
            if wj != 0.0]
    (spark.createDataFrame(rows or [(0, 0.0)], "bucket int, w double")
     .write.mode("overwrite").parquet(path.rstrip("/") + "/weights"))
    _write_manifest(spark, path, "classifier",
                    {"n_buckets": n_buckets, "bias": float(bias),
                     "hash_method": hash_method,
                     "sparse_rows": len(rows)})


def load_classifier(
    spark: SparkSession, path: str,
) -> tuple[list[float], float, dict]:
    """Returns (weights dense list, bias, config) — drop-in for
    classifier.score_text / plans.prepare_web_corpus."""
    cfg = _read_manifest(spark, path, "classifier")
    n = int(cfg["n_buckets"])
    w = [0.0] * n
    for r in spark.read.parquet(path.rstrip("/") + "/weights").collect():
        w[int(r["bucket"])] = float(r["w"])
    return w, float(cfg["bias"]), cfg


# ---------------------------------------------------------------------------
# char n-gram LM (counts tables + vocab scalar) — lm.train_char_lm
# ---------------------------------------------------------------------------

def save_char_lm(
    path: str,
    ngram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    n: int = 3,
) -> None:
    spark = ngram_counts.sparkSession
    p = path.rstrip("/")
    ngram_counts.write.mode("overwrite").parquet(p + "/ngram_counts")
    context_counts.write.mode("overwrite").parquet(p + "/context_counts")
    _write_manifest(spark, path, "char_lm",
                    {"vocab_size": int(vocab_size), "n": int(n)})


def load_char_lm(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, DataFrame, int, dict]:
    """Returns (ngram_counts, context_counts, vocab_size, config);
    the first three are exactly lm.lm_score's model arguments (and
    streaming's lm_model triple)."""
    cfg = _read_manifest(spark, path, "char_lm")
    p = path.rstrip("/")
    return (spark.read.parquet(p + "/ngram_counts"),
            spark.read.parquet(p + "/context_counts"),
            int(cfg["vocab_size"]), cfg)


# ---------------------------------------------------------------------------
# BPE merges — tokenize.train_bpe
# ---------------------------------------------------------------------------

def save_bpe(
    spark: SparkSession, path: str, merges: list[tuple[str, str]],
) -> None:
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    (spark.createDataFrame(rows or [(-1, "", "")],
                           "rank int, a string, b string")
     .write.mode("overwrite").parquet(path.rstrip("/") + "/merges"))
    _write_manifest(spark, path, "bpe", {"n_merges": len(merges)})


def load_bpe(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Ordered merge list — the entire tokenizer state, drop-in for
    tokenize.bpe_tokenize."""
    _read_manifest(spark, path, "bpe")
    rows = (spark.read.parquet(path.rstrip("/") + "/merges")
            .filter(F.col("rank") >= 0)
            .orderBy("rank").collect())
    return [(r["a"], r["b"]) for r in rows]


# ---------------------------------------------------------------------------
# unigram-LM vocab — tokenize.train_unigram
# ---------------------------------------------------------------------------

def save_unigram(
    spark: SparkSession, path: str, logp: dict[str, float],
) -> None:
    rows = sorted(logp.items())
    if not rows:
        raise ValueError("empty unigram vocab")
    (spark.createDataFrame(rows, "piece string, logp double")
     .write.mode("overwrite").parquet(path.rstrip("/") + "/vocab"))
    _write_manifest(spark, path, "unigram", {"vocab_size": len(rows)})


def load_unigram(spark: SparkSession, path: str) -> dict[str, float]:
    """{piece: log-prob} — drop-in for tokenize.unigram_tokenize."""
    _read_manifest(spark, path, "unigram")
    return {r["piece"]: float(r["logp"]) for r in
            spark.read.parquet(path.rstrip("/") + "/vocab").collect()}


# ---------------------------------------------------------------------------
# k-means centroids — clustering.kmeans_fit
# ---------------------------------------------------------------------------

def save_kmeans(
    spark: SparkSession, path: str, centroids: list[list[float]],
) -> None:
    if not centroids:
        raise ValueError("empty centroid list")
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    (spark.createDataFrame(rows, "cluster int, centroid array<double>")
     .write.mode("overwrite").parquet(path.rstrip("/") + "/centroids"))
    _write_manifest(spark, path, "kmeans",
                    {"k": len(centroids), "dim": len(centroids[0])})


def load_kmeans(spark: SparkSession, path: str) -> list[list[float]]:
    """Centroids ordered by cluster id — drop-in for
    clustering._assign / semantic_dedup_incremental /
    similarity.build_ivf_index."""
    cfg = _read_manifest(spark, path, "kmeans")
    rows = (spark.read.parquet(path.rstrip("/") + "/centroids")
            .orderBy("cluster").collect())
    if len(rows) != int(cfg["k"]):
        raise ValueError(
            f"kmeans payload has {len(rows)} centroids, "
            f"manifest says {cfg['k']}")
    return [list(r["centroid"]) for r in rows]


# ---------------------------------------------------------------------------
# PQ codebooks — quantization.pq_train
# ---------------------------------------------------------------------------

def save_pq(
    spark: SparkSession, path: str,
    codebooks: list[list[list[float]]],
) -> None:
    if not codebooks or not codebooks[0]:
        raise ValueError("empty PQ codebooks")
    rows = [(j, c, [float(x) for x in codebooks[j][c]])
            for j in range(len(codebooks))
            for c in range(len(codebooks[0]))]
    (spark.createDataFrame(rows, "j int, c int, centroid array<double>")
     .write.mode("overwrite").parquet(path.rstrip("/") + "/codebooks"))
    _write_manifest(spark, path, "pq",
                    {"m": len(codebooks), "k": len(codebooks[0]),
                     "dsub": len(codebooks[0][0])})


def load_pq(spark: SparkSession, path: str) -> list[list[list[float]]]:
    """codebooks[j][c] — drop-in for quantization.pq_encode /
    pq_topk / build_ivfpq_index."""
    cfg = _read_manifest(spark, path, "pq")
    rows = (spark.read.parquet(path.rstrip("/") + "/codebooks")
            .orderBy("j", "c").collect())
    m, k = int(cfg["m"]), int(cfg["k"])
    books: list[list] = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["j"]][r["c"]] = list(r["centroid"])
    if any(c is None for book in books for c in book):
        raise ValueError(f"incomplete PQ codebooks at {path}")
    return books


# ---------------------------------------------------------------------------
# language profiles — text_analysis.train_lang_profiles
# ---------------------------------------------------------------------------

def save_lang_profiles(
    path: str,
    profiles: DataFrame,
    n: int = 3,
    top_k: int = 100,
) -> None:
    spark = profiles.sparkSession
    profiles.write.mode("overwrite").parquet(
        path.rstrip("/") + "/profiles")
    _write_manifest(spark, path, "lang_profiles",
                    {"n": int(n), "top_k": int(top_k)})


def load_lang_profiles(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, dict]:
    """Returns (profiles DF, config with n/top_k) — drop-in for
    text_analysis.language_id_ngram (pass n=cfg['n'],
    top_k=cfg['top_k'] so scoring matches training)."""
    cfg = _read_manifest(spark, path, "lang_profiles")
    return spark.read.parquet(path.rstrip("/") + "/profiles"), cfg


# ---------------------------------------------------------------------------
# multinomial Naive Bayes — nbayes.train_naive_bayes
# ---------------------------------------------------------------------------

def save_nbayes(
    spark: SparkSession,
    path: str,
    cond_df: DataFrame,
    class_df: DataFrame,
    n_buckets: int,
    hash_method: str = "xxhash64",
    alpha: float = 1.0,
) -> None:
    """Model = the two training DataFrames verbatim (conditional
    log-probs for seen buckets + per-class prior/default), so load is
    zero-recompute; n_buckets/hash_method/alpha travel in the
    manifest so scoring can't silently hash differently than
    training did."""
    p = path.rstrip("/")
    cond_df.write.mode("overwrite").parquet(p + "/cond")
    class_df.write.mode("overwrite").parquet(p + "/classes")
    _write_manifest(spark, path, "nbayes",
                    {"n_buckets": int(n_buckets),
                     "hash_method": hash_method,
                     "alpha": float(alpha)})


def load_nbayes(
    spark: SparkSession, path: str,
) -> tuple[DataFrame, DataFrame, dict]:
    """Returns (cond_df, class_df, config) — the first two are
    exactly nbayes.score_naive_bayes's model arguments; pass
    n_buckets=cfg['n_buckets'], hash_method=cfg['hash_method']."""
    cfg = _read_manifest(spark, path, "nbayes")
    p = path.rstrip("/")
    return (spark.read.parquet(p + "/cond"),
            spark.read.parquet(p + "/classes"), cfg)


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM — kn_lm.train_kn_bigram
# ---------------------------------------------------------------------------

def save_kn_bigram(path: str, model: "tuple") -> None:
    """Persist a kn_lm.train_kn_bigram model: the three count tables
    as parquet, scalars (B, V, discount) and the optional capped
    vocab in the manifest."""
    bigrams, contexts, conts, b, v, d, words = model
    spark = bigrams.sparkSession
    p = path.rstrip("/")
    bigrams.write.mode("overwrite").parquet(p + "/bigrams")
    contexts.write.mode("overwrite").parquet(p + "/contexts")
    conts.write.mode("overwrite").parquet(p + "/conts")
    _write_manifest(spark, path, "kn_bigram",
                    {"b": int(b), "v": int(v),
                     "discount": float(d),
                     "vocab": list(words) if words is not None
                     else None})


def load_kn_bigram(spark: SparkSession, path: str) -> "tuple":
    """Returns exactly kn_lm.kn_score's model tuple."""
    cfg = _read_manifest(spark, path, "kn_bigram")
    p = path.rstrip("/")
    vocab = cfg["vocab"]
    return (spark.read.parquet(p + "/bigrams"),
            spark.read.parquet(p + "/contexts"),
            spark.read.parquet(p + "/conts"),
            int(cfg["b"]), int(cfg["v"]), float(cfg["discount"]),
            list(vocab) if vocab is not None else None)
