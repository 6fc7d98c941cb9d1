"""Web-corpus preparation: the end-to-end Common Crawl shape — WARC
segments in, training-ready documents out.

Stage order is the 100 TB-correct one (cheapest, most selective,
narrowest first; every shuffle sees only survivors):

  1. WARC/WET parse (`sources/warc.py`) — map-only, one task per
     segment file.
  2. Boilerplate removal (`extract_main_content`) for `response`
     HTML records; WET `conversion` records are already extracted
     text — map-only Arrow kernel.
  3. URL canonical dedup (`dedup_by_url`) — (canonical_url, id)-only
     shuffle, the cheapest dedup signal, applied before any
     content-based work.
  4. Language ID + quality + Gopher rules + char-LM score — all
     narrow zero-UDF projections; the LM lookup is two broadcast
     joins and one partial agg.
  5. Exact content dedup — (fingerprint, id)-only shuffle over the
     (already thinned) survivors.
  6. Token stats for the packer.

Near/semantic dedup (MinHash-LSH, SemDeDup) intentionally stay OUT of
the default plan: they are corpus-level batch jobs with their own cost
envelope — run them on the OUTPUT of this plan (see
operators/dedup.py, operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text_analysis as ta
from ..operators.dedup import dedup_exact
from ..operators.extract import extract_main_content
from ..operators.lm import lm_score, train_char_lm
from ..sources.warc import read_warc, warc_to_documents


def warc_segments_to_documents(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.warc.gz",
    remove_boilerplate: bool = True,
) -> DataFrame:
    """WARC/WET segments → (doc_id, url, text, n_chars) documents.
    `response` HTML records go through jusText main-content extraction
    (their flattened full text is the fallback when the classifier
    keeps nothing); WET `conversion` records pass through as-is."""
    parsed = read_warc(spark, path, glob=glob)
    return _records_to_documents(parsed, remove_boilerplate)


def _records_to_documents(parsed: DataFrame,
                          remove_boilerplate: bool) -> DataFrame:
    if remove_boilerplate:
        is_html = (
            (F.col("warc_type") == "response")
            & F.col("text").isNotNull())
        # classify the ALREADY-DECODED text, not the raw payload: the
        # WARC parser honored the page's charset= (Shift_JIS, cp1251,
        # ...) when producing `text`; re-decoding payload bytes with a
        # utf-8→latin-1 fallback would classify mojibake and replace
        # correct text with garbled main_text
        html = extract_main_content(
            parsed.filter(is_html), content_col="text",
            compute_ratio=False)  # ratio would be dropped; skip its
        # second full HTML parse in the hottest kernel
        html = html.withColumn(
            "text",
            F.when(F.length("main_text") > 0, F.col("main_text"))
            .otherwise(F.col("text"))).drop("main_text")
        rest = parsed.filter(~(
            (F.col("warc_type") == "response")
            & F.col("text").isNotNull()))
        parsed = html.unionByName(rest)
    return warc_to_documents(parsed)


def prepare_web_corpus(
    docs: DataFrame,
    lm_reference: DataFrame | None = None,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    max_nll: float | None = None,
    lm_n: int = 3,
    normalize: bool = True,
    classifier: "tuple[list[float], float] | str | None" = None,
    min_classifier_prob: float | None = None,
    host_ranks: DataFrame | None = None,
    min_host_rank: float | None = None,
    kn_reference: "DataFrame | str | None" = None,
    max_kn_nll: float | None = None,
) -> DataFrame:
    """documents (doc_id, url, text) → filtered, deduped, scored rows.

    `lm_reference`: high-quality corpus to train the char-LM on (the
    CCNet pattern: train on Wikipedia-like text, score the crawl);
    defaults to the input corpus itself (self-scoring, outlier cut).
    `max_nll=None` keeps the score column without filtering on it.
    `normalize` runs mojibake repair + NFC + whitespace cleanup FIRST
    so every downstream hash (URL canon excepted) sees stable bytes.

    `classifier`: optional (weights, bias) from
    classifier.train_text_classifier, or a str path to a model saved
    with models.save_classifier (train once, score across jobs) —
    the GPT-3-style "quality classifier" gate; adds `clf_prob`, and
    filters when `min_classifier_prob` is set. Scoring is the broadcast-weight
    Catalyst plan; runs AFTER the cheap narrow filters so only
    survivors pay the token explode.
    `host_ranks`: optional (node, rank) table (graph.pagerank over
    the crawl's host graph — the Common Crawl host-rank prior);
    BROADCAST-joined on url_host(url), adds `host_rank`, filters when
    `min_host_rank` is set. Host tables are ~10^7 rows at full crawl
    scale — still broadcastable; swap to a shuffle join above that.

    `kn_reference`: optional word-level Kneser-Ney reference — a
    high-quality corpus DataFrame to train on, or a str path saved
    with models.save_kn_bigram. Adds `kn_nll` (the CCNet WORD-level
    perplexity signal next to the char-LM `nll` — char statistics
    catch encoding junk, word statistics catch fluent-looking
    keyword stuffing / MT garbage); filters when `max_kn_nll` is
    set. Runs after the cheap narrow filters like the other model
    gates."""
    from ..operators.dedup import _spread
    from ..operators.normalize import normalize_and_clean
    from ..operators.text_analysis import dedup_by_url, url_host

    # fan a single-file local input out BEFORE the Arrow kernels:
    # boilerplate/normalize cost tracks rows, and every traversal
    # below inherits this width through the persist (measured 16.9 s
    # -> 4.0 s at sf0.1 on local[32]; no-op on wide scans)
    out = _spread(docs)
    if normalize:
        out = normalize_and_clean(out, "text")
    if "url" in docs.columns:
        out = dedup_by_url(out, url_col="url", id_col="doc_id")
    out = ta.language_id(out, "text")
    out = ta.quality_score(out, "text")
    out = out.filter(F.col("lang_pred").isin(list(langs))
                     & (F.col("quality") >= min_quality))
    if host_ranks is not None:
        if "url" not in docs.columns:
            raise ValueError("host_ranks filtering needs a url column")
        hr = host_ranks.select(F.col("node").alias("__host"),
                               F.col("rank").alias("host_rank"))
        out = (out.withColumn("__host", url_host(F.col("url")))
               .join(F.broadcast(hr), "__host", "left")
               .drop("__host"))
        if min_host_rank is not None:
            out = out.filter(F.col("host_rank") >= min_host_rank)
    # the lineage above (WARC parse → boilerplate kernel → normalize
    # kernel → filters → host prior) feeds every traversal below: the
    # classifier branch fans out 2 ways (token scoring + join-back)
    # and the LM stage 5 ways (ngram agg, ctx agg, vocab collect,
    # score explode, join/dedup branch) — without a cache every
    # document would be re-parsed and re-normalized per traversal
    from ..operators.lifecycle import track_persist
    out = track_persist(out)  # lifecycle-tracked so bench/driver
    # release_all() can free it between queries
    if classifier is not None:
        from ..operators.classifier import score_text
        hash_method = "xxhash64"
        if isinstance(classifier, str):
            from ..operators.models import load_classifier
            w, b, cfg = load_classifier(docs.sparkSession, classifier)
            hash_method = cfg.get("hash_method", hash_method)
        else:
            w, b = classifier
        scored = score_text(out.select("doc_id", "text"), w, b,
                            hash_method=hash_method) \
            .select("doc_id", F.col("prob").alias("clf_prob"))
        out = out.join(scored, "doc_id")
        if min_classifier_prob is not None:
            out = out.filter(F.col("clf_prob") >= min_classifier_prob)
        # re-persist past the scoring join so the 5-way LM fan-out
        # below replays neither the token-explode aggregation nor the
        # join (the pre-classifier persist is released by the same
        # lifecycle sweep; with classifier=None nothing changes)
        out = track_persist(out)
    if kn_reference is not None:
        from ..operators.kn_lm import kn_score, train_kn_bigram
        if isinstance(kn_reference, str):
            from ..operators.models import load_kn_bigram
            kn_model = load_kn_bigram(docs.sparkSession, kn_reference)
        else:
            kn_model = train_kn_bigram(kn_reference, "text")
        kn = kn_score(out.select("doc_id", "text"), kn_model) \
            .select("doc_id", "kn_nll")
        out = out.join(kn, "doc_id")
        if max_kn_nll is not None:
            out = out.filter(F.col("kn_nll") <= max_kn_nll)
    counts, ctx, vocab = train_char_lm(
        lm_reference if lm_reference is not None else out,
        "text", n=lm_n)
    scores = lm_score(out, counts, ctx, vocab,
                      id_col="doc_id", text_col="text", n=lm_n)
    out = out.join(scores, "doc_id")
    if max_nll is not None:
        out = out.filter(F.col("nll") <= max_nll)
    out = dedup_exact(out, id_col="doc_id", text_col="text")
    return ta.token_stats(out, "text")
