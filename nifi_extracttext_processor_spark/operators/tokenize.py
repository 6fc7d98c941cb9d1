"""Real BPE tokenizer training + encoding (Sennrich et al. 2016) —
the token counter a training-data pipeline actually budgets with,
next to the regex approximation in text_analysis.bpe_token_count.

Training uses the WORD-HISTOGRAM formulation every practical BPE
trainer uses (subword-nmt, HF tokenizers): merges depend only on the
word-frequency table, not the raw corpus, so

  1. Spark aggregates (pre-token, count) — one map-side-combinable
     shuffle of short strings, optionally Bernoulli-sampled first
     (the kmeans_fit sample-fit pattern) — and takes the top
     `max_words` by count (TakeOrdered; Zipf makes the tail
     irrelevant to merge ranks);
  2. the driver runs the classic merge loop over that bounded
     histogram (pure Python, seconds for tens of thousands of words);
  3. encoding broadcasts the merge ranks and applies them in an
     Arrow kernel with a per-word LRU cache (Zipf again: the cache
     hit rate on real text is ~99%). Map-only, no shuffle.

Pre-tokenization reuses text_analysis.BPE_TOKEN_RE — the ONE word
convention shared with the regex counter — plus the standard
end-of-word sentinel so merges cannot cross word boundaries.

No DuckDB twin exists for the merge loop (iterative, order-dependent
— exactly the "genuinely non-SQL-expressible" carve-out); the
contract is locked by hand-computed goldens on the canonical
low/lower/newest corpus and determinism/round-trip tests.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import BPE_TOKEN_RE

END_OF_WORD = "</w>"
_PRETOKEN = re.compile(BPE_TOKEN_RE)


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str],
                merged: str) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(sym):
        if (i + 1 < len(sym) and sym[i] == pair[0]
                and sym[i + 1] == pair[1]):
            out.append(merged)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(
    word_counts: "dict[str, int]",
    n_merges: int,
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word histogram: `n_merges`
    iterations of merge-the-most-frequent-adjacent-pair (ties broken
    by pair value for determinism). Returns the ordered merge list —
    the entire tokenizer state.

    Pair counts are maintained INCREMENTALLY (the subword-nmt form):
    each merge re-scans only the words that contain the merged pair
    (tracked in a pair → word-ids index), not the whole vocabulary —
    O(affected) per merge instead of O(total symbols), which is the
    difference between seconds and minutes at the documented
    n_merges=1000 / max_words=50000 defaults."""
    words: list[tuple[str, ...]] = []
    counts: list[int] = []
    seen: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        sym = tuple(w) + (END_OF_WORD,)
        if sym in seen:
            counts[seen[sym]] += c
        else:
            seen[sym] = len(words)
            words.append(sym)
            counts.append(c)
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, c) in enumerate(zip(words, counts)):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += c
            where.setdefault((a, b), set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # drop zeroed pairs lazily
        while pair_counts and pair_counts[
                best := max(pair_counts, key=lambda p: (pair_counts[p],
                                                        p))] <= 0:
            del pair_counts[best]
            where.pop(best, None)
        if not pair_counts:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in sorted(where.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best, merged)
            if new == old:
                continue
            c = counts[wi]
            for a, b in zip(old, old[1:]):
                pair_counts[(a, b)] -= c
                s = where.get((a, b))
                if s is not None:
                    s.discard(wi)
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += c
                where.setdefault((a, b), set()).add(wi)
            words[wi] = new
        pair_counts.pop(best, None)
        where.pop(best, None)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    max_words: int = 50000,
    sample_fraction: float | None = None,
    seed: int = 0,
) -> list[tuple[str, str]]:
    """Distributed word histogram → driver merge loop. `max_words`
    bounds driver memory (top-N by count, ties by word — TakeOrdered,
    no full sort); `sample_fraction` Bernoulli-samples the corpus
    first (at 100 TB even 0.1% yields a histogram whose top-50k
    counts are rank-stable)."""
    src = df if sample_fraction is None else \
        df.sample(fraction=sample_fraction, seed=seed)
    # F.lit for the pattern, NOT an f-string into F.expr: the SQL
    # parser would eat the backslash in \s, silently turning
    # whitespace into pre-tokens (and their merges into dead vocab)
    counts = (src
              .select(F.explode(F.regexp_extract_all(
                  F.coalesce(F.col(text_col), F.lit("")),
                  F.lit(BPE_TOKEN_RE), 0)).alias("w"))
              .groupBy("w").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("w"))
              .limit(max_words)
              .collect())
    return bpe_train_from_counts({r["w"]: r["c"] for r in counts},
                                 n_merges)


def bpe_encode_word(word: str, ranks: "dict[tuple[str, str], int]",
                    ) -> list[str]:
    """Greedy lowest-rank merging of one pre-token (the standard BPE
    inference loop)."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    tokens_col: str | None = "bpe_tokens",
    count_col: str = "n_bpe_real",
    emit: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Apply a trained merge list: adds `count_col` (true token count)
    and, unless tokens_col is None, the token array itself. Arrow
    kernel, map-only; the merge ranks ride the closure (KBs) and a
    per-word LRU cache skips re-encoding repeated words (~99% hits on
    Zipfian text).

    `emit` (guide §4.2 — pass/return only what the kernel needs):
    when set, the output carries ONLY those input columns plus the
    token/count columns, and the kernel's input is pruned to
    emit+text — a count-only consumer (e.g. pack_sequences keyed on
    doc_id) then ships (id, text) INTO Python and (id, count) OUT,
    instead of round-tripping the whole corpus text through Arrow
    both ways. mapInPandas receives every column of its child by
    contract, so this pruning cannot come from Catalyst."""
    import pandas as pd

    if emit is not None:
        keep = [c for c in emit if c != text_col]
        df = df.select(*keep, text_col)
        drop_text = True
    else:
        drop_text = False
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields
              if not (drop_text and f.name == text_col)]
    if tokens_col:
        fields.append(f"{tokens_col} ARRAY<STRING>")
    fields.append(f"{count_col} INT")
    schema = ", ".join(fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=65536)
        def enc(word: str) -> tuple[str, ...]:
            return tuple(bpe_encode_word(word, ranks))

        for pdf in batches:
            texts = pdf[text_col]
            pdf = (pdf.drop(columns=[text_col]) if drop_text
                   else pdf.copy())
            toks_out, counts_out = [], []
            for t in texts:
                toks: list[str] = []
                for w in _PRETOKEN.findall(t or ""):
                    toks.extend(enc(w))
                counts_out.append(len(toks))
                if tokens_col:
                    toks_out.append(toks)
            if tokens_col:
                pdf[tokens_col] = toks_out
            pdf[count_col] = counts_out
            yield pdf

    return df.mapInPandas(_run, schema=schema)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018 — the SentencePiece "unigram" model)
# ---------------------------------------------------------------------------
#
# Same two-phase formulation as BPE above: Spark aggregates the
# bounded word histogram (one short-string shuffle, TakeOrdered cap),
# the driver runs the EM + prune loop over it (SentencePiece itself
# trains from a sentence/word frequency table), and encoding
# broadcasts the piece log-probs into an Arrow Viterbi kernel with the
# same per-word LRU. Iterative EM = the documented non-SQL carve-out.

_UNK_LOGP = -100.0   # floor for characters never seen in training


def _word_lattice_logsum(word: str, logp: "dict[str, float]",
                         max_len: int) -> "tuple[float, list[float]]":
    """Forward pass over the segmentation lattice: returns
    (log Z(word), alpha) where alpha[i] = log-sum over segmentations
    of word[:i]."""
    import math

    n = len(word)
    alpha = [float("-inf")] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = float("-inf")
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or alpha[j] == float("-inf"):
                continue
            cand = alpha[j] + lp
            acc = cand if acc == float("-inf") else (
                max(acc, cand) + math.log1p(
                    math.exp(min(acc, cand) - max(acc, cand))))
        alpha[i] = acc
    return alpha[n], alpha


def _word_expected_counts(word: str, count: int,
                          logp: "dict[str, float]", max_len: int,
                          out: "dict[str, float]") -> float:
    """Accumulate EM expected piece counts for one word (forward-
    backward over the lattice); returns the word's log-likelihood
    contribution count * log Z."""
    import math

    n = len(word)
    logz, alpha = _word_lattice_logsum(word, logp, max_len)
    if logz == float("-inf"):
        return 0.0
    beta = [float("-inf")] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = float("-inf")
        for k in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:k]
            lp = logp.get(piece)
            if lp is None or beta[k] == float("-inf"):
                continue
            cand = lp + beta[k]
            acc = cand if acc == float("-inf") else (
                max(acc, cand) + math.log1p(
                    math.exp(min(acc, cand) - max(acc, cand))))
        beta[i] = acc
    for i in range(n):
        if alpha[i] == float("-inf"):
            continue
        for k in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:k]
            lp = logp.get(piece)
            if lp is None or beta[k] == float("-inf"):
                continue
            post = alpha[i] + lp + beta[k] - logz
            out[piece] = out.get(piece, 0.0) + count * math.exp(post)
    return count * logz


def unigram_train_from_counts(
    word_counts: "dict[str, int]",
    vocab_size: int = 1000,
    seed_max_len: int = 8,
    seed_size: int = 20000,
    em_iters: int = 2,
    prune_rounds: int = 4,
    prune_frac: float = 0.25,
) -> "dict[str, float]":
    """EM + prune unigram-LM training over a word histogram. Returns
    {piece: log-prob}. Single characters are never pruned (coverage);
    ties everywhere break on the piece string, so the vocab is
    deterministic."""
    import math

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    # seed: frequent substrings (counted once per occurrence) + chars
    sub_counts: "dict[str, float]" = {}
    chars: set[str] = set()
    for w, c in word_counts.items():
        for ch in w:
            chars.add(ch)
        n = len(w)
        for i in range(n):
            for k in range(i + 1, min(n, i + seed_max_len) + 1):
                piece = w[i:k]
                sub_counts[piece] = sub_counts.get(piece, 0.0) + c
    multi = sorted((p for p in sub_counts if len(p) > 1),
                   key=lambda p: (-sub_counts[p], p))[:seed_size]
    vocab = set(multi) | chars
    total = sum(sub_counts[p] for p in vocab)
    logp = {p: math.log(sub_counts[p] / total) for p in vocab}

    def em(rounds: int) -> None:
        nonlocal logp
        for _ in range(rounds):
            exp: "dict[str, float]" = {}
            for w, c in word_counts.items():
                _word_expected_counts(w, c, logp, seed_max_len, exp)
            z = sum(exp.values())
            if z <= 0:
                return
            # dead pieces keep a floor so chars never drop out
            logp = {p: (math.log(exp[p] / z) if exp.get(p, 0.0) > 0
                        else _UNK_LOGP)
                    for p in logp}

    em(em_iters)
    while len(logp) > max(vocab_size, len(chars)):
        removable = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (logp[p], p))
        if not removable:
            break
        target = max(vocab_size, len(chars))
        n_drop = min(len(removable),
                     max(1, int(len(removable) * prune_frac)),
                     len(logp) - target)
        for p in removable[:n_drop]:
            del logp[p]
        em(1)
        if prune_rounds <= 0:
            break
        prune_rounds -= 1
    return logp


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_words: int = 50000,
    sample_fraction: float | None = None,
    seed: int = 0,
    **kw,
) -> "dict[str, float]":
    """Distributed word histogram (same TakeOrdered cap and optional
    Bernoulli sample as train_bpe) → driver EM+prune loop."""
    src = df if sample_fraction is None else \
        df.sample(fraction=sample_fraction, seed=seed)
    counts = (src
              .select(F.explode(F.regexp_extract_all(
                  F.coalesce(F.col(text_col), F.lit("")),
                  F.lit(BPE_TOKEN_RE), 0)).alias("w"))
              .groupBy("w").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("w"))
              .limit(max_words)
              .collect())
    return unigram_train_from_counts(
        {r["w"]: r["c"] for r in counts}, vocab_size=vocab_size, **kw)


def unigram_encode_word(word: str, logp: "dict[str, float]",
                        max_len: int = 8) -> "list[str]":
    """Viterbi best segmentation under the unigram model (ties break
    toward the LONGER piece, then lexicographically — deterministic).
    Characters missing from the vocab segment as themselves at a
    floor probability (byte-fallback posture)."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back: "list[tuple[int, str] | None]" = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) == 1:
                    lp = _UNK_LOGP   # unseen char fallback
                else:
                    continue
            if best[j] == float("-inf"):
                continue
            cand = best[j] + lp
            prev = back[i]
            if (cand > best[i]
                    or (cand == best[i] and prev is not None
                        and (len(piece), piece) >
                        (len(prev[1]), prev[1]))):
                best[i] = cand
                back[i] = (j, piece)
    out: "list[str]" = []
    i = n
    while i > 0:
        j, piece = back[i]        # always set: char fallback is total
        out.append(piece)
        i = j
    out.reverse()
    return out


def unigram_tokenize(
    df: DataFrame,
    vocab: "dict[str, float]",
    text_col: str = "text",
    tokens_col: "str | None" = "unigram_tokens",
    count_col: str = "n_unigram_real",
    max_len: int = 8,
) -> DataFrame:
    """Apply a trained unigram vocab: Viterbi per pre-token in an
    Arrow kernel (broadcast vocab, per-word LRU) — map-only, lossless
    by construction (concat(tokens) == pre-tokens)."""
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(dict(vocab))
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    if tokens_col:
        fields.append(f"{tokens_col} ARRAY<STRING>")
    fields.append(f"{count_col} INT")
    schema = ", ".join(fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        logp = bc.value

        @lru_cache(maxsize=65536)
        def enc(word: str) -> "tuple[str, ...]":
            return tuple(unigram_encode_word(word, logp, max_len))

        for pdf in batches:
            pdf = pdf.copy()
            toks_out, counts_out = [], []
            for t in pdf[text_col]:
                toks: "list[str]" = []
                for w in _PRETOKEN.findall(t or ""):
                    toks.extend(enc(w))
                counts_out.append(len(toks))
                if tokens_col:
                    toks_out.append(toks)
            if tokens_col:
                pdf[tokens_col] = toks_out
            pdf[count_col] = counts_out
            yield pdf

    return df.mapInPandas(_run, schema=schema)
