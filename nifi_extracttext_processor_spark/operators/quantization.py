"""Product quantization (PQ — Jégou, Douze & Schmid 2011, "Product
Quantization for Nearest Neighbor Search", TPAMI): compress each
d-dim embedding into m sub-space codebook ids (m bytes at k ≤ 256)
and answer top-k by Asymmetric Distance Computation (ADC) — the
faiss-style IVF-PQ storage layout that makes 100 TB-scale vector
search affordable: a 64-dim float32 vector (256 B) becomes an 8-byte
code, so the index that had to stream 100 TB streams ~3 TB.

Spark-first shape:
- train: the d dims split into m contiguous sub-spaces; each runs the
  existing deterministic Lloyd fit (operators/clustering.kmeans_fit)
  on its slice — m small k-means problems, reusing the house
  literal/arrow assignment dispatcher and its oracle story.
- encode: per-subspace argmin over k centroids. Catalyst literal
  expressions when m·k·dsub is small (oracle-replayable in DuckDB,
  same first-min convention as clustering._assign), an Arrow numpy
  kernel above the threshold (equivalence-tested) — the exact
  dispatcher pattern of clustering._assign.
- search (ADC): the query precomputes an m×k lookup table of
  sub-distances on the driver (m·k doubles — tiny), broadcast as a
  LITERAL array-of-arrays; each row's distance is a k-free fold
  sum_j lut[j][code_j] — pure Catalyst, zero UDF, and the only wide
  data touched are the m-byte codes. Global top-k is TakeOrdered.
- refine (re-rank): ADC top-(c·k) candidate ids broadcast-join an
  original-vector sidecar; exact squared Euclidean re-ranks to the
  final k. Lifts ADC's compression-bound recall back to
  near-brute-force while the corpus-wide pass still reads only
  codes (the faiss IndexRefineFlat pattern).

Everything deterministic: ties break first-min / lowest id, and the
DuckDB twins replay codes and ADC distances exactly (round-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


# literal-plan ceiling, same spirit as clustering's 32k expression
# terms: m*k*dsub beyond this flips encode to the Arrow kernel
_LITERAL_TERM_CEILING = 1 << 15


def _check_dims(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return dim // m


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float | None = None,
    seed: int = 13,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: codebooks[j][c] is the c-th centroid of
    sub-space j (dsub floats). m deterministic kmeans_fit runs over
    sliced sub-vectors, each with metric="l2" — Lloyd assignment by
    squared Euclidean distance, the objective pq_encode/ADC search
    with (Jégou 2011 §II; a cosine-trained codebook would optimize a
    different metric than the one encode and search use).
    `sample_fraction` is the 100 TB pattern (fit on a Bernoulli
    sample, encode the full corpus)."""
    from .clustering import kmeans_fit

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    dsub = _check_dims(int(first["d"]), m)
    books = []
    for j in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"),
                    j * dsub + 1, dsub).alias("sub"))
        books.append(kmeans_fit(sub, id_col=id_col, vec_col="sub",
                                k=k, iters=iters,
                                sample_fraction=sample_fraction,
                                seed=seed, metric="l2"))
    return books


def _resolve_encode(encode: str, m: int, k: int, dsub: int) -> str:
    if encode in ("literal", "arrow"):
        return encode
    if encode != "auto":
        raise ValueError(f"unknown encode method {encode!r}")
    # literal plan ~ 2*m*k*dsub terms (each distance appears twice in
    # the array_position/array_min argmin); budget m*k^2*dsub anyway —
    # the quadratic margin keeps Catalyst's constant-folding and
    # codegen comfortably under their own limits before arrow takes
    # over
    return ("literal" if m * k * k * dsub <= _LITERAL_TERM_CEILING
            else "arrow")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
    encode: str = "auto",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id_col, *keep_cols, out_col array<int>): per-subspace argmin
    centroid id (first-min tie-break). Literal path = pure Catalyst
    (DuckDB twin); Arrow path = one numpy argmin per batch, O(1) plan
    size. `keep_cols` ride along so composers (build_ivfpq_index's
    cell column) don't need a join-back."""
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    method = _resolve_encode(encode, m, k, dsub)
    v = df.select(F.col(id_col), *keep_cols,
                  F.col(vec_col).cast("array<double>").alias("v"))
    if method == "arrow":
        return _pq_encode_arrow(v, codebooks, id_col, out_col,
                                keep_cols)
    subcodes = []
    for j in range(m):
        dists = []
        for c in range(k):
            terms = [
                (F.element_at("v", j * dsub + t + 1)
                 - F.lit(float(codebooks[j][c][t]))) ** 2
                for t in range(dsub)]
            dists.append(sum(terms[1:], terms[0]))
        # first-min argmin via array_position(darr, array_min) — each
        # distance appears exactly twice, so the plan really is
        # O(k·dsub) per subspace. A nested WHEN-chain carrying the
        # running best re-embeds the previous best TWICE per round
        # (condition + otherwise) and grows ~2^k: k=16 OOMed an 8 GB
        # driver at plan conversion before this was rewritten (the
        # same shape _assign in clustering.py already uses).
        darr = F.array(*dists)
        subcodes.append(
            (F.array_position(darr, F.array_min(darr)) - F.lit(1))
            .cast("int"))
    return v.select(id_col, *keep_cols,
                    F.array(*subcodes).alias(out_col))


def _pq_encode_arrow(v, codebooks, id_col, out_col, keep_cols=()):
    import pandas as pd

    sc = v.sparkSession.sparkContext
    bc = sc.broadcast([[list(map(float, c)) for c in book]
                       for book in codebooks])
    passthrough = [id_col, *keep_cols]
    schema = (", ".join(
        f"`{c}` {v.schema[c].dataType.simpleString()}"
        for c in passthrough) + f", {out_col} array<int>")

    def run(batches):
        import numpy as np
        books = np.asarray(bc.value)          # (m, k, dsub)
        m, k, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {**{c: [] for c in passthrough}, out_col: []})
                continue
            x = np.stack(pdf["v"].to_numpy())  # (n, d)
            xs = x.reshape(len(pdf), m, dsub)  # (n, m, dsub)
            # (n, m, k): squared distance per subspace/centroid
            d2 = ((xs[:, :, None, :] - books[None, :, :, :]) ** 2
                  ).sum(axis=3)
            codes = d2.argmin(axis=2)          # first-min, like np
            out = pdf[passthrough].copy()
            out[out_col] = [[int(c) for c in row] for row in codes]
            yield out

    return v.mapInPandas(run, schema)


def _adc_lut(codebooks, query_vec) -> list[list[float]]:
    """m×k table: squared distance between each query sub-vector and
    each centroid, round-6 so Spark and DuckDB agree bit-for-bit."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != m * dsub:
        raise ValueError(
            f"query dim {len(query_vec)} != m*dsub {m * dsub}")
    lut = []
    for j in range(m):
        q = query_vec[j * dsub:(j + 1) * dsub]
        lut.append([
            round(sum((float(qt) - float(ct)) ** 2
                      for qt, ct in zip(q, c)), 6)
            for c in codebooks[j]])
    return lut


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    refine_mult: int | None = None,
    vectors_df: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over encoded vectors: (id_col, adc_dist) ascending,
    ties on id. The LUT is an m×k literal; the per-row work is m
    array lookups + a sum — no vectors anywhere.

    Refine (the faiss re-rank pattern, Jégou 2011 §V.C): pass
    `refine_mult=c` and a `vectors_df` sidecar (id_col, vec_col of
    the ORIGINAL vectors) — ADC selects the c·k best candidates,
    their exact squared Euclidean distances are computed from the
    sidecar, and the final top-k re-ranks on the exact distance
    (ties on id). Output gains an `exact_dist` column and is ordered
    by it. Cost shape at 100 TB: the candidate ids (c·k rows, ids +
    one double) are BROADCAST to the sidecar join, so the original
    vectors never shuffle and only c·k of them are ever materialized
    past the scan — the corpus-wide pass still touches only m-byte
    codes. Without refine, ADC recall degrades with compression
    (measured 0.325 recall@10 at 32× on i.i.d. data,
    BENCH_NOTES_r08); with a small c the exact re-rank restores
    near-brute-force recall for the same corpus scan."""
    if k < 1:
        raise ValueError("k must be >= 1")
    lut = _adc_lut(codebooks, query_vec)
    lut_col = F.array(*[F.array(*[F.lit(x) for x in row])
                        for row in lut])
    m = len(lut)
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at(lut_col, j + 1),
            F.element_at(F.col(codes_col), j + 1) + 1))
    adc = (codes_df
           .select(id_col, dround(dist, 6).alias("adc_dist"))
           .orderBy(F.asc("adc_dist"), F.asc(id_col)))
    if refine_mult is None:
        return adc.limit(k)
    if refine_mult < 1:
        raise ValueError("refine_mult must be >= 1")
    if vectors_df is None:
        raise ValueError("refine needs a vectors_df sidecar")
    cand = adc.limit(refine_mult * k)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    exact = dround(F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), q,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    return (vectors_df
            .join(F.broadcast(cand), on=id_col)
            .select(id_col, "adc_dist", exact.alias("exact_dist"))
            .orderBy(F.asc("exact_dist"), F.asc(id_col))
            .limit(k))


def pq_codes_sql(
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of pq_encode(literal): same slicing, same squared
    distances, same first-min argmin."""
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    # parenthesized: `x::DOUBLE[][1]` would parse the [1] as part of
    # the TYPE (array-of-array cast), not as list indexing
    v = f"({vec_col}::DOUBLE[])"
    cols = []
    for j in range(m):
        dists = []
        for c in range(k):
            terms = " + ".join(
                f"({v}[{j * dsub + t + 1}] - "
                f"({float(codebooks[j][c][t])!r}))"
                f" * ({v}[{j * dsub + t + 1}] - "
                f"({float(codebooks[j][c][t])!r}))"
                for t in range(dsub))
            dists.append(f"({terms})")
        # list_position(l, list_min(l)) - 1: first-min argmin, same
        # linear shape as the Spark side (the nested-CASE carry of a
        # running best doubles the TEXT per round — ~2^k characters
        # of SQL at k=16)
        darr = "[" + ", ".join(dists) + "]"
        cols.append(
            f"(list_position({darr}, list_min({darr})) - 1)")
    codes = "[" + ", ".join(cols) + "]"
    return f"SELECT {id_col}, {codes} AS codes FROM {table}"


def pq_topk_sql(
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of pq_encode + pq_topk (codes computed inline from
    the raw table, the same literal LUT fold, same rounding/ties)."""
    lut = _adc_lut(codebooks, query_vec)
    m = len(lut)
    lut_lit = ("([" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in lut
    ) + "]::DOUBLE[][])")
    return f"""
WITH codes_t AS ({pq_codes_sql(codebooks, table, id_col, vec_col)})
SELECT {id_col},
       round(list_sum(list_transform(range({m}),
             j -> ({lut_lit})[j + 1][codes[j + 1] + 1])), 6)
         AS adc_dist
FROM codes_t
ORDER BY adc_dist ASC, {id_col} ASC
LIMIT {k}
"""


def pq_topk_refine_sql(
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    refine_mult: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of pq_topk(refine_mult=..., vectors_df=...): the
    same ADC candidate cut (c·k by adc_dist, ties on id), then exact
    squared Euclidean from the raw vectors, re-ranked round-6."""
    adc = pq_topk_sql(codebooks, query_vec, k=refine_mult * k,
                      table=table, id_col=id_col, vec_col=vec_col)
    q = ("([" + ", ".join(repr(float(x)) for x in query_vec)
         + "]::DOUBLE[])")
    v = f"(t.{vec_col}::DOUBLE[])"
    d = len(query_vec)
    return f"""
WITH cand AS ({adc})
SELECT t.{id_col}, cand.adc_dist,
       round(list_sum(list_transform(range(1, {d + 1}),
             i -> ({v}[i] - {q}[i]) * ({v}[i] - {q}[i]))), 6)
         AS exact_dist
FROM {table} t JOIN cand ON t.{id_col} = cand.{id_col}
ORDER BY exact_dist ASC, t.{id_col} ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells (partition pruning) + PQ codes (byte storage)
# ---------------------------------------------------------------------------

def build_ivfpq_index(
    df: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    cell_centroids: list[list[float]] | None = None,
    mode: str = "overwrite",
    encode: str = "auto",
    store_vectors: bool = False,
) -> None:
    """The full faiss-shape index: vectors assign to a coarse cell
    (similarity.build_ivf_index semantics — partition pruning at
    query time) but each cell stores PQ CODES, not vectors — the
    layout where a 100 TB corpus's index is both partition-pruned
    AND ~32× smaller on disk/scan.

    Layout under `path`:
      data/       (id, codes array<int>) partitioned by cell
      centroids/  coarse cell centroids (ci, c)
      codebooks/  PQ codebooks (j, c, centroid array<double>)
      vectors/    (store_vectors=True) the ORIGINAL vectors
                  partitioned by the same cell — the refine sidecar:
                  a query's exact re-rank reads only the nprobe
                  pruned cell dirs, never the whole corpus
    """
    from .clustering import _assign

    if cell_centroids is not None:
        if len(cell_centroids) != n_cells:
            raise ValueError(
                f"{len(cell_centroids)} centroids but n_cells="
                f"{n_cells}")
        cents = [list(map(float, c)) for c in cell_centroids]
    else:
        sample = (df.orderBy(F.col(id_col)).limit(n_cells)
                  .select(F.col(vec_col).cast("array<double>")
                          .alias("c"))
                  .collect())
        cents = [list(r["c"]) for r in sample]
    v = df.select(F.col(id_col),
                  F.col(vec_col).cast("array<double>").alias("v"))
    assigned = (_assign(v, cents, "auto")
                .withColumnRenamed("cluster", "cell"))
    codes = pq_encode(assigned.select(id_col, F.col("v"), "cell"),
                      codebooks, id_col=id_col, vec_col="v",
                      encode=encode, keep_cols=("cell",))
    p = path.rstrip("/")
    (codes.write.mode(mode).partitionBy("cell").parquet(p + "/data"))
    if store_vectors:
        (assigned.select(id_col, F.col("v").alias(vec_col), "cell")
         .write.mode(mode).partitionBy("cell")
         .parquet(p + "/vectors"))
    spark = df.sparkSession
    (spark.createDataFrame([(i, c) for i, c in enumerate(cents)],
                           "ci int, c array<double>")
     .coalesce(1).write.mode(mode).parquet(p + "/centroids"))
    book_rows = [(j, c, list(map(float, codebooks[j][c])))
                 for j in range(len(codebooks))
                 for c in range(len(codebooks[0]))]
    (spark.createDataFrame(book_rows,
                           "j int, c int, centroid array<double>")
     .coalesce(1).write.mode(mode).parquet(p + "/codebooks"))


def load_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    rows = (spark.read.parquet(path.rstrip("/") + "/codebooks")
            .orderBy("j", "c").collect())
    m = max(r["j"] for r in rows) + 1
    k = max(r["c"] for r in rows) + 1
    books = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["j"]][r["c"]] = list(r["centroid"])
    if any(c is None for book in books for c in book):
        raise ValueError(f"incomplete PQ codebooks at {path}")
    return books


def ivfpq_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    nprobe: int = 4,
    refine_mult: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a build_ivfpq_index artifact: probe-cell
    selection against the tiny centroid table with the SAME metric
    the build's _assign used (round-6 cosine, first-max ties — a
    euclidean probe against a cosine-assigned layout reads the wrong
    cells), then a partition-pruned read of the nprobe matching cell
    dirs, then the pq_topk LUT fold over codes. nprobe = n_cells
    reproduces pq_topk over the full corpus exactly
    (equivalence-tested).

    `refine_mult=c` re-ranks the ADC top-(c·k) by exact distance
    from the index's `vectors/` sidecar (build with
    store_vectors=True) — the sidecar read is pruned to the SAME
    nprobe cells, so refine adds one partition-pruned scan of c·k-ish
    rows, not a corpus pass."""
    import math

    p = path.rstrip("/")
    books = load_pq_codebooks(spark, p)
    cents = {r["ci"]: list(r["c"])
             for r in spark.read.parquet(p + "/centroids").collect()}
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    sims = []
    for ci in sorted(cents):
        cv = cents[ci]
        cn = math.sqrt(sum(x * x for x in cv))
        dot = sum(float(a) * b for a, b in zip(query_vec, cv))
        s_ = round(dot / (qn * cn), 6) if qn > 0 and cn > 0 else 0.0
        sims.append((-s_, ci))
    sims.sort()
    probe = [ci for _, ci in sims[:nprobe]]
    codes = (spark.read.parquet(p + "/data")
             .filter(F.col("cell").isin(probe)))
    vectors = None
    if refine_mult is not None:
        vectors = (spark.read.parquet(p + "/vectors")
                   .filter(F.col("cell").isin(probe)))
    return pq_topk(codes, books, query_vec, k=k, id_col=id_col,
                   refine_mult=refine_mult, vectors_df=vectors,
                   vec_col=vec_col)
