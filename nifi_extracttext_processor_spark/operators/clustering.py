"""DataFrame-native k-means + SemDeDup-style semantic deduplication.

Extends the dedup family (SURVEY §2 extension block) with the
cluster-then-prune pipeline of SemDeDup (Abbas et al. 2023,
arXiv:2303.09540): Lloyd k-means over embedding vectors, then
intra-cluster cosine pruning that keeps one representative per
near-duplicate neighborhood.

Everything is deterministic so a DuckDB oracle can replay it
value-for-value (the driver's correctness gate hash-compares):

  * init centroids = the k lowest-id vectors (same convention as
    build_ivf_index in operators/similarity.py);
  * assignment = first-max of round(cosine, 6) — ties break to the
    lowest centroid index on both engines;
  * centroid update = round(avg, 6) per dimension; empty clusters
    keep their previous centroid;
  * fixed iteration count (no convergence test — cross-engine float
    drift could disagree about "converged").

100 TB design:
  * centroids live on the driver (k*dim doubles) and are broadcast
    into a narrow projection — assignment itself shuffles NOTHING;
  * TWO assignment kernels behind one `_assign` dispatcher:
      - "literal" (small k): one Catalyst expression per centroid —
        whole-stage-codegen'd, UDF-free, and replayable term-for-term
        by the DuckDB oracle. Dies at large k: the plan carries k*dim
        literal nodes, and SemDeDup prescribes k ~ n/100 (10^4-10^5
        at corpus scale), i.e. 10^6-10^8 literals — Catalyst
        analysis/codegen falls over before any data moves.
      - "arrow" (large k): the centroid matrix is one numpy array in
        a SparkContext broadcast; each Arrow batch assigns via a
        single matmul against the pre-normalized centroid matrix.
        Still a narrow map-only projection — no shuffle, no join —
        and the plan size is O(1) in k. Differs from "literal" only
        where an unrounded cosine sits within float-summation
        distance of a round-6 tie boundary (numpy pairwise/BLAS
        summation vs Catalyst fold-left; equivalence-tested on the
        repo fixtures).
    "auto" switches on k*dim > _LITERAL_ASSIGN_MAX_TERMS, so the
    small-k driver/oracle queries keep the replayable plan and
    SemDeDup-scale k gets the O(1)-plan kernel.
  * the per-iteration centroid update has the same two regimes:
    small k = the oracle-replayable (cluster, pos) partial-mean agg
    (map-side combinable, k*dim rows per partition); large k = an
    Arrow scatter-add of per-batch (cluster, sum, count) partials
    combined per cluster — the driver receives k rows of dim-length
    arrays instead of k*dim scalar rows.
  * semantic_dedup's pairwise stage joins co-partitioned on the
    cluster key (SemDeDup's point: k is chosen large, so clusters are
    small and the quadratic stays per-cluster local); only dominated
    ids shuffle back for the anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


from ..functions.portable import cosine_sql, l2_normalize_sql
from .dedup import cosine


# Above this many k*dim expression terms the literal assignment plan
# stops being viable (Catalyst analysis/codegen cost grows with plan
# size; SemDeDup-scale k would put 10^6-10^8 literal nodes in the
# plan) — "auto" switches to the Arrow matmul kernel.
_LITERAL_ASSIGN_MAX_TERMS = 1 << 15

# Per-tile edge for the per-cluster similarity kernels (r17 skew
# guard): a cluster of m rows needs an m x m similarity — fine at the
# SemDeDup-prescribed k ~ n/100 (~100-row clusters) but O(m^2) worker
# memory under a degenerate/skewed clustering (many identical
# vectors landing in one group). Above this edge the kernels switch
# to B x B tiles, capping similarity memory at ~B^2*8 bytes per tile
# (128 MB at the default) for ANY cluster size; per-ELEMENT values
# are unchanged (the exact path accumulates per-dimension outer
# products in the same index order tile-by-tile; the gemm path
# rounds the same per-pair dot), and clusters at or under the edge
# run the pre-r17 single-shot code byte-for-byte.
_PRUNE_BLOCK = 4096


def _dominated_blocked(Xa, Xb, predicate, upper_only, gemm,
                       block=None):
    """For each column j of the similarity matrix S = Xa @ Xb.T (rows
    = Xa, cols = Xb, both L2-normalized), whether any row i satisfies
    `predicate(S_tile)` — restricted to global i < j when upper_only
    (the min-id rule's strict upper triangle; requires Xa is Xb).
    Tiled so no allocation exceeds block x block. `predicate` maps a
    float tile to a bool tile and owns the exact/gemm comparison
    semantics. gemm=False computes tiles by the EXACT index-ordered
    per-dimension outer-product fold — every element equals the
    unblocked fold bit-for-bit regardless of tiling; gemm=True uses
    the BLAS matmul per tile (the scale kernel — its contract already
    waives summation-order ulps vs the exact path)."""
    import numpy as np
    b = int(block or _PRUNE_BLOCK)
    m, dim = Xa.shape
    n = Xb.shape[0]
    out = np.zeros(n, dtype=bool)
    for j0 in range(0, n, b):
        j1 = min(j0 + b, n)
        Xj = Xb[j0:j1]
        i_stop = min(j1, m) if upper_only else m
        for i0 in range(0, i_stop, b):
            i1 = min(i0 + b, i_stop)
            if gemm:
                t = Xa[i0:i1] @ Xj.T
            else:
                t = np.zeros((i1 - i0, j1 - j0))
                for d in range(dim):
                    t = t + np.multiply.outer(Xa[i0:i1, d], Xj[:, d])
            hit = predicate(t)
            if upper_only and i1 > j0:
                hit &= (np.arange(i0, i1)[:, None]
                        < np.arange(j0, j1)[None, :])
            out[j0:j1] |= hit.any(axis=0)
    return out


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    sample_fraction: float | None = None,
    seed: int = 13,
    assign: str = "auto",
    metric: str = "cosine",
) -> list[list[float]]:
    """Lloyd iterations; returns the final centroids (driver-side
    k*dim list). Deterministic as described in the module docstring.

    `sample_fraction` is the 100 TB pattern: fit the centroids on a
    Bernoulli sample (each iteration scans only the sample), then
    assign the FULL corpus once with the returned centroids — Lloyd
    converges to near-identical centroids on a large-enough sample at
    a fraction of the scan cost. The sampled path is seed-stable for
    a fixed partitioning but is NOT the oracle-replayable path; the
    driver/oracle queries use the default full-fit.

    `assign` in {"auto", "literal", "arrow"} picks the assignment
    kernel (module docstring); it also selects the matching centroid
    update — the literal regime's (cluster, pos) scalar agg is
    oracle-replayable, the arrow regime's scatter-add partials keep
    the driver transfer at k rows instead of k*dim.

    `metric`: "cosine" (the SemDeDup convention, first-max of
    round-6 similarity) or "l2" (squared Euclidean, first-min —
    the Lloyd objective PQ sub-space training needs so the training
    metric agrees with pq_encode/ADC's Euclidean assignment, per
    Jégou 2011)."""
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError("sample_fraction must be in (0, 1]")
        v = v.sample(fraction=sample_fraction, seed=seed)
    cents = [list(r["v"]) for r in
             v.orderBy("_id").limit(k).select("v").collect()]
    if not cents:
        raise ValueError("kmeans_fit: empty input")
    dim = len(cents[0])
    method = _resolve_assign(assign, len(cents), dim)
    for _ in range(iters):
        if method == "arrow":
            # fused assign+partials kernel: ONE Python crossing per
            # iteration instead of two chained mapInPandas evals
            # (each chained Python operator costs its own worker per
            # task and a full Arrow round-trip of every vector)
            cents = _centroid_means_arrow(
                _assign_partials_arrow(v, cents, metric=metric),
                cents, dim, prepartialed=True)
            continue
        assigned = _assign(v, cents, method, metric=metric)
        rows = (assigned
                .select("cluster", F.posexplode("v").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(dround(F.avg("val"), 6).alias("m"))
                .collect())
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [[by_cluster[ci][p] for p in range(dim)]
                 if ci in by_cluster else cents[ci]
                 for ci in range(len(cents))]
    return cents


def _resolve_assign(assign: str, k: int, dim: int) -> str:
    if assign not in ("auto", "literal", "arrow"):
        raise ValueError(f"unknown assignment method {assign!r}")
    if assign != "auto":
        return assign
    return "literal" if k * dim <= _LITERAL_ASSIGN_MAX_TERMS \
        else "arrow"


def _assign(v: DataFrame, cents: list[list[float]],
            method: str = "auto", metric: str = "cosine") -> DataFrame:
    """(..., v) + broadcast centroids -> (..., v, cluster). Narrow (no
    shuffle, no join) in BOTH kernels. metric="cosine": one round-6
    cosine per centroid, first-max wins so ties take the lowest
    centroid index. metric="l2": round-6 squared Euclidean, first-MIN
    wins — the Lloyd objective pq_train needs so training agrees with
    the ADC search metric."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    method = _resolve_assign(method, len(cents), len(cents[0]))
    if method == "arrow":
        return _assign_arrow(v, cents, metric=metric)
    if metric == "l2":
        dists = F.array(*[
            dround(F.aggregate(
                F.zip_with(F.col("v"),
                           F.array(*[F.lit(float(x)) for x in cv]),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x), 6)
            for cv in cents])
        return (v.withColumn("_d", dists)
                 .withColumn("cluster",
                             (F.array_position(F.col("_d"),
                                               F.array_min(F.col("_d")))
                              - F.lit(1)).cast("int"))
                 .drop("_d"))
    sims = F.array(*[
        dround(cosine(F.col("v"),
                       F.array(*[F.lit(float(x)) for x in cv])), 6)
        for cv in cents])
    return (v.withColumn("_sims", sims)
             .withColumn("cluster",
                         (F.array_position(F.col("_sims"),
                                           F.array_max(F.col("_sims")))
                          - F.lit(1)).cast("int"))
             .drop("_sims"))


def _assign_arrow(v: DataFrame, cents: list[list[float]],
                  metric: str = "cosine") -> DataFrame:
    """Large-k assignment: the k*dim centroid matrix travels ONCE per
    executor as a SparkContext broadcast (not as plan literals, not in
    every task closure); each Arrow batch is one matmul against the
    pre-normalized centroid matrix. Cosine/tie semantics mirror the
    literal kernel: zero-norm rows/centroids get similarity 0.0,
    round-6, argmax takes the first (lowest-index) maximum.
    metric="l2" assigns by round-6 squared Euclidean (first-min),
    computed exactly as pairwise differences so it matches the
    literal zip_with fold term-for-term away from tie boundaries."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    if metric == "l2":
        bc = v.sparkSession.sparkContext.broadcast(C.copy())
    else:
        cn = np.sqrt((C * C).sum(axis=1))
        Cn = np.divide(C, cn[:, None], out=np.zeros_like(C),
                       where=cn[:, None] > 0)
        bc = v.sparkSession.sparkContext.broadcast(Cn.T.copy())

    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in v.schema.fields]
    schema = ", ".join(fields + ["cluster int"])

    def run(batches):
        import pandas as pd  # noqa: F401  (arrow batches are pandas)
        M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if metric == "l2":
                D = np.round(
                    ((X[:, None, :] - M[None, :, :]) ** 2).sum(axis=2),
                    6)
                pdf["cluster"] = D.argmin(axis=1).astype("int32")
            else:
                xn = np.sqrt((X * X).sum(axis=1))
                Xn = np.divide(X, xn[:, None], out=np.zeros_like(X),
                               where=xn[:, None] > 0)
                S = np.round(Xn @ M, 6)
                pdf["cluster"] = S.argmax(axis=1).astype("int32")
            yield pdf

    return v.mapInPandas(run, schema=schema)


def _assign_partials_arrow(
    v: DataFrame,
    cents: list[list[float]],
    metric: str = "cosine",
) -> DataFrame:
    """Fused Lloyd-iteration kernel: assignment (same matmul/argmax
    math as _assign_arrow, batch for batch) immediately followed by
    the per-batch scatter-add partials of _centroid_means_arrow, in
    ONE mapInPandas — the assigned vectors never travel back to the
    JVM. Returns the (cluster, s, n) partial frame the combine stage
    consumes; values are bit-identical to the unfused chain because
    the per-batch inputs and the numpy ops are unchanged."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    if metric == "l2":
        bc = v.sparkSession.sparkContext.broadcast(C.copy())
    else:
        cn = np.sqrt((C * C).sum(axis=1))
        Cn = np.divide(C, cn[:, None], out=np.zeros_like(C),
                       where=cn[:, None] > 0)
        bc = v.sparkSession.sparkContext.broadcast(Cn.T.copy())

    def run(batches):
        import pandas as pd
        M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if metric == "l2":
                D = np.round(
                    ((X[:, None, :] - M[None, :, :]) ** 2).sum(axis=2),
                    6)
                cl = D.argmin(axis=1).astype("int32")
            else:
                xn = np.sqrt((X * X).sum(axis=1))
                Xn = np.divide(X, xn[:, None], out=np.zeros_like(X),
                               where=xn[:, None] > 0)
                S = np.round(Xn @ M, 6)
                cl = S.argmax(axis=1).astype("int32")
            uniq, inv = np.unique(cl, return_inverse=True)
            sums = np.zeros((len(uniq), X.shape[1]))
            np.add.at(sums, inv, X)
            counts = np.bincount(inv, minlength=len(uniq))
            yield pd.DataFrame({
                "cluster": uniq.astype("int32"),
                "s": list(sums),
                "n": counts.astype("int64"),
            })

    return v.mapInPandas(run, "cluster int, s array<double>, n long")


def _centroid_means_arrow(
    assigned: DataFrame,
    prev: list[list[float]],
    dim: int,
    prepartialed: bool = False,
) -> list[list[float]]:
    """Large-k Lloyd update: per-Arrow-batch scatter-add partials
    (cluster, sum-vector, count) — at most |clusters-in-batch| rows
    per batch, each dim-wide — combined per cluster, so the shuffle
    and the driver transfer are O(k) ARRAY rows, never the k*dim
    scalar rows of the literal regime. round(mean, 6) matches the
    literal update; empty clusters keep their previous centroid.
    `prepartialed=True` means `assigned` already IS the (cluster, s,
    n) partial frame (_assign_partials_arrow)."""
    import numpy as np

    def partials(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cl = pdf["cluster"].to_numpy()
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            uniq, inv = np.unique(cl, return_inverse=True)
            sums = np.zeros((len(uniq), X.shape[1]))
            np.add.at(sums, inv, X)
            counts = np.bincount(inv, minlength=len(uniq))
            yield pd.DataFrame({
                "cluster": uniq.astype("int32"),
                "s": list(sums),
                "n": counts.astype("int64"),
            })

    def combine(pdf):
        import pandas as pd
        S = np.asarray(pdf["s"].tolist(), dtype=np.float64).sum(axis=0)
        n = int(pdf["n"].sum())
        # scalars, not sliced Series — a Series with a non-zero index
        # would misalign against the fresh-index list column
        return pd.DataFrame({
            "cluster": [int(pdf["cluster"].iloc[0])],
            "m": [list(np.round(S / n, 6))],
        })

    part = assigned if prepartialed else \
        assigned.select("cluster", "v").mapInPandas(
            partials, "cluster int, s array<double>, n long")
    got = (part.groupBy("cluster")
           .applyInPandas(combine, "cluster int, m array<double>")
           .toPandas())
    cents = [list(c) for c in prev]
    for ci, m in zip(got["cluster"], got["m"]):
        cents[int(ci)] = list(m)
    return cents


def kmeans_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    centroids: list[list[float]] | None = None,
    assign: str = "auto",
) -> DataFrame:
    """(id_col, cluster int) for every row — fit + final assignment.
    Pass precomputed `centroids` (from kmeans_fit) to share one fit
    across several downstream stages. `assign` picks the assignment
    kernel (module docstring; "auto" = literal below
    _LITERAL_ASSIGN_MAX_TERMS expression terms, Arrow matmul above)."""
    cents = centroids if centroids is not None else kmeans_fit(
        df, id_col, vec_col, k, iters, assign=assign)
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    return (_assign(v, cents, assign)
            .select(F.col("_id").alias(id_col), "cluster"))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    method: str = "exact",
    assign: str = "auto",
) -> DataFrame:
    """SemDeDup: k-means cluster, then drop every row that has a
    LOWER-id row in the same cluster with round(cosine, 6) >=
    threshold. Returns the kept (id_col, cluster) rows.

    The min-id survivor rule is the same convention as the exact /
    MinHash / SimHash dedup keep rules in operators/dedup.py, and it
    makes the prune order-free and oracle-replayable (the paper keeps
    an arbitrary representative per neighborhood).

    method:
      * "exact" — Catalyst pair join on the cluster key with fold-left
        dot products: every arithmetic step is replayed by
        semantic_dedup_sql, so this is the driver/oracle path.
      * "gemm"  — the 100 TB path: one Arrow batch per cluster through
        applyInPandas, similarity matrix as a single numpy matmul; no
        pair rows ever materialize in the plan, the shuffle moves each
        vector ONCE (to its cluster) instead of once per candidate
        pair. Same min-id rule; differs from "exact" only where a
        similarity sits within float-summation distance of the
        round-6 threshold boundary (numpy pairwise summation vs
        fold-left; equivalence-tested on the repo fixtures).

    Capacity guidance (measured r13, BENCH_NOTES_r13): the gemm
    path's win is SHUFFLE VOLUME (each vector moves once vs once per
    candidate pair), so it pays off as clusters grow; below ~128
    vectors/cluster the bounded exact join is competitive or ahead
    single-node (sf1, k=n/100: exact 5.8 s vs gemm 7.1 s) while at
    250-vector clusters gemm already wins (sf0.1, k=8: 4.8 s vs
    6.9 s). Both paths keep the identical min-id rule.

    The input is _spread once up front (assignment/cosine cost tracks
    rows, not file bytes; no-op on wide scans). When a spread actually
    happens (tiny single-file input) the result is persisted via the
    lifecycle tracker: kmeans_fit traverses the input once per
    iteration, and separate DataFrame actions do NOT reuse exchange
    output, so an unpersisted spread re-pays its shuffle per
    traversal (measured: the k=256 arrow bench regressed 3.2 s ->
    4.7 s at sf0.1 from exactly that). At scale _spread is a no-op
    and nothing is cached.

    `assign` picks the cluster-assignment kernel (module docstring) —
    at SemDeDup-prescribed k (~n/100) pair "gemm" with the automatic
    Arrow assignment: the whole pipeline is then one broadcast matmul
    projection plus one vectors-move-once shuffle."""
    if method not in ("exact", "gemm"):
        raise ValueError(f"unknown semantic_dedup method {method!r}")
    from .dedup import _spread
    from .lifecycle import track_persist
    spread = _spread(df)
    if spread is not df:
        spread = track_persist(spread)
    df = spread
    cents = centroids if centroids is not None else kmeans_fit(
        df, id_col, vec_col, k, iters, assign=assign)
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    blk = _PRUNE_BLOCK  # bound at build time: ships inside the
    # pickled kernels (a worker re-import would not see an override)
    if method == "gemm":
        af = _assign(v, cents, assign)
        id_type = dict((f.name, f.dataType.simpleString())
                       for f in df.schema.fields)[id_col]
        out_schema = f"`{id_col}` {id_type}, cluster int"

        def prune(pdf):
            import numpy as np
            import pandas as pd
            pdf = pdf.sort_values("_id", kind="stable")
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            norms = np.sqrt((X * X).sum(axis=1))
            nz = norms > 0
            X[nz] = X[nz] / norms[nz, None]
            X[~nz] = 0.0
            if X.shape[0] <= blk:
                S = np.round(X @ X.T, 6) >= threshold
                np.fill_diagonal(S, False)
                dominated = np.triu(S, 1).any(axis=0)
            else:
                # skew guard: tile the m x m similarity (module
                # docstring at _PRUNE_BLOCK) — same rounded-gemm
                # compare per pair, bounded memory per tile
                dominated = _dominated_blocked(
                    X, X, lambda t: np.round(t, 6) >= threshold,
                    upper_only=True, gemm=True, block=blk)
            kept = pdf.loc[~dominated]
            return pd.DataFrame({id_col: kept["_id"].values,
                                 "cluster": kept["cluster"].values})

        return af.groupBy("cluster").applyInPandas(prune, out_schema)
    # "exact": same cluster-grouped kernel shape as "gemm" (each
    # vector shuffles ONCE, to its cluster, instead of riding both
    # sides of a pair join plus the anti-join), but the kernel
    # replays Catalyst's arithmetic TERM FOR TERM — the historical
    # pair join evaluated `fold-left(zip_with(na, nb, *), 0.0, +)`
    # per pair through interpreted higher-order functions, the
    # hottest expression in the bench. Exactness argument:
    #   * l2 norm: per-dimension `n2 = n2 + x_i * x_i` accumulated in
    #     index order == F.aggregate's left fold; sqrt, the per-
    #     element division, and the zero-vector `x * 0.0` arm are
    #     single IEEE ops on both sides;
    #   * pair dot: `S = S + outer(Xn[:,i], Xn[:,i])` accumulates the
    #     products in the same index order as the zip_with fold;
    #   * `dround(dot, 6) >= threshold` is monotone in dot, so it is
    #     solved ONCE on the driver into a plain boundary compare
    #     (rounding.dround_ge_boundary); NaN compares greater than
    #     everything in Spark's ordering, hence the isnan OR.
    from .rounding import dround_ge_boundary

    bound = dround_ge_boundary(threshold, 6)
    af = _assign(v, cents, assign)
    id_type = dict((f.name, f.dataType.simpleString())
                   for f in df.schema.fields)[id_col]
    out_schema = f"`{id_col}` {id_type}, cluster int"

    def prune_exact(pdf):
        import numpy as np
        import pandas as pd
        pdf = pdf.sort_values("_id", kind="stable")
        X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        m, dim = X.shape
        n2 = np.zeros(m)
        for i in range(dim):
            n2 = n2 + X[:, i] * X[:, i]
        norm = np.sqrt(n2)
        nz = norm > 0
        Xn = np.empty_like(X)
        Xn[nz] = X[nz] / norm[nz, None]
        Xn[~nz] = X[~nz] * 0.0
        if m <= blk:
            S = np.zeros((m, m))
            for i in range(dim):
                S = S + np.multiply.outer(Xn[:, i], Xn[:, i])
            mask = (S >= bound) | np.isnan(S)
            dominated = np.triu(mask, 1).any(axis=0)
        else:
            # skew guard (_PRUNE_BLOCK): tiled index-ordered fold —
            # bit-identical elements, bounded memory per tile
            dominated = _dominated_blocked(
                Xn, Xn, lambda t: (t >= bound) | np.isnan(t),
                upper_only=True, gemm=False, block=blk)
        kept = pdf.loc[~dominated]
        return pd.DataFrame({id_col: kept["_id"].values,
                             "cluster": kept["cluster"].values})

    return af.groupBy("cluster").applyInPandas(prune_exact, out_schema)


# ------------------------------------------------------------ oracles


def _kmeans_ctes(table: str, id_col: str, vec_col: str, k: int,
                 iters: int, dim: int) -> tuple[str, str]:
    """WITH-chain replaying kmeans_fit + final assignment in DuckDB.
    Returns (cte_sql, final_assignment_name)."""
    cos = cosine_sql("t.v", "t.c")
    parts = [
        f"v AS (SELECT {id_col} AS vid, {vec_col}::DOUBLE[] AS v "
        f"FROM {table})",
        f"c0 AS (SELECT (row_number() OVER (ORDER BY vid)) - 1 AS ci, "
        f"v AS c FROM (SELECT vid, v FROM v ORDER BY vid LIMIT {k}))",
    ]

    def assign(name: str, cents: str) -> str:
        return (
            f"{name} AS (SELECT vid, v, CAST(cluster AS INTEGER) AS "
            f"cluster FROM (SELECT t.vid, t.v, t.ci AS cluster, "
            f"row_number() OVER (PARTITION BY t.vid ORDER BY "
            f"round({cos}, 6) DESC, t.ci ASC) AS rn "
            f"FROM (SELECT v.vid, v.v, {cents}.ci, {cents}.c "
            f"FROM v CROSS JOIN {cents}) t) WHERE rn = 1)")

    cents = "c0"
    for it in range(iters):
        parts.append(assign(f"a{it}", cents))
        parts.append(
            f"cm{it + 1} AS (SELECT cluster, p.pos AS pos, "
            f"round(avg(v[p.pos]), 6) AS m FROM a{it} CROSS JOIN "
            f"(SELECT unnest(range(1, {dim + 1})) AS pos) p "
            f"GROUP BY cluster, p.pos)")
        parts.append(
            f"c{it + 1} AS (SELECT cluster AS ci, list(m ORDER BY pos) "
            f"AS c FROM cm{it + 1} GROUP BY cluster UNION ALL "
            f"SELECT ci, c FROM {cents} WHERE ci NOT IN "
            f"(SELECT DISTINCT cluster FROM a{it}))")
        cents = f"c{it + 1}"
    parts.append(assign("af", cents))
    return "WITH " + ",\n".join(parts), "af"


def kmeans_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB twin of kmeans_embeddings."""
    ctes, af = _kmeans_ctes(table, id_col, vec_col, k, iters, dim)
    return (f"{ctes}\nSELECT vid AS {id_col}, cluster FROM {af} "
            f"ORDER BY {id_col}")


def semantic_dedup_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin of semantic_dedup (same pre-normalized dot)."""
    ctes, af = _kmeans_ctes(table, id_col, vec_col, k, iters, dim)
    ndot = ("list_sum(list_transform(list_zip(a.nv, b.nv), "
            "p -> p[1] * p[2]))")
    return (
        f"{ctes},\n"
        f"afn AS (SELECT vid, cluster, {l2_normalize_sql('v')} "
        f"AS nv FROM {af}),\n"
        f"dom AS (SELECT DISTINCT b.vid AS vid FROM afn a "
        f"JOIN afn b ON a.cluster = b.cluster AND a.vid < b.vid "
        f"WHERE round({ndot}, 6) >= {threshold!r})\n"
        f"SELECT vid AS {id_col}, cluster FROM {af} "
        f"WHERE vid NOT IN (SELECT vid FROM dom) ORDER BY {id_col}")


def semantic_dedup_incremental(
    batch: DataFrame,
    catalog: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    k: int = 8,
    iters: int = 2,
    assign: str = "auto",
) -> DataFrame:
    """Incremental SemDeDup: prune a NEW batch against the already-kept
    catalog. A batch row is dropped when a catalog row in its cluster
    sits at round(cosine, 6) >= threshold (catalog rows always win —
    they were kept first), or when a lower-id batch row does (the
    within-batch min-id rule of semantic_dedup). Returns the kept
    batch rows (id_col, cluster).

    Centroids default to kmeans_fit on the CATALOG: the catalog owns
    the cluster geometry, so assignment stays stable as batches stream
    in (the append-only twin of operators/dedup.py's
    dedup_exact_incremental, and the batch form of what a foreachBatch
    streaming sink would run per micro-batch). Bootstrap: an EMPTY
    catalog (the first micro-batch) fits centroids on the batch
    itself and degrades to plain within-batch semantic_dedup."""
    if centroids is not None:
        cents = centroids
    elif catalog.limit(1).count() == 0:
        cents = kmeans_fit(batch, id_col, vec_col, k, iters,
                           assign=assign)
    else:
        cents = kmeans_fit(catalog, id_col, vec_col, k, iters,
                           assign=assign)

    def prep(df: DataFrame) -> DataFrame:
        v = df.select(F.col(id_col).alias("_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
        return _assign(v, cents, assign)

    # cluster-cogrouped kernel (r16): the historical twin pair joins
    # (batch x catalog, batch x batch) shuffled every vector once per
    # candidate pair and paid the interpreted zip_with fold per pair;
    # the cogroup moves each vector ONCE to its cluster and replays
    # the fold-left arithmetic exactly (same exactness argument as
    # semantic_dedup's exact kernel: index-ordered accumulation,
    # boundary-solved dround compare, NaN-greatest OR).
    from .rounding import dround_ge_boundary

    bound = dround_ge_boundary(threshold, 6)
    blk = _PRUNE_BLOCK  # build-time bind (see semantic_dedup)
    ab = prep(batch)
    ac = prep(catalog)
    id_type = dict((f.name, f.dataType.simpleString())
                   for f in batch.schema.fields)[id_col]
    out_schema = f"`{id_col}` {id_type}, cluster int"

    def _norm_foldleft(X):
        import numpy as np
        m, dim = X.shape
        n2 = np.zeros(m)
        for i in range(dim):
            n2 = n2 + X[:, i] * X[:, i]
        norm = np.sqrt(n2)
        nz = norm > 0
        Xn = np.empty_like(X)
        Xn[nz] = X[nz] / norm[nz, None]
        Xn[~nz] = X[~nz] * 0.0
        return Xn

    def prune_inc(bpdf, cpdf):
        import numpy as np
        import pandas as pd
        if len(bpdf) == 0:
            return pd.DataFrame({id_col: [], "cluster": []}).astype(
                {"cluster": "int32"})
        bpdf = bpdf.sort_values("_id", kind="stable")
        Xb = _norm_foldleft(
            np.asarray(bpdf["v"].tolist(), dtype=np.float64))
        m, dim = Xb.shape
        dominated = np.zeros(m, dtype=bool)
        if len(cpdf) > 0:
            Xc = _norm_foldleft(
                np.asarray(cpdf["v"].tolist(), dtype=np.float64))
            if m * Xc.shape[0] <= blk * blk:
                S = np.zeros((m, Xc.shape[0]))
                for i in range(dim):
                    S = S + np.multiply.outer(Xb[:, i], Xc[:, i])
                dominated |= ((S >= bound) | np.isnan(S)).any(axis=1)
            else:
                # skew guard (_PRUNE_BLOCK): tiled, catalog rows x
                # batch cols — IEEE multiply commutes, so the
                # transposed elements are bit-identical
                dominated |= _dominated_blocked(
                    Xc, Xb, lambda t: (t >= bound) | np.isnan(t),
                    upper_only=False, gemm=False, block=blk)
        if m <= blk:
            S = np.zeros((m, m))
            for i in range(dim):
                S = S + np.multiply.outer(Xb[:, i], Xb[:, i])
            mask = (S >= bound) | np.isnan(S)
            dominated |= np.triu(mask, 1).any(axis=0)
        else:
            dominated |= _dominated_blocked(
                Xb, Xb, lambda t: (t >= bound) | np.isnan(t),
                upper_only=True, gemm=False, block=blk)
        kept = bpdf.loc[~dominated]
        return pd.DataFrame({id_col: kept["_id"].values,
                             "cluster": kept["cluster"].values})

    return (ab.groupBy("cluster")
            .cogroup(ac.groupBy("cluster"))
            .applyInPandas(prune_inc, out_schema))


def semantic_dedup_incremental_sql(
    table: str = "embeddings",
    catalog_where: str = "vec_id % 2 = 0",
    batch_where: str = "vec_id % 2 = 1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin: kmeans over the catalog subset, assign both sides,
    prune the batch against catalog-first + min-id-within-batch."""
    ctes, af = _kmeans_ctes(
        f"(SELECT * FROM {table} WHERE {catalog_where})",
        id_col, vec_col, k, iters, dim)
    ndot = ("list_sum(list_transform(list_zip(a.nv, b.nv), "
            "p -> p[1] * p[2]))")
    cents = f"c{iters}"
    cos = cosine_sql("t.v", "t.c")
    # assign an arbitrary side with the final centroids (mirrors
    # _kmeans_ctes' assign() but over a caller-chosen source)
    assign = (
        "SELECT vid, v, CAST(cluster AS INTEGER) AS cluster FROM ("
        "SELECT t.vid, t.v, t.ci AS cluster, row_number() OVER ("
        f"PARTITION BY t.vid ORDER BY round({cos}, 6) DESC, t.ci ASC"
        ") AS rn FROM (SELECT s.vid, s.v, c.ci, c.c FROM {src} s "
        f"CROSS JOIN {cents} c) t) WHERE rn = 1")
    normed = (f"SELECT vid, cluster, {l2_normalize_sql('v')} "
              "AS nv FROM {src}")
    return (
        f"{ctes},\n"
        f"bv AS (SELECT {id_col} AS vid, {vec_col}::DOUBLE[] AS v "
        f"FROM {table} WHERE {batch_where}),\n"
        f"ba AS ({assign.replace('{src}', 'bv')}),\n"
        f"bn AS ({normed.replace('{src}', 'ba')}),\n"
        f"cn AS ({normed.replace('{src}', af)}),\n"
        f"dom AS (\n"
        f"  SELECT a.vid FROM bn a JOIN cn b USING (cluster) "
        f"WHERE round({ndot}, 6) >= {threshold!r}\n"
        f"  UNION\n"
        f"  SELECT b.vid FROM bn a JOIN bn b ON a.cluster = b.cluster "
        f"AND a.vid < b.vid WHERE round({ndot}, 6) >= {threshold!r})\n"
        f"SELECT vid AS {id_col}, cluster FROM ba "
        f"WHERE vid NOT IN (SELECT vid FROM dom) ORDER BY {id_col}")


# ---------------------------------------------------------------------------
# topic discovery: hashed-TF -> k-means -> distinctive terms per cluster
# ---------------------------------------------------------------------------

def topic_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    dim: int = 64,
    iters: int = 2,
    top_n: int = 5,
    assign: str = "auto",
) -> DataFrame:
    """Corpus topic discovery with zero external models: hashed-TF
    vectors (text_analysis.hashed_tf_embedding) → deterministic
    k-means assignment (kmeans_embeddings) → the `top_n` most
    DISTINCTIVE terms per cluster, scored cluster-level TF-IDF style:
    score = count_in_cluster · ln(k_eff / n_clusters_containing_term)
    with k_eff = the number of NON-EMPTY clusters (nominal k would
    leave a true stopword scoring ln(k/k_eff) > 0 whenever Lloyd
    leaves clusters empty), round-6 — terms present in every
    populated cluster score 0 and fall away: stopwords eliminate
    themselves. Output (cluster, term, cnt, score, rk).

    Plan: one fit (driver-side centroids, broadcast back as
    literals), assignment is a narrow projection; term counting is
    one explode + two map-side-combinable aggs; the final rank is a
    per-cluster window over ≤ |vocab| rows. Every stage reuses the
    exact conventions of its standalone op, so the DuckDB twin
    (topic_clusters_sql) replays the whole composition."""
    from .text_analysis import hashed_tf_embedding

    tf = hashed_tf_embedding(docs, id_col=id_col, text_col=text_col,
                             dim=dim)
    assigned = kmeans_embeddings(tf, id_col=id_col,
                                 vec_col="embedding", k=k,
                                 iters=iters, assign=assign)
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("term"))
        .filter(F.length("term") > 0))
    ct = (toks.join(assigned, id_col)
          .groupBy("cluster", "term")
          .agg(F.count("*").alias("cnt")))
    df_t = ct.groupBy("term").agg(F.count("*").alias("df_t"))
    k_eff = ct.select(F.countDistinct("cluster").alias("k_eff"))
    scored = (ct.join(df_t, "term")
              .crossJoin(F.broadcast(k_eff))
              .withColumn("score", dround(
                  F.col("cnt")
                  * F.log(F.col("k_eff").cast("double")
                          / F.col("df_t")), 6))
              .drop("k_eff"))
    from pyspark.sql import Window
    w = (Window.partitionBy("cluster")
         .orderBy(F.desc("score"), F.asc("term")))
    return (scored
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_n)
            .select("cluster", "term", "cnt", "score",
                    F.col("rk").cast("long").alias("rk")))


def topic_clusters_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    k: int = 8,
    dim: int = 64,
    iters: int = 2,
    top_n: int = 5,
) -> str:
    """DuckDB twin of topic_clusters: the hashed-TF query feeds the
    unrolled kmeans replay as a FROM-subquery, then the same
    count/df/score/rank chain."""
    from .text_analysis import hashed_tf_embedding_sql

    tf = hashed_tf_embedding_sql(table=table, id_col=id_col,
                                 text_col=text_expr, dim=dim)
    ctes, af = _kmeans_ctes(f"({tf})", id_col, "embedding", k,
                            iters, dim)
    return f"""
{ctes},
toks AS (
  SELECT {id_col}, t.term AS term
  FROM {table}, unnest(string_split_regex(lower(trim({text_expr})),
                                          '\\s+')) AS t(term)
  WHERE len(t.term) > 0),
ct AS (
  SELECT a.cluster, t.term, count(*) AS cnt
  FROM toks t JOIN {af} a ON a.vid = t.{id_col}
  GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df_t FROM ct GROUP BY term),
keff AS (SELECT count(DISTINCT cluster) AS k_eff FROM ct),
scored AS (
  SELECT c.cluster, c.term, c.cnt,
         round(c.cnt * ln(e.k_eff::DOUBLE / d.df_t), 6) AS score
  FROM ct c JOIN dft d USING (term) CROSS JOIN keff e),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster
            ORDER BY score DESC, term ASC) AS rk
  FROM scored)
SELECT cluster, term, cnt, score, rk FROM ranked WHERE rk <= {top_n}
"""
