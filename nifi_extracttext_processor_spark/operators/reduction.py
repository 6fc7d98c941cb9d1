"""Distributed PCA over embedding columns — dimension reduction /
whitening for the vector family (ANN, k-NN join, SemDeDup).

Classic preprocessing before similarity work: project d-dim
embeddings onto the top-k principal directions (and optionally
whiten), shrinking every downstream shuffle/index by d/k while
keeping most cosine structure. No MLlib: the fit is the textbook
covariance eigendecomposition with the DISTRIBUTED part reduced to
sufficient statistics.

Scale design:
- FIT: one Arrow pass computes per-partition sufficient statistics
  (n, sum x, sum x x^T flattened) — d(d+1)+1 doubles per partition,
  independent of row count — which partial-aggregate by position
  (posexplode -> sum by pos: map-side combinable, <= d^2+d+1 rows
  shuffle total). The driver does a d x d `numpy.linalg.eigh` (d is
  an embedding width, 64-4096: trivial). Deterministic sign
  convention (largest-|component| coordinate made positive) so fits
  are reproducible across runs/clusters.
- TRANSFORM: the (mean, components) matrix rides ONE SparkContext
  broadcast into a map-only Arrow matmul kernel (the _assign_arrow
  shape) — O(1) plan size in both d and k.

Iterative/eigen work is driver-side linear algebra (the kmeans_fit /
BPE-train posture), so the contract is pytest vs numpy's own PCA:
equality of subspaces, variance ordering, reconstruction optimality,
and end-to-end ANN-recall preservation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround



def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> "tuple[list[float], list[list[float]], list[float]]":
    """Fit PCA on an array<float|double> column. Returns
    (mean[d], components[k][d]  — rows are principal directions,
    explained_variance[k]). Rows with NULL vectors are ignored."""
    import numpy as np

    v = (df.select(F.col(vec_col).cast("array<double>").alias("v"))
         .filter(F.col("v").isNotNull()))

    first = v.first()
    if first is None:
        raise ValueError("pca_fit: no vectors")
    d = len(first["v"])
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")

    def stats(batches):
        import pandas as pd
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            n += X.shape[0]
            s += X.sum(axis=0)
            ss += X.T @ X
        out = np.concatenate(([float(n)], s, ss.ravel()))
        yield pd.DataFrame({"pos": np.arange(out.size), "val": out})

    sums = (v.mapInPandas(stats, "pos long, val double")
            .groupBy("pos").agg(F.sum("val").alias("val"))
            .collect())
    flat = np.zeros(1 + d + d * d)
    for r in sums:
        flat[r["pos"]] = r["val"]
    n = flat[0]
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    mean = flat[1:1 + d] / n
    cov = (flat[1 + d:].reshape(d, d) / n) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T               # k x d
    # deterministic sign: the largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = np.maximum(evals[order], 0.0)
    return mean.tolist(), comps.tolist(), ev.tolist()


def pca_transform(
    df: DataFrame,
    mean: "list[float]",
    components: "list[list[float]]",
    vec_col: str = "embedding",
    out_col: str = "reduced",
    whiten: bool = False,
    explained_variance: "list[float] | None" = None,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the fitted components: out = (x - mean) @
    components^T, optionally whitened (divided by sqrt(variance) —
    the isotropic form SemDeDup-style cosine work prefers). Map-only
    Arrow kernel; the projection matrix ships once per executor as a
    SparkContext broadcast. NULL vectors stay NULL."""
    import numpy as np

    if whiten and explained_variance is None:
        raise ValueError("whiten=True needs explained_variance")
    M = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    if whiten:
        scale = 1.0 / np.sqrt(np.asarray(explained_variance) + eps)
        M = M * scale[:, None]
    bc = df.sparkSession.sparkContext.broadcast((mu, M.T.copy()))
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    schema = ", ".join(fields + [f"{out_col} array<double>"])
    vc = vec_col

    def run(batches):
        mu_, MT = bc.value
        for pdf in batches:
            outs = []
            for x in pdf[vc]:
                if x is None:
                    outs.append(None)
                else:
                    outs.append(((np.asarray(x, dtype=np.float64)
                                  - mu_) @ MT).tolist())
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run, schema)


def pca_reference(
    X: "list[list[float]]",
    k: int,
) -> "tuple[list[float], list[list[float]], list[float]]":
    """Independent dense-numpy PCA (SVD form) for test goldens, same
    sign convention."""
    import numpy as np

    A = np.asarray(X, dtype=np.float64)
    mu = A.mean(axis=0)
    U, S, Vt = np.linalg.svd(A - mu, full_matrices=False)
    comps = Vt[:k]
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = (S[:k] ** 2) / A.shape[0]
    return mu.tolist(), comps.tolist(), ev.tolist()


def pca_transform_expr(
    df: DataFrame,
    mean: "list[float]",
    components: "list[list[float]]",
    vec_col: str = "embedding",
    out_prefix: str = "pc",
    round_dp: "int | None" = None,
) -> DataFrame:
    """Pure-Catalyst projection twin of pca_transform: one column
    `{out_prefix}{i+1}` per component, each an explicit left-
    associated sum  Σ_t (CAST(x[t] AS DOUBLE) − μ_t)·w_it  unrolled
    into the plan (the Hilbert unrolled-literal posture). No Python
    runs at execution time — the whole projection stays inside
    whole-stage codegen, which for small k is the cheapest possible
    transform (no Arrow hop, no batch materialization) AND gives a
    bit-exact DuckDB replay via pca_project_sql: both engines parse
    `+` left-associatively and every term is one IEEE double
    multiply, so the fold orders match term-for-term. The Arrow
    matmul kernel (pca_transform) remains the big-k path; pytest
    pins expr ≡ arrow on the same (mean, components).
    """
    cols = [df[c] for c in df.columns]
    outs = []
    for i, comp in enumerate(components):
        terms = None
        for t, (m, w) in enumerate(zip(mean, comp)):
            if w == 0.0:
                continue
            term = ((F.element_at(F.col(vec_col), t + 1)
                     .cast("double") - F.lit(float(m)))
                    * F.lit(float(w)))
            terms = term if terms is None else (terms + term)
        if terms is None:
            terms = F.lit(0.0)
        if round_dp is not None:
            terms = dround(terms, round_dp)
        outs.append(terms.alias(f"{out_prefix}{i + 1}"))
    return df.select(*cols, *outs)


def pca_project_sql(
    table: str,
    mean: "list[float]",
    components: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_prefix: str = "pc",
    round_dp: "int | None" = None,
) -> str:
    """DuckDB twin of pca_transform_expr — identical left-associated
    term chain over 1-based list indexing; CAST to DOUBLE before the
    subtraction on both sides so float32 storage promotes at the
    same point."""
    sel = [id_col]
    for i, comp in enumerate(components):
        terms = [
            f"(CAST({vec_col}[{t + 1}] AS DOUBLE) - {float(m)!r})"
            f" * {float(w)!r}"
            for t, (m, w) in enumerate(zip(mean, comp))
            if w != 0.0
        ] or ["CAST(0.0 AS DOUBLE)"]
        chain = " + ".join(terms)
        if round_dp is not None:
            # `+ 0.0` normalizes IEEE -0.0 to +0.0: Spark's round goes
            # through BigDecimal (which has no signed zero) while
            # DuckDB's round preserves the sign bit — same magnitude,
            # different serialized bytes.
            chain = f"round({chain}, {int(round_dp)}) + 0.0"
        sel.append(f"{chain} AS {out_prefix}{i + 1}")
    return f"SELECT {', '.join(sel)} FROM {table}"
