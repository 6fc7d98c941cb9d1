"""Vectorized MD5 Poisson-bootstrap weight kernel (guide §4.2).

The bootstrap operators' declared semantics hash md5(id || '#' || b ||
'#' || seed) once per (row, resample) — at n_boot=60 that is 60 hashes
per input row, and the JVM evaluates each one as a scalar expression
chain (concat → md5 → substring → conv → cast). Profiled at sf0.1
(r17): 40 of 53 executor-CPU core-seconds of ab_bootstrap_ci live in
that one stage. md5 itself is the floor — the semantics are
oracle-replayed — but HOW it is computed is not: every message here is
shorter than 56 bytes, i.e. exactly ONE md5 compression block, so the
whole batch can run through a numpy-vectorized single-block MD5
(64 rounds of uint32 ops over (rows × resamples)-wide arrays) at ~10x
less CPU than the JVM expression chain. "Hash-state reuse" across
resamples is impossible for sub-block messages (the id prefix never
fills a 64-byte block), so vectorization across messages is the
correct form of that r16 idea.

The kernel also REPLACES the 60-way explode: instead of shipping
rows × n_boot exploded rows into the partial aggregate, it emits
per-batch PARTIAL sums per (group, b) — the same map-side-combine
shape, computed in one Arrow crossing. Exactness contract (the same
one the operators document): every accumulation is an exact integer
sum (numpy int64 with an overflow guard that falls back to Python-int
object arithmetic), the uniform u = (h + 0.5) / 2^32 is
IEEE-bit-identical to the JVM's (h exact in 32 bits, +0.5 exact,
power-of-two divide exact), and the Poisson inverse-CDF lookup is the
same strict-< threshold walk (searchsorted side='right' ==
first k with u < cdf[k]). NULL value semantics are replayed too: a
partial is NULL iff every value in the (batch, group) is NULL, so the
final Spark sum is NULL iff all inputs are NULL — exactly F.sum over
the exploded products.

Messages longer than 55 bytes (id + '#b#seed' would spill into a
second md5 block) route the batch through a hashlib fallback —
bit-identical, just not vectorized; ids that long are pathological.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# single-block MD5, vectorized over messages
# ---------------------------------------------------------------------------

_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 \
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_K = [int(abs(__import__("math").sin(i + 1)) * 2**32) & 0xFFFFFFFF
      for i in range(64)]
_G = [i for i in range(16)] \
    + [(5 * i + 1) % 16 for i in range(16)] \
    + [(3 * i + 5) % 16 for i in range(16)] \
    + [(7 * i) % 16 for i in range(16)]
_IV = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _md5_block_a(blocks_u32: np.ndarray) -> np.ndarray:
    """First digest word (little-endian A' = IV0 + A) of one padded
    64-byte MD5 block per row. blocks_u32: (N, 16) uint32. All adds
    are uint32 wraparound — numpy array overflow wraps silently, which
    is the mod-2^32 arithmetic MD5 specifies."""
    m = blocks_u32
    n = m.shape[0]
    a = np.full(n, _IV[0], dtype=np.uint32)
    b = np.full(n, _IV[1], dtype=np.uint32)
    c = np.full(n, _IV[2], dtype=np.uint32)
    d = np.full(n, _IV[3], dtype=np.uint32)
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        tmp = a + f + np.uint32(_K[i]) + m[:, _G[i]]
        s = np.uint32(_S[i])
        rot = (tmp << s) | (tmp >> np.uint32(32 - s))
        a, d, c, b = d, c, b, b + rot
    return a + np.uint32(_IV[0])


def _hash_matrix_hashlib(enc_ids: "list[bytes]", n_boot: int,
                         seed: int) -> np.ndarray:
    """Row-at-a-time fallback for over-long ids (> 1 md5 block).
    Bit-identical to the vectorized path; only the speed differs."""
    import hashlib
    out = np.empty((n_boot, len(enc_ids)), dtype=np.uint32)
    sfx = [f"#{b}#{seed}".encode() for b in range(n_boot)]
    for i, s in enumerate(enc_ids):
        for b in range(n_boot):
            out[b, i] = int.from_bytes(
                hashlib.md5(s + sfx[b]).digest()[:4], "big")
    return out


def _hash_matrix(enc_ids: "list[bytes]", n_boot: int,
                 seed: int) -> np.ndarray:
    """h[b, i] = conv(substr(md5(id_i||'#'||b||'#'||seed), 1, 8),
    16, 10) — the exact JVM/DuckDB hash value — as uint32, for every
    (resample b, row i)."""
    n = len(enc_ids)
    lens = np.array([len(s) for s in enc_ids], dtype=np.int64)
    width = max(int(lens.max()), 1) if n else 1
    max_sfx = len(f"#{n_boot - 1}#{seed}".encode())
    if n and int(lens.max()) + max_sfx > 55:
        return _hash_matrix_hashlib(enc_ids, n_boot, seed)
    mat = (np.array(enc_ids, dtype=f"S{width}")
           .view(np.uint8).reshape(n, width))
    template = np.zeros((n, 64), dtype=np.uint8)
    template[:, :width] = mat
    rows = np.arange(n)
    out = np.empty((n_boot, n), dtype=np.uint32)
    for b in range(n_boot):
        sfx = np.frombuffer(f"#{b}#{seed}".encode(), dtype=np.uint8)
        blk = template.copy()
        for j, byte in enumerate(sfx):
            blk[rows, lens + j] = byte
        ml = lens + len(sfx)               # message length <= 55
        blk[rows, ml] = 0x80               # md5 pad byte
        bits = ml * 8                      # fits in two length bytes
        blk[:, 56] = (bits & 0xFF).astype(np.uint8)
        blk[:, 57] = (bits >> 8).astype(np.uint8)
        a = _md5_block_a(blk.view("<u4").reshape(n, 16))
        # the hex-prefix value reads the little-endian word big-endian
        out[b] = a.byteswap()
    return out


# ---------------------------------------------------------------------------
# the weight-partials operator
# ---------------------------------------------------------------------------

def _weights(h: np.ndarray, cdf: np.ndarray) -> np.ndarray:
    """Poisson inverse-CDF weights from the uint32 hash matrix.
    u = (h + 0.5) / 2^32 is IEEE-exact (h < 2^32 representable, +0.5
    exact, power-of-two divide exact) so every comparison lands on the
    same side as the JVM CASE chain; searchsorted side='right' is
    'first k with u < cdf[k], else len(cdf)'."""
    u = (h.astype(np.float64) + np.float64(0.5)) / np.float64(2.0**32)
    return np.searchsorted(cdf, u, side="right").astype(np.int64)


def boot_weight_partials(
    base,
    key_cols: "list[str]",
    n_boot: int,
    seed: int,
    thresholds: "tuple[float, ...]",
    vals: "dict[str, str]",
    with_sw: bool = False,
):
    """mapInArrow stage: from base(key_cols..., __id string non-null,
    <val cols> decimal(38,0) nullable) emit per-(batch, keys, b)
    partial sums: for each (partial_name -> val_col) in `vals`, the
    exact integer sum of weight*val over the batch's group rows (NULL
    iff every val in the group is NULL), plus `__psw` = sum of weights
    when with_sw. Finish with groupBy(*key_cols, 'b').sum(...) — the
    decimal/long sums are order-independent, so the result is
    value-identical to the exploded JVM aggregation."""
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in base.schema.fields}
    out_fields = [in_fields[k] for k in key_cols]
    out_fields.append(T.StructField("b", T.IntegerType(), False))
    for pname in vals:
        out_fields.append(
            T.StructField(pname, T.DecimalType(38, 0), True))
    if with_sw:
        out_fields.append(T.StructField("__psw", T.LongType(), False))
    out_schema = T.StructType(out_fields)

    cdf = tuple(float(t) for t in thresholds)
    val_items = list(vals.items())
    n_boot = int(n_boot)
    seed = int(seed)
    keys = list(key_cols)
    sw = bool(with_sw)

    def _kernel(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        cdf_np = np.array(cdf, dtype=np.float64)
        b_tile = np.arange(n_boot, dtype=np.int32)
        dec38 = pa.decimal128(38, 0)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            # --- group codes over the key columns, NULL-exact:
            # pandas factorizes the values; explicit is-null flags keep
            # NULL distinct from NaN (Spark groupBy does).
            kdata = {}
            for i, k in enumerate(keys):
                col = batch.column(batch.schema.get_field_index(k))
                kdata[f"v{i}"] = col.to_pandas()
                kdata[f"n{i}"] = col.is_null().to_pandas()
            kdf = pd.DataFrame(kdata)
            codes = (kdf.groupby(list(kdf.columns), sort=False,
                                 dropna=False).ngroup().to_numpy())
            n_groups = int(codes.max()) + 1
            _, first_idx = np.unique(codes, return_index=True)
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(n_groups))

            # --- the hash/weight matrix (n_boot, n)
            ids = batch.column(
                batch.schema.get_field_index("__id")).to_pylist()
            enc = [s.encode("utf-8") for s in ids]
            w_mat = _weights(_hash_matrix(enc, n_boot, seed), cdf_np)
            w_sorted = w_mat[:, order]

            arrays = []
            rep_first = np.repeat(first_idx, n_boot)
            for k in keys:
                col = batch.column(batch.schema.get_field_index(k))
                arrays.append(pc.take(col, pa.array(rep_first)))
            arrays.append(pa.array(np.tile(b_tile, n_groups),
                                   type=pa.int32()))

            for _pname, vcol in val_items:
                col = batch.column(batch.schema.get_field_index(vcol))
                # NULL replay: partial is NULL iff the whole
                # (batch, group) is NULL — F.sum semantics.
                nonnull = np.asarray(~col.is_null().to_pandas())
                has_val = np.add.reduceat(
                    nonnull[order].astype(np.int64), bounds) > 0
                exact = None
                try:
                    x = pc.fill_null(pc.cast(col, pa.int64()),
                                     0).to_numpy()
                    # guard: |sum(w*x)| over a batch group is bounded
                    # by n * max(w) * max|x|; stay far inside int64
                    mx = int(np.abs(x).max()) if n else 0
                    if mx and n * len(cdf) * mx >= 2**62:
                        raise OverflowError
                    prods = w_sorted * x[order]
                    sums = np.add.reduceat(prods, bounds, axis=1)
                except (OverflowError, pa.ArrowInvalid):
                    # exact object-int fallback (arbitrary precision)
                    exact = np.array(
                        [0 if d is None else int(d)
                         for d in col.to_pylist()], dtype=object)
                    prods = w_sorted.astype(object) * exact[order]
                    sums = np.add.reduceat(prods, bounds, axis=1)
                flat = sums.T.ravel()
                mask = np.repeat(has_val, n_boot)
                arrays.append(pa.array(
                    [int(v) if m else None
                     for v, m in zip(flat, mask)], type=dec38))
            if sw:
                sw_sums = np.add.reduceat(w_sorted, bounds, axis=1)
                arrays.append(pa.array(sw_sums.T.ravel(),
                                       type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_fields])

    return base.mapInArrow(_kernel, out_schema)


def kernel_groupable(df, key_cols: "list[str]") -> bool:
    """True when every key column is an atomic type the kernel's
    pandas factorization handles exactly. Nested keys (array/struct/
    map) keep the JVM explode path."""
    from pyspark.sql import types as T

    atomic = (T.StringType, T.BooleanType, T.ByteType, T.ShortType,
              T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
              T.DecimalType, T.DateType, T.TimestampType,
              T.TimestampNTZType, T.BinaryType)
    fields = {f.name: f.dataType for f in df.schema.fields}
    return all(isinstance(fields[k], atomic) for k in key_cols)
