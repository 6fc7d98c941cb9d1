"""Synthesize an sf1-scale dataset (10x sf0.1) under .bench/sf1/ for
the scaling checkpoint (VERDICT r9 task 4). /root/testdata is
read-only, so the decade-up data lives inside the repo workdir
(gitignored).

Construction (deterministic, duckdb):
- lineitem/orders/events: 10 replicas with key columns shifted by
  replica * OFFSET (row counts x10, group keys unchanged so
  aggregations see x10 bigger groups — the realistic shape).
- documents: 10 replicas; replica r>0 suffixes EVERY token with
  "~r" so replicas are token-disjoint (Jaccard 0 across replicas).
  Without this, every doc would gain 9 near-identical copies and the
  dedup operators would measure a degenerate all-duplicates corpus,
  not a 10x corpus: pair counts would grow quadratically in replica
  count instead of linearly in corpus size.
- embeddings: 10 replicas; replica r circularly shifts the vector by
  r positions (norm-preserving, decorrelates replicas so semantic
  clusters scale in count, not in size).
- region/nation/customer/supplier/part: copied as-is (dimensions).
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   ".bench", "sf1")
R = 10
OFF = 100_000_000


def main() -> None:
    # second-decade checkpoint (VERDICT r10 task 4):
    #   python make_sf1.py --replicas 30 --dst .bench/sf3
    # same construction, 30 replicas (~sf3); key shifts and token/
    # vector salting generalize unchanged (OFF > 30 * max base key).
    global R, DST
    import argparse
    ap = argparse.ArgumentParser(
        description="Synthesize a replica-salted decade-up dataset "
                    "from sf0.1 (see module docstring)")
    ap.add_argument("--replicas", type=int, default=R,
                    help="replica count (10 = ~sf1, 30 = ~sf3)")
    ap.add_argument("--dst", default=None,
                    help="output dir, relative to the repo root "
                         "(default .bench/sf1)")
    args = ap.parse_args()
    if args.replicas < 1 or args.replicas * 1_000_000 > OFF:
        ap.error(f"--replicas must be in [1, {OFF // 1_000_000}] so "
                 "key shifts cannot collide")
    R = args.replicas
    if args.dst is not None:
        DST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           args.dst)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")

    key_shift = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in key_shift.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        parts = []
        for r in range(R):
            sel = ", ".join(
                f"{c} + {r * OFF} AS {c}" if c in keys else c
                for c in cols)
            parts.append(
                f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)

    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/documents.parquet'"
    ).fetchall()]
    other = [c for c in cols if c not in ("doc_id", "text", "n_chars")]
    parts = []
    for r in range(R):
        if r == 0:
            text = "text"
        else:
            text = ("array_to_string(list_transform("
                    f"string_split(text, ' '), x -> x || '~{r}'), ' ')")
        sel = ", ".join([f"doc_id + {r * OFF} AS doc_id",
                         f"{text} AS text"] + other
                        + [f"length({text}) AS n_chars"])
        parts.append(f"SELECT {sel} FROM '{SRC}/documents.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO "
        f"'{DST}/documents.parquet' (FORMAT PARQUET)")
    print("documents", con.execute(
        f"SELECT count(*) FROM '{DST}/documents.parquet'"
    ).fetchone()[0])

    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/embeddings.parquet'"
    ).fetchall()]
    other = [c for c in cols if c not in ("vec_id", "embedding")]
    parts = []
    for r in range(R):
        if r == 0:
            vec = "embedding"
        else:
            vec = (f"embedding[{r + 1}:] || embedding[1:{r}]")
        sel = ", ".join([f"vec_id + {r * OFF} AS vec_id",
                         f"{vec} AS embedding"] + other)
        parts.append(f"SELECT {sel} FROM '{SRC}/embeddings.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO "
        f"'{DST}/embeddings.parquet' (FORMAT PARQUET)")
    print("embeddings", con.execute(
        f"SELECT count(*) FROM '{DST}/embeddings.parquet'"
    ).fetchone()[0])
    print("done ->", DST)


if __name__ == "__main__":
    main()
