#!/usr/bin/env python3
"""Closed-form oracle for the planted-pair ANN/LSH join gates
(q53_cosine_lsh, q84_ann_join, q179_imi_join) at scale factors where the
DuckDB brute-force oracle is infeasible (all-pairs over n vectors is
O(n^2) 64-dim cosines — ~2e10 at sf10).

The queries construct their own ground truth: vectors 0..49 are
duplicated at id offset = max(vec_id)+1 scaled by 2.0 — identical
DIRECTION, so cosine is exactly 1 — and the query's engine-side margin
guard requires the max natural pairwise cosine on a sample stays < 0.85
(the small-SF brute-force oracles verify it globally: max natural
~0.51). With the 0.9 floor, the exact expected output is therefore the
50 rows (i, offset+i, 1.0) for i in 0..49 — checked here exactly, same
column/sort conventions as check.py."""
import glob
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10_verify"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10_gate_out"
QUERIES = sys.argv[3].split(",") if len(sys.argv) > 3 else [
    "q53_cosine_lsh", "q84_ann_join", "q179_imi_join"]

offset = duckdb.sql(
    f"select max(vec_id) + 1 from '{SF}/embeddings.parquet'").fetchone()[0]
expected = pd.DataFrame({
    "va": [i for i in range(50)],
    "vb": [offset + i for i in range(50)],
    "cos": [1.0] * 50})

rc = 0
for name in QUERIES:
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no dump", file=sys.stderr)
        rc = 1
        continue
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    # cos compares with a tight tolerance, not float equality: the planted
    # construction makes cosine mathematically 1, but the engine's kernel
    # accumulates in a specific float order — a semantically-neutral
    # reordering (e.g. a vectorized kernel) must not flap this gate
    ok = (list(df.columns) == ["va", "vb", "cos"]
          and len(df) == 50
          and df["va"].tolist() == expected["va"].tolist()
          and df["vb"].tolist() == expected["vb"].tolist()
          and all(abs(c - 1.0) <= 1e-9 for c in df["cos"].tolist()))
    print(("OK  " if ok else "FAIL") + f" {name} rows={len(df)} "
          f"(closed-form planted oracle, offset={offset})", file=sys.stderr)
    if not ok:
        print(df.head(10), file=sys.stderr)
        rc = 1
sys.exit(rc)
