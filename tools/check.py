#!/usr/bin/env python3
"""Local driver-mimic correctness gate: compare Verify's parquet dumps
against the DuckDB oracle SQL, per query.

Faithfulness matters more than convenience here: the driver reads the
SPARK dump with pyarrow (which preserves DECIMAL as decimal.Decimal,
TIMESTAMP_NTZ as datetime64, etc.) and the ORACLE result via DuckDB's
fetchdf (which coerces DECIMAL to float64). Round 2's version of this
script read BOTH sides through DuckDB, which coerced both to float64 and
masked a 17-query decimal-representation failure class. So: pyarrow for
the Spark side, fetchdf for the oracle side, stringified compare — the
gate must fail exactly when the driver fails."""
import decimal, glob, json, os, sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# GRAFT_CHECK_SKIP: comma-separated query names whose DuckDB oracle is
# super-linear in the corpus (the q53/q84/q179 all-pairs self-joins are
# O(n^2) cosine evaluations — ~2e10 at sf10) and must be checked by the
# closed-form planted-pair oracle instead (tools/check_planted.py).
# Unset by default: the driver's sf0.01 contract is unchanged.
for name in os.environ.get("GRAFT_CHECK_SKIP", "").split(","):
    oracle.pop(name.strip(), None)
results = {}
# a query that crashed in Verify leaves no output dir — that must count as
# a failure, not silently shrink the denominator
for name in oracle:
    if not os.path.isdir(os.path.join(OUT, name)):
        results[name] = {"err": "query produced no output (failed in Verify)"}
for name in sorted(os.listdir(OUT)):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if not files:
        results[name] = {"err": "no parquet output"}
        continue
    # driver path: Spark dump through pyarrow, decimals/timestamps preserved.
    # Read EVERY part file (sorted name order = Spark's global sort order for
    # our ORDER BY'd queries) — reading only part 0 of a multi-part dump would
    # silently truncate and misreport rows_match.
    spark_df = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    if name not in oracle:
        results[name] = {"rows": len(spark_df), "rows_only": True,
                         "ok": len(spark_df) > 0}
        continue
    import time as _time
    _t0 = _time.time()
    print(f"[check] {name} oracle...", file=sys.stderr, flush=True)
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = {"err": f"oracle failed: {e}"}
        continue
    print(f"[check] {name} oracle done in {_time.time() - _t0:.1f}s",
          file=sys.stderr, flush=True)
    s = spark_df[sorted(spark_df.columns)]
    o = duck_df[sorted(duck_df.columns)]
    entry = {"rows_spark": len(s), "rows_oracle": len(o),
             "cols_spark": list(s.columns), "cols_oracle": list(o.columns),
             "dtypes_spark": [str(t) for t in s.dtypes],
             "dtypes_oracle": [str(t) for t in o.dtypes]}
    entry["rows_match"] = len(s) == len(o)
    entry["schema_match"] = list(s.columns) == list(o.columns)
    if entry["rows_match"] and entry["schema_match"]:
        sv = s.astype(str).values.tolist()
        ov = o.astype(str).values.tolist()
        entry["hash_match"] = sv == ov
        if not entry["hash_match"]:
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    entry["first_diff"] = {"row": i, "spark": a, "oracle": b}
                    break
    entry["ok"] = entry.get("hash_match", False)
    results[name] = entry

oracled = {k: v for k, v in results.items() if not v.get("rows_only")}
ro = {k: v for k, v in results.items() if v.get("rows_only")}
npass = sum(1 for v in oracled.values() if v.get("ok"))
nro = sum(1 for v in ro.values() if v.get("ok"))
print(json.dumps(results, indent=1, default=str))
print(f"\n=== oracled {npass}/{len(oracled)} ok; rows-only {nro}/{len(ro)} nonempty ===",
      file=sys.stderr)
for k, v in results.items():
    flag = "OK " if v.get("ok") else ("ro " if v.get("rows_only") else "FAIL")
    if v.get("rows_only"):
        flag = "ro+" if v.get("ok") else "ro0"
    print(f"{flag} {k} {'' if v.get('ok') else json.dumps({kk: vv for kk, vv in v.items() if kk in ('err','rows_spark','rows_oracle','schema_match','first_diff','rows','cols_spark','cols_oracle','dtypes_spark','dtypes_oracle')}, default=str)[:400]}", file=sys.stderr)
sys.exit(0 if npass == len(oracled) else 1)
