#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf tables, compare values (columns sorted by name,
rows sorted, floats rounded). NOT part of the library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [gateOut.json]

With a third argument the per-entry pass/fail verdicts are ALSO written
as a JSON artifact (entry -> "pass" | "fail: <reason>") so a round-close
gate claim is auditable line by line (round-10 standing rule: summary
counts alone are not acceptable gate evidence).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
gate_out = sys.argv[3] if len(sys.argv) > 3 else None
gate = {}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # GenScale writes spark-style directories
        p = f"{p}/*.parquet"
    elif not os.path.exists(p):
        continue
    if t == "events":
        # the GenScale sf1 layout stores ts as NANOS-since-epoch BIGINT
        # (the driver's own parquet is a µs timestamp); convert exactly
        # as Graft.table does (integer-DIV truncation to µs) so every
        # oracle sees the same TIMESTAMP column at any scale factor
        ty = con.sql(f"SELECT typeof(ts) FROM '{p}' LIMIT 1").fetchone()[0]
        if ty == "BIGINT":
            con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")
            continue
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            dt = pd.to_datetime(df[c])
            if (dt.dt.time == pd.Timestamp("00:00:00").time()).all():
                df[c] = dt.dt.date.astype(str)
            else:
                df[c] = dt.astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output")
        gate[name] = "fail: no spark output"
        n_fail += 1
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in sorted(pq)])
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        gate[name] = f"fail: {str(e)[:200]}"
        n_fail += 1
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        gate[name] = f"fail: columns spark={list(s.columns)} duck={list(d.columns)}"
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        gate[name] = f"fail: rows spark={len(s)} duck={len(d)}"
        n_fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                      check_exact=False, rtol=1e-9, atol=1e-6)
        print(f"PASS {name} ({len(s)} rows)")
        gate[name] = "pass"
        n_pass += 1
    except AssertionError as e:
        print(f"FAIL {name}: {str(e)[:500]}")
        gate[name] = f"fail: {str(e)[:200]}"
        n_fail += 1

# queries without oracle: rows-only check
all_outs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
for name in sorted(all_outs - set(oracle)):
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    rows = sum(len(pd.read_parquet(p)) for p in pq) if pq else 0
    status = "PASS" if rows > 0 else "FAIL"
    print(f"{status} {name} (rows-only: {rows})")
    gate[name] = "pass (rows-only)" if rows > 0 else "fail: rows-only 0"
    if rows > 0: n_pass += 1
    else: n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
if gate_out:
    with open(gate_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "entries": dict(sorted(gate.items()))}, f, indent=1)
    print(f"gate artifact -> {gate_out}")
sys.exit(1 if n_fail else 0)
