#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py /tmp/verify_out /root/testdata/sf0.01

Reads each <name>/ parquet dump produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with each fixture parquet
registered as a view under its table name), sorts columns by name, and
compares row-by-row values. Dev tool only — not part of the shipped library.
"""
import json, math, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    timings = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if got.shape != want.shape:
                print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
                n_fail += 1
                continue
            ok = True
            for c in got.columns:
                a = [canon(x) for x in got[c].tolist()]
                b = [canon(x) for x in want[c].tolist()]
                if a != b:
                    bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                    print(f"FAIL {name}: col {c} row {bad}: spark={a[bad]!r} duckdb={b[bad]!r}")
                    ok = False
                    break
            if ok:
                print(f"PASS {name} ({got.shape[0]} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
        timings[name] = time.time() - t0
    print(f"== {n_pass} pass, {n_fail} fail")
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print("slowest oracles:", ", ".join(f"{k}={v:.1f}s" for k, v in slow))
    print(f"compare total: {sum(timings.values()):.1f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
