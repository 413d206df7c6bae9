#!/usr/bin/env python3
"""Local replica of the driver's t2 check: run Verify output vs DuckDB oracle.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def main(sf_dir, out_dir):
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for n in TABLES:
        p = f"{sf_dir}/{n}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(sql):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            res = con.execute(sql[name])
            cols = [d[0] for d in res.description]
            want_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        sort_key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
        want = sorted((tuple(canon(r[i]) for i in order) for r in want_rows), key=sort_key)
        tbl = pq.read_table(qdir)
        got_cols = sorted(tbl.column_names)
        if got_cols != sorted(cols):
            print(f"FAIL {name}: columns {got_cols} != {sorted(cols)}"); n_fail += 1; continue
        got = sorted((tuple(canon(v) for v in row)
                     for row in zip(*[tbl.column(c).to_pylist() for c in got_cols])),
                     key=sort_key)
        if got == want:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            for g, w in list(zip(got, want))[:3]:
                if g != w:
                    print(f"  got  {g}\n  want {w}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
