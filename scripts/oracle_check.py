#!/usr/bin/env python3
"""Local replica of the driver's t2 check: run Verify output vs DuckDB oracle.

Mimics the driver's compare: both sides materialize through Arrow
(`.arrow()` / `pq.read_table` + `to_pylist`), which preserves SQL NULL
(None) vs float NaN and surfaces DuckDB HUGEINT/DECIMAL as
decimal.Decimal; cells compare on canonicalized *string* values (floats
rounded to 6). This catches type-surface divergences like `1000.0` vs
`1000` that pure Python `==` hides (Decimal(1000) == 1000).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, os, decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if isinstance(v, decimal.Decimal):  # duckdb HUGEINT/DECIMAL via arrow
        return canon(float(v))
    if isinstance(v, float) and v != v:
        return "<nan>"  # distinct from NULL: Spark NaN vs oracle NULL must fail
    if v is None or v != v:  # None / NaT
        return "<null>"
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rows_of(tbl, cols):
    # pyarrow to_pylist preserves None (SQL NULL) vs float('nan') — pandas
    # float64 columns collapse NULL into NaN, which would make the
    # '<null>' / '<nan>' distinction in canon() unfireable
    data = tbl.select(cols).to_pylist()
    return sorted(tuple(canon(row[c]) for c in cols) for row in data)

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
            want_tbl = con.execute(sql[name]).arrow()
            got_tbl = pq.read_table(qdir)
        except Exception as e:
            print(f"FAIL {name}: oracle/read error {e}"); n_fail += 1; continue
        cols = sorted(want_tbl.column_names)
        if sorted(got_tbl.column_names) != cols:
            print(f"FAIL {name}: columns {sorted(got_tbl.column_names)} != {cols}")
            n_fail += 1; continue
        want = rows_of(want_tbl, cols)
        got = rows_of(got_tbl, cols)
        if got == want:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            shown = 0
            for g, w in zip(got, want):
                if g != w and shown < 3:
                    print(f"  got  {g}\n  want {w}"); shown += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
