#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL over the same parquet tables, compare value-hashes
with columns sorted by name and rows sorted. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: timestamps -> ns ints; widen ints/floats; sort rows
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif dt.startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif dt.startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        eq = got.equals(want)
        if not eq:
            # detailed diff on first mismatching cell
            shown = False
            for c in got.columns:
                if not got[c].equals(want[c]):
                    ga, wa = got[c].to_numpy(), want[c].to_numpy()
                    for i in range(len(ga)):
                        g, w = ga[i], wa[i]
                        same = (g == w) or (pd.isna(g) and pd.isna(w))
                        if not same:
                            print(f"FAIL {name}: col {c} row {i}: got {g!r} want {w!r} "
                                  f"(dtypes {got[c].dtype}/{want[c].dtype})")
                            shown = True
                            break
                    if not shown:
                        print(f"FAIL {name}: col {c} equals()==False but no cell diff "
                              f"(dtypes {got[c].dtype}/{want[c].dtype})")
                        shown = True
                    break
            if not shown:
                print(f"FAIL {name}: frames differ (no per-column diff found)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # rows-only queries (no oracle)
    for pdir in sorted(glob.glob(os.path.join(out, "*"))):
        name = os.path.basename(pdir)
        if os.path.isdir(pdir) and name not in oracle:
            try:
                n = len(con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df())
                if n == 0:
                    print(f"FAIL {name}: rows-only query returned 0 rows"); n_fail += 1
                else:
                    print(f"ROWS {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable output: {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
