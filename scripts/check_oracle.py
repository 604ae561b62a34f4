#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 DuckDB-oracle compare (SURVEY.md §5.2).

Usage: python3 scripts/check_oracle.py <verify_out_dir> [sf_dir]

Loads <out>/oracle_sql.json (written by `graft.Verify`), registers the ten
test tables as DuckDB views over <sf_dir>, executes every oracle SQL, and
compares row-for-row / column-sorted against the corresponding Verify
parquet dump. Exit 1 on any mismatch.
"""
import duckdb, json, math, sys
import pyarrow.parquet as pq
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list) or isinstance(b, list):
        if not (isinstance(a, list) and isinstance(b, list)) or len(a) != len(b):
            return False
        return all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (Decimal, int, float)) and isinstance(b, (Decimal, int, float)):
        return Decimal(str(a)) == Decimal(str(b))
    return a == b or str(a) == str(b)


def main():
    outdir = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sql = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    fails = []
    for name in sorted(sql):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql[name]).fetch_arrow_table()
            got = pq.read_table(f"{outdir}/{name}")
            wn, gn = sorted(want.column_names), sorted(got.column_names)
            if wn != gn:
                fails.append((name, f"cols spark={gn} duck={wn}"))
                continue
            wp = want.select(wn).to_pylist()
            gp = got.select(gn).to_pylist()
            if len(wp) != len(gp):
                fails.append((name, f"rows spark={len(gp)} duck={len(wp)}"))
                continue
            bad = None
            for i, (g, w) in enumerate(zip(gp, wp)):
                for k in wn:
                    if not eq(g[k], w[k]):
                        bad = (i, k, g[k], w[k])
                        break
                if bad:
                    break
            if bad:
                fails.append((name, f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
            else:
                print(f"OK   {name} ({len(gp)} rows)")
        except Exception as e:
            fails.append((name, f"EXC {type(e).__name__}: {str(e)[:300]}"))
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    print(f"\n{len(sql) - len(fails)}/{len(sql)} oracle queries match" if not only else "")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
