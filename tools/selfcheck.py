#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same source
parquet tables, sorts columns by name on both sides, and requires EXACT
value equality (the strongest bar any hash compare could set).
"""
import sys, os, json, glob, math, datetime, decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime,)):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(data[i][r]) for i in range(len(cols)))
                  for r in range(table.num_rows)]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0] if len(files) == 1 else files)
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        gc, gr = rows_of(got)
        ec, er = rows_of(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        # Strict arrow-type parity: a hash compare that looks at dtypes or
        # string renderings would flag int32-vs-int64 or int-vs-double even
        # when the values compare equal in python.
        gt = {f.name: str(f.type) for f in got.schema}
        et = {f.name: str(f.type) for f in exp.schema}
        tdiff = {c: (gt[c], et[c]) for c in gt if gt[c] != et.get(c, gt[c])}
        if tdiff:
            print(f"FAIL {name}: dtype mismatch {tdiff}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first @row {i}:")
            print(f"  cols : {gc}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
