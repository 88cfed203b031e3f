#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Stricter than the driver: exact value equality after sorting columns by
name, so passing here should imply passing the driver's hash compare.
"""
import sys, os, json, math, datetime, decimal
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        s = format(v.normalize(), "f")
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    return cols, [tuple(canon(data[c][i]) for c in cols)
                  for i in range(tbl.num_rows)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_tbl = pq.read_table(qdir)
        if name not in oracle:
            print(f"  [rows-only] {name}: {spark_tbl.num_rows} rows")
            continue
        try:
            o_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols, s_rows = table_rows(spark_tbl)
        o_cols, o_rows = table_rows(o_tbl)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} vs oracle {o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: {len(s_rows)} rows vs oracle {len(o_rows)}")
            n_fail += 1
            continue
        s_types = {f.name: str(f.type) for f in spark_tbl.schema}
        o_types = {f.name: str(f.type) for f in o_tbl.schema}
        tdiff = [c for c in s_cols if s_types.get(c) != o_types.get(c)]
        if tdiff:  # warn-only: value canon below is the authority
            print(f"  [types] {name}: " + ", ".join(
                f"{c}: {s_types[c]} vs {o_types[c]}" for c in tdiff))
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; "
                  f"first at {i}:\n  cols : {s_cols}\n  spark: {a}\n  oracle:{b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([k for k in oracle])} oracle queries declared")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
