#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from <verifyOutDir>, registers the sfDir parquet
tables as DuckDB views, runs each oracle SQL, and compares against the
Spark result parquet (columns sorted by name, rows sorted, values
compared exactly; floats compared exactly after the queries' own
rounding). NOT part of the Scala library — builder-side check only.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def table_key(tbl):
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl.column(c).to_pylist() for c in cols}
    for i in range(tbl.num_rows):
        rows.append(tuple(norm(data[c][i]) for c in cols))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark output")
            n_bad += 1
            continue
        try:
            got = pq.read_table(str(res_dir))
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, gr = table_key(got)
        wc, wr = table_key(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_bad += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_bad += 1
        elif gr != wr:
            bad = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: ")
            i = bad[0]
            print(f"  cols : {gc}")
            print(f"  spark: {gr[i]}")
            print(f"  duck : {wr[i]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
