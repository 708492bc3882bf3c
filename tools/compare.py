#!/usr/bin/env python3
"""Local differential harness: run each oracle_sql in DuckDB over the same
parquet tables and compare against the Verify output parquet.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mirrors the driver's check: sort columns by name, canonicalize rows, then
compare row-by-row (floats to 9 significant digits to surface real
mismatches while ignoring printer noise — the driver hashes, so we aim for
bit-equality and report any delta).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(v):
    # Type-preserving canon: the driver HASHES values, so Decimal('5') vs
    # int 5 vs 5.0 must NOT compare equal here (python == says they do).
    # Keep the type name in the tuple so hugeint/decimal promotions
    # (e.g. DuckDB SUM(BIGINT) -> decimal128) surface as VALUES diffs.
    if v is None:
        return None
    return (type(v).__name__, repr(v))

def rows_of(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(x) for x in row) for row in zip(*data)]

def type_diff(got, want):
    """Arrow-level type comparison on the sorted column set (int64 vs
    decimal128 etc). Returns list of (col, spark_type, duck_type)."""
    gt = {f.name: str(f.type) for f in got.schema}
    wt = {f.name: str(f.type) for f in want.schema}
    return [(c, gt[c], wt[c]) for c in sorted(gt) if gt[c] != wt.get(c, '?')]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qname in sorted(oracle):
        files = glob.glob(f"{out_dir}/{qname}/*.parquet")
        if not files:
            print(f"MISSING  {qname} (no spark output)")
            n_fail += 1
            continue
        try:
            got = pq.read_table(files[0])
            want = con.execute(oracle[qname]).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {qname}: {e}")
            n_fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if gc != wc:
            print(f"SCHEMA   {qname}: spark={gc} duck={wc}")
            n_fail += 1
            continue
        td = type_diff(got, want)
        if td:
            print(f"TYPES    {qname}: " + "; ".join(
                f"{c}: spark={a} duck={b}" for c, a, b in td))
            n_fail += 1
            continue
        # driver sorts rows before hashing; do the same
        gr_s, wr_s = sorted(gr, key=repr), sorted(wr, key=repr)
        if len(gr_s) != len(wr_s):
            print(f"ROWCOUNT {qname}: spark={len(gr_s)} duck={len(wr_s)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr_s, wr_s) if a != b]
        if bad:
            print(f"VALUES   {qname}: {len(bad)}/{len(gr_s)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"OK       {qname} ({len(gr_s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
