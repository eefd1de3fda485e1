#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir of parquet under verifyOutDir, runs oracle_sql.json[name]
in DuckDB with the fixture tables registered as views, sorts columns by name
and rows by all columns, and compares values (exact for non-floats, then
exact-hash AND tolerance report for floats).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob, os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    # Every registered query must have produced an output dir — a crash in
    # Verify must turn the check red here, not silently shrink the grade.
    mpath = f"{out_dir}/queries.json"
    if os.path.exists(mpath):
        expected = json.load(open(mpath))
        for missing in sorted(set(expected) - set(names)):
            n_fail += 1
            print(f"FAIL  {missing}: NO OUTPUT (query crashed in Verify)")
    for name in names:
        got_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols, grows = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracle:
            print(f"SKIP  {name}: no oracle (rows={len(grows)})")
            continue
        exp_rel = con.sql(oracle[name])
        ecols, erows = canon(exp_rel.fetchall(), exp_rel.columns)
        status = []
        # The driver's hash is TYPE-sensitive while this value-compare is
        # not: DuckDB widens BIGINT window/plain sums to HUGEINT (int128),
        # which Spark can never emit — any HUGEINT oracle column is a
        # guaranteed driver hash-fail even when every value matches (q102,
        # round 5). Catch it here.
        hugeint = [c for c, t in zip(exp_rel.columns, exp_rel.types)
                   if "HUGEINT" in str(t).upper()]
        if hugeint:
            status.append(f"ORACLE-TYPE hugeint cols {hugeint}: "
                          f"CAST(... AS BIGINT) in the oracle SQL")
        if gcols != ecols:
            status.append(f"SCHEMA got={gcols} exp={ecols}")
        elif len(grows) != len(erows):
            status.append(f"ROWS got={len(grows)} exp={len(erows)}")
        else:
            mismatch = 0
            example = None
            for gr, er in zip(grows, erows):
                for g, e in zip(gr, er):
                    same = (g == e)
                    if not same and isinstance(g, float) and isinstance(e, float):
                        same = (math.isnan(g) and math.isnan(e))
                    if not same:
                        mismatch += 1
                        if example is None:
                            example = (g, e)
                        break
            if mismatch:
                status.append(f"VALUES {mismatch}/{len(grows)} rows differ, e.g. {example}")
        if status:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            n_pass += 1
            print(f"OK    {name} ({len(grows)} rows)")
    print(f"== {n_pass} ok, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
