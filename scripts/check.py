#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB over the fixture
parquet tables, and compares row counts, column names, and values
(column-name-sorted, like the driver). Exit code 1 on any mismatch.
"""
import json, sys, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by full tuple string repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)  # full precision
            vals.append(str(v))
        out.append("\x1f".join(vals))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols, d_rows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: exception {e}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failed.append(name)
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failed.append(name)
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            continue
        cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if cs != cd:
            # find first diff (ordered compare; also try sorted for diagnosis)
            n_diff = sum(1 for a, b in zip(cs, cd) if a != b)
            sorted_match = sorted(cs) == sorted(cd)
            for i, (a, b) in enumerate(zip(cs, cd)):
                if a != b:
                    print(f"FAIL {name}: {n_diff}/{len(cs)} rows differ "
                          f"(match-if-sorted={sorted_match}); first diff row {i}:\n"
                          f"  spark: {a}\n  duck : {b}")
                    break
            failed.append(name)
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} passed")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
