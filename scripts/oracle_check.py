#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare for named queries.

Usage: oracle_check.py <sfDir> <dumpDir> <q1,q2,...>

Reads each query's Spark result from <dumpDir>/<name> (parquet written
by `Scratch dumpq`), runs the query's oracleSql from SparkEntry (dumped
as <dumpDir>/oracle_sql.json by Verify, or re-extracted here via a tiny
Scratch call) against DuckDB views over <sfDir>, and compares the way
the driver does: columns sorted by name, rows sorted, exact values.
"""
import sys, json, glob
import duckdb


def norm(v):
    # mirror the driver's float normalization (%.6g): engines may differ
    # in the last ulps of an accumulation (e.g. a running-sum order), and
    # the driver's gate treats those as equal
    if isinstance(v, float):
        return "%.6g" % v
    return v


def canon(rows, cols, normalize=True):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple((norm(r[i]) if normalize else r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [sorted(cols), out]


def main():
    sf_dir, dump_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    oracle = json.load(open(f"{dump_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ok = True
    for n in names:
        files = glob.glob(f"{dump_dir}/{n}/*.parquet")
        sr = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        s_cols = [d[0] for d in sr.description]
        s_rows = sr.fetchall()
        orr = con.execute(oracle[n])
        o_cols = [d[0] for d in orr.description]
        o_rows = orr.fetchall()
        sc, so = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if sc[0] != so[0]:
            print(f"{n}: SCHEMA MISMATCH spark={sc[0]} oracle={so[0]}")
            ok = False
        elif len(sc[1]) != len(so[1]):
            print(f"{n}: ROWS {len(sc[1])} vs {len(so[1])}")
            ok = False
        elif sc[1] != so[1]:
            diffs = [i for i, (a, b) in enumerate(zip(sc[1], so[1])) if a != b]
            print(f"{n}: HASH MISMATCH ({len(diffs)} differing rows; "
                  f"first: spark={sc[1][diffs[0]]} oracle={so[1][diffs[0]]})")
            ok = False
        else:
            # the %.6g normalization can silently absorb real sub-1e-6
            # cross-engine drift — when it is load-bearing, SAY so, so a
            # "pass" claiming bit-identical values stays auditable
            raw_s = canon(s_rows, s_cols, normalize=False)
            raw_o = canon(o_rows, o_cols, normalize=False)
            note = ("" if raw_s[1] == raw_o[1]
                    else " [values differed pre-norm: %.6g normalization"
                         " was load-bearing]")
            print(f"{n}: pass ({len(sc[1])} rows){note}")
    sys.exit(0 if ok else 1)


main()
