#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet in verify_out_dir, runs oracle_sql.json[name]
in DuckDB with the sf_dir tables registered as views, sorts columns by
name, rounds floats, sorts rows, and compares values.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                # + 0.0 folds -0.0 into 0.0: Spark's BigDecimal round has no
                # signed zero while DuckDB keeps it, and repr distinguishes
                v = round(v, 6) + 0.0
            rr.append(repr(v))
        out.append("|".join(rr))
    out.sort()
    return sorted(c for c in cols), out

def main(outdir, sfdir):
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            results[name] = "EMPTY_SPARK_OUT"
            continue
        sq = con.execute(f"SELECT * FROM read_parquet('{os.path.join(outdir, name)}/*.parquet')")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if name not in oracle:
            results[name] = f"no_oracle rows={len(srows)}"
            continue
        try:
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERR {str(e)[:160]}"
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            results[name] = f"ROWS_MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
            ex = "; ".join(f"[{i}] {sr[i][:120]} != {orr[i][:120]}" for i in diffs)
            results[name] = f"HASH_MISMATCH n={sum(1 for a,b in zip(sr,orr) if a!=b)} ex: {ex}"
        else:
            results[name] = f"OK rows={len(sr)}"
    bad = 0
    for k in sorted(results):
        v = results[k]
        flag = "  " if v.startswith(("OK", "no_oracle")) else "!!"
        if flag == "!!":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results)} queries, {bad} problems")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
