#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>
       compare_oracle.py --lint <verify_out_dir> <sf_dir>   (type lint only)

For each <name>/ parquet in verify_out_dir, runs oracle_sql.json[name]
in DuckDB with the sf_dir tables registered as views, sorts columns by
name, rounds floats, sorts rows, and compares values.

IMPORTANT: both sides are fetched through DuckDB's pandas path (.df()),
NOT fetchall(). The driver canonicalizes through pandas, where DuckDB
HUGEINT (the result type of SUM over integers) is rendered as float64 —
so an uncast SUM() oracle column hashes as `2630.0` against Spark's
int64 `2630` even though fetchall() would return a python int and
compare equal. Round 5 lost t32/t35 to exactly this; the mirror must
reproduce the driver's verdict, not a kinder one.

The --lint pass (also always run as part of a full compare) DESCRIBEs
every oracle query and fails on any result column typed HUGEINT /
UHUGEINT / DECIMAL: those types silently change representation through
the pandas path and must be CAST (BIGINT / DOUBLE) in the oracle SQL.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose pandas rendering diverges from their SQL value identity.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def connect(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def df_rows(df):
    """Canonical (cols, sorted row reprs) from a pandas frame.

    Values are unboxed from numpy scalars via .item() so the repr is the
    plain python one (stable across numpy versions) while still keeping
    the int-vs-float distinction the driver's hash keys on.
    """
    cols = list(df.columns)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in df.itertuples(index=False, name=None):
        rr = []
        for i in idx:
            v = row[i]
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                # + 0.0 folds -0.0 into 0.0: Spark's BigDecimal round has no
                # signed zero while DuckDB keeps it, and repr distinguishes
                v = round(v, 6) + 0.0
            rr.append(repr(v))
        out.append("|".join(rr))
    out.sort()
    return sorted(cols), out


def lint_types(con, oracle):
    """Fail on oracle result columns whose type pandas mangles."""
    problems = []
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            problems.append(f"{name}: DESCRIBE failed: {str(e)[:160]}")
            continue
        for col, typ, *_ in desc:
            if any(typ.upper().startswith(b) for b in BANNED_TYPES):
                problems.append(
                    f"{name}: column `{col}` is {typ} — pandas path renders "
                    f"this as float64/object; CAST it in the oracle SQL")
    return problems


def main(outdir, sfdir, lint_only=False):
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = connect(sfdir)

    lint = lint_types(con, oracle)
    for p in lint:
        print(f"!! TYPE_LINT {p}")
    if lint_only:
        print(f"\n{len(oracle)} oracle queries linted, {len(lint)} type problems")
        return 1 if lint else 0

    results = {}
    names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            results[name] = "EMPTY_SPARK_OUT"
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{os.path.join(outdir, name)}/*.parquet')").df()
        if name not in oracle:
            results[name] = f"no_oracle rows={len(sdf)}"
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERR {str(e)[:160]}"
            continue
        sc, sr = df_rows(sdf)
        oc, orr = df_rows(odf)
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
    bad = len(lint)
    for k in sorted(results):
        v = results[k]
        flag = "  " if v.startswith(("OK", "no_oracle")) else "!!"
        if flag == "!!":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results)} queries, {bad} problems ({len(lint)} type-lint)")
    return 1 if bad else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--lint"]
    sys.exit(main(args[0], args[1], lint_only="--lint" in sys.argv))
