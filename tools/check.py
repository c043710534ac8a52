#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet (or <name>/ dir) the Verify main dumped, runs
the matching oracle SQL from oracle_sql.json in DuckDB against views over
the sf parquet tables, and compares: row count, sorted-column schema,
and a hash over the value matrix with rows sorted and columns sorted by
name (per the driver's documented compare).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        # normalize -0.0 and int-valued floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(
        set(os.path.basename(p).replace(".parquet", "")
            for p in glob.glob(f"{outdir}/*")
            if os.path.basename(p) != "oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        path = f"{outdir}/{name}"
        if not os.path.isdir(path):
            path = f"{outdir}/{name}.parquet"
        try:
            got = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchall() \
                if os.path.isdir(path) else \
                con.execute(f"SELECT * FROM '{path}'").fetchall()
            gd = con.description
            gcols = [c[0] for c in gd]
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"rows  {name}: rows-only check, rows={len(got)}"
                  + ("  (EMPTY!)" if len(got) == 0 else ""))
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            ecols = [c[0] for c in con.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rowcount {len(got)} vs {len(exp)}")
        if sorted(c.lower() for c in gcols) != sorted(c.lower() for c in ecols):
            problems.append(f"schema {sorted(gcols)} vs {sorted(ecols)}")
        if not problems:
            hg = frame_fingerprint([c.lower() for c in gcols], got)
            he = frame_fingerprint([c.lower() for c in ecols], exp)
            if hg != he:
                problems.append("hash mismatch")
                # show a sample diff
                order_g = sorted(range(len(gcols)), key=lambda i: gcols[i].lower())
                order_e = sorted(range(len(ecols)), key=lambda i: ecols[i].lower())
                sg = sorted(tuple(canon(r[i]) for i in order_g) for r in got)
                se = sorted(tuple(canon(r[i]) for i in order_e) for r in exp)
                for a, b in zip(sg, se):
                    if a != b:
                        problems.append(f"first diff:\n    spark={a}\n    duck ={b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
