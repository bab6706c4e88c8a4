#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against DuckDB executing oracle_sql.json[name] over
the same source tables. Two comparisons per query:
  1. value-tuple compare (DuckDB fetchall, order as emitted);
  2. the driver's actual semantics — load both sides into pandas, sort
     columns by name, sort_values over all columns, hash the str-rendered
     frame. This catches pandas-only traps (unhashable ndarray cells,
     HUGEINT→float64 rendering, Decimal objects, ns-timestamp overflow)
     that tuple equality misses.
Driver-side python (duckdb/pandas) — NOT a library dependency of the Scala
engine."""
import duckdb, json, sys, glob, os, hashlib


def pandas_hash(df):
    """Mimic the driver: sorted columns, sorted rows, str-rendered hash.
    Raises on unhashable cells exactly like the driver does."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_glob = f"{out}/{name}/*.parquet"
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{res_glob}')").fetchall()
        gcols = [d[0] for d in con.description]
        exp = con.execute(sql).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        n_fail += 1
        continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns differ got={sorted(gcols)} exp={sorted(ecols)}")
        n_fail += 1
        continue
    # driver sorts columns by name before hashing values
    gperm = [gcols.index(c) for c in sorted(gcols)]
    eperm = [ecols.index(c) for c in sorted(ecols)]
    g = [tuple(row[i] for i in gperm) for row in got]
    e = [tuple(row[i] for i in eperm) for row in exp]
    if len(g) != len(e):
        print(f"FAIL {name}: row count got={len(g)} exp={len(e)}")
        n_fail += 1
        continue
    bad = None
    for i, (gr, er) in enumerate(zip(g, e)):
        if gr != er:
            bad = (i, gr, er)
            break
    if bad:
        i, gr, er = bad
        print(f"FAIL {name}: first diff at row {i}:\n  got {gr}\n  exp {er}")
        n_fail += 1
        continue
    # second gate: the driver's pandas sort+hash path. The Spark result MUST
    # be loaded via pandas/pyarrow (not DuckDB's .df(), which normalizes
    # DECIMAL to float64 and would mask Decimal-object / ns-timestamp traps
    # the real driver hits).
    try:
        import pandas as pd
        hg = pandas_hash(pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(res_glob))],
            ignore_index=True))
        he = pandas_hash(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: pandas compare crashed (driver would too): {type(e).__name__}: {e}")
        n_fail += 1
        continue
    if hg != he:
        print(f"FAIL {name}: values equal but pandas hash differs (dtype rendering trap)")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} oracled ==")
sys.exit(1 if n_fail else 0)
