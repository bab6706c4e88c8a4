#!/usr/bin/env python3
"""x100 rehearsal dataset for the adaptive-capacity paths (VERDICT r14
item 3): the x10 rehearsal is routine; the untested region is the
adaptive rules' HIGHER settings — LSH planes > 12, MinHash rows-per-band
> 4, SimHash bucket bits > 8 — which only engage past the x10 corpus.
Multiply ONLY the three corpus-shaped tables (documents, embeddings,
events) by K=100 with the same re-keyed union-multiply discipline as
scale_gen.py (copies never collide, per-key structure preserved, text /
embedding payloads verbatim -> exact-duplicate clusters of size K); the
TPC-H relational tables copy through at x1 (the relational plans are
rehearsed at x10 — this dataset exists for the sketch/ANN family).

Derived settings this corpus must exercise (asserted by the rehearsal):
  embeddings 200k -> lshPlaneCount = 15 (8 << 15 >= 200k)
  documents  500k -> minhash bandRows = 6 / K = 24 (256*4^6 >= 500k),
                     simhashBucketBits = 14 (32 << 14 >= 500k),
                     phashBandCount = 3 (8 << 15 < 500k)

Driver-side python tooling like check.py — NOT a library dependency of
the Scala engine.

Usage: python3 tools/scale_gen100.py [K] [src_dir] [out_dir]
Defaults: K=100, src=/root/testdata/sf0.1, out=/tmp/sfscale100
"""
import duckdb, os, shutil, sys

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale100"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


ES = stride("events", "event_id")
US = stride("events", "user_id")
DS = stride("documents", "doc_id")
VS = stride("embeddings", "vec_id")

copies = f"(SELECT unnest(range({K})) AS c)"


def gen(table, select):
    con.execute(
        f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet'), {copies}) "
        f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


gen("documents", f"doc_id + c * {DS} AS doc_id, * EXCLUDE (doc_id)")
gen("embeddings", f"vec_id + c * {VS} AS vec_id, * EXCLUDE (vec_id)")
gen("events",
    f"event_id + c * {ES} AS event_id, user_id + c * {US} AS user_id, "
    "* EXCLUDE (event_id, user_id)")

for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"{t}: copied x1")
