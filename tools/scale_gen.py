#!/usr/bin/env python3
"""Deterministic ~sf1 scale-rehearsal dataset: re-keyed union-multiply of
sf0.1 (VERDICT r12 item 2 — the broadcast gates, bounded-round loops and
DistRank slice sizing had never seen data 10x the bench scale).

Each of the K copies re-keys every primary key and its foreign refs by
copy_index * stride (stride = max(key)+1 from the source, so copies never
collide and per-copy structure — basket sizes, per-user event streams,
per-order supplier sets — is preserved exactly; the corpus scales
uniformly instead of densifying any one key). region/nation stay fixed
(dimension tables don't grow with corpus size). Text/embedding payloads
are copied verbatim: near-dup ops then see exact-duplicate clusters of
size K, which is a bounded, realistic duplication profile.

Driver-side python tooling like check.py — NOT a library dependency of
the Scala engine.

Usage: python3 tools/scale_gen.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/sfscale1
"""
import duckdb, os, sys

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


CS = stride("customer", "c_custkey")
SS = stride("supplier", "s_suppkey")
PS = stride("part", "p_partkey")
OS = stride("orders", "o_orderkey")
ES = stride("events", "event_id")
US = stride("events", "user_id")
DS = stride("documents", "doc_id")
VS = stride("embeddings", "vec_id")

copies = f"(SELECT unnest(range({K})) AS c)"


def gen(table, select, multiply=True):
    frm = f"read_parquet('{src}/{table}.parquet')" + (
        f", {copies}" if multiply else "")
    con.execute(
        f"COPY (SELECT {select} FROM {frm}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


gen("region", "*", multiply=False)
gen("nation", "*", multiply=False)
gen("customer",
    f"c_custkey + c*{CS} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
gen("supplier",
    f"s_suppkey + c*{SS} AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",
    f"p_partkey + c*{PS} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
gen("orders",
    f"o_orderkey + c*{OS} AS o_orderkey, o_custkey + c*{CS} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem",
    f"l_orderkey + c*{OS} AS l_orderkey, l_partkey + c*{PS} AS l_partkey, "
    f"l_suppkey + c*{SS} AS l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
gen("events",
    f"event_id + c*{ES} AS event_id, ts, user_id + c*{US} AS user_id, "
    "event_type, value, props")
gen("documents",
    f"doc_id + c*{DS} AS doc_id, text, lang, source, n_chars")
gen("embeddings",
    f"vec_id + c*{VS} AS vec_id, embedding, label")
print(f"done -> {out} (K={K})")
