#!/usr/bin/env python3
"""Assemble SCALE_r16.json from the round-16 rehearsal artifacts in /tmp
(driver-side evidence tooling like check.py — NOT a library dependency).

Blocks (each produced by a tmux-run sbt main, see SURVEY §6.12):
  pairwork_x100        ScaleProbe pairwork  — VERDICT r15 item 1 before/after
  gates_x30/x220       ScaleProbe gates     — item 2 broadcast-gate flip
  x100 (+isolated)     Bench @ /tmp/sfscale100 with the collapse live
  x30_graph (+iso)     Bench @ /tmp/sfscale30 lineitem-axis (graph+TPC-H)
  x100_stream_rocksdb  Bench streaming family under RocksDBStateStoreProvider
"""
import json, sys

def load(p):
    try:
        return json.load(open(p))
    except Exception as e:
        print(f"missing {p}: {e}", file=sys.stderr)
        return None

out = {
    "pairwork_x100": load("/tmp/pairwork_x100.json"),
    "gates_x30": load("/tmp/gates_x30.json"),
    "gates_x220": load("/tmp/gates_x220.json"),
    "x100": load("/tmp/scale_x100_r16.json"),
    "x100_isolated": load("/tmp/iso_x100_r16.json"),
    "x30_graph": load("/tmp/scale_x30_r16.json"),
    "x30_graph_isolated": load("/tmp/iso_x30_r16.json"),
    "x100_stream_rocksdb": load("/tmp/scale_x100_rocksdb_r16.json"),
    "x100_stream_rocksdb_isolated": load("/tmp/iso_x100_rocksdb_r16.json"),
    "notes": [
        "pairwork_x100: representative banding cuts LSH band-join rows 107.9M->836 (text) and 336.7M->23.6k (phash); PNG decodes 500k->4992 (digest-keyed) at copy factor 100.",
        "gates: x30 (600k nodes) broadcast gate ON, x220 (4.4M nodes > 4.19M knob) gate OFF naturally; LPA round plan verified BroadcastExchange-free on the shuffle fallback at x220.",
        "x100: same 30-suspect list as r15 with the exact-dup collapse live; mm_phash 284.8s->4.0s, text_dedup_near in-band.",
        "x30_graph: lineitem/orders multiplied x30 (18M lineitem rows) — first graph/TPC-H axis evidence above x10; sfscale220 (132M rows) used for the gate probe only.",
        "x100_stream_rocksdb: full 10-query streaming block completes under RocksDBStateStoreProvider at x100 (436.1s sweep / isolated mins 72.4s stream_session, 43.7s stream_dedup); vs the default heap store the per-op JNI+serde cost reads 1.6-6x at this state size (stream_dedup 27.0->43.7s min, stream_distinct_users 7.2->42.2s) - the provider trades per-op cost for state beyond heap, which is the 100TB play; no failures, no OOM.",
    ],
}
json.dump(out, open("SCALE_r16.json", "w"), indent=1)
print("wrote SCALE_r16.json with blocks:",
      [k for k, v in out.items() if v is not None])
