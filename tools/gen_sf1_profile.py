#!/usr/bin/env python
"""Build a LOCAL sf1.0-shaped profiling dataset in .bench_cache/sf1/.

The driver's round-end measurement runs at a driver-generated sf1.0
(BENCH_r06.json: "sf": 1.0), which is 10x the largest local testdata
(sf0.1). To profile optimizations at the scale that actually gets graded,
this script synthesizes 10x-replicated tables from /root/testdata/sf0.1:

- ``documents``: 10 replicas, each vowel-translated with an INJECTIVE
  per-replica map (same discipline as bench.py's dedup scaling corpus) so
  near-dup structure replicates instead of exploding into cross-replica
  clone clusters; doc_id offset 10_000_000 per replica.
- ``embeddings``: 10 replicas with vec_id offsets and a tiny deterministic
  per-replica dither (breaks exact-duplicate top-k ties while keeping the
  bucket/cell distribution realistic).
- ``customer``, ``orders``, ``lineitem``, ``events``, ``part``,
  ``supplier``: 10 replicas with consistent key offsets.
- ``nation``, ``region``: copied verbatim (fixed dims).

PROFILING ONLY — never used by bench.py or any declared query; lives in
the gitignored .bench_cache.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, ".bench_cache", "sf1")

POOL = "aeioubcdfghjklmnpqrst"  # 21 chars


def vowel_map(r: int) -> str:
    return "".join(
        [
            POOL[r % 21],
            POOL[(r // 21 + 7) % 21],
            POOL[(r + 5) % 21],
            POOL[(2 * r + 11) % 21],
            POOL[(3 * r + 2) % 21],
        ]
    )


def main() -> None:
    reps = 10
    os.makedirs(DST, exist_ok=True)

    # documents: injective vowel translation per replica
    d = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for r in range(reps):
        p = d.copy()
        p["doc_id"] = p["doc_id"] + r * 10_000_000
        if r > 0:
            table = str.maketrans("aeiou", vowel_map(r))
            p["text"] = [t.translate(table) for t in p["text"]]
        parts.append(p)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(DST, "documents.parquet"), index=False
    )

    # embeddings: id offset + deterministic per-replica dither
    e = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    mat = np.array(list(e["embedding"]), dtype=np.float32)
    parts = []
    for r in range(reps):
        p = e.copy()
        p["vec_id"] = p["vec_id"] + r * 1_000_000
        if r > 0:
            rng = np.random.default_rng(1000 + r)
            m = mat + rng.normal(0, 0.01, size=mat.shape).astype(np.float32)
            p["embedding"] = list(m)
        parts.append(p)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(DST, "embeddings.parquet"), index=False
    )

    # star-schema tables + events: uniform key offsets
    offs = {
        "customer": ("c_custkey", 1_000_000),
        "orders": ("o_orderkey", 100_000_000),
        "lineitem": ("l_orderkey", 100_000_000),
        "supplier": ("s_suppkey", 1_000_000),
        "part": ("p_partkey", 10_000_000),
        "events": ("event_id", 100_000_000),
    }
    for name, (key, off) in offs.items():
        src = os.path.join(SRC, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        t = pd.read_parquet(src)
        parts = []
        for r in range(reps):
            p = t.copy()
            if key in p.columns:
                p[key] = p[key] + r * off
            # keep FK consistency for the orders/lineitem/customer chain
            if name == "lineitem" and "l_orderkey" in p.columns:
                pass
            if name == "orders" and "o_custkey" in p.columns:
                p["o_custkey"] = p["o_custkey"] + r * 1_000_000
            if name == "events" and "user_id" in p.columns:
                p["user_id"] = p["user_id"] + r * 1_000_000
            if name == "customer" and "c_name" in p.columns and r > 0:
                p["c_name"] = [
                    n[:-9] + str(int(n[-9:]) + r * 1_000_000).zfill(9)
                    if n[-9:].isdigit()
                    else f"{n}#{r}"
                    for n in p["c_name"]
                ]
            parts.append(p)
        pd.concat(parts, ignore_index=True).to_parquet(
            os.path.join(DST, f"{name}.parquet"), index=False
        )

    for name in ("nation", "region"):
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(DST, f"{name}.parquet"),
        )
    print(f"wrote {DST}")


if __name__ == "__main__":
    sys.exit(main())
