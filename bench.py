#!/usr/bin/env python
"""Benchmark harness (M7).

Default mode (what the driver runs per round): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship transcript-extraction job on
a cached deterministic fixture. Prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1, ...}

Scaling mode (``--scaling``, run manually / by CI): the SAME extraction job
on the SAME input at local[8] and local[32] in fresh subprocesses, reporting
turns/sec at each and scaling efficiency ``(tp_32/tp_8)/4`` — the sandbox
rendition of the north rule's "N → 4N executors ≥ 0.8" criterion
(BASELINE.md protocol). Results appended to BENCH/BASELINE.md.

Internal helper mode (``--extract-once CORES``) is what the scaling mode
spawns; it prints a small JSON dict.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_CACHE = os.path.join(REPO, ".bench_cache")

HEADLINE = [
    "pricing_summary",
    "semi_join",
    "outer_disposition",
    "golden_verify_join",
    "turn_order_window",
    "running_sum",
    "explode_words",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "ann_lsh_buckets",
    "langid",
    "token_count",
]


def _force(df) -> int:
    """Execute fully without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _ensure_bench_fixture(scale: str = "bench") -> str:
    from work_order_pdf_extractor_spark import fixtures

    os.makedirs(BENCH_CACHE, exist_ok=True)
    return fixtures.write_fixture_parquet(BENCH_CACHE, scale)["transcripts"]


def run_default() -> None:
    from work_order_pdf_extractor_spark import fixtures
    from work_order_pdf_extractor_spark.plans import pipeline
    from work_order_pdf_extractor_spark.queries import REGISTRY
    from work_order_pdf_extractor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    tpath = _ensure_bench_fixture()
    spark = get_spark(app_name="bench", cores=cores)

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    # flagship extraction job on the cached transcript fixture
    t = spark.read.parquet(tpath)
    ref = spark.createDataFrame(fixtures.gen_reference_orders())
    n_turns = t.count()
    t0 = time.perf_counter()
    _force(pipeline.run_pipeline(t, ref))
    ext_sec = time.perf_counter() - t0
    times["extract_pipeline"] = round(ext_sec, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + transcript extraction wall-clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "extract_turns": n_turns,
                "extract_turns_per_sec": round(n_turns / ext_sec, 1),
                "cores": cores,
            }
        )
    )
    spark.stop()


def run_extract_once(cores: int) -> None:
    from work_order_pdf_extractor_spark import fixtures
    from work_order_pdf_extractor_spark.plans import pipeline
    from work_order_pdf_extractor_spark.session import get_spark

    tpath = _ensure_bench_fixture()
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
    t = spark.read.parquet(tpath)
    ref = spark.createDataFrame(fixtures.gen_reference_orders())
    n_turns = t.count()
    # warm-up pass: JIT + python worker startup out of the measurement
    _force(pipeline.run_pipeline(t, ref))
    t0 = time.perf_counter()
    _force(pipeline.run_pipeline(t, ref))
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_turns": n_turns,
                "sec": round(sec, 3),
                "turns_per_sec": round(n_turns / sec, 1),
            }
        )
    )
    spark.stop()


def run_scaling() -> None:
    _ensure_bench_fixture()
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--extract-once", str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    tp8 = results[8]["turns_per_sec"]
    tp32 = results[32]["turns_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3)
    summary = {
        "metric": "extraction scaling local[8] -> local[32]",
        "turns": results[8]["n_turns"],
        "turns_per_sec_8": tp8,
        "turns_per_sec_32": tp32,
        "scaling_efficiency": eff,
        "target": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## scaling run\n\n"
            f"- input: {results[8]['n_turns']} turns (deterministic bench fixture, seed 42)\n"
            f"- local[8]:  {tp8} turns/sec ({results[8]['sec']} s)\n"
            f"- local[32]: {tp32} turns/sec ({results[32]['sec']} s)\n"
            f"- scaling efficiency (tp32/tp8)/4 = {eff} (target >= 0.8)\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--extract-once" in sys.argv:
        run_extract_once(int(sys.argv[sys.argv.index("--extract-once") + 1]))
    else:
        run_default()
