#!/usr/bin/env python
"""Interleaved fixture-mix attribution for extract_pipeline (VERDICT r5
ask #1): split the r5 ×1.46 bench delta into (intentional PDF 1.5
xref-stream parse work) vs (VM weather).

Protocol: generate TWO bench-scale transcript fixtures that are
byte-identical except for the PDF form — XREF_STREAM_SHARE 0.0 (every
PDF the classic 1.4 xref table, the r4 mix) vs 0.4 (the r5+ production
mix). One Spark session, both pipelines warmed, then N strictly
INTERLEAVED timed runs (A,B,A,B,...) so slow VM minutes hit both arms
equally. The per-pair ratio isolates the 1.5-parse cost from weather;
the reported statistic is the median of per-pair ratios plus each arm's
min/median seconds.

Usage: python tools/attr_extract.py [n_pairs] [cpus]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else int(
    os.environ.get("SPARK_GRAFT_CPUS", "32")
)
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
)


def main() -> None:
    from work_order_pdf_extractor_spark import fixtures
    from work_order_pdf_extractor_spark.session import get_spark

    # Cache dirs are keyed by a fingerprint of the fixture-generation code:
    # write_fixture_parquet is skip-if-exists, and silently pairing a stale
    # arm with a fresh one would break the "byte-identical except the PDF
    # form" premise the interleaved statistic depends on.
    import hashlib
    import inspect

    from work_order_pdf_extractor_spark.core import pdfparse as _pp

    code_fp = hashlib.md5(
        (inspect.getsource(fixtures) + inspect.getsource(_pp)).encode()
    ).hexdigest()[:10]
    paths = {}
    for share, tag in ((0.0, "xref00"), (0.4, "xref40")):
        fixtures.XREF_STREAM_SHARE = share
        out = os.path.join(CACHE, f"{tag}_{code_fp}")
        paths[tag] = fixtures.write_fixture_parquet(out, "bench")["transcripts"]
        print(f"# fixture {tag}: {paths[tag]}", flush=True)

    spark = get_spark(
        app_name="attr-extract", cores=CPUS, shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from work_order_pdf_extractor_spark.plans import pipeline, skew

    ref = spark.createDataFrame(fixtures.gen_reference_orders())
    ref_prep = spark.createDataFrame(
        [
            (r["ref_order"],)
            for r in pipeline.prepare_reference_orders(ref).collect()
        ],
        "ref_order string",
    )

    def runner(tag: str):
        t = spark.read.parquet(paths[tag])
        whale_rows = (
            skew.conversation_lengths(t.select("conv_id"))
            .filter(F.col("n_turns") >= skew.DEFAULT_WHALE_THRESHOLD)
            .select("conv_id")
            .collect()
        )
        whales = spark.createDataFrame(
            [(r["conv_id"],) for r in whale_rows] or [("__none__",)],
            "conv_id string",
        )

        def run() -> float:
            t0 = time.perf_counter()
            pipeline.run_pipeline(
                t, ref_prep, whales=whales, ref_prepared=True
            ).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        return run

    runs = {tag: runner(tag) for tag in ("xref00", "xref40")}
    for tag in ("xref00", "xref40"):  # warm both arms (codegen, page cache)
        runs[tag]()

    a, b, ratios = [], [], []
    print("| pair | order | xref00 sec | xref40 sec | ratio |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for i in range(N_PAIRS):
        # alternate the arm order each pair so monotone VM drift cancels
        # in the per-pair ratio instead of biasing it one way
        if i % 2 == 0:
            ta = runs["xref00"]()
            tb = runs["xref40"]()
            order = "00,40"
        else:
            tb = runs["xref40"]()
            ta = runs["xref00"]()
            order = "40,00"
        a.append(ta)
        b.append(tb)
        ratios.append(tb / ta)
        print(
            f"| {i} | {order} | {ta:.3f} | {tb:.3f} | {tb / ta:.3f} |",
            flush=True,
        )
    print(
        f"# xref00: min={min(a):.3f} median={statistics.median(a):.3f} | "
        f"xref40: min={min(b):.3f} median={statistics.median(b):.3f} | "
        f"median per-pair ratio={statistics.median(ratios):.3f} "
        f"(cpus={CPUS}, pairs={N_PAIRS})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
