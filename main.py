#!/usr/bin/env python
"""spark-submit entry point (north rule: ships via ``spark-submit --py-files``).

Usage::

    # package the library once
    (cd /path/to/repo && zip -r wo_spark.zip work_order_pdf_extractor_spark)

    spark-submit --py-files wo_spark.zip main.py \
        --transcripts  <iceberg table | parquet dir> \
        --ref-orders   <csv | parquet> \
        --out          <output dir> \
        [--checkpoint] [--n-buckets 64] [--crop x1 y1 x2 y2] [--incremental]

Modes:
- default: one batch run with per-partition checkpoint/lineage (resumable —
  rerun the same command after a crash and committed buckets are skipped)
- ``--incremental``: Structured-Streaming availableNow backlog processing
  with a streaming checkpoint
- ``--no-checkpoint``: plain one-shot write (partitioned by disposition)
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import Observation

from work_order_pdf_extractor_spark.core.pdfparse import DEFAULT_CROP
from work_order_pdf_extractor_spark.plans import lineage, pipeline
from work_order_pdf_extractor_spark.session import get_spark
from work_order_pdf_extractor_spark.sources import transcripts as sources


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--ref-orders", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--crop", nargs=4, type=float, default=list(DEFAULT_CROP))
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--no-checkpoint", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="work_order_extraction")
    t = None if args.incremental else sources.read_transcripts(spark, args.transcripts)
    ref = sources.read_reference_orders(spark, args.ref_orders)
    crop = tuple(args.crop)

    if args.incremental:
        from work_order_pdf_extractor_spark.streaming.incremental import (
            run_incremental,
        )

        run_incremental(
            spark, args.transcripts, ref, args.out,
            checkpoint_dir=args.out + "_ckpt", crop=crop,
        )
        print(json.dumps({"mode": "incremental", "out": args.out}))
    elif args.no_checkpoint:
        obs = Observation("metrics")
        res = pipeline.run_pipeline(t, ref, crop=crop, observation=obs)
        pipeline.write_partitioned(res, args.out)
        print(json.dumps({"mode": "oneshot", "metrics": dict(obs.get)}))
    else:
        summary = lineage.run_with_checkpoint(
            spark, t, ref, args.out, n_buckets=args.n_buckets, crop=crop
        )
        print(json.dumps({"mode": "checkpointed", **summary}))

    spark.stop()


if __name__ == "__main__":
    main()
