"""bench.py's HEADLINE list must stay a subset of the query registry —
a typo'd name would silently crash the driver's per-round bench."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_is_subset_of_registry():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from work_order_pdf_extractor_spark.queries import REGISTRY

    missing = [q for q in bench.HEADLINE if q not in REGISTRY]
    assert missing == [], missing
