"""work_order_pdf_extractor_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the capabilities of the reference single-process pipeline
(Nattapolch/work-order-pdf-extractor, studied read-only at /root/reference)
as an idiomatic Spark DataFrame job over an Iceberg-shaped table of
multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``:

- deterministic, vectorized payload parsing (PDF content-stream tokenizer,
  HTML boilerplate classifier) via Arrow-batched pandas UDFs — replacing the
  reference's GPT-4 Vision call (``work_order_extractor.py:1588-1688``),
- anchored-regex field extraction (``work_order_extractor.py:1615-1624``),
- broadcast semi/outer join against the reference-order key set
  (``work_order_extractor.py:976-996, 1752-1767``),
- disposition/metrics/lineage as columns and aggregates, not filesystem
  mutations (``work_order_extractor.py:1769-1797, 1887-1916``).

All code here derives only from public knowledge: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
