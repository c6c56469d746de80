"""Job plans: the end-to-end extraction pipeline, skew handling, lineage."""
