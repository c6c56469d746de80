"""Spark operators: pandas-UDF extraction, dedup, similarity, text stats."""
