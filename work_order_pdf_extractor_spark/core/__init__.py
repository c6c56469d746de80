"""Pure-Python extraction core.

Every function here is deterministic and side-effect free. The SAME functions
are called by both the single-process pandas oracle (``oracle.py``) and the
Spark pandas UDFs (``operators/extract.py``) so per-turn text equality between
the distributed job and the golden outputs holds by construction and is then
re-verified through the distributed path by the test suite.
"""
