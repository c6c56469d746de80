"""Vectorized shingle derivation — r7 fast twins of
``common.word_shingles`` / ``dedup.positioned_shingles``.

Why a separate module (the ``ann_tuning``/``annfast`` precedent):
``common.py`` is in the dependency closure of 55 registry queries —
editing it would push the whole registry through re-attestation. The
twins live here; ``dedup.py``/``textclean.py`` rebind their internal
shingle derivation to them (their families re-attest this round).

What changes and why it is value-identical:

- ``word_shingles`` exploded a ``sequence`` per row, evaluated an
  interpreted ``concat_ws`` per shingle, and then paid a FULL SHUFFLE
  for ``.distinct()`` over (id, shingle) string rows (guide §2.4:
  remove shuffles outright). The twin emits each document's shingle SET
  from one Arrow pass — per-document distinctness needs no shuffle
  because shingles of different documents are distinct rows by
  definition. Join/aggregate consumers are order-insensitive, so set
  iteration order is immaterial.
- String semantics match exactly: Spark's ``split(text, ' ')`` keeps
  empty tokens (so does Python's ``str.split(' ')``), ``concat_ws``
  over non-null strings equals ``' '.join``, and documents with fewer
  than ``n`` words emit nothing on both paths. Distinct word TUPLES and
  distinct joined strings are the same sets because words cannot
  contain the split character.
- ``positioned_shingles`` had no distinct (positions are the payload);
  the twin just vectorizes the per-position string build.

Differential tests: ``tests/test_shinglefast.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .common import ensure_parallelism


def word_shingles_fast(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct n-word shingles per document — one Arrow pass, no
    distinct shuffle. Output: (id_col, shingle), exactly the
    ``common.word_shingles`` row set."""
    import pandas as _pd
    from collections.abc import Iterator as _It

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            out_ids: list = []
            out_sh: list = []
            for i, t in zip(b[id_col].values, b[text_col]):
                words = ("" if t is None else t).split(" ")
                if len(words) < n:
                    continue
                sh = set(map(" ".join, zip(*(words[k:] for k in range(n)))))
                out_ids.extend([i] * len(sh))
                out_sh.extend(sh)
            yield _pd.DataFrame({id_col: out_ids, "shingle": out_sh})

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        fn, schema=f"{id_col} long, shingle string"
    )


def positioned_shingles_fast(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, shingle) for every n-word shingle WITH start position,
    not deduplicated — one Arrow pass; exactly the
    ``dedup.positioned_shingles`` row multiset."""
    import pandas as _pd
    from collections.abc import Iterator as _It

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            out_ids: list = []
            out_pos: list = []
            out_sh: list = []
            for i, t in zip(b[id_col].values, b[text_col]):
                words = ("" if t is None else t).split(" ")
                if len(words) < n:
                    continue
                grams = list(map(" ".join, zip(*(words[k:] for k in range(n)))))
                out_ids.extend([i] * len(grams))
                out_pos.extend(range(len(grams)))
                out_sh.extend(grams)
            yield _pd.DataFrame(
                {id_col: out_ids, "pos": out_pos, "shingle": out_sh}
            )

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        fn, schema=f"{id_col} long, pos int, shingle string"
    )
