"""Custom stateful streaming operator: cross-batch turn dedup.

The reference processes each file exactly once per session because its
worklist is an in-memory dict keyed by path (``work_order_extractor.py:
1842-1875``); re-queued files are skipped. The streaming rendition of that
guarantee across micro-batches is keyed state: for every ``conv_id`` we
remember which ``turn_idx`` values have been emitted and suppress
re-arrivals (late duplicates, upstream replays, at-least-once sources).

Implemented with ``applyInPandasWithState`` — Spark's Arrow-batched
stateful grouped-map (SURVEY §2.8's "custom stateful operator" slot):

- group key: ``conv_id`` (state is per-conversation, co-partitioned with
  the stream by the state-store shuffle),
- state: the sorted list of seen ``turn_idx`` (bounded by conversation
  length; at 10^12-turn scale you would bound it further to a
  (max_turn_idx, bitmap-of-recent) pair — duplicates arrive near their
  original in practice),
- output: only never-seen turns, in (conv_id, turn_idx) order.

Determinism: for a fixed sequence of micro-batches the emitted set is
exactly the first arrival of each (conv_id, turn_idx) — asserted in
``tests/test_streaming_stateful.py`` against a replayed second batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import pyspark.sql.types as T

from .incremental import TRANSCRIPT_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.IntegerType()))]
)


def _dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    seen: set[int] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        fresh = pdf[~pdf["turn_idx"].isin(seen) & ~pdf["turn_idx"].duplicated()]
        seen.update(int(t) for t in fresh["turn_idx"])
        if len(fresh):
            yield fresh[["conv_id", "turn_idx", "role", "text", "tool"]]
    state.update((sorted(seen),))


def tws_available() -> bool:
    """True iff the transformWithState Python protocol can run here (its
    driver worker imports google.protobuf at startup)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def dedup_turns_tws(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_batch: int | None = None,
):
    """Twin of :func:`dedup_turns_stateful` on the NEWER Spark 4 stateful
    API (``transformWithStateInPandas`` + ``StatefulProcessor``): typed
    per-key state handles (a ValueState of the seen turn list) instead of
    a single opaque state tuple, and the RocksDB state store provider,
    which is what the new operator requires and what large state at 10^12
    turns needs anyway (spillable, incremental-checkpointing state).
    Same exactly-once-per-(conv_id, turn_idx) contract — the test asserts
    both implementations emit the identical row set.

    Environment gate: the transformWithState protocol talks to the Python
    driver worker over protobuf, so it needs ``google.protobuf``
    importable — probe with :func:`tws_available` before calling (this
    sandbox lacks protobuf; the applyInPandasWithState implementation
    above is the one exercised end-to-end here)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python environment; use dedup_turns_stateful instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Dedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", T.StructType([T.StructField("seen", T.ArrayType(T.IntegerType()))])
            )

        def handleInputRows(self, key, rows, timerValues):
            seen: set[int] = (
                set(self._seen.get()[0]) if self._seen.exists() else set()
            )
            for pdf in rows:
                pdf = pdf.sort_values("turn_idx")
                fresh = pdf[
                    ~pdf["turn_idx"].isin(seen) & ~pdf["turn_idx"].duplicated()
                ]
                seen.update(int(t) for t in fresh["turn_idx"])
                if len(fresh):
                    yield fresh[["conv_id", "turn_idx", "role", "text", "tool"]]
            self._seen.update((sorted(seen),))

        def close(self) -> None:
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA).format("parquet")
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    stream = reader.load(input_dir)
    deduped: DataFrame = stream.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=Dedup(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_turns_stateful(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_batch: int | None = None,
):
    """Stream transcript parquet arrivals, emit each (conv_id, turn_idx)
    exactly once across ALL micro-batches (keyed state survives batches
    and — via the checkpoint — restarts). availableNow semantics like
    :func:`..incremental.run_incremental`."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA).format("parquet")
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    stream = reader.load(input_dir)

    deduped: DataFrame = (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
