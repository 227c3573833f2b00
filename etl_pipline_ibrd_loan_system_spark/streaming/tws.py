"""transformWithState (Spark 4 stateful-streaming successor API).

Round-5 recorded the API as environment-blocked: the driver-side
Python worker crashed before user code ran. Round-6 root-caused it —
the worker's protobuf control channel needs the `google.protobuf`
runtime, absent from this container — and unblocked it with the
vendored shim (`vendor/pbshim/sitecustomize.py`). Two runtime
switches make the API live on ANY session, including one created by
an external harness (no JVM-launch env needed):

1. the shim directory is prepended to the PYTHONPATH that
   `SparkContext.environment` hands to spawned Python workers, and
2. the state-store provider is switched to RocksDB for the stream's
   duration — transformWithState keeps each typed state variable in
   its own column family, which HDFSBackedStateStoreProvider does not
   support (UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES).

At 100 TB this is the API you want over applyInPandasWithState:
RocksDB state scales past executor heap (changelog-checkpointed,
spillable), state schema is typed and evolvable, and timers replace
hand-rolled timeout bookkeeping. The engine keeps both operators —
`stateful_first_event` (applyInPandasWithState, works everywhere) and
`stateful_first_event_tws` (this module) — verified against the same
oracle (queries/stream_queries.py st1/st2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_SHIM_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "vendor", "pbshim")


def tws_available() -> bool:
    """Cheap feature probe: the spawned worker runs THIS interpreter, so
    transformWithState initializes iff StateMessage_pb2 imports here
    once the shim path is active. No stream is started."""
    import importlib.util
    import sys

    def _has_protobuf() -> bool:
        try:
            return importlib.util.find_spec("google.protobuf") is not None
        except ModuleNotFoundError:
            # find_spec imports the PARENT package; no `google` at all
            # raises instead of returning None.
            return False

    if _has_protobuf():
        return True
    added = False
    try:
        if _SHIM_DIR not in sys.path:
            # sitecustomize in the shim dir appends the vendored runtime.
            sys.path.insert(0, _SHIM_DIR)
            added = True
        import sitecustomize  # noqa: F401
        return _has_protobuf()
    except Exception:
        return False
    finally:
        if added:
            sys.path.remove(_SHIM_DIR)


def enable_tws(spark: SparkSession) -> None:
    """Point spawned Python workers at the shim. Mutating
    `SparkContext.environment` reaches workers created for UDFs built
    AFTER this call (the env dict is captured per-function), so calling
    this before declaring the transformWithState query is sufficient —
    verified to work on a session whose JVM was launched with no
    PYTHONPATH at all."""
    env = spark.sparkContext.environment
    prev = env.get("PYTHONPATH", "")
    if _SHIM_DIR not in prev.split(os.pathsep):
        env["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + prev if prev else "")
        )


class _rocksdb_state_store:
    """Scope the RocksDB provider to one verification stream: the provider
    conf is read at stream START, so setting/restoring around `start()`
    leaves concurrently-defined HDFSBacked streams (st1/sd1/ss1) alone."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        self.spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
        )
        return self

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", self.prev
            )


def stateful_first_event_tws(
    events: DataFrame, key_col: str, ts_col: str, id_col: str
) -> DataFrame:
    """First event per key via transformWithStateInPandas: one typed
    ValueState cell per key ("already emitted"), RocksDB-backed. Same
    semantics as microbatch.stateful_first_event — emit the (ts, id)-min
    row of the key's first batch, nothing afterwards — so both APIs are
    checked by the same argmin SQL oracle.

    State per key is one boolean struct — bounded by distinct keys and
    kept OFF the JVM heap by RocksDB, which is what lets the operator
    run with billions of keys at 100 TB (heap-backed HDFSBacked state
    would OOM long before).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    enable_tws(events.sparkSession)

    out_schema = T.StructType(
        [
            events.schema[key_col],
            T.StructField("first_ts", events.schema[ts_col].dataType),
            T.StructField("first_id", events.schema[id_col].dataType),
        ]
    )

    class FirstEvent(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", T.StructType([T.StructField("seen", T.BooleanType())])
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            if self._seen.exists():
                return
            first = None
            for pdf in rows:
                if not len(pdf):
                    continue
                head = pdf.sort_values([ts_col, id_col]).iloc[0]
                if first is None or (head[ts_col], head[id_col]) < (
                    first[ts_col],
                    first[id_col],
                ):
                    first = head
            if first is None:
                return
            self._seen.update((True,))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "first_ts": [first[ts_col]],
                    "first_id": [first[id_col]],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FirstEvent(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
