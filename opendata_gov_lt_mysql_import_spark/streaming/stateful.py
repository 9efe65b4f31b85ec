"""Arbitrary stateful streaming via ``transformWithStateInPandas`` —
the Spark 4 successor to ``applyInPandasWithState`` (typed state
handles, timers, TTL; SPARK-46815 "State V2").

Operator here: **online per-user running statistics** (count / mean /
variance via Welford's update) — instead of re-aggregating history each
trigger, each user carries a 3-number state and emits its updated
(n, mean, var) whenever it sees events; downstream can score new events
against these moments (the streaming complement of the batch
``events_zscore_outliers`` shape). Constant memory per key, one state
row per user, no shuffle beyond the groupBy. Null values are ignored,
matching SQL aggregate semantics (``avg``/``var_pop`` skip NULLs).

The reference has no stateful surface (its harvest queue processes each
staged object independently, odgovlt.py:355-407); this is the
beyond-reference pattern demonstration alongside the older-API
``running_user_totals`` (sessionize.py) so both state APIs are covered.

ENVIRONMENT GATE: executing State V2 requires ``google.protobuf`` (the
state-server wire protocol, imported by
pyspark.sql.streaming.proto.StateMessage_pb2), which is not installed
in this container — check :func:`state_v2_available` before running;
the operator itself and its plan construction are real and tested where
protobuf exists, and ``running_user_totals`` (applyInPandasWithState)
is the fully-exercised stateful path here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

def state_v2_available() -> bool:
    """True when the transformWithStateInPandas runtime can actually
    execute here (its state server speaks protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("mean_value", DoubleType()),
        StructField("var_value", DoubleType()),
    ]
)

_STATS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _make_processor():
    """Processor factory: imported lazily so the module stays importable
    on Spark versions without the State-V2 API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _STATS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, mean, m2 = (
                self._stats.get() if self._stats.exists() else (0, 0.0, 0.0)
            )
            for pdf in rows:
                # dropna, NOT fillna: SQL aggregates skip NULLs, and the
                # batch twin (avg / var_pop) is the parity contract
                for v in pdf["value"].dropna().astype(float):
                    # Welford: numerically stable single-pass moments
                    n += 1
                    delta = v - mean
                    mean += delta / n
                    m2 += delta * (v - mean)
            self._stats.update((n, mean, m2))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "mean_value": [mean],
                    "var_value": [m2 / n if n else 0.0],
                }
            )

        def close(self) -> None:
            pass

    return RunningStatsProcessor()


def running_user_stats(
    events: DataFrame, require_runtime: bool = True
) -> DataFrame:
    """Per-user running (count, mean, population variance) emitted each
    micro-batch the user appears in — State V2 transformWithStateInPandas.

    Fails fast (RuntimeError) when the State-V2 runtime can't execute
    here (``google.protobuf`` absent), instead of handing back a plan
    that dies mid-stream in the state server; ``running_user_totals``
    (sessionize.py, applyInPandasWithState) is the fully-supported
    stateful path in that environment. Pass ``require_runtime=False``
    to build the plan anyway (schema/wiring tests, or sessions that
    ship the plan to a cluster that does have protobuf)."""
    if require_runtime and not state_v2_available():
        raise RuntimeError(
            "State V2 (transformWithStateInPandas) cannot execute here: "
            "google.protobuf is not installed (its state-server wire "
            "protocol requires it). Use running_user_totals "
            "(streaming.sessionize, applyInPandasWithState) instead, or "
            "install protobuf."
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=RUNNING_STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
