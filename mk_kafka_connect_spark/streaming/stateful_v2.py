"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark-4 successor to ``applyInPandasWithState`` (SURVEY.md §2.B B13/B14).

Same semantics as ``stateful.running_user_stats`` (per-key running
count / max / cent-exact total), expressed through the new
``StatefulProcessor`` contract: named state variables on an explicit
handle (value/list/map state, timers, TTL), RocksDB-backed state store.
At scale the TWS form is preferred — finer-grained state, state eviction
via TTL, and schema evolution support.

ENV-GATED (like ``sources/kafka.py``): TWS's driver-side Python worker
requires the ``google.protobuf`` package, which this container lacks
(verified: the worker crashes with ``ImportError: cannot import name
'descriptor' from 'google.protobuf'``). ``tws_available()`` probes for
it; the operator raises a clear error when unavailable, and the
registered query surface uses ``stateful.running_user_stats``
(applyInPandasWithState) instead — identical semantics, driver-certified.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

__all__ = ["running_user_stats_tws", "tws_available"]


def tws_available() -> bool:
    """True when the TWS Python driver worker's dependencies exist."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

OUTPUT_SCHEMA = "user_id long, n_seen long, max_value double, total_value double"
STATE_SCHEMA = "n long, mx double, total double"

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


class _RunningStats(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key: tuple[Any, ...], rows, timerValues):
        (user_id,) = key
        if self._state.exists():
            n, mx, total = tuple(self._state.get())
        else:
            n, mx, total = 0, float("-inf"), 0.0
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
                # Cent-exact accumulation: values are 2-decimal payments.
                total += float((pdf["value"] * 100).round().sum()) / 100.0
        self._state.update((n, mx, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_seen": [n],
                "max_value": [mx],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, max, exact total) in named value state via
    transformWithStateInPandas. State is O(keys); requires the RocksDB
    state store provider (set here — runtime-settable)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(absent in this container); use stateful.running_user_stats "
            "(applyInPandasWithState) — identical semantics"
        )
    spark = events.sparkSession
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    # _RunningStats is module-level -> pickled by reference; ship the
    # package so PYTHONPATH-less sessions' workers can import it (same
    # fix as stateful.running_user_stats).
    from ..session import ship_package

    ship_package(spark)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
