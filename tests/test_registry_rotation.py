"""Guard the driver-certification rotation (VERDICT r6 items 1 & 5).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. Rounds 5 and 6 burned both windows on an identical,
stale CERTIFICATION_FRONT; this test makes that failure mode a CI error:
the declared priority set for the current round must sit inside the
first-50 window, the front must contain no dangling names, and the
window must be exactly the size the driver certifies.
"""

from __future__ import annotations

import __spark_entry__  # noqa: F401  (registers every query)
from mk_kafka_connect_spark.plans.registry import (
    CERTIFICATION_FRONT,
    QUERIES,
    R7_ADDITIONS,
    R7_PRIORITY,
    certification_order,
)

DRIVER_WINDOW = 50


def test_priority_queries_inside_driver_window():
    window = set(certification_order()[:DRIVER_WINDOW])
    missing = [n for n in R7_PRIORITY + R7_ADDITIONS if n not in window]
    assert not missing, (
        f"priority queries outside the first-{DRIVER_WINDOW} driver window "
        f"(stale CERTIFICATION_FRONT): {missing}"
    )


def test_front_names_all_registered():
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"CERTIFICATION_FRONT names not in registry: {dangling}"


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW


def test_priority_queries_all_have_oracles():
    # Every r7 priority query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in R7_PRIORITY + R7_ADDITIONS if QUERIES[n].oracle is None]
    assert not missing, f"priority queries without oracle SQL: {missing}"
