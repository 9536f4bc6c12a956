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
    DRIVER_WINDOW,
    QUERIES,
    R8_ADDITIONS,
    R8_BACKFILL,
    R8_PRIORITY,
    certification_order,
)


def test_round_priority_inside_driver_window():
    # New r8 queries and the never-certified r7 overflow both have zero
    # driver rows; every one must land inside the window. (If R8_ADDITIONS
    # grows past the window capacity, this fails loudly and the front must
    # be re-triaged by hand rather than silently dropping priority names.)
    window = set(certification_order()[:DRIVER_WINDOW])
    missing = [n for n in R8_ADDITIONS + R8_PRIORITY if n not in window]
    assert not missing, (
        f"priority queries outside the first-{DRIVER_WINDOW} driver window "
        f"(stale CERTIFICATION_FRONT): {missing}"
    )


def test_front_names_all_registered():
    composed = R8_ADDITIONS + R8_PRIORITY + R8_BACKFILL
    dangling = [n for n in composed if n not in QUERIES]
    assert not dangling, f"rotation names not in registry: {dangling}"
    assert len(set(composed)) == len(composed), "duplicate names in rotation"


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW


def test_front_differs_from_r7_window():
    # The r5/r6 failure mode: two rounds burned the driver window on the
    # same 50 names. The r7 window opened with the 10 r7-priority names;
    # none of them belongs in the r8 window.
    r7_head = {"cdc_scd2_history", "cohort_retention_weekly", "dedup_clusters"}
    assert not r7_head & set(CERTIFICATION_FRONT), "r8 front repeats the r7 window"


def test_priority_queries_all_have_oracles():
    # Every r8 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
