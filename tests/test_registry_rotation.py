"""Guard the driver-certification rotation (VERDICT r8 item 1).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. After r8, exactly 50 registered queries had no green
driver row in any CORRECTNESS artifact (the r7 driver window never ran).
The r9 front must be exactly that never-certified set — recomputed here
from the artifact files themselves, so the pin cannot drift from the
evidence — after which every registered query has >=1 driver row ever.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__  # noqa: F401  (registers every query)
from mk_kafka_connect_spark.plans.registry import (
    CERTIFICATION_FRONT,
    DRIVER_WINDOW,
    QUERIES,
    R9_ADDITIONS,
    R9_NEVER_CERTIFIED,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# CORRECTNESS files that existed when the r9 front was pinned. Later
# rounds append artifacts; the front derivation must stay frozen on the
# evidence it was computed from, so enumerate r1..r8 explicitly.
_PRE_R9_ARTIFACTS = tuple(
    f"CORRECTNESS_r0{n}.json" for n in range(1, 9)
)


def _ever_certified_before_r9() -> set[str]:
    certified: set[str] = set()
    for fname in _PRE_R9_ARTIFACTS:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):  # r7 never ran — expected hole
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                certified.add(name)
    return certified


def test_front_is_exactly_the_never_certified_set():
    # Recompute from artifacts; queries registered after the r9 pin
    # (R9_ADDITIONS) are excluded — they queue for the r10 window.
    certified = _ever_certified_before_r9()
    new_this_round = set(R9_ADDITIONS)
    never = {
        n for n in QUERIES if n not in certified and n not in new_this_round
    }
    assert never == set(R9_NEVER_CERTIFIED), (
        f"front drifted from evidence: missing={sorted(never - set(R9_NEVER_CERTIFIED))} "
        f"extra={sorted(set(R9_NEVER_CERTIFIED) - never)}"
    )


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"front names not in registry: {dangling}"


def test_front_differs_from_r8_window():
    # The r5/r6 failure mode: two rounds burned the driver window on the
    # same 50 names. Spot-check the r8 head; none belongs in the r9 window.
    r8_head = {"events_ohlc_hourly", "events_ewma", "streaming_cdc_scd1"}
    assert not r8_head & set(CERTIFICATION_FRONT), "r9 front repeats the r8 window"


def test_r9_additions_queue_directly_behind_window():
    order = certification_order()
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(R9_ADDITIONS)]
    expected = [n for n in R9_ADDITIONS if n in QUERIES]
    assert behind == expected, "r9 additions must head the r10 queue"
    dangling = [n for n in R9_ADDITIONS if n not in QUERIES]
    assert not dangling, f"R9_ADDITIONS names not in registry: {dangling}"


def test_window_queries_all_have_oracles():
    # Every r9 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
