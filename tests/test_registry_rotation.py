"""Guard the driver-certification rotation (round 10).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. CORRECTNESS_r09 went 50/50 green on the r9 backlog, so
every query registered before round 9 now has >=1 driver row ever. The
r10 window therefore certifies (a) the 16 queries added during r9
(zero driver rows yet), (b) everything added during r10, and (c) fills
the remaining slots by RE-certifying the stalest evidence — queries
whose newest green driver row is still round 2. The stale set is
recomputed here from the artifact files so the pin cannot drift.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__  # noqa: F401  (registers every query)
from mk_kafka_connect_spark.plans.registry import (
    CERTIFICATION_FRONT,
    DRIVER_WINDOW,
    QUERIES,
    R2_STALE_RECERTS,
    R9_ADDITIONS,
    R10_ADDITIONS,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r10 front was pinned (r1..r9; the r7
# driver never ran, so that file is legitimately absent). Later rounds
# append artifacts; the derivation stays frozen on this evidence.
_PRE_R10_ARTIFACTS = tuple(f"CORRECTNESS_r0{n}.json" for n in range(1, 10))


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R10_ARTIFACTS:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        rnd = int(re.search(r"r0(\d+)", fname).group(1))
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
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_every_pre_r9_query_has_a_driver_row():
    # The r9 window closed the coverage bar: nothing registered before
    # round 9 may be driver-uncertified. (R9/R10 additions are the only
    # allowed holes — they are what the r10 front exists to certify.)
    latest = _latest_green_round()
    new = set(R9_ADDITIONS) | set(R10_ADDITIONS)
    holes = [n for n in QUERIES if n not in latest and n not in new]
    assert not holes, f"driver-uncertified queries outside the new-query set: {holes}"


def test_stale_recert_list_matches_artifacts():
    latest = _latest_green_round()
    stale = sorted(n for n, r in latest.items() if r <= 2 and n in QUERIES)
    assert stale == sorted(R2_STALE_RECERTS), (
        f"stale set drifted from evidence: "
        f"missing={sorted(set(stale) - set(R2_STALE_RECERTS))} "
        f"extra={sorted(set(R2_STALE_RECERTS) - set(stale))}"
    )


def test_front_is_new_queries_then_stale_recerts():
    head = list(R9_ADDITIONS) + [
        n for n in R10_ADDITIONS if n not in R9_ADDITIONS
    ]
    fill = [n for n in R2_STALE_RECERTS if n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"front names not in registry: {dangling}"
    dangling = [n for n in (*R9_ADDITIONS, *R10_ADDITIONS) if n not in QUERIES]
    assert not dangling, f"addition names not in registry: {dangling}"


def test_front_differs_from_r9_window():
    # The r5/r6 failure mode: two rounds burned the driver window on the
    # same 50 names. Spot-check the r9 head; none belongs in the r10
    # window (they were all certified green in CORRECTNESS_r09).
    r9_head = {"agg_approx_distinct", "cdc_scd2_history", "docs_pack_sequences"}
    assert not r9_head & set(CERTIFICATION_FRONT), "r10 front repeats the r9 window"


def test_recert_overflow_queues_directly_behind_window():
    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow = [n for n in R2_STALE_RECERTS if n not in front]
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "re-cert overflow must head the r11 queue"


def test_window_queries_all_have_oracles():
    # Every r10 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
