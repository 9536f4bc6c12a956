"""Guard the driver-certification rotation (round 15).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. CORRECTNESS_r14 certified exactly ``_r14_front()``
50/50 green — closing 289/289 ever-certified. The r15 front pins, in
order: the three queries whose code or oracle was rewritten AFTER their
newest driver row (stale-by-code evidence), the 45 queries whose newest
green evidence is still round 6, round-15 additions, then backfill from
the 49-query round-8 evidence pool. Every pool is recomputed here from
the artifact files so the pin cannot drift.
"""

from __future__ import annotations

import json
import os
import re

import __spark_entry__  # noqa: F401  (registers every query)
from mk_kafka_connect_spark.plans.registry import (
    CERTIFICATION_FRONT,
    DRIVER_WINDOW,
    QUERIES,
    R6_STALE_FILL,
    R8_STALE_FILL,
    R15_ADDITIONS,
    R15_REWRITTEN_RECERTS,
    _r14_front,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r15 front was pinned (r1..r14; the r7
# and r12 drivers never ran, so those files are legitimately absent).
# Later rounds append artifacts; the derivation stays frozen on this
# evidence.
_PRE_R15_ARTIFACTS = tuple(
    f"CORRECTNESS_r{n:02d}.json" for n in range(1, 15)
)


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R15_ARTIFACTS:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        rnd = int(re.search(r"r(\d+)", fname).group(1))
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


def test_r14_window_matches_r14_front():
    # The premise of the rotation: the r14 driver certified exactly the
    # pinned _r14_front() set, all green.
    path = os.path.join(REPO, "CORRECTNESS_r14.json")
    with open(path) as f:
        rows = json.load(f)
    assert set(rows) == set(_r14_front())
    bad = {
        n: r
        for n, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and not r.get("err"))
    }
    assert not bad, f"r14 rows not green: {sorted(bad)}"


def test_every_query_certified_ever():
    # r14 closed full coverage: every registered query outside this
    # round's additions has at least one green driver row.
    latest = _latest_green_round()
    orphans = sorted(
        n for n in QUERIES if n not in latest and n not in R15_ADDITIONS
    )
    assert not orphans, f"queries with no driver row ever: {orphans}"


def test_r6_remaining_pool_matches_artifacts():
    # The r14 fill recertified 5 of the 50 r6-pool queries; exactly 45
    # remain with newest evidence = round 6, and they are exactly the
    # R6_STALE_FILL members outside the r14 window.
    latest = _latest_green_round()
    r6 = [n for n in QUERIES if latest.get(n) == 6]
    expected = [n for n in R6_STALE_FILL if n not in set(_r14_front())]
    assert r6 == expected, (
        f"r6 remaining pool drifted from evidence: "
        f"missing={sorted(set(r6) - set(expected))} "
        f"extra={sorted(set(expected) - set(r6))}"
    )
    assert len(r6) == 45


def test_r8_fill_pool_matches_artifacts():
    latest = _latest_green_round()
    r8 = [n for n in QUERIES if latest.get(n) == 8]
    assert r8 == list(R8_STALE_FILL), (
        f"r8 fill pool drifted from evidence: "
        f"missing={sorted(set(r8) - set(R8_STALE_FILL))} "
        f"extra={sorted(set(R8_STALE_FILL) - set(r8))}"
    )


def test_front_is_recerts_then_r6_pool_then_additions_then_fill():
    head = list(R15_REWRITTEN_RECERTS)
    head += [
        n
        for n in R6_STALE_FILL
        if n not in set(_r14_front()) and n not in head
    ]
    head += [n for n in R15_ADDITIONS if n not in head]
    fill = [n for n in R8_STALE_FILL if n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected
    # The stale-by-code re-certs must never be displaced by additions
    # or fill.
    assert list(CERTIFICATION_FRONT[: len(R15_REWRITTEN_RECERTS)]) == list(
        R15_REWRITTEN_RECERTS
    )


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"front names not in registry: {dangling}"
    dangling = [
        n
        for n in (*R15_REWRITTEN_RECERTS, *R15_ADDITIONS, *R8_STALE_FILL)
        if n not in QUERIES
    ]
    assert not dangling, f"pinned names not in registry: {dangling}"


def test_front_differs_from_r14_window():
    # The r5/r6 (and again r11) failure mode: two rounds burned the
    # driver window on the same 50 names. The ONLY r14-window queries
    # allowed back are the stale-by-code re-certs (their code/oracle
    # changed after the r14 row was recorded).
    repeats = set(_r14_front()) & set(CERTIFICATION_FRONT)
    allowed = set(R15_REWRITTEN_RECERTS)
    assert repeats <= allowed, (
        f"r15 front repeats r14 window beyond the rewritten re-certs: "
        f"{sorted(repeats - allowed)}"
    )


def test_fill_overflow_queues_directly_behind_window():
    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow = [
        n
        for n in (*R15_ADDITIONS, *R8_STALE_FILL)
        if n in QUERIES and n not in front
    ]
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "fill overflow must head the r16 queue"


def test_window_queries_all_have_oracles():
    # Every r15 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
