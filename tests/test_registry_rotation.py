"""Guard the driver-certification rotation (round 16).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. CORRECTNESS_r15 certified exactly ``_r15_front()``
50/50 green — consuming the rewritten re-certs, the whole round-6
staleness pool, and the first two round-15 additions. That leaves
exactly 43 registry entries with NO driver row ever (the round-15
addition overflow) plus the untouched 49-query round-8 evidence pool.
The r16 front pins the 43 orphans first — closing driver coverage to
334/334 ever-certified — then backfills its 7 remaining slots from the
round-8 pool. Every pool is recomputed here from the artifact files so
the pin cannot drift.
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
    R8_STALE_FILL,
    R15_ADDITIONS,
    R16_ADDITIONS,
    R16_REWRITTEN_RECERTS,
    _r15_front,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r16 front was pinned (r1..r15; the r7
# and r12 drivers never ran, so those files are legitimately absent).
# Later rounds append artifacts; the derivation stays frozen on this
# evidence.
_PRE_R16_ARTIFACTS = tuple(
    f"CORRECTNESS_r{n:02d}.json" for n in range(1, 16)
)


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R16_ARTIFACTS:
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


def test_r15_window_matches_r15_front():
    # The premise of the rotation: the r15 driver certified exactly the
    # pinned _r15_front() set, all green.
    path = os.path.join(REPO, "CORRECTNESS_r15.json")
    with open(path) as f:
        rows = json.load(f)
    assert set(rows) == set(_r15_front())
    bad = {
        n: r
        for n, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and not r.get("err"))
    }
    assert not bad, f"r15 rows not green: {sorted(bad)}"


def test_orphan_pool_is_exactly_r15_addition_overflow():
    # The only queries with no driver row ever are the 43 round-15
    # additions that did not fit the r15 window, plus this round's own
    # additions (queued for r17); the r16 head must be exactly the r15
    # overflow, in R15_ADDITIONS order.
    latest = _latest_green_round()
    orphans = [n for n in QUERIES if n not in latest]
    expected_head = [n for n in R15_ADDITIONS if n not in set(_r15_front())]
    expected = expected_head + list(R16_ADDITIONS)
    assert sorted(orphans) == sorted(expected), (
        f"orphan pool drifted from evidence: "
        f"missing={sorted(set(orphans) - set(expected))} "
        f"extra={sorted(set(expected) - set(orphans))}"
    )
    assert len(expected_head) == 43
    assert list(CERTIFICATION_FRONT[: len(expected_head)]) == expected_head


def test_r8_fill_pool_matches_artifacts():
    # The round-8 evidence pool was untouched by r13-r15 windows; it is
    # still the 49 queries whose newest green row is round 8, and it
    # supplies the r16 backfill.
    latest = _latest_green_round()
    r8 = [n for n in QUERIES if latest.get(n) == 8]
    assert r8 == list(R8_STALE_FILL), (
        f"r8 fill pool drifted from evidence: "
        f"missing={sorted(set(r8) - set(R8_STALE_FILL))} "
        f"extra={sorted(set(R8_STALE_FILL) - set(r8))}"
    )
    assert len(r8) == 49


def test_front_is_orphans_then_r8_fill():
    certified_r15 = set(_r15_front())
    head = [n for n in R15_ADDITIONS if n not in certified_r15]
    fill = [n for n in R8_STALE_FILL if n not in certified_r15 and n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected
    # The never-certified orphans must never be displaced by fill.
    assert list(CERTIFICATION_FRONT[: len(head)]) == head


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"front names not in registry: {dangling}"
    dangling = [
        n
        for n in (*R15_ADDITIONS, *R8_STALE_FILL)
        if n not in QUERIES
    ]
    assert not dangling, f"pinned names not in registry: {dangling}"


def test_front_differs_from_r15_window():
    # The r5/r6 (and again r11) failure mode: two rounds burned the
    # driver window on the same 50 names. Nothing in the r16 window may
    # repeat the r15 window — the orphans were never sampled and the r8
    # pool predates it.
    repeats = set(_r15_front()) & set(CERTIFICATION_FRONT)
    assert not repeats, (
        f"r16 front repeats r15 window: {sorted(repeats)}"
    )


def test_fill_overflow_queues_directly_behind_window():
    # r17 priority: stale-by-code re-certs first (code changed after
    # their newest driver row), then the r8-pool leftovers, then this
    # round's never-certified additions.
    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow: list[str] = []
    for n in (
        *R16_REWRITTEN_RECERTS,
        *R15_ADDITIONS,
        *R8_STALE_FILL,
        *R16_ADDITIONS,
    ):
        if n in QUERIES and n not in front and n not in overflow:
            overflow.append(n)
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "fill overflow must head the r17 queue"
    assert list(R16_REWRITTEN_RECERTS) == overflow[: len(R16_REWRITTEN_RECERTS)]


def test_r16_rewritten_recerts_are_outside_window_with_older_rows():
    # Membership criterion: a driver row exists, but the round-16
    # materialize_result refactor touched the query after it.
    latest = _latest_green_round()
    for n in R16_REWRITTEN_RECERTS:
        assert n in QUERIES
        assert n not in set(CERTIFICATION_FRONT)
        assert latest.get(n), f"{n} has no driver row — belongs in additions"


def test_window_queries_all_have_oracles():
    # Every r16 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
