"""Guard the driver-certification rotation (round 14).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. CORRECTNESS_r13 certified exactly ``_r12_front()``
50/50 green, which leaves 34 registry entries with NO driver row in any
CORRECTNESS artifact: the 11 round-12 additions past the r13 window plus
all 23 round-13 additions. The r14 front pins those 34 first, then
round-14 additions, then fills the free slots from the stalest surviving
evidence (newest green row = round 6). Every set is recomputed here from
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
    R12_ADDITIONS,
    R13_ADDITIONS,
    R14_ADDITIONS,
    _r12_front,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r14 front was pinned (r1..r13; the r7
# and r12 drivers never ran, so those files are legitimately absent).
# Later rounds append artifacts; the derivation stays frozen on this
# evidence.
_PRE_R14_ARTIFACTS = tuple(
    f"CORRECTNESS_r{n:02d}.json" for n in range(1, 14)
)


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R14_ARTIFACTS:
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


def _never_certified() -> list[str]:
    """The artifact-derived head: registered queries with no green row ever,

    in certification-queue order (r12-addition overflow first, then the
    round-13 additions) — the exact order _r14_front() pins them.
    """
    latest = _latest_green_round()
    queue = [n for n in R12_ADDITIONS if n not in latest]
    queue += [n for n in R13_ADDITIONS if n not in latest and n not in queue]
    return queue


def test_r13_window_matches_r12_front():
    # The premise of the rotation: the r13 driver certified exactly the
    # pinned _r12_front() set, all green.
    path = os.path.join(REPO, "CORRECTNESS_r13.json")
    with open(path) as f:
        rows = json.load(f)
    assert set(rows) == set(_r12_front())
    bad = {
        n: r
        for n, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and not r.get("err"))
    }
    assert not bad, f"r13 rows not green: {sorted(bad)}"


def test_never_certified_set_matches_artifacts():
    # Exactly 34 registered queries have no green driver row ever, and
    # they are exactly the r12-overflow + r13 additions (outside the
    # round-14 additions, which are new by definition).
    latest = _latest_green_round()
    orphans = sorted(
        n for n in QUERIES if n not in latest and n not in R14_ADDITIONS
    )
    assert orphans == sorted(_never_certified()), (
        f"never-certified set drifted from evidence: artifacts say {orphans}"
    )


def test_r6_fill_pool_matches_artifacts():
    latest = _latest_green_round()
    r6 = [n for n in QUERIES if latest.get(n) == 6]
    assert r6 == list(R6_STALE_FILL), (
        f"r6 fill pool drifted from evidence: "
        f"missing={sorted(set(r6) - set(R6_STALE_FILL))} "
        f"extra={sorted(set(R6_STALE_FILL) - set(r6))}"
    )


def test_front_is_never_certified_then_additions_then_fill():
    head = _never_certified()
    head += [n for n in R14_ADDITIONS if n not in head]
    fill = [n for n in R6_STALE_FILL if n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected
    # The never-certified queries must never be displaced by additions
    # or fill.
    owed = _never_certified()
    assert list(CERTIFICATION_FRONT[: len(owed)]) == owed


def test_front_fills_driver_window_exactly():
    # A short front silently promotes registration-order filler into the
    # window; a long front silently drops its own tail. Pin it to 50.
    assert len(CERTIFICATION_FRONT) == DRIVER_WINDOW
    assert len(set(CERTIFICATION_FRONT)) == DRIVER_WINDOW
    dangling = [n for n in CERTIFICATION_FRONT if n not in QUERIES]
    assert not dangling, f"front names not in registry: {dangling}"
    dangling = [
        n
        for n in (*R12_ADDITIONS, *R13_ADDITIONS, *R14_ADDITIONS)
        if n not in QUERIES
    ]
    assert not dangling, f"pinned names not in registry: {dangling}"


def test_front_differs_from_r13_window():
    # The r5/r6 (and again r11) failure mode: two rounds burned the
    # driver window on the same 50 names. Nothing certified green in the
    # r13 window belongs in the r14 window.
    repeats = set(_r12_front()) & set(CERTIFICATION_FRONT)
    assert not repeats, f"r14 front repeats the r13 window: {sorted(repeats)}"


def test_fill_overflow_queues_directly_behind_window():
    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow = [
        n
        for n in (*R6_STALE_FILL, *R14_ADDITIONS)
        if n in QUERIES and n not in front
    ]
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "fill overflow must head the r15 queue"


def test_window_queries_all_have_oracles():
    # Every r14 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
