"""Guard the driver-certification rotation (round 12).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. The r10 AND r11 windows both certified the same
``_r10_front()`` set (round 11 shipped no registry change), so after
r11 the owed evidence is: 2 queries with NO driver row ever (the
rotation orphans) and 31 queries whose newest green row is still
round 2. The r12 front pins orphans + stale-r2 re-certs first, then
round-12 additions, then fills any free slots from the stalest
surviving evidence (newest green row = round 6). Every set is
recomputed here from the artifact files so the pin cannot drift.
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
    R2_STALE_RECERTS,
    R6_STALE_FILL,
    R12_ADDITIONS,
    R12_ORPHANS,
    R12_REWRITTEN,
    R13_ADDITIONS,
    _r10_front,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r12 front was pinned (r1..r11; the r7
# driver never ran, so that file is legitimately absent). Later rounds
# append artifacts; the derivation stays frozen on this evidence.
_PRE_R12_ARTIFACTS = tuple(
    f"CORRECTNESS_r{n:02d}.json" for n in range(1, 12)
)


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R12_ARTIFACTS:
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


def test_orphans_match_artifacts():
    # Exactly the registered queries with no green driver row ever —
    # outside the round-12 additions, which are new by definition.
    latest = _latest_green_round()
    orphans = sorted(
        n
        for n in QUERIES
        if n not in latest
        and n not in R12_ADDITIONS
        and n not in R13_ADDITIONS
    )
    assert orphans == sorted(R12_ORPHANS), (
        f"orphan set drifted from evidence: artifacts say {orphans}"
    )


def test_owed_stale_set_matches_artifacts():
    # The stale-r2 queries owed a re-cert are exactly R2_STALE_RECERTS
    # minus the five that made the r10/r11 windows.
    latest = _latest_green_round()
    stale = sorted(n for n, r in latest.items() if r <= 2 and n in QUERIES)
    owed = sorted(n for n in R2_STALE_RECERTS if n not in set(_r10_front()))
    assert stale == owed, (
        f"owed set drifted from evidence: "
        f"missing={sorted(set(stale) - set(owed))} "
        f"extra={sorted(set(owed) - set(stale))}"
    )


def test_r6_fill_pool_matches_artifacts():
    latest = _latest_green_round()
    r6 = [n for n in QUERIES if latest.get(n) == 6]
    assert r6 == list(R6_STALE_FILL), (
        f"r6 fill pool drifted from evidence: "
        f"missing={sorted(set(r6) - set(R6_STALE_FILL))} "
        f"extra={sorted(set(R6_STALE_FILL) - set(r6))}"
    )


def test_front_is_orphans_then_owed_then_rewrites_then_additions_then_fill():
    owed = list(R12_ORPHANS) + [
        n for n in R2_STALE_RECERTS if n not in set(_r10_front())
    ]
    head = owed + [n for n in R12_REWRITTEN if n not in owed]
    head += [n for n in R12_ADDITIONS if n not in head]
    fill = [n for n in R6_STALE_FILL if n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected
    # The 33 owed slots must never be displaced by rewrites/additions/fill.
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
        for n in (*R12_ORPHANS, *R12_REWRITTEN, *R12_ADDITIONS, *R13_ADDITIONS)
        if n not in QUERIES
    ]
    assert not dangling, f"pinned names not in registry: {dangling}"


def test_front_differs_from_r11_window():
    # The r5/r6 (and again r11) failure mode: two rounds burned the
    # driver window on the same 50 names. Nothing certified green in the
    # r10/r11 windows belongs in the r12 window — EXCEPT queries whose
    # plan was rewritten this round, whose old rows no longer attest the
    # shipped code.
    repeats = set(_r10_front()) & set(CERTIFICATION_FRONT) - set(R12_REWRITTEN)
    assert not repeats, f"r12 front repeats the r10/r11 window: {sorted(repeats)}"


def test_fill_overflow_queues_directly_behind_window():
    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow = [
        n
        for n in (*R12_ADDITIONS, *R6_STALE_FILL)
        if n in QUERIES and n not in front
    ]
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "fill overflow must head the r13 queue"


def test_window_queries_all_have_oracles():
    # Every r12 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
