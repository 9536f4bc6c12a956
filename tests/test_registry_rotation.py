"""Guard the driver-certification rotation (round 17).

The driver hash-checks only the FIRST 50 entries of the exposed query
dict per round. CORRECTNESS_r16 certified exactly ``_r16_front()``
50/50 green — consuming the 43 never-certified r15-addition orphans
plus the 7 stalest r8-pool queries. The r17 front pins the 20 priority
queries first — the 9 stale-by-code R16_REWRITTEN_RECERTS and the 11
never-certified R16_ADDITIONS — then backfills its 30 remaining slots
from the r8-evidence pool leftover. The 11 pool queries that do not
fit are pinned as R18_STALE_HEAD so the r8 pool provably drains to
zero next round. Every pool is recomputed here from the artifact
files so the pin cannot drift.
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
    R16_ADDITIONS,
    R16_REWRITTEN_RECERTS,
    R17_ADDITIONS,
    R18_STALE_HEAD,
    _r15_front,
    _r16_front,
    certification_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifacts that existed when the r17 front was pinned (r1..r16; the r7
# and r12 drivers never ran, so those files are legitimately absent).
# Later rounds append artifacts; the derivation stays frozen on this
# evidence.
_PRE_R17_ARTIFACTS = tuple(
    f"CORRECTNESS_r{n:02d}.json" for n in range(1, 17)
)


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fname in _PRE_R17_ARTIFACTS:
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


def test_r16_window_matches_r16_front():
    # The premise of the rotation: the r16 driver certified exactly the
    # pinned _r16_front() set, all green.
    path = os.path.join(REPO, "CORRECTNESS_r16.json")
    with open(path) as f:
        rows = json.load(f)
    assert set(rows) == set(_r16_front())
    bad = {
        n: r
        for n, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and not r.get("err"))
    }
    assert not bad, f"r16 rows not green: {sorted(bad)}"


def test_orphan_pool_is_exactly_r16_additions():
    # The only queries with no driver row ever are the 11 round-16
    # additions (plus this round's own additions, queued for r18); the
    # r17 head carries every one of them.
    latest = _latest_green_round()
    orphans = [n for n in QUERIES if n not in latest]
    expected = list(R16_ADDITIONS) + list(R17_ADDITIONS)
    assert sorted(orphans) == sorted(expected), (
        f"orphan pool drifted from evidence: "
        f"missing={sorted(set(orphans) - set(expected))} "
        f"extra={sorted(set(expected) - set(orphans))}"
    )
    assert set(R16_ADDITIONS) <= set(CERTIFICATION_FRONT)


def test_r8_leftover_pool_matches_artifacts():
    # After the r16 fill consumed 7, the queries whose newest green row
    # is still round 8 are the 42-query leftover (one of which,
    # streaming_cdc_scd1, rides in the recert head instead of the fill).
    latest = _latest_green_round()
    r8 = [n for n in QUERIES if latest.get(n) == 8]
    expected = [n for n in R8_STALE_FILL if n not in set(_r16_front())]
    assert r8 == expected, (
        f"r8 leftover pool drifted from evidence: "
        f"missing={sorted(set(r8) - set(expected))} "
        f"extra={sorted(set(expected) - set(r8))}"
    )
    assert len(r8) == 42


def test_front_is_priority_head_then_r8_fill():
    head = list(R16_REWRITTEN_RECERTS)
    head += [n for n in R16_ADDITIONS if n not in head]
    assert len(head) == 20
    consumed = set(_r15_front()) | set(_r16_front())
    fill = [n for n in R8_STALE_FILL if n not in consumed and n not in head]
    expected = tuple((head + fill)[:DRIVER_WINDOW])
    assert CERTIFICATION_FRONT == expected
    # The priority head must never be displaced by fill.
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
        for n in (*R16_ADDITIONS, *R16_REWRITTEN_RECERTS, *R8_STALE_FILL)
        if n not in QUERIES
    ]
    assert not dangling, f"pinned names not in registry: {dangling}"


def test_front_differs_from_r16_window():
    # The r5/r6 (and again r11) failure mode: two rounds burned the
    # driver window on the same 50 names. Nothing in the r17 window may
    # repeat the r16 window. (cdc_incremental_cron_replay repeating the
    # *r15* window is correct — it is a stale-by-code re-cert.)
    repeats = set(_r16_front()) & set(CERTIFICATION_FRONT)
    assert not repeats, (
        f"r17 front repeats r16 window: {sorted(repeats)}"
    )


def test_r18_stale_head_drains_the_pool():
    # R18_STALE_HEAD must be exactly the r8-pool queries no window has
    # consumed — scheduling them at the r18 head drains the pool to
    # zero within two rounds (VERDICT r16 #2).
    consumed = (
        set(_r15_front()) | set(_r16_front()) | set(CERTIFICATION_FRONT)
    )
    expected = tuple(n for n in R8_STALE_FILL if n not in consumed)
    assert R18_STALE_HEAD == expected
    assert len(R18_STALE_HEAD) == 11
    latest = _latest_green_round()
    for n in R18_STALE_HEAD:
        assert latest.get(n) == 8


def test_stale_overflow_queues_directly_behind_window():
    # r18 priority: the r8-pool leftover first, then this round's
    # stale-by-code re-certs, then its never-certified additions.
    from mk_kafka_connect_spark.plans.registry import R17_REWRITTEN_RECERTS

    order = certification_order()
    front = set(CERTIFICATION_FRONT)
    overflow: list[str] = []
    for n in (*R18_STALE_HEAD, *R17_REWRITTEN_RECERTS, *R17_ADDITIONS):
        if n in QUERIES and n not in front and n not in overflow:
            overflow.append(n)
    behind = order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)]
    assert behind == overflow, "stale overflow must head the r18 queue"


def test_r16_rewritten_recerts_have_older_rows_and_ride_the_window():
    # Membership criterion: a driver row exists, but round-16 code
    # changes touched the query (or a helper it calls) after it. The
    # set is derived mechanically by tests/test_stale_by_code.py from
    # the QUERY_FINGERPRINTS.json ledger going forward; here we pin
    # that every member has prior evidence and a seat in the window.
    latest = _latest_green_round()
    for n in R16_REWRITTEN_RECERTS:
        assert n in QUERIES
        assert n in set(CERTIFICATION_FRONT)
        assert latest.get(n), f"{n} has no driver row — belongs in additions"
    # The specific ADVICE-r16 correction: the untouched query is out,
    # the touched one is in.
    assert "streaming_topk_per_window" not in R16_REWRITTEN_RECERTS
    assert "cdc_incremental_cron_replay" in R16_REWRITTEN_RECERTS


def test_window_queries_all_have_oracles():
    # Every r17 window query claims a full DuckDB value-hash oracle —
    # a rows-only driver row would not discharge the certification debt.
    missing = [n for n in CERTIFICATION_FRONT if QUERIES[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
