"""Mechanical stale-by-code guard (ADVICE r16, medium).

Round 16's hand-typed recert list both included a query the diff never
touched and omitted one it did. This test makes that class of error
impossible going forward: ``QUERY_FINGERPRINTS.json`` holds, for every
registered query, the SHA-256 of its source closure (the query
function, its ``@query`` decorator text — hence oracle SQL and tags —
and transitively every in-package function/class it references, so a
shared-helper edit like round 16's ``materialize_result`` swap is
caught even when the query body is untouched).

The ledger was bootstrapped at commit 22a1fc2 — the exact code the r16
driver certified — and re-stamped each round from the new CORRECTNESS
artifact (r17: the 50-query window, refreshed at the unchanged
end-of-r17 code the driver ran). Any
query whose HEAD fingerprint differs from its ledgered one has
certification evidence from older code and MUST hold a pending
re-certification seat: the r18 window (CERTIFICATION_FRONT), the
staged r19 queue (R19_STALE_POOL), this round's derived recert list
(R18_REWRITTEN_RECERTS), or — for brand-new queries — R18_ADDITIONS.
Forgetting to queue a touched query now fails CI instead of waiting
for a judge to notice.

End-of-round, ``python tools/fingerprints.py refresh`` re-stamps the
queries the new CORRECTNESS artifact certified (and the bootstrap rule
re-runs after the round's strict-parity gate).
"""

from __future__ import annotations

import os
import sys

import __spark_entry__  # noqa: F401  (registers every query)
from mk_kafka_connect_spark.plans.registry import (
    CERTIFICATION_FRONT,
    QUERIES,
    R17_ADDITIONS,
    R18_ADDITIONS,
    R18_REWRITTEN_RECERTS,
    R19_REWRITTEN_RECERTS,
    R19_STALE_POOL,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import fingerprints  # noqa: E402


def test_ledger_covers_every_query():
    ledger = fingerprints.load_ledger()
    assert ledger, "QUERY_FINGERPRINTS.json missing — run fingerprints.py bootstrap"
    unledgered = [
        n
        for n in QUERIES
        if n not in ledger
        and n not in set(R17_ADDITIONS)
        and n not in set(R18_ADDITIONS)
    ]
    assert not unledgered, (
        f"queries with no ledgered fingerprint and no addition seat: "
        f"{unledgered}"
    )


def test_drifted_queries_hold_a_pending_recert_seat():
    pending = (
        set(CERTIFICATION_FRONT)
        | set(R19_STALE_POOL)
        | set(R18_REWRITTEN_RECERTS)
        | set(R19_REWRITTEN_RECERTS)
        | set(R18_ADDITIONS)
    )
    stranded = {
        name: row["reason"]
        for name, row in fingerprints.drifted().items()
        if name not in pending
    }
    assert not stranded, (
        "stale-by-code queries with no pending re-certification seat "
        f"(add them to R18_REWRITTEN_RECERTS): {sorted(stranded)}"
    )


def test_recert_list_members_actually_drifted():
    # The inverse guard — the r16 failure mode of listing an untouched
    # query. A seat in R18_REWRITTEN_RECERTS asserts the code changed;
    # if the fingerprint still matches the ledger, the listing is wrong
    # (or the ledger refresh already consumed it — then drop the seat).
    drifted = set(fingerprints.drifted())
    phantom = [n for n in R18_REWRITTEN_RECERTS if n not in drifted]
    assert not phantom, (
        f"R18_REWRITTEN_RECERTS entries whose code never drifted: {phantom}"
    )


def test_local_imports_join_the_closure():
    # ADVICE r18 (low): `from ..operators.multimodal import
    # ahash_near_dups` INSIDE the query body was invisible to the
    # round-18 tracer (it resolved names only through module globals
    # and closure cells), so tests here silently passed while r18
    # changed that operator. The upgraded tracer walks Import/
    # ImportFrom nodes in the function body; this pins the fix with the
    # exact query that slipped through.
    import inspect

    from mk_kafka_connect_spark.operators import multimodal

    srcs = fingerprints._closure_sources(QUERIES["multimodal_ahash_neardup"].fn)
    blob = "\n".join(srcs.values())
    assert inspect.getsource(multimodal.ahash_near_dups) in blob, (
        "function-local import not traced into the fingerprint closure"
    )


def test_qq_registry_alias_is_chased():
    # ADVICE r18 (medium): composed queries that index the registry via
    # the body-local `_QQ` alias (docs_neardup_overlap_matrix →
    # dedup_minhash_lsh) never had their components folded into the
    # fingerprint because _REGISTRY_REF only matched `_Q[`/`QUERIES[`.
    name = "docs_neardup_overlap_matrix"
    blob = "\n".join(
        fingerprints._fingerprint_inputs(name, QUERIES[name], QUERIES)
    )
    assert "def dedup_minhash_lsh" in blob, (
        "_QQ[...] component reference not chased into the fingerprint"
    )


def test_registry_ref_regex_covers_every_alias_in_package():
    # Mechanical guard for the alias set itself: find every
    # `<alias>["name"].fn / .oracle` indexing expression in the package
    # source and assert _REGISTRY_REF matches it, so a NEW alias
    # (tomorrow's `_QQQ`) cannot silently reopen the hole.
    import re

    pkg_dir = os.path.join(REPO, "mk_kafka_connect_spark")
    idx = re.compile(
        r"([A-Za-z_][A-Za-z0-9_]*)\[\s*['\"][A-Za-z0-9_]+['\"]\s*\]\s*\.\s*(?:fn|oracle)"
    )
    uncovered = set()
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if not f.endswith(".py"):
                continue
            src = open(os.path.join(root, f)).read()
            for m in idx.finditer(src):
                if not fingerprints._REGISTRY_REF.match(m.group(0)):
                    uncovered.add(m.group(1))
    assert not uncovered, (
        f"registry-indexing aliases invisible to _REGISTRY_REF: {uncovered}"
    )
