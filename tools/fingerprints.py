"""Source fingerprints for every registered query — the mechanical
stale-by-code detector (ADVICE r16, medium).

Round 16's hand-typed R16_REWRITTEN_RECERTS list both included a query
the diff never touched (streaming_topk_per_window) and omitted one it
did (cdc_incremental_cron_replay, whose backing helper
_run_incremental_cron_replay received the materialize_result swap).
Hand-derived stale-by-code lists cannot be trusted; this module derives
them.

A query's fingerprint is a SHA-256 over the concatenated sources of:

- the query function itself (``inspect.getsource`` includes the
  ``@query(...)`` decorator text, so the oracle SQL and tags are
  covered for free), and
- transitively, every function / class defined inside the
  ``mk_kafka_connect_spark`` package that the query's code references
  by name — resolved through the module globals, following one
  ``Attribute`` hop for module aliases (``SW.run_to_memory``) and
  class methods. This is exactly the closure that bit round 16: the
  query body was untouched but a shared helper changed.

``QUERY_FINGERPRINTS.json`` at the repo root is the ledger: for each
query, the fingerprint its newest driver-certified (or, at bootstrap,
builder-certified) code had, plus the evidence round. The guard test
``tests/test_stale_by_code.py`` recomputes HEAD fingerprints and fails
if any query drifted from its ledgered fingerprint without sitting in
the pending re-certification set (CERTIFICATION_FRONT or the staged
r18 queue) — so a changed query can no longer silently keep a green
driver row from old code.

Refresh after a driver round with::

    python tools/fingerprints.py refresh --round 17 \
        --certified CORRECTNESS_r17.json

which re-stamps only the queries that round actually certified.
``python tools/fingerprints.py check`` prints the drift report.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEDGER = os.path.join(REPO, "QUERY_FINGERPRINTS.json")
PACKAGE = "mk_kafka_connect_spark"


def _source(obj) -> str | None:
    try:
        return textwrap.dedent(inspect.getsource(obj))
    except (OSError, TypeError):
        return None


def _in_package(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return bool(mod) and (mod == PACKAGE or mod.startswith(PACKAGE + "."))


def _referenced_names(src: str) -> list[tuple[str, str | None]]:
    """(name, attr) pairs referenced in ``src``.

    ``(name, None)`` for bare ``Name`` loads; ``(base, attr)`` for
    single-hop ``base.attr`` attribute loads (module aliases like
    ``SW.run_to_memory`` and class attributes).
    """
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return []
    pairs: list[tuple[str, str | None]] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            pairs.append((node.id, None))
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            pairs.append((node.value.id, node.attr))
    return pairs


def _closure_sources(fn) -> dict[str, str]:
    """name -> source for fn plus its in-package reference closure.

    Names resolve through BOTH the function's module globals and its
    closure cells (``co_freevars``): registry queries are typically
    defined inside ``_register_*`` wrapper functions, so helpers they
    call (round 17's first miss: ``cosine_topk_bruteforce`` inside
    ``sim_knn_loo_eval``) arrive as cell references, not globals."""
    sources: dict[str, str] = {}
    seen: set[int] = set()
    # (qualifier, object) worklist; qualifier is a stable display name.
    stack: list[tuple[str, object]] = [(fn.__qualname__, fn)]
    while stack:
        qual, obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        src = _source(obj)
        if src is None:
            continue
        key = f"{getattr(obj, '__module__', '?')}.{qual}"
        sources[key] = src
        glb = dict(getattr(obj, "__globals__", None) or {})
        if not glb:  # a class: resolve names through its module
            mod = sys.modules.get(getattr(obj, "__module__", ""), None)
            glb = dict(getattr(mod, "__dict__", {}))
        cells = getattr(obj, "__closure__", None)
        if cells:
            for cname, cell in zip(obj.__code__.co_freevars, cells):
                try:
                    glb[cname] = cell.cell_contents
                except ValueError:  # empty cell
                    continue
        for name, attr in _referenced_names(src):
            target = glb.get(name)
            if target is None:
                continue
            if attr is not None:
                target = getattr(target, attr, None)
                if target is None:
                    continue
            # unwrap plain module aliases only via the attr hop above
            if inspect.isfunction(target) or inspect.isclass(target):
                if _in_package(target):
                    stack.append((getattr(target, "__qualname__", name), target))
    return sources


# Dynamic registry composition: queries like the recall/ndcg reports
# call other queries via QUERIES["name"].fn and interpolate their
# .oracle into an f-string at registration time — neither edge is
# visible to static name resolution, so a component change would leave
# the composed query's fingerprint unmoved. Chase the string literals.
_REGISTRY_REF = re.compile(r"(?:_Q|QUERIES)\[\s*['\"]([A-Za-z0-9_]+)['\"]\s*\]")


def _fingerprint_inputs(name, spec, registry, stack=()) -> list[str]:
    if name in stack:  # cycle guard (mutual composition)
        return [f"### cycle:{name}"]
    parts = _closure_sources(spec.fn)
    blob = [f"### {k}\n{parts[k]}" for k in sorted(parts)]
    # the RESOLVED oracle (composed oracles embed component SQL) + tags
    blob.append(f"### oracle:{name}\n{spec.oracle or ''}")
    blob.append(f"### tags:{name}\n{tuple(spec.tags or ())!r}")
    refs = sorted(
        {m for src in parts.values() for m in _REGISTRY_REF.findall(src)}
    )
    for ref in refs:
        if ref in registry and ref != name:
            blob.extend(
                _fingerprint_inputs(ref, registry[ref], registry, stack + (name,))
            )
    return blob


def query_fingerprint(name, spec, registry) -> str:
    blob = "\n".join(_fingerprint_inputs(name, spec, registry))
    return hashlib.sha256(blob.encode()).hexdigest()


def head_fingerprints() -> dict[str, str]:
    import __spark_entry__  # noqa: F401  (registers every query)
    from mk_kafka_connect_spark.plans.registry import QUERIES

    return {
        name: query_fingerprint(name, spec, QUERIES)
        for name, spec in QUERIES.items()
    }


def load_ledger() -> dict:
    if not os.path.exists(LEDGER):
        return {}
    with open(LEDGER) as f:
        return json.load(f)


def drifted(ledger: dict | None = None) -> dict[str, dict]:
    """Queries whose HEAD fingerprint differs from the ledgered one."""
    ledger = load_ledger() if ledger is None else ledger
    head = head_fingerprints()
    out: dict[str, dict] = {}
    for name, fp in head.items():
        row = ledger.get(name)
        if row is None:
            out[name] = {"reason": "never-ledgered", "head": fp}
        elif row["fingerprint"] != fp:
            out[name] = {
                "reason": "drifted",
                "head": fp,
                "ledgered": row["fingerprint"],
                "evidence_round": row.get("evidence_round"),
            }
    return out


def cmd_bootstrap(round_no: int) -> None:
    """Stamp EVERY query with its current fingerprint.

    Only valid when the builder has just verified the full registry
    against the oracles on current code (the r17 bootstrap ran after a
    full-registry strict-parity pass), so 'current code' IS the
    certified code for every query.
    """
    head = head_fingerprints()
    ledger = {
        name: {"fingerprint": fp, "evidence_round": round_no}
        for name, fp in sorted(head.items())
    }
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"bootstrapped {len(ledger)} fingerprints at round {round_no}")


def cmd_refresh(round_no: int, certified_path: str) -> None:
    with open(certified_path) as f:
        rows = json.load(f)
    green = {
        n
        for n, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match")
        and r.get("schema_match")
        and not r.get("err")
    }
    ledger = load_ledger()
    head = head_fingerprints()
    for name in sorted(green):
        if name in head:
            ledger[name] = {
                "fingerprint": head[name],
                "evidence_round": round_no,
            }
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"refreshed {len(green)} fingerprints at round {round_no}")


def cmd_check() -> int:
    d = drifted()
    if not d:
        print("clean: every query matches its ledgered fingerprint")
        return 0
    for name, row in sorted(d.items()):
        print(f"{name}: {row['reason']} (evidence r{row.get('evidence_round')})")
    return 1


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("bootstrap")
    b.add_argument("--round", type=int, required=True)
    r = sub.add_parser("refresh")
    r.add_argument("--round", type=int, required=True)
    r.add_argument("--certified", required=True)
    sub.add_parser("check")
    args = p.parse_args()
    if args.cmd == "bootstrap":
        cmd_bootstrap(args.round)
    elif args.cmd == "refresh":
        cmd_refresh(args.round, args.certified)
    else:
        raise SystemExit(cmd_check())
