"""Registry integrity: the certification front must be real queries.

Round 3 shipped 12 CERTIFICATION_FRONT names with no implementation —
``certification_order()`` silently dropped them, so the intended first-50
pinning was partly a no-op and nobody noticed until the driver ran. These
tests (plus the import-time guard in ``plans/__init__.py``) make that
class of drift fail loudly."""

from __future__ import annotations

from mk_kafka_connect_spark.plans import (
    CERTIFICATION_FRONT,
    QUERIES,
    certification_order,
    oracle_queries,
    spark_queries,
)


def test_front_names_all_registered():
    missing = set(CERTIFICATION_FRONT) - set(QUERIES)
    assert not missing, f"CERTIFICATION_FRONT entries not in registry: {sorted(missing)}"


def test_front_has_no_duplicates():
    assert len(CERTIFICATION_FRONT) == len(set(CERTIFICATION_FRONT))


def test_certification_order_is_a_permutation_of_registry():
    order = certification_order()
    assert sorted(order) == sorted(QUERIES)
    assert order[: len(CERTIFICATION_FRONT)] == list(CERTIFICATION_FRONT)


def test_driver_window_covers_all_tpch_queries():
    """The 12 r3/r4 TPC-H queries must sit inside the driver's first-50
    certification window to get their first driver row this round."""
    window = set(certification_order()[:50])
    tpch = {n for n in QUERIES if n.startswith("q") and "_" in n}
    front_tpch = {n for n in CERTIFICATION_FRONT if n in tpch}
    assert front_tpch <= window


def test_exposed_dicts_follow_certification_order():
    assert list(spark_queries()) == certification_order()
    oracle_names = [n for n in certification_order() if QUERIES[n].oracle is not None]
    assert list(oracle_queries()) == oracle_names


def test_scale_probe_set_is_registered():
    """Every query the scaling probe reports on must exist in the
    registry — keeps SCALING.md's tool from silently probing nothing."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scale_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from mk_kafka_connect_spark.plans import QUERIES

    missing = [n for n in mod.PROBE_SET if n not in QUERIES]
    assert not missing, f"probe set names not registered: {missing}"
