"""Engine facade tests: catalog/SQL/registry/transform/explain through one
object — the switch-over surface for a reference user."""

from __future__ import annotations

from mk_kafka_connect_spark.engine import Engine


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir).register()
    assert eng.sql("SELECT count(*) AS n FROM lineitem").first().n == 60000
    q1 = eng.query("q1_pricing_summary")
    assert q1.count() > 0 and "sum_qty" in q1.columns
    assert "q1_pricing_summary" in eng.queries()
    out = eng.transform(
        eng.table("events").select("event_id", "event_type"),
        [{"name": "string_cast", "fields": ["event_type"]}],
    ).first()
    assert out.event_type.startswith('"')
    plan = eng.explain("q3_shipping_priority")
    assert "BroadcastHashJoin" in plan and "PushedFilters" in plan
