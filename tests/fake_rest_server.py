"""Compatibility shim: the fake REST server now ships with the package
(`mk_kafka_connect_spark.sources.fake_server`) so the driver-certified
`rest_scan_events` query can use it too. Tests import through here."""

from mk_kafka_connect_spark.sources.fake_server import FakeRestServer

__all__ = ["FakeRestServer"]
