"""REST sink contract tests: batched POSTs, retry/backoff/429 parity with
the source client, per-task throttling, end-to-end Spark write."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mk_kafka_connect_spark.sources.rest_sink import _RestSinkWriter, register_sink

from .fake_rest_server import FakeRestServer


def test_rest_sink_end_to_end_spark_write(spark):
    with FakeRestServer({}) as srv:
        register_sink(spark)
        df = spark.range(0, 23).selectExpr("id", "CAST(id * 2 AS STRING) AS name")
        (
            df.repartition(2)
            .write.format("rest_sink")
            .option("url", srv.url)
            .option("entity", "customer")
            .option("batch.size", "5")
            .mode("append")
            .save()
        )
        posted = srv.posted["customer"]
        assert sorted(int(r["id"]) for r in posted) == list(range(23))
        posts = [r for r in srv.requests if r.startswith("POST")]
        # 23 rows over 2 partitions at batch.size=5 → 5 or 6 requests.
        assert 5 <= len(posts) <= 6


def test_rest_sink_retries_500_with_backoff():
    with FakeRestServer({}) as srv:
        w = _RestSinkWriter({"url": srv.url, "entity": "e"})
        sleeps: list[float] = []
        w.sleep = sleeps.append
        srv.fail_next(2)
        w._post_with_retry(b'{"records": []}', rng_seed=0)
        assert len(sleeps) == 2
        assert 1.0 <= sleeps[0] <= 1.1  # 2^0 + 10% jitter
        assert 2.0 <= sleeps[1] <= 2.2  # 2^1 + 10% jitter


def test_rest_sink_429_fixed_wait():
    with FakeRestServer({}) as srv:
        w = _RestSinkWriter({"url": srv.url, "entity": "e"})
        sleeps: list[float] = []
        w.sleep = sleeps.append
        srv.rate_limit_next(1)
        w._post_with_retry(b'{"records": []}', rng_seed=0)
        assert sleeps == [60.0]  # Task.java:318 fixed rate-limit wait


def test_rest_sink_gives_up_after_max_retries():
    with FakeRestServer({}) as srv:
        w = _RestSinkWriter({"url": srv.url, "entity": "e", "max.retries": "2"})
        w.sleep = lambda s: None
        srv.fail_next(10)
        with pytest.raises(Exception):
            w._post_with_retry(b'{"records": []}', rng_seed=0)
        # 1 try + 2 retries
        assert len([r for r in srv.requests if r.startswith("POST")]) == 3


def test_rest_sink_throttles_to_requests_per_second():
    with FakeRestServer({}) as srv:
        w = _RestSinkWriter(
            {"url": srv.url, "entity": "e", "batch.size": "5", "requests.per.second": "2"}
        )
        sleeps: list[float] = []
        w.sleep = sleeps.append
        w.clock = lambda: 0.0  # frozen clock: every wait is visible as a sleep
        msg = w.write(iter([Row(id=i) for i in range(12)]))
        assert msg.n_records == 12 and msg.n_requests == 3
        assert sleeps == [0.5, 1.0]  # 2 req/s → 0.5 s spacing from t=0


def test_rest_sink_batch_size_validation():
    with pytest.raises(ValueError):
        _RestSinkWriter({"url": "http://x", "batch.size": "0"})
    with pytest.raises(ValueError):
        _RestSinkWriter({"url": "http://x", "batch.size": "501"})
    with pytest.raises(ValueError):
        _RestSinkWriter({})
