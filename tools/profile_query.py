#!/usr/bin/env python
"""Profile named registry queries: build time (fn call — includes any
localCheckpoint / write / streaming machinery the builder runs), count
time (plan execution), and Spark job count for each phase.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q1,q2,...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mk_kafka_connect_spark.plans import QUERIES  # noqa: E402
from mk_kafka_connect_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile-query",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tracker = spark.sparkContext.statusTracker()
    print(f"{'query':34s} {'build_s':>8s} {'count_s':>8s} {'jobs_b':>6s} {'jobs_c':>6s}")
    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"{name}: not registered")
            continue
        # warm-up (untimed): JIT, parquet footers
        try:
            spec.fn(spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {ex}"[:160])
            continue
        j0 = len(tracker.getJobIdsForGroup(None) or []) or max(
            tracker.getJobIdsForGroup() or [-1]
        )
        jobs_before = max(tracker.getJobIdsForGroup() or [-1])
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        jobs_mid = max(tracker.getJobIdsForGroup() or [-1])
        df.count()
        t2 = time.perf_counter()
        jobs_after = max(tracker.getJobIdsForGroup() or [-1])
        print(
            f"{name:34s} {t1 - t0:8.2f} {t2 - t1:8.2f} "
            f"{jobs_mid - jobs_before:6d} {jobs_after - jobs_mid:6d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
