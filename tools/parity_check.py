"""Targeted oracle-parity gate: run named queries at sf0.01 and compare
against their DuckDB oracles with the driver's canonicalization (reuses
tests/conftest.py's comparator). Usage:

    python tools/parity_check.py q1,q2,... [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

from mk_kafka_connect_spark import catalog  # noqa: E402
from mk_kafka_connect_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import conftest as C  # tests/conftest.py for assert_matches_oracle

    spark = get_spark(app_name="parity_check", extra_conf={
        "spark.driver.memory": "8g",
        "spark.sql.shuffle.partitions": "8",
    })
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    from mk_kafka_connect_spark.plans.registry import QUERIES

    failures = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                assert n > 0, f"{name}: empty result"
                print(f"OK-rowsonly {name} rows={n} {time.time()-t0:.1f}s", flush=True)
                continue
            C.assert_matches_oracle(df, con, q.oracle, name=name)
            print(f"OK {name} {time.time()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            msg = str(e).splitlines()
            print(f"FAIL {name} {time.time()-t0:.1f}s :: " + " | ".join(msg[:5]), flush=True)
    print(f"\n{len(names)-len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
