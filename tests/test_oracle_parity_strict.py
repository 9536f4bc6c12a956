"""Opt-in STRICT oracle parity: raw-value (fetchall) repr equality.

The standard parity suite mirrors the driver's pandas canonicalization,
where DuckDB DATE coerces to a midnight Timestamp — masking Spark-vs-
oracle output-TYPE asymmetries (a DuckDB ``date_trunc`` returns DATE while
Spark's returns TIMESTAMP; the r7 `cohort_retention_weekly` oracle had
exactly this). This suite compares DuckDB's *raw* fetchall values against
Spark's collected rows with full ``repr`` equality, so any type divergence
fails loudly regardless of how a downstream canonicalizer coerces.

Slow (re-executes every oracle-bearing query), so opt-in:

    SPARK_GRAFT_STRICT_PARITY=1 python -m pytest tests/test_oracle_parity_strict.py -q

Run it before shipping any new or edited oracle (see the verify skill).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as E

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRICT_PARITY"),
    reason="strict parity is opt-in: set SPARK_GRAFT_STRICT_PARITY=1",
)

_ORACLES = E.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_strict_raw_value_parity(spark, duck, sf_dir, name):
    sdf = E.queries()[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(repr(v) for v in row) for row in sdf.select(*cols).collect()
    )
    res = duck.execute(_ORACLES[name])
    ocols = [d[0] for d in res.description]
    idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = sorted(tuple(repr(row[i]) for i in idx) for row in res.fetchall())
    assert cols == sorted(ocols), f"{name}: cols {cols} vs {sorted(ocols)}"
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    diffs = [(s, o) for s, o in zip(srows, orows) if s != o][:3]
    assert not diffs, f"{name}: raw-value/type divergence; first diffs: {diffs}"
