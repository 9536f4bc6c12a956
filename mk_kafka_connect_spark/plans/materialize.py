"""Driver-side result materialization with an explicit size contract.

Several registry queries compute their result inside a ``finally``-cleaned
scope (a temp-dir warehouse, a streaming memory sink, a conf override) and
must return a DataFrame that outlives that scope. The idiom is a
driver-side copy — ``createDataFrame(df.collect(), df.schema)`` — which is
only sound while the result is state- or group-sized. This helper is the
ONE allowed spelling of that idiom (``tests/test_plan_smells.py`` fails on
any direct use in a plan module): it fails loudly past a row ceiling so
the harness pattern can never silently ship into a data-sized path and
OOM the driver at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["MATERIALIZE_ROW_CEILING", "materialize_result"]

# Generous for every current use (the largest materialized result is
# ~4k rows at sf0.1) yet far below driver-memory danger; a query whose
# final state legitimately outgrows this should persist to parquet and
# re-read instead of materializing.
MATERIALIZE_ROW_CEILING = 100_000


def materialize_result(
    spark: SparkSession,
    df: DataFrame,
    *,
    ceiling: int = MATERIALIZE_ROW_CEILING,
) -> DataFrame:
    """Copy a SMALL result through the driver so it survives the teardown
    of whatever it was computed from. Raises if the result is not small —
    the contract that keeps this harness idiom out of data-sized paths.

    Collects through ``limit(ceiling + 1)`` (ADVICE r16): a genuinely
    data-sized result trips the guard at ceiling+1 rows instead of
    OOMing the driver mid-``collect()`` before the check runs. When the
    guard does not trip, the limit never truncated, so the probe IS the
    complete row set and is returned directly (LIMIT's row-ORDER
    nondeterminism is no looser than plain ``collect()`` on an
    unordered plan, and a sorted parent keeps its order through
    GlobalLimit).
    """
    probe = df.limit(ceiling + 1).collect()
    if len(probe) > ceiling:
        raise ValueError(
            f"materialize_result: result exceeds the {ceiling}-row "
            "driver-side ceiling — this result is data-sized; persist "
            "it to parquet and re-read instead"
        )
    return spark.createDataFrame(probe, schema=df.schema)
