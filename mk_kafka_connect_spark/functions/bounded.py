"""Window helper for PROVABLY BOUNDED relations.

``bounded_window(anchor, *order)`` is a window spec partitioned by the
CONSTANT key ``pmod(hash(anchor), 1)`` (always 0). Semantically
identical to an unpartitioned ``Window.orderBy(...)`` — every row lands
in one partition and the frame sees the total order — but the key is
non-foldable (a bare ``lit(0)`` is constant-folded out of the partition
spec), so Spark plans a PARTITIONED window: WindowExec does not log the
"No Partition Defined ... moving all data to a single partition"
warning, and the plan reads as what it is — a reviewed, bounded-input
total-order window, not an accidental global sort.

USE ONLY where the input is structurally bounded: the ≤K-row result of
an ORDER BY + LIMIT (TakeOrderedAndProject), a coarse-block prefix
table, a calendar-bounded day table, a k-sized bucket table. Wrapping a
data-sized relation with this helper hides a real scale bug from the
plan sweep (tests/test_plan_smells.py flags EVERY window whose
partition spec is empty — after this helper's adoption, with no
allowlist) — the boundedness argument belongs in the query docstring.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F

__all__ = ["bounded_window"]


def bounded_window(anchor, *order) -> WindowSpec:
    """Total-order window over a bounded relation.

    ``anchor``: any plain column (name or Column, NOT a sort order) of
    the relation — only used to anchor the non-foldable constant key.
    ``order``: the total order, exactly as for ``Window.orderBy``.
    """
    key = F.pmod(F.hash(anchor), F.lit(1))
    return Window.partitionBy(key).orderBy(*order)
