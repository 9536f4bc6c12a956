"""Data-layout diagnostics (SURVEY.md §2.B B1 maintenance surface):
an oracle-checkable RELATIONAL MODEL of parquet row-group min/max
pruning under different physical layouts.

``operators/layout.py::zorder_write`` produces the physical clustered
layout and ``tests/test_r7_batch2.py`` measures the real footer stats;
this plan re-derives the same pruning arithmetic purely relationally —
"row group" = R consecutive rows in write order, stats = per-group
min/max — so the clustering benefit itself becomes a driver-certifiable
query with a DuckDB oracle, not just a pytest assertion. The numbers
model exactly what ``zorder_write`` does physically, because that writer
range-partitions + sorts by the same Morton code before writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
from .materialize import materialize_result
from .registry import query

_BITS = 16
_ROWS_PER_GROUP = 4096
# The measurement box (the tests/test_r7_batch2.py probe): ~1%-selective
# conjunctive box plus each dimension alone, so the result shows where
# each layout wins — natural (orderkey-sorted) is tight on orderkey and
# useless on partkey; Z-order is moderately tight on BOTH.
_OK_LO, _OK_HI = 1000, 2500
_PK_LO, _PK_HI = 100, 300


def _zorder_layout_oracle() -> str:
    scaled = {
        "ok": "least(65535, greatest(0, CAST(floor((CAST(l_orderkey AS DOUBLE)"
        " - lo_ok) / span_ok * 65535) AS BIGINT)))",
        "pk": "least(65535, greatest(0, CAST(floor((CAST(l_partkey AS DOUBLE)"
        " - lo_pk) / span_pk * 65535) AS BIGINT)))",
    }
    z_terms = " + ".join(
        f"(((s_{c} >> {bit}) & 1) << {bit * 2 + i})"
        for bit in range(_BITS)
        for i, c in enumerate(("ok", "pk"))
    )
    # Hilbert xy2d, 16 unrolled rotation steps (h0..h16): each stage is a
    # pure projection over the previous one, mirroring the Spark loop.
    hchain = "h0 AS (SELECT *, s_ok AS hx, s_pk AS hy, CAST(0 AS BIGINT) AS hd FROM keyed)"
    for k in range(_BITS):
        sv = 1 << (_BITS - 1 - k)
        rx = f"(CASE WHEN (hx & {sv}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {sv}) > 0 THEN 1 ELSE 0 END)"
        hchain += f""",
    h{k + 1} AS (
      SELECT l_orderkey, l_linenumber, l_partkey, s_ok, s_pk, z,
        hd + CAST({sv} AS BIGINT) * {sv} * xor(3 * {rx}, {ry}) AS hd,
        CASE WHEN {ry} = 1 THEN hx
             WHEN {rx} = 1 THEN {sv - 1} - hy ELSE hy END AS hx,
        CASE WHEN {ry} = 1 THEN hy
             WHEN {rx} = 1 THEN {sv - 1} - hx ELSE hx END AS hy
      FROM h{k})"""
    preds = {
        "box_both": (
            f"max_ok >= {_OK_LO} AND min_ok <= {_OK_HI} "
            f"AND max_pk >= {_PK_LO} AND min_pk <= {_PK_HI}"
        ),
        "orderkey_only": f"max_ok >= {_OK_LO} AND min_ok <= {_OK_HI}",
        "partkey_only": f"max_pk >= {_PK_LO} AND min_pk <= {_PK_HI}",
    }
    pred_rows = " UNION ALL ".join(
        f"SELECT layout, '{p}' AS predicate, count(*) AS n_groups, "
        f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap "
        f"FROM stats GROUP BY layout"
        for p, cond in preds.items()
    )
    return f"""
    WITH bounds AS (
      SELECT CAST(min(l_orderkey) AS DOUBLE) AS lo_ok,
             CASE WHEN max(l_orderkey) = min(l_orderkey) THEN 1.0
                  ELSE CAST(max(l_orderkey) - min(l_orderkey) AS DOUBLE) END
               AS span_ok,
             CAST(min(l_partkey) AS DOUBLE) AS lo_pk,
             CASE WHEN max(l_partkey) = min(l_partkey) THEN 1.0
                  ELSE CAST(max(l_partkey) - min(l_partkey) AS DOUBLE) END
               AS span_pk
      FROM lineitem),
    zed AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             {scaled['ok']} AS s_ok, {scaled['pk']} AS s_pk
      FROM lineitem, bounds),
    keyed AS (SELECT *, {z_terms} AS z FROM zed),
    {hchain},
    layouts AS (
      SELECT 'natural' AS layout, l_orderkey, l_partkey,
        CAST(floor((CAST(row_number() OVER (
          ORDER BY l_orderkey, l_linenumber) AS DOUBLE) - 1)
          / {_ROWS_PER_GROUP}) AS BIGINT) AS g
      FROM keyed
      UNION ALL
      SELECT 'zorder' AS layout, l_orderkey, l_partkey,
        CAST(floor((CAST(row_number() OVER (
          ORDER BY z, l_orderkey, l_linenumber) AS DOUBLE) - 1)
          / {_ROWS_PER_GROUP}) AS BIGINT) AS g
      FROM keyed
      UNION ALL
      SELECT 'hilbert' AS layout, l_orderkey, l_partkey,
        CAST(floor((CAST(row_number() OVER (
          ORDER BY hd, l_orderkey, l_linenumber) AS DOUBLE) - 1)
          / {_ROWS_PER_GROUP}) AS BIGINT) AS g
      FROM h{_BITS}),
    stats AS (
      SELECT layout, g,
             min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
             min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
      FROM layouts GROUP BY layout, g)
    SELECT layout, predicate, n_groups, n_overlap,
           CAST(n_overlap AS DOUBLE) / n_groups AS overlap_frac
    FROM ({pred_rows})
    """


@query(
    "layout_zorder_pruning_stats",
    oracle=_zorder_layout_oracle(),
    tags=("layout", "maintenance", "B1", "zorder", "diagnostics"),
)
def layout_zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group pruning statistics for the natural (orderkey-sorted)
    vs Z-order (Morton on l_orderkey, l_partkey) layout of lineitem,
    under three probe predicates — the OPTIMIZE-ZORDER benefit as a
    relation: for each (layout, predicate), how many of the modeled
    4096-row row groups have min/max stats overlapping the predicate
    (a physical scan reads exactly the overlapping groups).

    Expected shape (asserted in tests/test_layout_stats.py): natural is
    tight on orderkey_only and ~useless on partkey_only (every group
    spans the full partkey domain); Z-order is moderately tight on BOTH,
    and wins the conjunctive box — the reason multi-dimension clustering
    exists. The global row_number here is the MODEL of write order, run
    over one diagnostic table; the physical layout itself is produced by
    ``operators/layout.py::zorder_write`` (range-partition + sort — no
    global single-partition pass), and real footer stats are measured in
    tests/test_r7_batch2.py. Bit-for-bit cross-engine: the Morton code
    is integer arithmetic after one deterministic min/max scaling."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    bounds = li.agg(
        F.min("l_orderkey").cast("double").alias("lo_ok"),
        F.max("l_orderkey").cast("double").alias("hi_ok"),
        F.min("l_partkey").cast("double").alias("lo_pk"),
        F.max("l_partkey").cast("double").alias("hi_pk"),
    ).collect()[0]

    def scaled(c: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        v = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
        return F.least(
            F.lit((1 << _BITS) - 1),
            F.greatest(F.lit(0), F.floor(v * ((1 << _BITS) - 1)).cast("long")),
        )

    zed = li.withColumn(
        "s_ok", scaled("l_orderkey", bounds["lo_ok"], bounds["hi_ok"])
    ).withColumn("s_pk", scaled("l_partkey", bounds["lo_pk"], bounds["hi_pk"]))
    z = F.lit(0).cast("long")
    for bit in range(_BITS):
        for i, c in enumerate(("s_ok", "s_pk")):
            z = z + F.shiftleft(
                F.shiftright(F.col(c), bit).bitwiseAND(1), bit * 2 + i
            )
    # Hilbert xy2d as ONE vectorized Arrow kernel. The previous
    # formulation — 16 chained selects, each stage's (hx, hy, hd)
    # rewritten from the previous stage's columns — exploded in the
    # optimizer: CollapseProject inlines attribute-referencing CASE
    # expressions, and because each stage references the prior hx/hy in
    # several branches, the inlined tree grows ~3× per stage (~3^16
    # nodes), which is what OOM'd the round-9 bench JVM on a 60k-row
    # input (data-independent). A pandas_udf keeps the logical plan O(1)
    # and runs the 16 rotation steps as numpy int64 ops over one Arrow
    # batch — the loop below mirrors the oracle's h0..h16 CTEs step for
    # step, so the integers stay bit-identical across engines.
    import pandas as pd  # noqa: F401  (pandas_udf signature)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _hilbert(sx, sy):
        import numpy as np

        x = sx.to_numpy(dtype="int64", copy=True)
        y = sy.to_numpy(dtype="int64", copy=True)
        hd = np.zeros(len(x), dtype="int64")
        for k in range(_BITS):
            sv = 1 << (_BITS - 1 - k)
            rx = ((x & sv) > 0).astype("int64")
            ry = ((y & sv) > 0).astype("int64")
            hd += np.int64(sv) * np.int64(sv) * ((3 * rx) ^ ry)
            nx = np.where(ry == 1, x, np.where(rx == 1, (sv - 1) - y, y))
            ny = np.where(ry == 1, y, np.where(rx == 1, (sv - 1) - x, x))
            x, y = nx, ny
        return pd.Series(hd)

    # Materialize the keyed relation ONCE: the three layout rankings
    # (natural / zorder / hilbert) each consume it twice (block counts +
    # the ranked join), and the three predicate aggregates below each
    # re-derived all of that — the r18 before-plan ran the scan + Morton
    # interleave + Hilbert Arrow kernel up to 9×. One scan, one kernel
    # pass (guide §2.4/§5; §4: pass the Python stage's output on, don't
    # recompute it).
    keyed = zed.withColumn("z", z).withColumn(
        "hd", _hilbert(F.col("s_ok"), F.col("s_pk"))
    ).localCheckpoint(eager=False)

    def grouped(df: DataFrame, layout: str, blk, order_cols: list) -> DataFrame:
        # Global rank WITHOUT a single-partition sort: the two-phase
        # parallel-prefix decomposition (same device as
        # events_disorder_profile) — per-coarse-block counts, exclusive
        # running sum over the tiny block table, then a window
        # partitioned BY block (each partition ~uniform fraction of the
        # table) supplies the within-block position. rank-1 = prior
        # block count + (within-block row_number - 1); identical to the
        # oracle's plain global row_number because the block key is a
        # prefix of the total order.
        b = df.withColumn("_blk", blk)
        counts = b.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
        wb = bounded_window("_blk", "_blk").rowsBetween(Window.unboundedPreceding, -1)
        prior = counts.select(
            "_blk",
            F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_prior"),
        )
        ww = Window.partitionBy("_blk").orderBy(*order_cols)
        return (
            b.join(F.broadcast(prior), "_blk")
            .withColumn(
                "g",
                F.floor(
                    (
                        F.col("_prior")
                        + F.row_number().over(ww).cast("long")
                        - 1
                    ).cast("double")
                    / _ROWS_PER_GROUP
                ).cast("long"),
            )
            .groupBy("g")
            .agg(
                F.min("l_orderkey").alias("min_ok"),
                F.max("l_orderkey").alias("max_ok"),
                F.min("l_partkey").alias("min_pk"),
                F.max("l_partkey").alias("max_pk"),
            )
            .withColumn("layout", F.lit(layout))
        )

    # Coarse blocks: orderkey for the natural order (near-uniform in
    # TPC-H), the top 10 z bits for the Morton order (z is 32 bits for
    # two 16-bit dims, so >> 22 yields ~1024 balanced buckets).
    stats = grouped(
        keyed,
        "natural",
        (F.col("l_orderkey") / 2048).cast("long"),
        ["l_orderkey", "l_linenumber"],
    ).unionByName(
        grouped(
            keyed,
            "zorder",
            F.shiftright("z", 22),
            ["z", "l_orderkey", "l_linenumber"],
        )
    ).unionByName(
        grouped(
            keyed,
            "hilbert",
            F.shiftright("hd", 22),
            ["hd", "l_orderkey", "l_linenumber"],
        )
    )
    preds = {
        "box_both": (
            (F.col("max_ok") >= _OK_LO)
            & (F.col("min_ok") <= _OK_HI)
            & (F.col("max_pk") >= _PK_LO)
            & (F.col("min_pk") <= _PK_HI)
        ),
        "orderkey_only": (F.col("max_ok") >= _OK_LO) & (F.col("min_ok") <= _OK_HI),
        "partkey_only": (F.col("max_pk") >= _PK_LO) & (F.col("min_pk") <= _PK_HI),
    }
    # All three predicate counts in ONE aggregate over the row-group
    # stats, then stack to (layout, predicate) rows — the previous
    # one-aggregate-per-predicate union re-derived the whole stats
    # relation (and its upstream rankings) three times.
    one = stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_groups"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_ov_{name}")
            for name, cond in preds.items()
        ],
    )
    stack_args = ", ".join(f"'{name}', _ov_{name}" for name in preds)
    out = one.select(
        "layout",
        "n_groups",
        F.expr(
            f"stack({len(preds)}, {stack_args}) AS (predicate, n_overlap)"
        ),
    )
    return out.select(
        "layout",
        "predicate",
        "n_groups",
        "n_overlap",
        (F.col("n_overlap").cast("double") / F.col("n_groups")).alias(
            "overlap_frac"
        ),
    )


# ---------------------------------------------------------------------------
# scan_schema_evolution — merged-schema scan over a drifted landing zone
# ---------------------------------------------------------------------------

_EVOLUTION_CUTOFF = "1997-01-01"


@query(
    "scan_schema_evolution",
    oracle=f"""
    SELECT
      CASE WHEN o_orderdate < DATE '{_EVOLUTION_CUTOFF}' THEN 1 ELSE 2 END
        AS ingest_batch,
      CASE WHEN o_orderdate < DATE '{_EVOLUTION_CUTOFF}' THEN NULL
           ELSE o_orderpriority END AS o_orderpriority,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("layout", "B1", "schema-evolution", "scan"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-schema scan over a schema-drifted parquet landing zone —
    the B1 maintenance capability every long-lived 100 TB dataset needs:
    early ingest batches were written BEFORE a column existed (here
    ``o_orderpriority``, absent from the batch-1 files), later batches
    carry it, and one scan must read the whole history. The staging step
    writes the two eras into partition directories
    (``ingest_batch=1/2`` — the landing-zone layout the reference's
    per-entity topics map to), and the scan composes the two
    Spark-native mechanisms: partition-column discovery (the batch id is
    a directory, not data) and ``mergeSchema`` footer-union (batch-1
    rows surface NULL for the late column — the same late-binding
    posture as the reference's schemaless records, SURVEY.md §1.2-1.3).
    The aggregate then groups straight over the merged relation, proving
    the evolved scan feeds normal relational ops.

    Scale: mergeSchema unions footers only (no data read at planning);
    partition discovery prunes by directory, so a predicate on
    ingest_batch never touches old files; exact decimal revenue via the
    shared dsum device. The staged directory is fixture-derived
    (deterministic), so the DuckDB oracle recomputes the identical table
    from ``orders`` with the cutoff CASE."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        cutoff = F.lit(_EVOLUTION_CUTOFF).cast("date")
        (
            o.filter(F.col("o_orderdate") < cutoff)
            .drop("o_orderpriority")  # the column did not exist yet
            .write.mode("overwrite")
            .parquet(f"{root}/ingest_batch=1")
        )
        (
            o.filter(F.col("o_orderdate") >= cutoff)
            .write.mode("overwrite")
            .parquet(f"{root}/ingest_batch=2")
        )
        merged = spark.read.option("mergeSchema", "true").parquet(root)
        out = (
            merged.groupBy(
                F.col("ingest_batch").cast("int").alias("ingest_batch"),
                "o_orderpriority",
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum(dec2("o_totalprice")).alias("revenue"),
            )
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# join_dpp_partitioned — dynamic partition pruning through a dim filter
# ---------------------------------------------------------------------------

_DPP_CUTOFF = "1999-01-01"


@query(
    "join_dpp_partitioned",
    oracle=f"""
    WITH dim AS (
      SELECT DISTINCT year(o_orderdate) AS ship_year
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_DPP_CUTOFF}')
    SELECT l.ship_year,
      CAST(count(*) AS BIGINT) AS n_items,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue
    FROM (SELECT year(l_shipdate) AS ship_year, l_extendedprice
          FROM lineitem) l
    JOIN dim USING (ship_year)
    GROUP BY 1
    """,
    tags=("layout", "B1", "B6", "dpp", "partition-pruning"),
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — THE scan-elimination device for
    star-schema joins over date/entity-partitioned 100 TB facts: the
    fact side is staged as a ship-year-partitioned parquet layout (the
    landing-zone layout ``write_entity_partitioned`` produces), the dim
    side is a FILTERED year relation derived from orders, and Spark
    turns the broadcast dim's build-side keys into a RUNTIME partition
    filter on the fact scan (``dynamicpruningexpression`` in
    PartitionFilters) — at scale the excluded years' files are never
    opened, which no static optimizer can do because the surviving keys
    only exist after the dim filter runs. The aggregate then rolls up
    revenue per surviving year.

    The pruning is pinned by a contract test (plan shows
    dynamicpruningexpression; a disabled-DPP run shows none); this
    registry query certifies the end-to-end VALUES: partition-discovery
    scan → broadcast dim join with DPP → exact decimal rollup equals
    the oracle's direct semi-join arithmetic.

    Exactness: counts integer; revenue via the shared dsum device."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        F.year("l_shipdate").alias("ship_year"),
    )
    root = tempfile.mkdtemp(prefix="dpp_fact_")
    try:
        li.write.partitionBy("ship_year").mode("overwrite").parquet(root)
        fact = spark.read.parquet(root)
        dim = (
            load_table(spark, sf_dir, "orders")
            .filter(
                F.col("o_orderdate") >= F.lit(_DPP_CUTOFF).cast("timestamp")
            )
            .select(F.year("o_orderdate").alias("ship_year"))
            .distinct()
        )
        out = (
            fact.join(F.broadcast(dim), "ship_year")
            .groupBy(F.col("ship_year").cast("int").alias("ship_year"))
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum(dec2("l_extendedprice")).alias("revenue"),
            )
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# scan_csv_json_roundtrip — text-format round-trip feeding a relational join
# ---------------------------------------------------------------------------


@query(
    "scan_csv_json_roundtrip",
    oracle="""
    SELECT o_custkey % 10 AS cust_bucket,
      CAST(count(*) AS BIGINT) AS n_lines,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_quantity > 45.0
    GROUP BY 1
    """,
    tags=("layout", "B1", "csv", "json", "formats"),
)
def scan_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON scans certified end-to-end at VALUE level (B1's
    text-format surface, upgraded from pytest round-trips to a driver
    row): orders re-land as headered CSV, the filtered lineitem slice
    as JSON-lines, both read back with DECLARED schemas (schema-on-read,
    never inference in production — inference costs a full extra pass
    and can flip types between batches), then joined and rolled up. The
    oracle equality over the ORIGINAL parquet proves the text round
    trip is lossless for the engine's types — doubles survive because
    Spark writes shortest-round-trip representations, timestamps are
    not involved in arithmetic here.

    Scale: text sources split by line ranges exactly like parquet row
    groups (CSV/JSON scans parallelize per file split); the join and
    aggregate are ordinary shuffles. Text formats cost ~5-10x parquet
    scan bandwidth and lose pushdown/pruning — this query is the
    interchange path, not the analytics layout (that is parquet,
    layout_zorder_pruning_stats)."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
    )
    root = tempfile.mkdtemp(prefix="textfmt_")
    try:
        o.write.option("header", True).mode("overwrite").csv(f"{root}/o_csv")
        li.write.mode("overwrite").json(f"{root}/li_json")
        o_back = (
            spark.read.schema(
                "o_orderkey long, o_custkey long, o_totalprice double"
            )
            .option("header", True)
            .csv(f"{root}/o_csv")
        )
        li_back = spark.read.schema(
            "l_orderkey long, l_extendedprice double, l_quantity double"
        ).json(f"{root}/li_json")
        out = (
            o_back.join(
                li_back, o_back.o_orderkey == li_back.l_orderkey
            )
            .groupBy((F.col("o_custkey") % 10).alias("cust_bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dsum(dec2("l_extendedprice")).alias("revenue"),
            )
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# scan_orc_roundtrip — ORC scans certified end-to-end at value level
# ---------------------------------------------------------------------------


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
      CAST(count(*) AS BIGINT) AS n_lines,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_discount >= 0.07 AND l_quantity > 10.0
    GROUP BY 1
    """,
    tags=("layout", "B1", "orc", "formats"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scans certified end-to-end at VALUE level — the fourth and
    last file format Spark ships natively (B1's format surface is now
    Parquet + CSV + JSON + ORC): orders and a discount-filtered
    lineitem slice re-land as ORC, read back with DECLARED schemas,
    a post-read predicate (``l_quantity > 10``) left for the ORC
    reader's own predicate pushdown (ORC carries per-stripe min/max
    and optional bloom indexes exactly like parquet row groups — the
    filter reaches the scan, ``PushedFilters`` in the explain), then
    joined and rolled up. Oracle equality over the ORIGINAL parquet
    proves the columnar round trip is lossless for longs, doubles and
    strings.

    Scale: ORC stripes split like parquet row groups, so the scan
    parallelizes identically; pushdown + column pruning both apply.
    For a Hive-lineage estate ORC is the zero-copy interchange format;
    the engine treats it as a first-class analytics layout, unlike the
    text formats (scan_csv_json_roundtrip) kept for interchange only."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") >= 0.07)
        .select("l_orderkey", "l_extendedprice", "l_quantity", "l_discount")
    )
    root = tempfile.mkdtemp(prefix="orcfmt_")
    try:
        o.write.mode("overwrite").orc(f"{root}/o_orc")
        li.write.mode("overwrite").orc(f"{root}/li_orc")
        o_back = spark.read.schema(
            "o_orderkey long, o_orderpriority string"
        ).orc(f"{root}/o_orc")
        li_back = (
            spark.read.schema(
                "l_orderkey long, l_extendedprice double,"
                " l_quantity double, l_discount double"
            )
            .orc(f"{root}/li_orc")
            .filter(F.col("l_quantity") > 10.0)
        )
        out = (
            o_back.join(li_back, o_back.o_orderkey == li_back.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dsum(dec2("l_extendedprice")).alias("revenue"),
                dsum(dec2("l_quantity")).alias("total_qty"),
            )
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# scan_binaryfile_manifest — the opaque-blob ingestion path (binaryFile)
# ---------------------------------------------------------------------------


@query(
    "scan_binaryfile_manifest",
    oracle="""
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS content_md5,
      substr(text, 1, 12) AS head
    FROM documents WHERE doc_id < 64
    """,
    tags=("layout", "B1", "binary", "multimodal"),
)
def scan_binaryfile_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` — Spark's opaque-blob ingestion format and the
    entry point of every multimodal pipeline (images, audio, PDFs land
    as files; the engine's decode/feature kernels in
    ``operators/multimodal.py`` take over from the binary column): a
    directory of one-blob-per-document files is read back as
    (path, length, content) rows, and the manifest — byte length, md5
    content hash, decoded head — must equal what the oracle computes
    from the source table, proving the file transport is byte-exact.
    This is also the engine's Kafka-less binary transport pattern
    (``kafka_file_roundtrip`` uses the same trick for message blobs).

    Scale shape: binaryFile scans parallelize per file; each row
    carries its whole blob, so partition sizing is governed by
    ``maxPartitionBytes`` against FILE sizes, not row counts — the
    100 TB posture is many-small-blobs per task, never one giant blob
    (those need chunked framing upstream). The manifest projection
    (length/hash/head) is codegen'd JVM work; content bytes never
    reach Python."""
    import os
    import shutil
    import tempfile

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "text")
        .collect()
    )
    root = tempfile.mkdtemp(prefix="binmanifest_")
    try:
        for r in docs:
            with open(os.path.join(root, f"{r.doc_id:05d}.bin"), "wb") as f:
                f.write(r.text.encode("utf-8"))
        manifest = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(root)
            .select(
                F.regexp_extract(F.col("path"), r"(\d{5})\.bin$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("length").alias("n_bytes"),
                F.md5("content").alias("content_md5"),
                F.substring(F.decode("content", "UTF-8"), 1, 12).alias(
                    "head"
                ),
            )
        )
        return materialize_result(spark, manifest)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# scan_partition_pruning_static — Hive-style partition layout + static prune
# ---------------------------------------------------------------------------

_PRUNE_YEARS = (1996, 1997)


@query(
    "scan_partition_pruning_static",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders
    WHERE year(o_orderdate) IN {_PRUNE_YEARS}
    GROUP BY 1, 2
    """,
    tags=("layout", "B1", "partition-pruning"),
)
def scan_partition_pruning_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC partition pruning over a Hive-style directory layout — the
    most fundamental scan optimization at 100 TB and the B1 sibling of
    the DYNAMIC case (``join_dpp_partitioned``): orders re-land
    partitioned by year (``order_year=1995/part-*.parquet`` directories)
    and a literal year predicate must be satisfied from DIRECTORY NAMES
    alone — non-matching partitions are never listed into the scan, so
    a 7-year estate answers a 2-year question at 2/7 the IO before a
    single row is read. The contract test pins the mechanism: the
    filtered scan's ``inputFiles()`` contains only the two matching
    partition directories, and the plan carries the predicate as a
    PartitionFilter (metadata-level), not a PushedFilter (row-group
    level). Value equality over the original table proves pruning
    never drops rows.

    Scale shape: partition listing is O(matching dirs); the aggregate
    is the ordinary map-side-combinable rollup. Partition-by-time is
    the universal 100 TB layout this query certifies end-to-end."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("order_year"),
    )
    root = tempfile.mkdtemp(prefix="prune_static_")
    try:
        o.write.partitionBy("order_year").mode("overwrite").parquet(root)
        back = spark.read.parquet(root).filter(
            F.col("order_year").isin(*_PRUNE_YEARS)
        )
        out = back.groupBy(
            F.col("order_year").cast("int").alias("order_year"),
            "o_orderpriority",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec2("o_totalprice")).alias("total"),
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# layout_compaction_roundtrip — small-file compaction certified at value level
# ---------------------------------------------------------------------------

_COMPACT_FRAG = 64  # deliberately fragmented file count


@query(
    "layout_compaction_roundtrip",
    oracle=f"""
    SELECT CAST({_COMPACT_FRAG} AS BIGINT) AS n_files_before,
      CAST(1 AS BIGINT) AS n_files_after,
      TRUE AS compacted,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total,
      CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
    FROM orders WHERE o_orderkey < 6000
    """,
    tags=("layout", "B1", "maintenance", "compaction"),
)
def layout_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (``operators/maintenance.py``) certified at
    VALUE level — the nightly OPTIMIZE a streaming-ingested plain-parquet
    table needs (every micro-batch lands a file set; at 100 TB scan cost
    becomes file-open overhead, not bytes): an orders slice is landed
    deliberately fragmented ({_COMPACT_FRAG} files), compacted through
    the verify-then-swap rewrite (sibling temp dir, row-count check,
    two-rename swap — a crash before the swap leaves the source
    untouched), and the emitted row pins the mechanism (file count
    before/after, compacted flag) AND the data (row count, exact decimal
    sum, key checksum equal to the ORIGINAL table slice — compaction
    must be byte-preserving for the values even though every file is
    rewritten).

    Scale shape: the rewrite is a shuffle-free coalesce — one read + one
    write of the partition's bytes; the stats pass is driver-side
    listing only. Hadoop FileSystem API throughout, so the same path
    works on file://, HDFS, and S3A."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum
    from ..operators.maintenance import compact_parquet, layout_stats

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 6000
    ).select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix="compact_rt_")
    path = f"{root}/orders_frag"
    try:
        o.repartition(_COMPACT_FRAG).write.parquet(path)
        before = layout_stats(spark, path)
        result = compact_parquet(spark, path, target_bytes=1 << 30)
        back = spark.read.parquet(path)
        out = back.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(dec2("o_totalprice")).alias("total"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        ).select(
            F.lit(before["n_files"]).cast("long").alias("n_files_before"),
            F.lit(result["n_files_after"]).cast("long").alias(
                "n_files_after"
            ),
            F.lit(bool(result["compacted"])).alias("compacted"),
            "n_rows",
            "total",
            "key_checksum",
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# scan_xml_roundtrip — the XML file source (native in Spark 4)
# ---------------------------------------------------------------------------


@query(
    "scan_xml_roundtrip",
    oracle="""
    SELECT c_mktsegment, r_name,
      CAST(count(*) AS BIGINT) AS n_customers,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_acctbal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
    tags=("layout", "B1", "xml", "formats"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scans certified end-to-end at VALUE level — Spark 4 ships the
    (formerly spark-xml) reader/writer natively, completing B1's format
    surface (Parquet + CSV + JSON + ORC + XML + binaryFile): the
    customer dimension denormalized against nation/region re-lands as
    one ``<customer>`` element per row with a NESTED ``<nation>``
    element (struct → child-element mapping, the shape real XML feeds
    arrive in), is read back with a DECLARED schema including the
    nested struct, and rolled up by segment × region. Oracle equality
    over the original parquet proves the text round trip is lossless
    for longs, doubles, strings, and nesting.

    Scale: XML is an interchange format, not an analytics layout — rows
    must be token-scanned (no column pruning, no predicate pushdown,
    splittability only at rowTag boundaries), so the engine's posture is
    ingest-once-to-parquet; this query certifies the ingest leg. The
    denormalizing join broadcasts the 5/25-row region/nation dims."""
    import shutil
    import tempfile

    from ..functions.exact import dec2, dsum

    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load_table(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.struct(
                F.col("n_name").alias("n_name"),
                F.col("r_name").alias("r_name"),
            ).alias("nation"),
        )
    )
    root = tempfile.mkdtemp(prefix="xmlfmt_")
    try:
        (
            cust.write.mode("overwrite")
            .option("rootTag", "customers")
            .option("rowTag", "customer")
            .format("xml")
            .save(f"{root}/cust_xml")
        )
        back = (
            spark.read.schema(
                "c_custkey long, c_mktsegment string, c_acctbal double,"
                " nation struct<n_name: string, r_name: string>"
            )
            .option("rowTag", "customer")
            .format("xml")
            .load(f"{root}/cust_xml")
        )
        out = (
            back.groupBy("c_mktsegment", F.col("nation.r_name").alias("r_name"))
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                dsum(dec2("c_acctbal")).alias("total_acctbal"),
            )
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
