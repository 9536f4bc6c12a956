"""Scalar function surface (SURVEY.md §2.B B12): string / regex / datetime /
math / array / JSON functions, plus the A15 string-cast transform.

Lineage: the reference's only scalar functions are datetime format/parse
(``ChargeOverSourceTask.java:371-375,465-472``) and JSON stringification
(``StringCast.java:90-96``); schemaless field access maps to
``get_json_object``. Everything here is built-in ``pyspark.sql.functions``
(JVM codegen, no Python in the hot path).

Cross-engine notes baked into the oracles:
* DuckDB ``dayofweek`` is 0-based (Sunday=0), Spark is 1-based → ``+1``.
* Spark ``log`` = natural log = DuckDB ``ln``; results rounded to 8 dp
  because libm implementations may differ in the last ulp.
* Spark ``split`` is regex-based and keeps empty strings — matches
  DuckDB ``string_split`` on single-space delimiters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..transforms import apply_chain
from .registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
      concat(c_name, '#', c_mktsegment) AS tagged,
      upper(c_name) AS up, lower(c_mktsegment) AS lo,
      substring(c_name, 1, 8) AS prefix,
      length(c_name) AS name_len,
      trim('  ' || c_name || ' ') AS trimmed,
      replace(c_name, 'Customer', 'Cust') AS replaced,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
      reverse(c_mktsegment) AS seg_rev,
      repeat('-', 3) || c_mktsegment AS dashed,
      strpos(c_name, 'er') AS er_pos,
      translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr
    FROM customer
    """,
    tags=("scalar", "B12", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("c_mktsegment")).alias("dashed"),
        F.instr(F.col("c_name"), "er").alias("er_pos"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_tr"),
    )


@query(
    "scalar_regex_funcs",
    oracle="""
    SELECT doc_id,
      regexp_extract(text, '([a-z]+)', 1) AS first_word,
      regexp_replace(text, '\\s+', '_', 'g') AS squashed,
      regexp_matches(text, 'spark') AS mentions_spark,
      len(regexp_extract_all(text, '[a-z]+')) AS n_words
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("scalar", "B12", "regex"),
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match / extract_all (patterns kept in the
    Java∩RE2 common subset so both engines agree)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"\s+", "_").alias("squashed"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+"), 0)).alias("n_words"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT event_id, ts,
      CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
      date_trunc('hour', ts) AS hour_start,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS formatted,
      year(ts) AS y, month(ts) AS m, day(ts) AS d,
      hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
      dayofweek(ts) + 1 AS dow,
      CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
      date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_ny,
      CAST(CAST(ts AS DATE) + 7 AS TIMESTAMP) AS week_later
    FROM events WHERE event_id < 2000
    """,
    tags=("scalar", "B12", "datetime"),
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery — trunc / format / extract / diff / add. The
    reference's entire datetime surface (fixed-format strings + tz pinning,
    ChargeOverSourceTask.java:371-375) generalized to typed timestamps."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        "ts",
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofweek("ts").alias("dow"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_ny"
        ),
        F.date_add(F.col("ts").cast("date"), 7).cast("timestamp").alias("week_later"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT o_orderkey,
      abs(o_totalprice - 250000.0) AS dist_mid,
      round(o_totalprice, -3) AS round_k,
      CAST(floor(o_totalprice) AS BIGINT) AS fl, CAST(ceil(o_totalprice) AS BIGINT) AS ce,
      sqrt(o_totalprice) AS sq,
      o_totalprice * o_totalprice AS sq2,
      round(ln(o_totalprice), 8) AS log_rounded,
      o_orderkey % 7 AS mod7,
      greatest(o_totalprice, 100000.0) AS hi,
      least(o_totalprice, 100000.0) AS lo,
      CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sgn
    FROM orders WHERE o_orderkey < 5000
    """,
    tags=("scalar", "B12", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery. sqrt is IEEE-correctly-rounded (safe to compare
    exactly); ln is not guaranteed to the last ulp → rounded to 8 dp."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_mid"),
        F.round(F.col("o_totalprice"), -3).alias("round_k"),
        F.floor("o_totalprice").alias("fl"),
        F.ceil("o_totalprice").alias("ce"),
        F.sqrt("o_totalprice").alias("sq"),
        (F.col("o_totalprice") * F.col("o_totalprice")).alias("sq2"),
        F.round(F.log("o_totalprice"), 8).alias("log_rounded"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("lo"),
        F.signum(F.col("o_totalprice") - 250000.0).alias("sgn"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      list_contains(string_split(text, ' '), 'spark') AS has_spark,
      string_split(text, ' ')[1] AS first_tok,
      string_split(text, ' ')[len(string_split(text, ' '))] AS last_tok,
      array_to_string(list_sort(string_split(text, ' '))[1:3], '-') AS sorted3,
      len(list_distinct(string_split(text, ' '))) AS n_unique
    FROM documents WHERE doc_id < 100
    """,
    tags=("scalar", "B12", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over tokenized text: size / contains / index /
    sort+slice / distinct-count (explode-free; all vectorized)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_join(F.slice(F.array_sort(toks), 1, 3), "-").alias("sorted3"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id, props,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      json_extract_string(props, '$.missing') AS missing_field,
      CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events WHERE event_id < 2000
    """,
    tags=("scalar", "B12", "json", "A15"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-bound JSON field access — the engine-side equivalent of reading
    arbitrary fields of the reference's schemaless Map payloads
    (ChargeOverSourceTask.java:421-432): unknown fields stay accessible
    without a declared schema."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        "props",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_valid"),
    )


@query(
    "string_cast_transform",
    oracle="""
    SELECT event_id,
      to_json(user_id) AS user_id,
      to_json(event_type) AS event_type,
      CASE WHEN props IS NOT NULL THEN to_json(props) END AS props
    FROM events WHERE event_id < 2000
    """,
    tags=("transform", "A15", "B14"),
)
def string_cast_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference SMT (StringCast.java:51-85) applied through the
    config-driven transform chain: configured fields become their JSON
    string form in place — numbers bare ("13"), strings JSON-quoted
    ("\\"click\\""), nulls preserved, missing fields ('nonexistent')
    silently skipped. Pure withColumn ops → whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    out = apply_chain(
        ev,
        [{"name": "string_cast", "fields": ["user_id", "event_type", "props", "nonexistent"]}],
    )
    return out.select("event_id", "user_id", "event_type", "props")


@query(
    "transform_smt_chain",
    oracle="""
    SELECT event_id, kind,
      to_json(value) AS amount,
      CASE WHEN props IS NOT NULL THEN to_json(props) END AS props
    FROM (SELECT event_id, event_type AS kind, value, props FROM events)
    WHERE event_id < 3000 AND kind IN ('purchase', 'refund')
    """,
    tags=("transform", "A15", "B14", "chain"),
)
def transform_smt_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A FOUR-stage config-driven SMT chain — rename → filter →
    string-cast → drop — composed exactly like Kafka Connect's
    ``transforms=a,b,c`` list (SMT-README:33-37): each stage is built
    from its config map and applied in order, and because every stage is
    declarative the whole chain fuses into one codegen'd projection over
    the scan (no per-stage materialization — the property that makes
    config-driven chains free at 100 TB). `string_cast_transform`
    certifies the single-SMT semantics; this certifies the composition."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    out = apply_chain(
        ev,
        [
            {"name": "rename", "mapping": {"event_type": "kind"}},
            {"name": "filter_expr", "predicate": "kind IN ('purchase', 'refund')"},
            {"name": "string_cast", "fields": ["value", "props", "nonexistent"]},
            {"name": "drop_fields", "fields": ["ts", "user_id"]},
        ],
    )
    return out.select("event_id", "kind", F.col("value").alias("amount"), "props")


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
      'k' AS prop_keys,
      CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
        AS prop_values,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_id < 1000
    """,
    tags=("scalar", "B12", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the schemaless JSON payload into a
    typed map, then map_keys / map_values / element access — the late-
    binding Map<String,Object> posture of the reference
    (ChargeOverSourceTask.java:421-432) with declared types."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    # map_keys/map_values are serialized to comma-joined strings: the driver
    # canonicalizes via a pandas sort and array cells are unhashable there.
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.array_join(F.transform(F.map_values(m), lambda v: v.cast("string")), ",").alias(
            "prop_values"
        ),
        F.element_at(m, "k").alias("k_val"),
    )


@query(
    "scalar_posexplode",
    oracle="""
    SELECT t.doc_id, u.s.pos AS pos, u.s.tok AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 50) t,
    unnest(list_transform(range(1, len(t.w) + 1),
                          i -> {'pos': i, 'tok': t.w[i]})) u(s)
    """,
    tags=("scalar", "B12", "explode"),
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per (position, token) — the generator/UDTF
    shape on the built-in fast path (1-based positions to match SQL)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


@query(
    "scalar_url_funcs",
    # The URL is CONSTRUCTED from fixture columns, so the oracle derives
    # every component from the same inputs directly — ground truth by
    # construction, no second URL parser whose edge cases could differ.
    oracle="""
    SELECT doc_id,
      'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
        || '?lang=' || lang || '&ref=mk#sec-'
        || CAST(doc_id % 7 AS VARCHAR) AS url,
      'https' AS protocol,
      source || '.example.com' AS host,
      '/docs/' || CAST(doc_id AS VARCHAR) AS path,
      'lang=' || lang || '&ref=mk' AS query,
      lang AS query_lang,
      'sec-' || CAST(doc_id % 7 AS VARCHAR) AS fragment
    FROM documents
    """,
    tags=("scalar", "B12", "url"),
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing battery (``parse_url``: PROTOCOL / HOST / PATH /
    QUERY / per-key QUERY / REF) — the web-corpus cousin of the string
    and JSON batteries, exercised over URLs constructed from fixture
    columns so the expected decomposition is known exactly. B12 surface:
    every extraction is a codegen'd JVM expression (java.net.URI under
    the hood), no Python anywhere."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=mk#sec-"),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("query_lang"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract(props, '$') AS VARCHAR) AS canonical_json,
      json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events WHERE event_id < 500
    """,
    tags=("scalar", "B12", "variant", "semi-structured"),
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT — Spark 4's binary semi-structured type, the engine-native
    upgrade over string-JSON for the reference's schemaless payloads
    (SURVEY.md §1.2): ``parse_json`` decodes once into a binary
    shredded form, every later ``variant_get`` is a direct path read
    (no re-parse per extraction, the cost model that makes wide
    late-binding columns viable at 100 TB), and ``to_json`` prints the
    canonical compact form. The battery extracts a typed path, the same
    path as string, the canonical re-serialization (proving
    parse→print is normalization, which DuckDB replays with
    ``json_extract('$')``), and a missing-path NULL probe — all
    codegen'd JVM expressions, no Python.

    Exactness: integers, strings, and a boolean only."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_int"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        F.to_json("v").alias("canonical_json"),
        F.variant_get("v", "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
    )


@query(
    "cdc_variant_pipeline",
    # The late-binding story end-to-end: the oracle replays the typed
    # extractions with string-JSON path reads; equality proves the
    # VARIANT ingest → canonical wire JSON → VARIANT re-parse roundtrip
    # loses nothing and binds the same types.
    oracle="""
    SELECT 'events.' || event_type AS topic,
      CAST(count(*) AS BIGINT) AS n_records,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
      CAST(sum(CAST(json_extract_string(COALESCE(props, '{}'), '$.k')
                    AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(max(CAST(json_extract_string(COALESCE(props, '{}'), '$.k')
                    AS BIGINT)) AS BIGINT) AS max_k,
      CAST(count(*) AS BIGINT) AS n_missing_tolerated,
      CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1
    """,
    tags=("cdc", "B12", "variant", "pipeline", "A7", "A9", "A10", "late-binding"),
)
def cdc_variant_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed CDC end-to-end — SURVEY.md §1.2's late-binding story
    closed with the engine-native type instead of string JSON: the
    schemaless payload is parsed ONCE to VARIANT at ingest
    (``parse_json``; NULL payloads normalized to the empty object, the
    same convention as the quarantine query), carried through the
    reference's record pipeline — A7 keyed records with null-id drop
    (Task.java:394-401), per-row entity tag, A9 ``{prefix}.{entity}``
    topic routing (Task.java:418-419), A10 Kafka shape
    (Task.java:434-443) whose ``value`` serializes the VARIANT to
    canonical compact JSON — and then a downstream CONSUMER re-parses
    the wire value to VARIANT and late-binds typed projections with
    ``variant_get`` ($.event_id, $.user_id, the nested $.payload.k, and
    a missing path that must tolerate absence as NULL, never error).
    Per-topic integer aggregates of the late-bound values prove the
    roundtrip binds exactly what the producer ingested.

    Scale shape: the whole pipeline is narrow codegen'd JVM expressions
    (parse once, direct path reads — no per-extraction re-parse, the
    cost model that makes wide late-binding viable at 100 TB); the only
    shuffle is the final per-topic aggregate, partial map-side.

    Exactness: counts, sums, max — integers only."""
    from ..operators.cdc import keyed_records, route_topics, to_kafka_shape

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    ingested = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.parse_json(F.coalesce(F.col("props"), F.lit("{}"))).alias("payload"),
    )
    routed = route_topics(
        keyed_records(ingested, "user_id").withColumn(
            "_entity_type", F.col("event_type")
        ),
        "events",
    )
    shaped = to_kafka_shape(routed)
    # Consumer side: back from the wire format, late-bound and typed.
    consumed = shaped.select("topic", F.parse_json("value").alias("msg"))
    typed = consumed.select(
        "topic",
        F.variant_get("msg", "$.event_id", "bigint").alias("event_id"),
        F.variant_get("msg", "$.user_id", "bigint").alias("user_id"),
        F.variant_get("msg", "$.payload.k", "bigint").alias("k"),
        F.variant_get("msg", "$.payload.missing", "bigint").alias("absent"),
    )
    return typed.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct("user_id").alias("n_keys"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias(
            "n_missing_tolerated"
        ),
        F.sum("event_id").alias("id_checksum"),
    )


@query(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain(suppkey, acctbal, depth) AS (
      SELECT s_suppkey, CAST(s_acctbal AS DECIMAL(18,2)), 0
      FROM supplier WHERE s_suppkey = 1
      UNION ALL
      SELECT s.s_suppkey, CAST(s.s_acctbal AS DECIMAL(18,2)), c.depth + 1
      FROM supplier s JOIN chain c ON s.s_suppkey // 2 = c.suppkey
      WHERE c.depth < 25)
    SELECT depth,
      CAST(count(*) AS BIGINT) AS n_nodes,
      CAST(min(suppkey) AS BIGINT) AS min_key,
      CAST(max(suppkey) AS BIGINT) AS max_key,
      CAST(sum(acctbal) AS DOUBLE) AS total_acctbal
    FROM chain GROUP BY depth ORDER BY depth
    """,
    tags=("sql", "B12", "recursive-cte", "iteration"),
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` — Spark 4.0's iterate-to-fixpoint SQL surface,
    the declarative form of the engine's iterative DataFrame loops
    (PageRank/BFS/LPA in ``plans/graph.py`` hand-roll the same
    fixpoint): each recursion step is a self-join of the working set
    against the base relation until no new rows appear. The hierarchy
    is a deterministic binary tree derived from the fixture (parent(s)
    = s_suppkey DIV 2, rooted at 1) — per-level node counts, key
    ranges, and exact decimal balance totals; DuckDB replays the
    recursion identically.

    Scale shape: recursive CTEs materialize the frontier per step —
    each step is one keyed equi-join (frontier ⋈ base), so cost is
    O(levels × join); the frontier is level-sized, never the whole
    closure. The depth guard bounds runaway recursion the same way
    ``spark.sql.cteRecursionLevelLimit`` (default 100) does. For
    100 TB-scale closures prefer the checkpointed iterative DataFrame
    loop (plans/graph.py) — same algebra, explicit materialization
    control."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "sql_rec_supplier"
    )
    return spark.sql("""
      WITH RECURSIVE chain(suppkey, acctbal, depth) AS (
        SELECT s_suppkey, CAST(s_acctbal AS DECIMAL(18,2)), 0
        FROM sql_rec_supplier WHERE s_suppkey = 1
        UNION ALL
        SELECT s.s_suppkey, CAST(s.s_acctbal AS DECIMAL(18,2)), c.depth + 1
        FROM sql_rec_supplier s JOIN chain c ON s.s_suppkey DIV 2 = c.suppkey
        WHERE c.depth < 25)
      SELECT depth,
        CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(min(suppkey) AS BIGINT) AS min_key,
        CAST(max(suppkey) AS BIGINT) AS max_key,
        CAST(sum(acctbal) AS DOUBLE) AS total_acctbal
      FROM chain GROUP BY depth ORDER BY depth
    """)


@query(
    "sql_pipe_query",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS revenue,
      CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql", "B12", "pipe-syntax"),
)
def sql_pipe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (``|>``) — Spark 4.0's linear query composition
    (FROM → WHERE → EXTEND → AGGREGATE → ORDER BY), certified at VALUE
    level on a Q1-style pricing rollup with exact decimal money math.
    ``EXTEND`` demonstrates lateral column references (``disc_price``
    computed once, consumed by the aggregate stage) — the pipe form of
    the DataFrame API's withColumn-then-agg chaining, and proof the
    surface is sugar over the SAME Catalyst plan: the oracle is the
    classic formulation and must hash-match exactly.

    Scale shape: identical plan to q1_pricing_summary — pushed filter +
    projection, partial aggregation, group-sized shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_pipe_lineitem"
    )
    return spark.sql("""
      FROM sql_pipe_lineitem
      |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |> EXTEND CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS disc_price
      |> AGGREGATE
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(disc_price) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
         GROUP BY l_returnflag, l_linestatus
      |> SELECT l_returnflag, l_linestatus, sum_qty, revenue, n
      |> ORDER BY l_returnflag, l_linestatus
    """)


@query(
    "scalar_collation_funcs",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                  ELSE o_orderpriority END AS pri,
             o_totalprice
      FROM orders)
    SELECT lower(pri) AS priority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN lower(pri) = '1-urgent' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_eq_urgent,
      CAST(sum(CASE WHEN contains(lower(pri), 'h') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_contains_h,
      CAST(sum(CASE WHEN lower(pri) >= '3-medium' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_ge_medium
    FROM mixed GROUP BY lower(pri) ORDER BY priority
    """,
    tags=("scalar", "B12", "collation"),
)
def scalar_collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations — Spark 4.0's engine-level case-insensitive
    comparison semantics (``COLLATE UTF8_LCASE``): grouping, equality,
    ``contains``, and ordering comparisons all respect the collation
    WITHOUT rewriting every predicate through ``lower()`` — the
    engine-native answer to the mixed-case chaos of real ingested data
    (the fixture column is deterministically case-mangled on even keys
    to force real merges). The oracle replays each operation with
    explicit ``lower()``, proving the collated semantics equal the
    normalize-then-compare formulation; the OUTPUT key is projected
    through ``lower()`` because a collated group's representative
    casing is undefined (either variant may surface) — the one
    determinism hazard collations introduce.

    Scale shape: one scan, one group-sized shuffle; collation-aware
    hashing happens inside the hash aggregate, no extra pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql_coll_orders"
    )
    return spark.sql("""
      WITH mixed AS (
        SELECT collate(CASE WHEN o_orderkey % 2 = 0
                            THEN upper(o_orderpriority)
                            ELSE o_orderpriority END, 'UTF8_LCASE') AS pri,
               o_totalprice
        FROM sql_coll_orders)
      SELECT lower(pri) AS priority,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_eq_urgent,
        CAST(sum(CASE WHEN contains(pri, 'H') THEN 1 ELSE 0 END)
             AS BIGINT) AS n_contains_h,
        CAST(sum(CASE WHEN pri >= '3-MEDIUM' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_ge_medium
      FROM mixed GROUP BY pri ORDER BY priority
    """)


@query(
    "scalar_ansi_try_funcs",
    oracle="""
    SELECT event_id,
      CASE WHEN event_id % 7 = 0 THEN NULL
           ELSE CAST(CAST(value AS DOUBLE) / (event_id % 7) AS DOUBLE)
      END AS safe_ratio,
      TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'N/A'
                    ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed_id,
      CASE WHEN event_id % 5 = 0 THEN NULL
           ELSE event_id + 1 END AS safe_inc,
      CASE WHEN event_id % 4 = 0 THEN NULL
           ELSE CAST('2024-01-15 12:00:00' AS TIMESTAMP) END AS parsed_ts,
      CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_id END AS elem
    FROM events WHERE event_id < 400
    """,
    tags=("scalar", "B12", "ansi", "try-functions"),
)
def scalar_ansi_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` safe-evaluation family under ANSI mode — Spark 4
    enables ``spark.sql.ansi.enabled`` by DEFAULT, so the operations
    that silently produced garbage in legacy mode (divide by zero,
    overflow, bad casts) now THROW, and the sanctioned per-row recovery
    is the try-variant: ``try_divide`` (zero denominators staged on
    event_id % 7), ``try_cast`` (a deterministically poisoned string
    column), ``try_add`` (forced bigint overflow), ``try_to_timestamp``
    (unparseable timestamps), and ``try_element_at`` (out-of-bounds
    array reads) — each yields NULL exactly where the oracle's CASE
    says the input was bad, never failing the job. This is the dirty
    100 TB ingest contract: one malformed row must cost one NULL, not
    the pipeline.

    Scale shape: one scan, one narrow codegen'd projection; the filter
    pushes to parquet."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    poisoned = F.when(F.col("event_id") % 3 == 0, F.lit("N/A")).otherwise(
        F.col("event_id").cast("string")
    )
    big = F.when(
        F.col("event_id") % 5 == 0, F.lit(9223372036854775807)
    ).otherwise(F.col("event_id"))
    ts_str = F.when(F.col("event_id") % 4 == 0, F.lit("not a ts")).otherwise(
        F.lit("2024-01-15 12:00:00")
    )
    arr = F.array(F.col("event_id"))
    idx = F.when(F.col("event_id") % 2 == 0, F.lit(5)).otherwise(F.lit(1))
    return ev.select(
        "event_id",
        F.try_divide(
            F.col("value").cast("double"), F.col("event_id") % 7
        ).alias("safe_ratio"),
        poisoned.try_cast("bigint").alias("parsed_id"),
        F.try_add(big, F.lit(1)).alias("safe_inc"),
        F.try_to_timestamp(ts_str).alias("parsed_ts"),
        F.try_element_at(arr, idx).alias("elem"),
    )


@query(
    "scalar_xml_funcs",
    # The oracle states the expected extractions straight from the
    # source columns: equality proves construct → from_xml / xpath is a
    # lossless roundtrip with the declared types.
    oracle="""
    SELECT event_id,
      event_id AS x_id,
      event_type AS x_type,
      CAST(round(CAST(value AS DECIMAL(18,2)), 2) AS DOUBLE) AS x_value,
      user_id AS xp_user,
      upper(event_type) AS xp_type_upper
    FROM events WHERE event_id < 400
    """,
    tags=("scalar", "B12", "xml", "semi-structured"),
)
def scalar_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML — Spark 4.0's native XML support (``from_xml`` schema-driven
    struct parse + the classic ``xpath_*`` extractors), the third
    semi-structured payload format after JSON and VARIANT: a typed
    record is serialized to an XML element per row (values quantized to
    1e-2 BEFORE serialization so the text form is exact), then parsed
    BACK two independent ways — ``from_xml`` with a declared schema
    (the typed, vectorizable path) and ``xpath_long``/``xpath_string``
    (the ad-hoc path-query path) — and both extractions must equal the
    original columns, proving the roundtrip lossless. The reference's
    schemaless-payload posture (SURVEY.md §1.2) applied to the one wire
    format enterprise feeds still ship everywhere.

    Scale shape: one scan, narrow codegen'd projection; XML parse is a
    JVM expression (no Python), linear per row."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    v2 = F.round(F.col("value").cast("decimal(18,2)"), 2)
    xml = F.concat(
        F.lit("<e uid=\""),
        F.col("user_id").cast("string"),
        F.lit("\"><id>"),
        F.col("event_id").cast("string"),
        F.lit("</id><type>"),
        F.col("event_type"),
        F.lit("</type><val>"),
        v2.cast("string"),
        F.lit("</val></e>"),
    )
    doc = ev.select("event_id", "event_type", xml.alias("x"))
    parsed = doc.select(
        "event_id",
        F.from_xml(
            "x", "_uid bigint, id bigint, type string, val double"
        ).alias("p"),
        "x",
    )
    return parsed.select(
        "event_id",
        F.col("p.id").alias("x_id"),
        F.col("p.type").alias("x_type"),
        F.col("p.val").alias("x_value"),
        F.xpath_long("x", F.lit("/e/@uid")).alias("xp_user"),
        F.upper(F.xpath_string("x", F.lit("/e/type"))).alias("xp_type_upper"),
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(year(l_shipdate) AS INTEGER) AS ship_year,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(3,2))
                        - CAST(l_discount AS DECIMAL(18,2)))), 2)
           AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 25.0
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("scalar", "B12", "sql-surface", "group-by-all"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` — Spark 4's analyst-ergonomics
    SQL surface: every non-aggregate select item becomes a grouping key
    and the full projection becomes the sort key, with no positional or
    name repetition to drift out of sync when the query is edited (the
    classic silent-bug in hand-maintained rollups: a new dimension added
    to SELECT but not to GROUP BY throws; added to GROUP BY but not
    ORDER BY reorders). The oracle replays the query with EXPLICIT
    ``GROUP BY 1,2,3`` — equality proves the inference binds exactly
    the non-aggregate items, including the computed ``year()`` column.

    Scale shape: identical plan to the explicit form — pushed filter +
    projection, partial aggregation, one group-sized shuffle; the
    sugar is resolved entirely at analysis time."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_gba_lineitem"
    )
    return spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(year(l_shipdate) AS INT) AS ship_year,
        CAST(count(*) AS BIGINT) AS n,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(3,2))
                          - CAST(l_discount AS DECIMAL(18,2)))), 2)
             AS DOUBLE) AS revenue
      FROM sql_gba_lineitem
      WHERE l_quantity < 25.0
      GROUP BY ALL
      ORDER BY ALL
    """)


@query(
    "scalar_interval_funcs",
    oracle="""
    SELECT o_orderkey,
      o_orderdate + INTERVAL 3 MONTH AS plus_3m,
      o_orderdate - INTERVAL 45 DAY AS minus_45d,
      o_orderdate + INTERVAL 90 MINUTE AS plus_90min,
      o_orderdate + INTERVAL 18 MONTH AS plus_1y6m,
      o_orderdate + (o_orderkey % 5) * INTERVAL 1 DAY AS staggered,
      CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
      CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr_start,
      CAST(date_part('day', TIMESTAMP '1999-01-01 00:00:00' - o_orderdate)
           AS BIGINT) AS age_days
    FROM orders WHERE o_orderkey < 5000
    """,
    tags=("scalar", "B12", "interval", "ansi"),
)
def scalar_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI INTERVAL battery — the typed time-arithmetic surface the
    datetime battery (``scalar_datetime_funcs``) does not touch: Spark
    3.2+ ANSI year-month and day-time INTERVAL types. Covered: month
    arithmetic with end-of-month CLAMPING (Jan 31 + 3 months =
    Apr 30 — the semantics both engines share and naive epoch math
    gets wrong), day and sub-day (minute) offsets, a compound
    ``INTERVAL '1-6' YEAR TO MONTH`` literal, interval MULTIPLICATION
    by a column (the per-row stagger idiom behind retry schedules and
    cohort offsets), ``last_day``, quarter truncation, and timestamp
    SUBTRACTION yielding a day-time interval whose DAY field is
    extracted (exact at midnight-aligned fixtures). Every output is a
    timestamp/date/bigint — interval VALUES never cross the driver
    boundary (they are engine-internal types with no stable external
    encoding; projecting them out is the portability hazard the
    battery documents).

    Scale shape: one scan, one codegen'd projection; the key filter
    pushes to parquet. Interval arithmetic is JVM-side expression
    work — zero shuffle, zero Python."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.expr("o_orderdate + INTERVAL '3' MONTH").alias("plus_3m"),
        F.expr("o_orderdate - INTERVAL '45' DAY").alias("minus_45d"),
        F.expr("o_orderdate + INTERVAL '90' MINUTE").alias("plus_90min"),
        F.expr("o_orderdate + INTERVAL '1-6' YEAR TO MONTH").alias(
            "plus_1y6m"
        ),
        F.expr(
            "o_orderdate + (o_orderkey % 5) * INTERVAL '1' DAY"
        ).alias("staggered"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").alias("qtr_start"),
        F.expr(
            "CAST(extract(DAY FROM (TIMESTAMP '1999-01-01 00:00:00'"
            " - o_orderdate)) AS BIGINT)"
        ).alias("age_days"),
    )


@query(
    "scalar_time_funcs",
    oracle="""
    SELECT event_id,
      CAST(make_time(hour(ts), minute(ts),
                     CAST(extract(second FROM ts) AS INTEGER)) AS VARCHAR)
        AS tod_str,
      CAST(hour(ts) AS BIGINT) AS t_h,
      CAST(minute(ts) AS BIGINT) AS t_m,
      CAST(extract(second FROM ts) AS BIGINT) AS t_s,
      CAST(hour(ts) * 3600 + minute(ts) * 60
           + extract(second FROM ts) AS BIGINT) AS secs_of_day,
      make_time(hour(ts), minute(ts),
                CAST(extract(second FROM ts) AS INTEGER))
        < TIME '12:00:00' AS is_am
    FROM events WHERE event_id < 2000
    """,
    tags=("scalar", "B12", "time-type"),
)
def scalar_time_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI TIME type — Spark 4.1's newest temporal type (flag-gated
    behind ``spark.sql.timeType.enabled``; this query turns it on):
    time-of-day values CONSTRUCTED with ``make_time``, compared against
    a ``TIME`` literal (the shift-boundary idiom: 'before noon'),
    component-extracted, and serialized. Like the INTERVAL battery, the
    TIME values themselves never cross the driver boundary — outputs
    are strings/longs/booleans (a brand-new type's external encoding is
    exactly what downstream BI/arrow clients lag on; keeping it
    engine-internal is the deployment-safe posture the docstring
    declares). Fractional seconds are deliberately avoided: Spark
    extracts SECOND from TIME as DECIMAL(8,6), DuckDB as truncated
    int — integer seconds are the cross-engine-safe subset.

    Scale shape: one scan, one codegen'd projection; the TIME ops are
    JVM expressions."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ev.createOrReplaceTempView("time_fn_events")
    return spark.sql("""
      SELECT event_id,
        CAST(make_time(hour(ts), minute(ts),
                       CAST(second(ts) AS INT)) AS STRING) AS tod_str,
        CAST(hour(ts) AS BIGINT) AS t_h,
        CAST(minute(ts) AS BIGINT) AS t_m,
        CAST(second(ts) AS BIGINT) AS t_s,
        CAST(extract(HOUR FROM make_time(hour(ts), minute(ts),
                                         CAST(second(ts) AS INT))) * 3600
             + extract(MINUTE FROM make_time(hour(ts), minute(ts),
                                             CAST(second(ts) AS INT))) * 60
             + extract(SECOND FROM make_time(hour(ts), minute(ts),
                                             CAST(second(ts) AS INT)))
             AS BIGINT) AS secs_of_day,
        make_time(hour(ts), minute(ts), CAST(second(ts) AS INT))
          < TIME '12:00:00' AS is_am
      FROM time_fn_events
    """)


@query(
    "sql_parameterized_exec",
    oracle="""
    SELECT 'low_cap' AS param_set, o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders
    WHERE o_totalprice < 150000.0 AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 2
    UNION ALL
    SELECT 'high_cap' AS param_set, o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders
    WHERE o_totalprice < 400000.0 AND o_orderdate >= TIMESTAMP '1995-06-01'
    GROUP BY 2
    UNION ALL
    SELECT 'exec_imm' AS param_set, o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders
    WHERE o_orderkey % 10 = 3
    GROUP BY 2
    """,
    tags=("scalar", "B12", "sql-surface", "parameterized"),
)
def sql_parameterized_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the injection-safe templating surface (Spark
    3.4+ named parameter markers via ``spark.sql(query, args=...)``,
    plus SQL-scripting's ``EXECUTE IMMEDIATE ... USING`` from 4.0): the
    SAME template is bound twice with different (cap, cutoff) argument
    sets, and a third slice goes through EXECUTE IMMEDIATE with a
    positional USING binding — the dynamic-SQL idiom of metadata-driven
    pipelines (the reference's config-driven per-entity queries,
    ``SURVEY.md §1.2``, are exactly this pattern: one template, N
    bindings). The oracle replays each binding with inlined literals —
    equality proves markers bind VALUES (typed, escaped), not spliced
    text.

    Scale shape: per binding, the same pushed-filter + group-sized
    aggregate plan as any literal query — parameterization is resolved
    at parse time and invisible to Catalyst."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "param_orders"
    )
    template = """
      SELECT :tag AS param_set, o_orderpriority,
        CAST(count(*) AS BIGINT) AS n,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS total
      FROM param_orders
      WHERE o_totalprice < :cap AND o_orderdate >= CAST(:d0 AS TIMESTAMP)
      GROUP BY 2
    """
    low = spark.sql(
        template, args={"tag": "low_cap", "cap": 150000.0, "d0": "1997-01-01"}
    )
    high = spark.sql(
        template,
        args={"tag": "high_cap", "cap": 400000.0, "d0": "1995-06-01"},
    )
    imm = spark.sql("""
      EXECUTE IMMEDIATE
        'SELECT ''exec_imm'' AS param_set, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total
         FROM param_orders WHERE o_orderkey % 10 = ? GROUP BY 2'
      USING 3
    """)
    return low.unionAll(high).unionAll(imm)


@query(
    "sql_udf_functions",
    oracle="""
    WITH priced AS (
      SELECT l_orderkey, l_linenumber,
        CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(3,2))
                      - CAST(l_discount AS DECIMAL(18,2))), 2)
             AS DOUBLE) AS net,
        CASE WHEN l_quantity >= 40.0 THEN 'bulk'
             WHEN l_quantity >= 15.0 THEN 'mid'
             ELSE 'small' END AS qty_band
      FROM lineitem WHERE l_orderkey < 3000)
    SELECT qty_band,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(net AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS net_revenue
    FROM priced GROUP BY 1
    """,
    tags=("scalar", "B12", "sql-udf"),
)
def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs — ``CREATE FUNCTION ... RETURNS ... RETURN``
    (SQL:2016 / Spark 4.0): reusable logic declared IN SQL, so it
    inlines into the calling plan as ordinary Catalyst expressions —
    full codegen, pushdown, and constant folding, none of the Python
    serialization tax of the B14 mechanisms (the decision rule the
    docstring exists to state: if the logic is expressible as a SQL
    expression, a SQL UDF beats every Python UDF flavor at any scale).
    Covered: a scalar function (exact-decimal net price) and a scalar
    CASE classifier (quantity banding), both applied in one rollup; the
    oracle replays the bodies inline — equality proves the function
    boundary is semantically transparent.

    Scale shape: identical plan to the inlined query — the functions
    dissolve at analysis time."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sqludf_lineitem"
    )
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)
      RETURNS DOUBLE
      RETURN CAST(round(CAST(p AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2))
                           - CAST(d AS DECIMAL(18,2))), 2) AS DOUBLE)
    """)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
      RETURNS STRING
      RETURN CASE WHEN q >= 40.0 THEN 'bulk'
                  WHEN q >= 15.0 THEN 'mid'
                  ELSE 'small' END
    """)
    return spark.sql("""
      SELECT qty_band(l_quantity) AS qty_band,
        CAST(count(*) AS BIGINT) AS n,
        CAST(round(sum(CAST(net_price(l_extendedprice, l_discount)
                            AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS net_revenue
      FROM sqludf_lineitem WHERE l_orderkey < 3000
      GROUP BY 1
    """)


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT o_orderpriority AS dim_value,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders GROUP BY 1
    """,
    tags=("scalar", "B12", "sql-surface", "identifier"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``IDENTIFIER()`` clause (Spark 4.0) — parameterizing the parts
    of a query a value marker canNOT reach: table and column NAMES. A
    parameter bound into IDENTIFIER() is resolved as an identifier with
    full injection safety (a name containing quotes or dots is one
    weird identifier, never spliced SQL) — completing the
    metadata-driven-pipeline story started by ``sql_parameterized_exec``
    (values) for the reference's config-driven per-entity queries,
    where entity → TABLE NAME and the rollup dimension comes from
    config (SURVEY.md §1.2). Here both the source view and the grouping
    column arrive as string arguments.

    Scale shape: resolved at analysis time; the executed plan is the
    ordinary pushed-scan + group-sized aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ident_orders"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(:dim) AS dim_value,
          CAST(count(*) AS BIGINT) AS n,
          CAST(round(sum(CAST(IDENTIFIER(:measure) AS DECIMAL(18,2))), 2)
               AS DOUBLE) AS total
        FROM IDENTIFIER(:tab) GROUP BY 1
        """,
        args={
            "dim": "o_orderpriority",
            "measure": "o_totalprice",
            "tab": "ident_orders",
        },
    )


@query(
    "sql_filter_window_clause",
    oracle="""
    WITH sliced AS (
      SELECT event_type, user_id, value,
        CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
          AS cents,
        row_number() OVER w AS rn,
        sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT))
          OVER w AS run_cents
      FROM events WHERE event_id < 2000
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n,
      CAST(count(*) FILTER (WHERE value > 100.0) AS BIGINT) AS n_high,
      CAST(sum(cents) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
        AS cents_even,
      CAST(max(rn) AS BIGINT) AS max_rn,
      CAST(max(run_cents) AS BIGINT) AS final_run_cents
    FROM sliced GROUP BY 1
    """,
    tags=("scalar", "B12", "sql-surface", "filter-clause"),
)
def sql_filter_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SQL:2003/2011 clauses the battery had exercised only on the
    ORACLE side, now certified engine-side: the aggregate ``FILTER
    (WHERE ...)`` clause (per-aggregate predicates without CASE-WHEN
    contortions — and unlike ``CASE WHEN ... END``, FILTER keeps
    count()'s null-semantics exact) and the named ``WINDOW w AS (...)``
    clause (one definition shared by many window expressions — the
    drift-proof form when a query carries five frames over the same
    partitioning). The windowed running sum's per-partition maximum
    must equal the group total, proving the named window bound to the
    same partitioning the aggregate used.

    Scale shape: pushed key filter, one partitioned window pass, one
    group-sized aggregate — both clauses are pure parser surface over
    plans already certified elsewhere."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "fw_events"
    )
    return spark.sql("""
      WITH sliced AS (
        SELECT event_type, user_id, value,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
            AS cents,
          row_number() OVER w AS rn,
          sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT))
            OVER w AS run_cents
        FROM fw_events WHERE event_id < 2000
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) FILTER (WHERE value > 100.0) AS BIGINT) AS n_high,
        CAST(sum(cents) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
          AS cents_even,
        CAST(max(rn) AS BIGINT) AS max_rn,
        CAST(max(run_cents) AS BIGINT) AS final_run_cents
      FROM sliced GROUP BY 1
    """)


@query(
    "sql_session_variables",
    # The oracle inlines each SET VAR's defining scalar subquery; both
    # bounds are exact cross-engine (IEEE halving of an exact max;
    # timestamp minus a whole-day interval).
    oracle="""
    SELECT o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders
    WHERE o_totalprice < (SELECT max(o_totalprice) / 2 FROM orders)
      AND o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 400 DAY
                          FROM orders)
    GROUP BY 1
    """,
    tags=("scalar", "B12", "sql-surface", "session-variables"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE VARIABLE`` /
    ``SET VAR``): two variables are DECLARED, then SET from scalar
    subqueries over the data itself (a data-derived price cap and a
    trailing-400-day cutoff), then referenced by NAME in a filtered
    rollup — the stateful-session idiom scripting pipelines use to
    thread one computed bound through many statements without
    re-deriving or string-splicing it. The oracle inlines the defining
    subqueries; equality proves SET VAR captured the VALUE once (typed,
    evaluated at set time), not a re-evaluated expression.

    Scale shape: each SET VAR is one scalar aggregate job; the final
    query is an ordinary pushed-filter group-sized rollup — variables
    live on the driver session and cost nothing at execution."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_cap DOUBLE")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_cutoff TIMESTAMP")
    spark.sql("SET VAR sv_cap = (SELECT max(o_totalprice) / 2 FROM sv_orders)")
    spark.sql(
        "SET VAR sv_cutoff = (SELECT max(o_orderdate) - INTERVAL 400 DAY"
        " FROM sv_orders)"
    )
    out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18, 2))) AS dtotal
        FROM sv_orders
        WHERE o_totalprice < sv_cap AND o_orderdate >= sv_cutoff
        GROUP BY 1
        """
    )
    return out.select(
        "o_orderpriority",
        "n",
        F.col("dtotal").cast("double").alias("total"),
    )


@query(
    "sql_lateral_column_alias",
    # DuckDB also resolves same-SELECT alias references, so the oracle
    # states the identical chain; the chain runs in exact DECIMAL
    # on both sides, so sums are order-independent and bit-equal.
    oracle="""
    WITH rows_chained AS (
      SELECT l_returnflag, l_linestatus,
        CAST(l_extendedprice AS DECIMAL(18,2)) AS gross,
        gross * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
          AS disc_price,
        disc_price * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))
          AS charge,
        CASE WHEN charge > gross THEN 1 ELSE 0 END AS tax_exceeds
      FROM lineitem WHERE l_quantity < 24.0)
    SELECT l_returnflag, l_linestatus,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(disc_price), 2) AS DOUBLE) AS sum_disc_price,
      CAST(round(sum(charge), 2) AS DOUBLE) AS sum_charge,
      CAST(sum(tax_exceeds) AS BIGINT) AS n_tax_exceeds_discount
    FROM rows_chained GROUP BY 1, 2
    """,
    tags=("scalar", "B12", "sql-surface", "lateral-alias"),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL COLUMN ALIASES (Spark 3.4+/4): a SELECT item references an
    alias defined EARLIER IN THE SAME SELECT — ``disc_price`` builds on
    ``gross``, ``charge`` on ``disc_price``, and a flag on ``charge`` —
    the derived-measure chain every pricing/metrics query wants without
    nesting three subqueries or repeating the expression (the classic
    pre-3.4 workarounds, both of which desync the moment one formula
    changes). The rollup then aggregates the chained measures per
    returnflag × linestatus. Catalyst inlines the alias chain at
    analysis — the physical plan is identical to the written-out
    expressions, which is what oracle equality (stated with the same
    chain on the DuckDB side) certifies.

    Scale shape: pure row-local projection chain inside one codegen'd
    stage, then a group-sized aggregate — no extra shuffle, no
    subquery re-scan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lca_li")
    return spark.sql(
        """
        WITH rows_chained AS (
          SELECT l_returnflag, l_linestatus,
            CAST(l_extendedprice AS DECIMAL(18,2)) AS gross,
            gross * (CAST(1 AS DECIMAL(3,2))
                     - CAST(l_discount AS DECIMAL(3,2))) AS disc_price,
            disc_price * (CAST(1 AS DECIMAL(3,2))
                          + CAST(l_tax AS DECIMAL(3,2))) AS charge,
            CASE WHEN charge > gross THEN 1 ELSE 0 END AS tax_exceeds
          FROM lca_li WHERE l_quantity < 24.0)
        SELECT l_returnflag, l_linestatus,
          count(*) AS n,
          CAST(round(sum(disc_price), 2) AS DOUBLE) AS sum_disc_price,
          CAST(round(sum(charge), 2) AS DOUBLE) AS sum_charge,
          sum(tax_exceeds) AS n_tax_exceeds_discount
        FROM rows_chained GROUP BY 1, 2
        """
    )
