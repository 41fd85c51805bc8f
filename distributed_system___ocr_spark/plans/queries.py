"""Query registry: every operator from SURVEY.md §2 (plus the
training-data-pipeline operators) as a (PySpark builder, ANSI-SQL
oracle) pair over the driver testdata tables.

Determinism rules for oracle parity (driver compares row count +
schema + order-insensitive value hash at sf0.01):

- every computed column is aliased IDENTICALLY on both sides;
- double aggregation uses the decimal trick: per-element (or
  per-product) cast to DECIMAL before SUM so the sum is exact and
  independent of accumulation order, then cast back to DOUBLE;
- ranking ties are always broken by a unique key;
- md5 hex (lowercase in both engines) is the shared hash primitive
  for dedup/minhash/simhash — Spark xxhash64 has no DuckDB twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# registry plumbing
# --------------------------------------------------------------------------

REGISTRY: dict[str, dict] = {}


def register(name: str, sql: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = {"builder": fn, "sql": sql}
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec["builder"] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec["sql"]
        for name, spec in REGISTRY.items()
        if spec["sql"] is not None
    }


# --------------------------------------------------------------------------
# O2: filter + projection (Manager.java:334 analogue)
# --------------------------------------------------------------------------

@register(
    "filter_project_docs",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> '' AND n_chars >= 200
    """,
)
def filter_project_docs(spark, sf_dir):
    """O2 drop-blank filter + column pruning; the scan should show
    PushedFilters on n_chars and ReadSchema of 3 columns."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.trim("text") != "")
            & (F.col("n_chars") >= 200)
        )
        .select("doc_id", "lang", "n_chars")
    )


# --------------------------------------------------------------------------
# O7: multiplicity accounting (Manager.java:216 counters)
# --------------------------------------------------------------------------

@register(
    "multiplicity_events",
    """
    SELECT event_type,
           count(*) AS n_occurrences,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def multiplicity_events(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# O8: deterministic last-wins dedup (Manager.java:218-219)
# --------------------------------------------------------------------------

@register(
    "dedup_latest_event",
    """
    SELECT user_id, event_id, event_type, ts FROM (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_event(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


# --------------------------------------------------------------------------
# resume anti-join (SURVEY §4: processed-set subtraction)
# --------------------------------------------------------------------------

@register(
    "resume_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def resume_anti_join(spark, sf_dir):
    """left-anti join — the resume primitive (pages vs processed)."""
    return (
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "orders"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# O10: manifest summary aggregation
# --------------------------------------------------------------------------

@register(
    "manifest_lang_summary",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DOUBLE) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def manifest_lang_summary(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (
                F.sum("n_chars").cast("double") / F.count("*")
            ).cast("double").alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q1: wide aggregation with exact-decimal sums
# --------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").alias("sum_base_price"),
        F.sum(disc.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3-style join + top-k (broadcast-able dims)
# --------------------------------------------------------------------------

@register(
    "q3_top_revenue",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_revenue(spark, sf_dir):
    """customer scales with the fact tables (150k rows/sf), so no
    static broadcast hint — AQE broadcasts it at runtime when the
    filtered side is measured small; ties broken by orderkey so the
    LIMIT is deterministic."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------------
# window top-k per group
# --------------------------------------------------------------------------

@register(
    "topk_orders_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def topk_orders_per_cust(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# --------------------------------------------------------------------------
# rollup over a broadcast dim chain
# --------------------------------------------------------------------------

@register(
    "region_rollup",
    """
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def region_rollup(spark, sf_dir):
    joined = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double").alias("total_acctbal"),
    )


# --------------------------------------------------------------------------
# sessionization (lag + gap cumsum)
# --------------------------------------------------------------------------

_SESSIONIZE_SQL = """
    SELECT user_id,
           CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL OR
                    ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE ts IS NOT NULL
      )
    ) GROUP BY user_id
    """


@register("sessionize_events", _SESSIONIZE_SQL)
def sessionize_events(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL-ts events are unorderable (and Spark NULLS FIRST vs DuckDB
    # NULLS LAST would diverge): excluded from sessionization, in both
    # forms and the oracle alike
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # microsecond precision to match DuckDB's exact interval compare
    # (ts is TIMESTAMP_NTZ in the parquet; unix_micros needs TIMESTAMP
    # and the session TZ is pinned UTC, so the cast is lossless)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    with_sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sess.groupBy("user_id").agg(
        F.countDistinct("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


_SESS_GAP_US = 30 * 60 * 1_000_000
_SESS_BUCKET_US = 24 * 3600 * 1_000_000  # 1 day >> the 30-min gap


@register("sessionize_events_salted", _SESSIONIZE_SQL)
def sessionize_events_salted(spark, sf_dir):
    """Skew-hardened sessionization: identical result to
    ``sessionize_events`` (same oracle), different physical shape. The
    plain form windows over user_id, so ONE pathologically hot user
    (50% of 10^12 events) lands in one task. Here the window is over
    (user_id, time-bucket): sessions are counted locally per bucket,
    then adjacent non-empty buckets are merged when the boundary gap
    is within the session gap — a per-(user,bucket) row window, tiny.
    Exact for ANY bucket size: a user's next event after a bucket's
    last is always the next non-empty bucket's first, and boundary
    comparisons use real timestamps, so empty buckets need no special
    case. Hot-key fixture equality is pinned in
    tests/test_scale_properties.py."""
    # same NULL-ts exclusion as the plain form (a NULL bucket would
    # otherwise count every NULL-ts event as its own session)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucketed = ev.select(
        "user_id", "ts", "event_id", us.alias("us"),
        F.floor(us / _SESS_BUCKET_US).alias("bucket"),
    )
    w_local = Window.partitionBy("user_id", "bucket").orderBy(
        "ts", "event_id"
    )
    gap = F.col("us") - F.lag("us").over(w_local)
    local = bucketed.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > _SESS_GAP_US), 1).otherwise(0),
    )
    per_bucket = local.groupBy("user_id", "bucket").agg(
        F.sum("new_sess").alias("n_sess_local"),
        F.count("*").alias("n_events"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    w_user = Window.partitionBy("user_id").orderBy("bucket")
    boundary_gap = F.col("first_us") - F.lag("last_us").over(w_user)
    merged = per_bucket.withColumn(
        "merge",
        F.when(
            boundary_gap.isNotNull() & (boundary_gap <= _SESS_GAP_US), 1
        ).otherwise(0),
    )
    return merged.groupBy("user_id").agg(
        (F.sum("n_sess_local") - F.sum("merge"))
        .cast("long").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


# --------------------------------------------------------------------------
# tumbling-window aggregation (batch analogue of the streaming path)
# --------------------------------------------------------------------------

@register(
    "windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def windowed_event_counts(spark, sf_dir):
    """F.window 5-min tumbling == DuckDB time_bucket (both align to the
    unix epoch for 5-minute buckets)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# set operation: EXCEPT
# --------------------------------------------------------------------------

@register(
    "except_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def except_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.subtract(buys)  # set EXCEPT (distinct), not exceptAll


# --------------------------------------------------------------------------
# manual pivot (conditional aggregation)
# --------------------------------------------------------------------------

@register(
    "pivot_event_values",
    """
    SELECT user_id % 5 AS bucket,
           CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS click_value,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS purchase_value,
           count(*) AS n
    FROM events GROUP BY user_id % 5
    """,
)
def pivot_event_values(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")

    def cond_sum(etype):
        return F.sum(
            F.when(
                F.col("event_type") == etype,
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        ).cast("double")

    return (
        ev.withColumn("bucket", F.col("user_id") % 5)
        .groupBy("bucket")
        .agg(
            cond_sum("click").alias("click_value"),
            cond_sum("purchase").alias("purchase_value"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# scalar function surface (O12 report transform analogues)
# --------------------------------------------------------------------------

@register(
    "scalar_report_transform",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           length(text) AS text_len,
           upper(substring(text, 1, 20)) AS head_upper,
           replace(substring(text, 1, 60), ' ', '<br/>') AS br_text
    FROM documents
    """,
)
def scalar_report_transform(spark, sf_dir):
    """The reference's only scalar transforms: newline->`<br/>`
    (LocalApplication.java:191), hashing, substring slicing."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.length("text").cast("long").alias("text_len"),
        F.upper(F.substring("text", 1, 20)).alias("head_upper"),
        F.regexp_replace(F.substring("text", 1, 60), " ", "<br/>").alias(
            "br_text"
        ),
    )
