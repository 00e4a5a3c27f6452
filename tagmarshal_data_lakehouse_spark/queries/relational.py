"""Relational operator coverage queries (SURVEY.md §2.2-§2.8).

Each query exercises one operator family from the reference's inventory,
re-expressed over the driver's TPC-H-ish testdata so the DuckDB oracle can
verify it.  Where the reference pattern is cited, the query is the same
*shape* (same operator composition), with golf-telemetry columns swapped
for testdata columns.

Determinism: see queries/__init__.py module docstring.  ``dsum(x)`` =
exact decimal sum cast back to double — identical IEEE value in Spark and
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import Query, load_views


def dsum(expr: str, scale: int = 4, prec: int = 18) -> str:
    """Exact decimal sum of a double expression, returned as double.

    SUM over doubles is order-dependent (differs between engines and
    between partitionings of the *same* engine); SUM over decimals is
    exact, so casting each input to decimal makes the aggregate
    bit-reproducible everywhere — including across a 1000-executor
    cluster, which is why the engine's own gold models use it too.
    `prec` widens the decimal for squared/product terms (moment sums)
    whose magnitude outgrows DECIMAL(18,·).
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def davg(expr: str, scale: int = 4) -> str:
    """Deterministic average: exact decimal sum / count."""
    return f"{dsum(expr, scale)} / COUNT(*)"


def _shared(name: str, sql: str, doc: str) -> Query:
    """Query whose Spark SQL and DuckDB oracle are the same ANSI text."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    return Query(name=name, build=build, oracle=sql, doc=doc)


# --------------------------------------------------------------------------
# Aggregations (§2.4)
# --------------------------------------------------------------------------

PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity')}                                        AS sum_qty,
       {dsum('l_extendedprice')}                                   AS sum_base_price,
       {dsum('l_extendedprice * (1 - l_discount)', 6)}             AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       ROUND({davg('l_quantity')}, 6)                              AS avg_qty,
       ROUND({davg('l_extendedprice')}, 6)                         AS avg_price,
       ROUND({davg('l_discount', 6)}, 6)                           AS avg_disc,
       CAST(COUNT(*) AS BIGINT)                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

q_agg_pricing_summary = _shared(
    "agg_pricing_summary",
    PRICING_SUMMARY_SQL,
    "Hash aggregate with multiple SUM/AVG/COUNT (SURVEY §2.4 A1/A3/A12; "
    "reference fact_rounds.sql:41-87 shape). Flagship query.",
)

q_agg_conditional = _shared(
    "agg_conditional",
    f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT)                                              AS n_orders,
       CAST(COUNT_IF(o_totalprice > 200000) AS BIGINT)                       AS n_high_value,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       {dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_revenue,
       ROUND(1.0e2 * COUNT_IF(o_totalprice > 200000) / NULLIF(COUNT(*), 0), 4) AS pct_high_value
FROM orders
GROUP BY o_orderstatus
""",
    "Conditional aggregation: COUNT_IF / SUM(CASE WHEN) / pct-of-total with "
    "NULLIF divide guard (SURVEY §2.4 A1, A13; reference "
    "data_quality_overview.sql:44-84).",
)

q_agg_filter_clause = _shared(
    "agg_filter_clause",
    f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT)                                    AS n_customers,
       CAST(COUNT(*) FILTER (WHERE c_acctbal < 0) AS BIGINT)       AS n_negative_bal,
       {dsum('c_acctbal')}                                         AS total_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) FILTER (WHERE c_acctbal > 5000) AS DOUBLE) AS rich_bal
FROM customer
GROUP BY c_mktsegment
""",
    "Aggregate FILTER (WHERE ...) clause (SURVEY §2.4 A5; reference "
    "global_overview.sql:58-59, dim_course.sql:39).",
)

q_agg_minmax_duration = Query(
    name="agg_minmax_duration",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts,
                   CAST(TIMESTAMPDIFF(MICROSECOND, MIN(ts), MAX(ts)) AS BIGINT) AS span_micros
            FROM events GROUP BY user_id
            """
        ),
    )[1],
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_micros
        FROM events GROUP BY user_id
    """,
    doc="MIN/MAX timestamps -> duration (SURVEY §2.4 A2; reference "
    "fact_rounds.sql:47-49 DATE_DIFF('second', MIN, MAX)).",
)

q_agg_percentile = _shared(
    "agg_percentile",
    """
SELECT o_orderpriority,
       ROUND(CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS median_price,
       ROUND(CAST(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS p90_price
FROM orders
GROUP BY o_orderpriority
""",
    "Exact median/p90 (SURVEY §2.4 A4 — reference APPROX_PERCENTILE "
    "global_overview.sql:59; exact form checked against oracle, approx "
    "form exposed separately for the 100TB path).",
)

q_agg_stddev = _shared(
    "agg_stddev",
    f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(
         SQRT(
           ( {dsum('l_discount * l_discount', 8)}
             - {dsum('l_discount', 8)} * {dsum('l_discount', 8)} / COUNT(*)
           ) / (COUNT(*) - 1)
         ), 6)                  AS stddev_disc
FROM lineitem
GROUP BY l_returnflag
""",
    "Deterministic STDDEV via exact decimal sum-of-squares (SURVEY §2.4 A3; "
    "reference bottleneck_analysis.sql:23-28 STDDEV(pace)). Engine-order-"
    "independent — the reason: plain stddev over doubles is not "
    "reproducible across partitionings.",
)

q_agg_bool_array = Query(
    name="agg_bool_array",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT c_nationkey,
                   BOOL_OR(c_acctbal < 0)                                 AS any_negative,
                   BOOL_AND(c_acctbal > -1000)                            AS all_above_floor,
                   ARRAY_JOIN(SORT_ARRAY(COLLECT_SET(c_mktsegment)), '+') AS segments,
                   CAST(SIZE(ARRAY_DISTINCT(COLLECT_LIST(c_mktsegment))) AS INT) AS n_segments
            FROM customer GROUP BY c_nationkey
            """
        ),
    )[1],
    oracle="""
        SELECT c_nationkey,
               BOOL_OR(c_acctbal < 0)  AS any_negative,
               BOOL_AND(c_acctbal > -1000) AS all_above_floor,
               ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(c_mktsegment))), '+') AS segments,
               CAST(LEN(LIST_DISTINCT(LIST(c_mktsegment))) AS INT) AS n_segments
        FROM customer GROUP BY c_nationkey
    """,
    doc="BOOL_OR rollup + sorted-distinct array join (SURVEY §2.4 A6/A7/A8; "
    "reference fact_rounds.sql:64-65, dashboard queries.py:596,607 "
    "'nines played = 1+2' idiom).",
)

q_agg_mode_deterministic = _shared(
    "agg_mode_deterministic",
    """
WITH counts AS (
    SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM part GROUP BY p_type, p_brand
), ranked AS (
    SELECT p_type, p_brand, cnt,
           ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY cnt DESC, p_brand ASC) AS rn
    FROM counts
)
SELECT p_type, p_brand AS dominant_brand, cnt AS brand_count
FROM ranked WHERE rn = 1
""",
    "Deterministic MODE (dominant value per group) via count + ordered "
    "row_number — tie-broken by value so it hash-matches; reference uses "
    "F.mode() for dominant hole per section (SURVEY §2.4 A9, "
    "dimensions.py:118-124).",
)

q_agg_having = _shared(
    "agg_having",
    f"""
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines, {dsum('l_quantity')} AS total_qty
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) > 40
""",
    "Post-aggregate HAVING filter (SURVEY §2.4 A11; reference "
    "bottleneck_analysis.sql:38 HAVING COUNT(*) > 50).",
)

q_agg_global = _shared(
    "agg_global",
    f"""
SELECT CAST(COUNT(*) AS BIGINT)                 AS n_lineitems,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_suppliers,
       {dsum('l_extendedprice')}                AS total_price,
       MIN(l_shipdate)                          AS first_ship,
       MAX(l_shipdate)                          AS last_ship
FROM lineitem
""",
    "Global no-group single-row aggregate (SURVEY §2.4 A12; reference "
    "global_overview.sql:34-60, executive_summary.sql).",
)

q_agg_weighted_score = _shared(
    "agg_weighted_score",
    """
WITH base AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(1.0e2 * COUNT_IF(o_orderstatus = 'F') / NULLIF(COUNT(*), 0), 6) AS pct_finished,
           ROUND(1.0e2 * COUNT_IF(o_totalprice > 150000) / NULLIF(COUNT(*), 0), 6) AS pct_large,
           ROUND(1.0e2 * COUNT_IF(o_orderstatus = 'O') / NULLIF(COUNT(*), 0), 6) AS pct_open
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, pct_finished, pct_large, pct_open,
       ROUND(4.0e-1 * pct_finished + 3.0e-1 * pct_large + 2.0e-1 * pct_open + 1.0e1, 6) AS composite_score,
       GREATEST(pct_finished, pct_large, pct_open) AS worst_dimension_pct
FROM base
""",
    "Weighted composite score over conditional aggregates + GREATEST "
    "(SURVEY §2.4 A13/A14; reference critical_column_gaps.sql:53-56,146-154 "
    "40/30/20/10 weighting). Scientific-notation literals force DOUBLE "
    "arithmetic in both engines — plain `100.0` parses as DECIMAL in "
    "Spark and the decimal result would type/hash-mismatch the oracle.",
)

q_distinct_projection = _shared(
    "distinct_projection",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "DISTINCT projection anchor (SURVEY §2.4 A15; reference dim_course.sql:18-21).",
)

# --------------------------------------------------------------------------
# Joins (§2.3)
# --------------------------------------------------------------------------

q_join_multiway = _shared(
    "join_multiway",
    f"""
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dsum('o_totalprice')}   AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "Chained multiway equi-join fact->dims (SURVEY §2.3 J3; reference "
    "dim_course.sql:89-99 5-way stitch). Catalyst auto-broadcasts the "
    "small dims (nation/region under the 10MB threshold).",
)


def _build_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    lineitem = spark.table("lineitem")
    part = spark.table("part")
    # Explicit broadcast hint, mirroring the reference's F.broadcast(topology)
    # (etl.py:518-519): dimension is small, fact is huge — never shuffle the
    # fact for this join.
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


q_join_broadcast = Query(
    name="join_broadcast",
    build=_build_join_broadcast,
    oracle=f"""
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               {dsum('l_quantity')}     AS total_qty,
               {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    doc="Broadcast hash join fact x small dim with explicit hint "
    "(SURVEY §2.3 J1-style broadcast, §4; reference etl.py:518-519).",
)


def _build_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    # Band dimension built in-memory, exactly like the reference's tiny
    # topology dim; the range condition prevents a hash join, so Catalyst
    # plans BroadcastNestedLoopJoin — correct call for a <=10-row dim
    # (SURVEY §2.3 J1, §4; reference etl.py:505-528).  Inline VALUES
    # (LocalRelation) rather than createDataFrame: the Python->RDD
    # round-trip of createDataFrame costs ~2 s per call; a literal
    # relation is free and broadcast-identical.
    bands = spark.sql(
        "SELECT * FROM VALUES (0.0D, 10.0D, 'low'), (10.0D, 25.0D, 'mid'), "
        "(25.0D, 60.0D, 'high') AS t(qty_lo, qty_hi, qty_band)"
    )
    lineitem = spark.table("lineitem")
    joined = lineitem.join(
        F.broadcast(bands),
        (lineitem.l_quantity > bands.qty_lo) & (lineitem.l_quantity <= bands.qty_hi),
        "left",
    )
    return joined.groupBy("qty_band").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
    )


q_join_range_broadcast = Query(
    name="join_range_broadcast",
    build=_build_join_range,
    oracle=f"""
        SELECT qty_band,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               {dsum('l_extendedprice')} AS total_price
        FROM lineitem
        LEFT JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 60.0, 'high'))
             AS bands(qty_lo, qty_hi, qty_band)
          ON l_quantity > qty_lo AND l_quantity <= qty_hi
        GROUP BY qty_band
    """,
    doc="Broadcast LEFT range join (non-equi BETWEEN-style) against a tiny "
    "band dim — the reference's topology nine_number join (SURVEY §2.3 J1; "
    "etl.py:505-528).",
)


def _build_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    customer = spark.table("customer")
    big_orders = spark.table("orders").filter(F.col("o_totalprice") > 250000)
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


q_join_semi = Query(
    name="join_semi",
    build=_build_join_semi,
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
    doc="Left-semi join / EXISTS (SURVEY §2.3 J6 eligible-rounds idiom; "
    "reference demo_all_insights.sql:180-201).",
)


def _build_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    customer = spark.table("customer")
    orders = spark.table("orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


q_join_anti = Query(
    name="join_anti",
    build=_build_join_anti,
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join / NOT EXISTS — customers with no orders (completes "
    "the join surface; SURVEY §2.3 notes the reference never needs it).",
)

q_join_coverage_audit = _shared(
    "join_coverage_audit",
    """
WITH order_counts AS (
    SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
), line_counts AS (
    SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
)
SELECT c_custkey,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_lines, 0)  AS n_lines,
       CASE WHEN COALESCE(n_orders, 0) = 0 THEN 'no_orders'
            WHEN COALESCE(n_lines, 0) = 0 THEN 'orders_without_lines'
            ELSE 'ok' END    AS coverage_status
FROM customer
LEFT JOIN order_counts ON c_custkey = custkey
LEFT JOIN line_counts  ON c_custkey = line_counts.custkey
""",
    "Multi-CTE LEFT-JOIN coverage audit — counts from two grains reconciled "
    "per key (SURVEY §2.3 J4, §5.4; reference gold_coverage_audit.sql:121-127).",
)

q_join_share_of_total = _shared(
    "join_share_of_total",
    """
WITH seg_nation AS (
    SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_mktsegment, c_nationkey
)
SELECT c_mktsegment, c_nationkey, n_customers,
       ROUND(1.0e2 * n_customers / NULLIF(SUM(n_customers) OVER (PARTITION BY c_mktsegment), 0), 6) AS pct_of_segment
FROM seg_nation
""",
    "Share-of-total via window SUM OVER (PARTITION BY) — the Spark-first "
    "rewrite of the reference's aggregate-then-join-back (SURVEY §2.3 J5; "
    "course_rounds_by_month.sql:54-63).",
)

q_join_outlier_vs_max = _shared(
    "join_outlier_vs_max",
    """
WITH per_pair AS (
    SELECT l_suppkey, l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_suppkey, l_partkey
)
SELECT l_suppkey, l_partkey, n_lines,
       MAX(n_lines) OVER (PARTITION BY l_suppkey) AS max_lines_for_supp,
       n_lines = MAX(n_lines) OVER (PARTITION BY l_suppkey) AS is_busiest_part
FROM per_pair
""",
    "Per-group max attached to detail rows via window MAX — Spark-first "
    "form of the reference's self-join against per-hole MAX(section) "
    "(SURVEY §2.3 J7; demo_all_insights.sql:308-338).",
)

def _build_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-dim join: lineitem salted on l_suppkey.

    Salting is semantically invisible (the oracle below is the PLAIN
    join), which is exactly the property that makes it safe to deploy on
    a hot key at 100 TB: spread the key across salt_factor reducers,
    replicate the dim side per salt, aggregate as usual.
    """
    from ..operators import salted_join

    load_views(spark, sf_dir)
    lineitem = spark.table("lineitem").withColumnRenamed("l_suppkey", "suppkey")
    supplier = spark.table("supplier").withColumnRenamed("s_suppkey", "suppkey")
    joined = salted_join(
        lineitem, supplier.select("suppkey", "s_nationkey"), on="suppkey",
        salt_col="l_orderkey", salt_factor=8,
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).cast("double").alias("revenue"),
        )
    )


q_join_salted_skew = Query(
    name="join_salted_skew",
    build=_build_join_salted,
    oracle=f"""
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               {dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    """,
    doc="Salted skew join (deterministic xxhash64 salt on the fact, "
    "salt_factor-replicated dim) — identical rows to the plain join, "
    "which the oracle IS; the skew treatment for keys AQE cannot split "
    "(operators/__init__.py:salted_join).",
)


# --------------------------------------------------------------------------
# Window functions (§2.5)
# --------------------------------------------------------------------------


def _build_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    events = spark.table("events")
    # The reference's dedup: ordered window, keep rn=1 — ordering encodes
    # business preference, NOT dropDuplicates (SURVEY §2.5 W1, §7.4 trap 4;
    # etl.py:572-586). Here: latest event per (user, type), ties broken by
    # event_id so the survivor set is unique.
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


q_window_dedup = Query(
    name="window_dedup",
    build=_build_window_dedup,
    oracle="""
        SELECT user_id, event_type, event_id, ts, value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) deduped WHERE rn = 1
    """,
    doc="Ordered-window dedup keeping preferred record (SURVEY §2.5 W1; "
    "reference etl.py:572-586 is_cache/battery preference).",
)

q_window_topn = _shared(
    "window_topn",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn AS price_rank
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
) ranked WHERE rn <= 3
""",
    "Top-N per group via ROW_NUMBER (SURVEY §2.5 W2; reference "
    "demo_all_insights.sql:47-86 top/bottom-3 months).",
)

q_window_lag_transitions = _shared(
    "window_lag_transitions",
    """
WITH seq AS (
    SELECT user_id, ts, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT event_type, prev_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY event_type, prev_type
""",
    "LAG sequence analysis -> transition classification (SURVEY §2.5 W3; "
    "reference queries.py:1011-1097 hole-transition validation).",
)

q_window_rank_dense = _shared(
    "window_rank_dense",
    """
SELECT c_nationkey, c_custkey, c_acctbal, bal_rank, bal_dense_rank
FROM (
    SELECT c_nationkey, c_custkey, c_acctbal,
           RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
) ranked
WHERE bal_rank <= 5
""",
    "RANK / DENSE_RANK + post-window filter (SURVEY §2.5 W4; reference "
    "queries.py:1246 global quality ranking).",
)

q_window_running_total = _shared(
    "window_running_total",
    f"""
SELECT o_orderdate, daily_revenue,
       ROUND(SUM(daily_revenue) OVER (ORDER BY o_orderdate
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_revenue
FROM (
    SELECT o_orderdate, {dsum('o_totalprice')} AS daily_revenue
    FROM orders GROUP BY o_orderdate
) daily
""",
    "Running total over an explicit ROWS frame — extension beyond the "
    "reference's ranking-only window use (SURVEY §2.5 note); daily grain "
    "keeps the frame deterministic.",
)

# --------------------------------------------------------------------------
# Sorts / limits (§2.6), set ops (§2.7)
# --------------------------------------------------------------------------

q_sort_limit_nulls_last = _shared(
    "sort_limit_nulls_last",
    """
SELECT event_id, user_id,
       CASE WHEN value < 5 THEN NULL ELSE value END AS capped_value
FROM events
ORDER BY capped_value DESC NULLS LAST, event_id ASC
LIMIT 50
""",
    "ORDER BY ... NULLS LAST + LIMIT with unique-key tiebreak "
    "(SURVEY §2.6; reference queries.py:419, etl.py:578-580).",
)

q_sort_case_key = _shared(
    "sort_case_key",
    """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS price_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
ORDER BY CASE price_bucket WHEN 'small' THEN 1 WHEN 'medium' THEN 2
                           WHEN 'large' THEN 3 ELSE 4 END
""",
    "Custom CASE sort key + GROUP BY ordinal (SURVEY §2.6, §7.4 trap 2; "
    "reference queries.py:573-582 round-length buckets).",
)


def _build_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    li = spark.table("lineitem")
    # Two frames with different column order and one missing column —
    # the ragged-CSV union trap (SURVEY §2.7, §7.4 trap 5; reference
    # etl.py:155-184): positional union would silently misalign; union
    # by NAME with missing-column fill is the only safe form.
    a = li.filter("l_linenumber = 1").select("l_orderkey", "l_quantity", "l_extendedprice")
    b = li.filter("l_linenumber = 2").select("l_extendedprice", "l_orderkey")  # reordered, missing qty
    return a.unionByName(b, allowMissingColumns=True)


q_union_by_name = Query(
    name="union_by_name",
    build=_build_union_by_name,
    oracle="""
        SELECT l_orderkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, CAST(NULL AS DOUBLE) AS l_quantity, l_extendedprice
        FROM lineitem WHERE l_linenumber = 2
    """,
    doc="unionByName(allowMissingColumns=True) across mismatched schemas "
    "(SURVEY §2.7; reference etl.py:184 ragged CSV union).",
)

# --------------------------------------------------------------------------
# Scalar function surface (§2.8)
# --------------------------------------------------------------------------

q_scalar_datetime = Query(
    name="scalar_datetime",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT CAST(TRUNC(o_orderdate, 'MM') AS TIMESTAMP_NTZ) AS order_month,
                   CAST(YEAR(o_orderdate) AS INT)                      AS order_year,
                   CAST(MONTH(o_orderdate) AS INT)                     AS order_month_num,
                   CAST(((DAYOFWEEK(o_orderdate) + 5) % 7) + 1 AS INT) AS iso_dow,
                   DATE_FORMAT(o_orderdate, 'MMMM')                    AS month_name,
                   DATE_FORMAT(o_orderdate, 'EEEE')                    AS day_name,
                   CAST(((DAYOFWEEK(o_orderdate) + 5) % 7) + 1 >= 6 AS BOOLEAN) AS is_weekend,
                   CAST(COUNT(*) AS BIGINT)                            AS n_orders
            FROM orders
            GROUP BY 1, 2, 3, 4, 5, 6, 7
            """
        ),
    )[1],
    oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(YEAR(o_orderdate) AS INT)     AS order_year,
               CAST(MONTH(o_orderdate) AS INT)    AS order_month_num,
               CAST(ISODOW(o_orderdate) AS INT)   AS iso_dow,
               MONTHNAME(o_orderdate)             AS month_name,
               DAYNAME(o_orderdate)               AS day_name,
               ISODOW(o_orderdate) >= 6           AS is_weekend,
               CAST(COUNT(*) AS BIGINT)           AS n_orders
        FROM orders
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
    doc="Datetime family incl. the ISO day-of-week conversion — the Spark "
    "1=Sunday vs Trino 1=Monday trap (SURVEY §2.8, §7.4 trap 1; reference "
    "fact_rounds.sql:110-114, global_time_patterns.sql:46-59). order_month "
    "is the naive timestamp type on BOTH sides, derived WITHOUT the LTZ "
    "detour: TRUNC(date,'MM') returns DATE and DATE->TIMESTAMP_NTZ casts "
    "tz-free, whereas DATE_TRUNC implicitly casts to session-tz TIMESTAMP "
    "and lands on 01:00 under timezones whose DST gap covers a month-first "
    "midnight (e.g. America/Asuncion, Oct 1993-95). The oracle casts "
    "DuckDB's DATE result up to its naive TIMESTAMP — both clients then "
    "materialize datetime64, avoiding the date-object vs Timestamp "
    "value-hash drift a DATE output hits.",
)

q_scalar_string_math = _shared(
    "scalar_string_math",
    """
SELECT p_partkey,
       CONCAT(p_brand, ':', p_type)                         AS brand_type,
       CAST(LENGTH(p_name) AS INT)                          AS name_len,
       UPPER(p_brand)                                       AS brand_upper,
       p_name LIKE '%green%'                                AS is_green,
       ROUND(p_retailprice / NULLIF(p_size, 0), 4)          AS price_per_size,
       COALESCE(NULLIF(p_size, 0), -1)                      AS size_or_sentinel,
       GREATEST(p_size, 10)                                 AS size_floor10
FROM part
""",
    "String + math + null-handling scalar surface: CONCAT/LENGTH/UPPER/"
    "LIKE/ROUND/NULLIF/COALESCE/GREATEST (SURVEY §2.8; reference "
    "etl.py:560-566 WKT concat, fact_rounds.sql:93-99 guards).",
)

q_scalar_json = Query(
    name="scalar_json",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT CAST(GET_JSON_OBJECT(props, '$.k') AS INT) AS k_value,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
            """
        ),
    )[1],
    oracle="""
        SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    """,
    doc="Semi-structured JSON field extraction — the engine's analogue of "
    "the reference's Mongo $oid/$date unwrapping of nested documents "
    "(SURVEY §2.8 JSON/Mongo family; api.py:22-40).",
)


q_scalar_variant = Query(
    name="scalar_variant",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            # VARIANT (Spark 4): parse once, typed path access after —
            # the open-format semi-structured type that replaces
            # repeated string re-parsing (GET_JSON_OBJECT) when many
            # paths read the same column at 100 TB. The filter and agg
            # both consume the SAME parsed variant. Decile uses
            # FLOOR(k/10.0) on BOTH engines — Spark's DIV truncates
            # toward zero while DuckDB's // floors, so a negative k
            # would otherwise flip the bucket.
            """
            WITH parsed AS (
                SELECT event_type, PARSE_JSON(props) AS v FROM events
            )
            SELECT event_type,
                   CAST(FLOOR(VARIANT_GET(v, '$.k', 'int') / 10.0) AS INT) AS k_decile,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MAX(VARIANT_GET(v, '$.k', 'int')) AS INT) AS max_k
            FROM parsed
            WHERE VARIANT_GET(v, '$.k', 'int') IS NOT NULL
            GROUP BY 1, 2
            """
        ),
    )[1],
    oracle="""
        WITH parsed AS (
            SELECT event_type, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(FLOOR(k / 10.0) AS INT) AS k_decile,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(k) AS INT) AS max_k
        FROM parsed
        WHERE k IS NOT NULL
        GROUP BY 1, 2
    """,
    doc="Semi-structured VARIANT path access (Spark 4 PARSE_JSON / "
    "VARIANT_GET): the column parses ONCE and every downstream path "
    "reads the binary variant — the scale answer to repeated "
    "GET_JSON_OBJECT string re-parsing; values oracle-checked against "
    "DuckDB's JSON extraction.",
)


def _build_scalar_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    # Coordinate validity + WKT construction, the quarantine predicate
    # re-expressed on testdata numerics (SURVEY §2.2 P5, §2.8 Misc;
    # reference etl.py:554-567,590-608; bounds constants.py:78-83).
    ev = spark.table("events")
    lon = (F.col("value") * 8 - 80).alias("lon")
    lat = (F.col("value") * 4 - 40).alias("lat")
    df = ev.select("event_id", lon, lat)
    valid = (
        F.col("lon").isNotNull()
        & F.col("lat").isNotNull()
        & (F.col("lon") >= -180.0)
        & (F.col("lon") <= 180.0)
        & (F.col("lat") >= -90.0)
        & (F.col("lat") <= 90.0)
    )
    return df.select(
        "event_id",
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        valid.alias("is_valid_coordinate"),
        F.when(
            valid,
            F.concat(
                F.lit("POINT("),
                F.round("lon", 6).cast("string"),
                F.lit(" "),
                F.round("lat", 6).cast("string"),
                F.lit(")"),
            ),
        ).alias("geometry_wkt"),
    )


q_scalar_coordinates = Query(
    name="scalar_coordinates",
    build=_build_scalar_coordinates,
    oracle="""
        WITH pts AS (
            SELECT event_id, value * 8 - 80 AS lon, value * 4 - 40 AS lat
            FROM events
        ), flagged AS (
            SELECT event_id, ROUND(lon, 6) AS lon, ROUND(lat, 6) AS lat,
                   (lon IS NOT NULL AND lat IS NOT NULL
                    AND lon >= -180.0 AND lon <= 180.0
                    AND lat >= -90.0 AND lat <= 90.0) AS is_valid_coordinate
            FROM pts
        )
        SELECT event_id, lon, lat, is_valid_coordinate,
               CASE WHEN is_valid_coordinate
                    THEN CONCAT('POINT(', CAST(lon AS VARCHAR), ' ', CAST(lat AS VARCHAR), ')')
               END AS geometry_wkt
        FROM flagged
    """,
    doc="Coordinate-validity predicate + POINT WKT synthesis — the "
    "quarantine split condition (SURVEY §2.2 P5; reference "
    "etl.py:554-567,590-608).",
)


# --------------------------------------------------------------------------
# Multi-dimensional aggregates, pivot, subqueries, lateral explode (§2.4/§2.8
# extensions — shapes the reference's dashboard rollups imply but its SQL
# spells out by hand with UNION ALL; Spark/DuckDB both have them natively)
# --------------------------------------------------------------------------

q_agg_rollup = _shared(
    "agg_rollup",
    f"""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       CAST(COUNT(*) AS BIGINT)      AS n_customers,
       {dsum('c_acctbal')}           AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    "ROLLUP hierarchy totals with GROUPING() markers — one pass computes "
    "the per-nation, per-region, and grand-total rows the reference's "
    "global_overview.sql assembles with separate queries. Spark plans a "
    "single Expand + hash aggregate: the fact is scanned ONCE at 100 TB.",
)

q_agg_cube = _shared(
    "agg_cube",
    f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(COUNT(*) AS BIGINT)               AS n_orders,
       {dsum('o_totalprice')}                 AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    "CUBE over two dims: all four grouping combinations in one Expand-based "
    "aggregate (SURVEY §2.4 extension).",
)

q_agg_grouping_sets = _shared(
    "agg_grouping_sets",
    f"""
SELECT c_mktsegment, n_name,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
       CAST(GROUPING(n_name) AS INT)       AS g_nation,
       CAST(COUNT(*) AS BIGINT)            AS n_customers,
       {dsum('c_acctbal')}                 AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
""",
    "Explicit GROUPING SETS: two independent dimension rollups plus grand "
    "total from one scan (SURVEY §2.4 extension).",
)

q_window_ntile_distribution = _shared(
    "window_ntile_distribution",
    """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS INT)        AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6)     AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6)        AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    "Distribution window functions (NTILE / PERCENT_RANK / CUME_DIST) over "
    "a named WINDOW clause; ordering includes the unique key so tile "
    "assignment is total-ordered and engine-independent (SURVEY §2.5 "
    "extension; reference percentile bands in dashboard rollups).",
)


def _build_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    # Explicit pivot value list: no values-discovery job (an extra scan +
    # collect at 100 TB), and the output schema is static for the planner.
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_fulfilled"),
            F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_pending"),
        )
    )


q_pivot_status = Query(
    name="pivot_status_counts",
    build=_build_pivot,
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_fulfilled,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Wide pivot (long->wide reshape) with a fixed value list; Spark "
    "lowers it to a single conditional aggregate — same plan as the "
    "oracle's FILTER form, one scan, no per-value jobs (SURVEY §2.4 "
    "extension; reference dashboard pace-by-hole matrix reshape).",
)

q_join_exists_correlated = _shared(
    "join_exists_correlated",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
""",
    "Correlated EXISTS predicate — Catalyst rewrites it to a left-semi "
    "hash join (no row explosion, no dedup pass) exactly like the "
    "explicit semi-join form (SURVEY §2.3 J6 subquery spelling).",
)

q_scalar_correlated_subquery = _shared(
    "scalar_correlated_subquery",
    """
SELECT c.c_custkey,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
       (SELECT MAX(o.o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey)                 AS max_order_price
FROM customer c
WHERE c.c_custkey <= 300
""",
    "Correlated scalar subqueries in the projection (incl. the classic "
    "COUNT-bug shape: customers with zero orders must read 0, not NULL). "
    "Catalyst de-correlates both into one left-outer aggregate join — "
    "the fact table is scanned once, not per-row (SURVEY §2.3/§2.8 "
    "extension).",
)


def _build_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, pos, word
        FROM documents
        LATERAL VIEW POSEXPLODE(SPLIT(text, ' ')) t AS pos, word
        WHERE doc_id < 50
        """
    )


q_explode_posexplode = Query(
    name="explode_posexplode",
    build=_build_posexplode,
    oracle="""
        WITH a AS (
            SELECT doc_id, split(text, ' ') AS arr FROM documents WHERE doc_id < 50
        ), zl AS (
            SELECT doc_id, list_zip(range(1, len(arr) + 1), arr) AS zipped FROM a
        ), z AS (
            SELECT doc_id, unnest(zipped) AS pr FROM zl
        )
        SELECT doc_id, CAST(pr[1] - 1 AS INT) AS pos, CAST(pr[2] AS VARCHAR) AS word
        FROM z
    """,
    doc="Ordinal-preserving lateral explode (posexplode) — tokenization "
    "with position, row-local generation so it never shuffles (SURVEY "
    "§2.8 array family; training tokenizer front-end).",
)


# --------------------------------------------------------------------------
# Set operations (§2.7), regression aggregates, advanced arrays, RANGE
# frames, full-outer reconciliation — round-2 depth additions
# --------------------------------------------------------------------------

q_set_intersect_except = _shared(
    "set_intersect_except",
    """
SELECT 'both' AS side, nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier)
UNION ALL
SELECT 'customer_only' AS side, nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier)
""",
    "INTERSECT / EXCEPT distinct set semantics beside the UNION ALL tag "
    "(SURVEY §2.7). Both lower to aggregate + semi/anti join, so the plan "
    "is two hash semi-joins on nationkey — no row-level set materialization.",
)

q_agg_corr_regression = _shared(
    "agg_corr_regression",
    f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE)                           AS n,
         {dsum('l_quantity')}                               AS sx,
         {dsum('l_extendedprice')}                          AS sy,
         {dsum('l_quantity * l_quantity', 4, 28)}           AS sxx,
         {dsum('l_extendedprice * l_extendedprice', 4, 28)} AS syy,
         {dsum('l_quantity * l_extendedprice', 4, 28)}      AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       ROUND((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)  AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
FROM s
""",
    "Pearson correlation + OLS slope/intercept computed from exact decimal "
    "moment sums (SURVEY §2.4 extension). Built-in CORR/REGR_* over doubles "
    "is partition-order dependent — the moment-sum form is bit-reproducible "
    "on any cluster size, same contract as dsum(). One map-side-combined "
    "hash aggregate; DECIMAL(28,4) headroom for the squared terms at 100 TB.",
)


def _build_scalar_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               array_join(transform(linenums, x -> CAST(x AS STRING)), ',') AS lines_csv,
               CAST(size(linenums) AS INT)                                  AS n_lines,
               CAST(size(filter(linenums, x -> x % 2 = 0)) AS INT)          AS n_even,
               CAST(element_at(linenums, 1) AS INT)                         AS first_line,
               CAST(element_at(linenums, -1) AS INT)                        AS last_line,
               CAST(aggregate(linenums, 0, (a, x) -> a + x) AS INT)         AS line_sum
        FROM (SELECT l_orderkey,
                     array_sort(collect_list(CAST(l_linenumber AS INT))) AS linenums
              FROM lineitem GROUP BY l_orderkey)
        ORDER BY l_orderkey LIMIT 100
        """
    )


q_scalar_array_family = Query(
    name="scalar_array_family",
    build=_build_scalar_array_family,
    oracle="""
        SELECT l_orderkey,
               array_to_string(list_transform(linenums, x -> CAST(x AS VARCHAR)), ',') AS lines_csv,
               CAST(len(linenums) AS INT)                                   AS n_lines,
               CAST(len(list_filter(linenums, x -> x % 2 = 0)) AS INT)      AS n_even,
               CAST(linenums[1] AS INT)                                     AS first_line,
               CAST(linenums[-1] AS INT)                                    AS last_line,
               CAST(list_sum(linenums) AS INT)                              AS line_sum
        FROM (SELECT l_orderkey, list_sort(list(CAST(l_linenumber AS INT))) AS linenums
              FROM lineitem GROUP BY l_orderkey)
        ORDER BY l_orderkey LIMIT 100
    """,
    doc="Higher-order array functions — transform / filter / aggregate "
    "lambdas, element_at from both ends, array_join (SURVEY §2.8 array "
    "family). All row-local and codegen'd after the one grouping shuffle; "
    "array_sort on the collected list makes the result partition-order "
    "independent.",
)

q_agg_string_agg = Query(
    name="agg_string_agg",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT c_mktsegment,
                   array_join(array_sort(collect_set(o_orderpriority)), '|') AS priorities,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)           AS n_priorities
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
            """
        ),
    )[1],
    oracle="""
        SELECT c_mktsegment,
               string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)                    AS n_priorities
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    doc="Ordered string aggregation (STRING_AGG / LISTAGG equivalent) as "
    "sorted collect_set + array_join — deterministic under any partitioning "
    "because the sort happens after collection, unlike a bare STRING_AGG "
    "whose order is engine-arbitrary (SURVEY §2.4 extension).",
)

q_window_range_frame = _shared(
    "window_range_frame",
    """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_30d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_last_30d
FROM orders
""",
    "Event-time RANGE frame (trailing 30-day count + decimal-exact spend) "
    "— the sliding-window shape behind pace-over-trailing-period telemetry "
    "(SURVEY §2.5 extension). One shuffle on the partition key; the frame "
    "scan is sort-merge within partition, no cross-partition state.",
)

q_join_full_outer = _shared(
    "join_full_outer",
    """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c.nk, s.nk)                AS nationkey,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_suppliers,
       (c.nk IS NULL OR s.nk IS NULL)      AS one_sided
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    "Full-outer reconciliation of two pre-aggregated sides with COALESCE "
    "null-handling — the two-sided version of the coverage audit's left "
    "anti pattern (SURVEY §2.3 extension; reference coverage_audit.sql "
    "shape). Aggregating BEFORE the join shrinks both sides to |keys| "
    "rows, so the full outer join is trivially small at any scale.",
)


def _build_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import key_skew_profile

    load_views(spark, sf_dir)
    return key_skew_profile(spark.table("orders"), "o_custkey", top=20)


q_agg_skew_profile = Query(
    name="agg_skew_profile",
    build=_build_skew_profile,
    oracle="""
        WITH counts AS (
            SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
        ), totals AS (
            SELECT CAST(SUM(n) AS DOUBLE) AS total_rows,
                   CAST(COUNT(*) AS DOUBLE) AS n_keys
            FROM counts
        )
        SELECT o_custkey,
               CAST(n AS BIGINT)                                 AS n_rows,
               ROUND(n / total_rows, 6)                          AS share,
               ROUND(n / (total_rows / n_keys), 4)               AS skew_vs_mean
        FROM counts, totals
        ORDER BY n_rows DESC, o_custkey ASC
        LIMIT 20
    """,
    doc="Hot-key diagnostic (operators.key_skew_profile): top-N keys with "
    "share-of-total and skew-vs-mean ratio — the measurement that decides "
    "between plain shuffle, salted_join, and AQE skew splitting before "
    "committing a 100 TB key to a distribution strategy. One partial-"
    "aggregated count + broadcast single-row totals; top-N is "
    "TakeOrderedAndProject.",
)


def _build_scan_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profile_columns

    load_views(spark, sf_dir)
    return profile_columns(
        spark.table("orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )


q_scan_profile = Query(
    name="scan_profile",
    build=_build_scan_profile,
    oracle="""
        WITH one AS (
            SELECT COUNT(*) AS rows_all,
                   SUM(CASE WHEN o_orderkey    IS NULL THEN 1 ELSE 0 END) AS n1,
                   SUM(CASE WHEN o_custkey     IS NULL THEN 1 ELSE 0 END) AS n2,
                   SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS n3,
                   SUM(CASE WHEN o_totalprice  IS NULL THEN 1 ELSE 0 END) AS n4,
                   SUM(CASE WHEN o_orderdate   IS NULL THEN 1 ELSE 0 END) AS n5,
                   COUNT(DISTINCT o_orderkey)    AS d1,
                   COUNT(DISTINCT o_custkey)     AS d2,
                   COUNT(DISTINCT o_orderstatus) AS d3,
                   COUNT(DISTINCT o_totalprice)  AS d4,
                   COUNT(DISTINCT o_orderdate)   AS d5,
                   CAST(MIN(o_orderkey) AS VARCHAR)    AS min1,
                   CAST(MIN(o_custkey) AS VARCHAR)     AS min2,
                   CAST(MIN(o_orderstatus) AS VARCHAR) AS min3,
                   CAST(MIN(o_totalprice) AS VARCHAR)  AS min4,
                   CAST(MIN(o_orderdate) AS VARCHAR)   AS min5,
                   CAST(MAX(o_orderkey) AS VARCHAR)    AS max1,
                   CAST(MAX(o_custkey) AS VARCHAR)     AS max2,
                   CAST(MAX(o_orderstatus) AS VARCHAR) AS max3,
                   CAST(MAX(o_totalprice) AS VARCHAR)  AS max4,
                   CAST(MAX(o_orderdate) AS VARCHAR)   AS max5
            FROM orders
        )
        SELECT u.* FROM one, LATERAL (VALUES
            ('o_orderkey',    CAST(rows_all AS BIGINT), CAST(n1 AS BIGINT), CAST(d1 AS BIGINT), min1, max1),
            ('o_custkey',     CAST(rows_all AS BIGINT), CAST(n2 AS BIGINT), CAST(d2 AS BIGINT), min2, max2),
            ('o_orderstatus', CAST(rows_all AS BIGINT), CAST(n3 AS BIGINT), CAST(d3 AS BIGINT), min3, max3),
            ('o_totalprice',  CAST(rows_all AS BIGINT), CAST(n4 AS BIGINT), CAST(d4 AS BIGINT), min4, max4),
            ('o_orderdate',   CAST(rows_all AS BIGINT), CAST(n5 AS BIGINT), CAST(d5 AS BIGINT), min5, max5)
        ) AS u(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    """,
    doc="One-pass multi-column profile (operators.profile_columns): rows, "
    "nulls, exact distincts, native-typed min/max per column from a "
    "single scan — the ANALYZE-TABLE / pre-training data-profiling role "
    "(swap approx_count_distinct in at 100 TB; plan otherwise "
    "unchanged).",
)


QUERIES = [
    q_agg_pricing_summary,
    q_agg_conditional,
    q_agg_filter_clause,
    q_agg_minmax_duration,
    q_agg_percentile,
    q_agg_stddev,
    q_agg_bool_array,
    q_agg_mode_deterministic,
    q_agg_having,
    q_agg_global,
    q_agg_weighted_score,
    q_distinct_projection,
    q_join_multiway,
    q_join_broadcast,
    q_join_range_broadcast,
    q_join_salted_skew,
    q_join_semi,
    q_join_anti,
    q_join_coverage_audit,
    q_join_share_of_total,
    q_join_outlier_vs_max,
    q_window_dedup,
    q_window_topn,
    q_window_lag_transitions,
    q_window_rank_dense,
    q_window_running_total,
    q_sort_limit_nulls_last,
    q_sort_case_key,
    q_union_by_name,
    q_scalar_datetime,
    q_scalar_string_math,
    q_scalar_json,
    q_scalar_coordinates,
    q_agg_rollup,
    q_agg_cube,
    q_agg_grouping_sets,
    q_window_ntile_distribution,
    q_pivot_status,
    q_join_exists_correlated,
    q_scalar_correlated_subquery,
    q_explode_posexplode,
    q_set_intersect_except,
    q_agg_corr_regression,
    q_scalar_array_family,
    q_agg_string_agg,
    q_window_range_frame,
    q_join_full_outer,
    q_agg_skew_profile,
    q_scan_profile,
    q_scalar_variant,
]
