"""Relational operator coverage (SURVEY.md §2.8) over the TPC-H-ish
testdata: joins, aggregation, rollup, windows, set ops, sessionization,
JSON extraction — the built-in Spark surface the engine exposes.

Where the two dialects agree, ONE SQL string serves both Spark
(`spark.sql` over registered temp views) and the DuckDB oracle —
identical text, zero drift.  Engine-side plans rely on Catalyst:
filters push to the parquet scan, dimension joins broadcast, decimal
aggregates use partial+final hash aggregation.

Cross-engine float policy (module docstring of entry_queries):
money sums in DECIMAL (exact) cast to DOUBLE; free doubles rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from beyond_vector_search_spark.plans.entry_queries import register
from beyond_vector_search_spark.sources.readers import register_testdata_views


def _sql_fn(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_testdata_views(spark, sf_dir)
        return spark.sql(sql)

    return fn


def register_shared_sql(name: str, sql: str) -> None:
    register(name, sql)(_sql_fn(sql))


# --- TPC-H Q1-style pricing summary (filter -> groupBy agg, decimal-exact)
TPCH_Q1 = """
SELECT
  l_returnflag,
  l_linestatus,
  count(*) AS count_order,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# --- TPC-H Q3-style shipping priority (3-way join -> agg -> top-k).
# The aggregate CTE is shared text; the final top-k differs by engine:
# the DuckDB oracle keeps the global row_number() window (fine single-
# node), while the Spark plan uses orderBy+LIMIT (TakeOrderedAndProject
# — per-task top-k, no single-partition shuffle of the full relation)
# and ranks only the k survivors (operators.scale.global_topk_ranked).
TPCH_Q3_REVENUE = """
  SELECT
    o.o_orderkey,
    CAST(o.o_orderdate AS STRING) AS o_orderdate,
    o.o_orderpriority,
    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY o.o_orderkey, CAST(o.o_orderdate AS STRING), o.o_orderpriority
"""

TPCH_Q3 = f"""
WITH revenue AS (
{TPCH_Q3_REVENUE}
)
SELECT o_orderkey, o_orderdate, o_orderpriority, revenue,
       CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS INTEGER) AS rank
FROM revenue
ORDER BY rank
LIMIT 10
"""


def q_tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.scale import global_topk_ranked

    register_testdata_views(spark, sf_dir)
    revenue = spark.sql(TPCH_Q3_REVENUE)
    return global_topk_ranked(revenue, 10, F.desc("revenue"), F.asc("o_orderkey"))

# --- TPC-H Q5-style local-supplier volume (6-way join through region)
TPCH_Q5 = """
SELECT
  n.n_name,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""

# --- TPC-H Q6-style revenue-change forecast + Q14-style promotion share
#     in one tagged relation (formerly tpch_q6_forecast + tpch_q14_promo).
#     Q6 is the pushdown showcase (every predicate reaches the parquet
#     scan); Q14 is conditional aggregation inside a fact->dim join.
TPCH_RATIO_AGGS = """
SELECT 'q6_revenue_change' AS q,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS value,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
UNION ALL
SELECT 'q14_promo_pct',
  CAST(CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
    * 100.0 AS DOUBLE),
  count(*)
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""

# --- TPC-H Q10-style returned-item reporting: which customers returned
#     the most revenue (join fact->dims, filter on flag, agg, top-k with
#     deterministic tie-break)
TPCH_Q10_RETURNS = """
  SELECT
    c.c_custkey,
    c.c_name,
    n.n_name,
    CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY c.c_custkey, c.c_name, n.n_name, CAST(c.c_acctbal AS DOUBLE)
"""

TPCH_Q10 = f"""
WITH returns AS (
{TPCH_Q10_RETURNS}
)
SELECT c_custkey, c_name, n_name, c_acctbal, revenue,
       CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INTEGER) AS rank
FROM returns
ORDER BY rank
LIMIT 20
"""


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side top-k like q_tpch_q3_topk: TakeOrderedAndProject
    instead of a global single-partition window (oracle keeps the
    window text)."""
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.scale import global_topk_ranked

    register_testdata_views(spark, sf_dir)
    returns = spark.sql(TPCH_Q10_RETURNS)
    return global_topk_ranked(returns, 20, F.desc("revenue"), F.asc("c_custkey"))

# --- window ranking: top-3 customers by balance per nation
WINDOW_TOP_CUSTOMERS = """
WITH ranked AS (
  SELECT
    n.n_name,
    c.c_custkey,
    c.c_name,
    c.c_acctbal,
    CAST(row_number() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS INTEGER) AS rank
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, c_custkey, c_name, c_acctbal, rank FROM ranked WHERE rank <= 3
"""

# --- every multi-grouping aggregation mode over orders in one tagged
#     relation (formerly orders_rollup + grouping_sets_orders +
#     cube_orders): ROLLUP, explicit GROUPING SETS, and CUBE, each with
#     grouping() tags so the rows are self-describing and the schemas
#     align across modes.
GROUPING_ORDERS = """
SELECT 'rollup' AS mode,
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'grouping_sets',
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INTEGER),
  CAST(grouping(o_orderpriority) AS INTEGER),
  count(*),
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
UNION ALL
SELECT 'cube',
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INTEGER),
  CAST(grouping(o_orderpriority) AS INTEGER),
  count(*),
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

# --- the set-operation family over order-activity windows in one tagged
#     relation (formerly except_custkeys + intersect_custkeys +
#     customers_without_orders): EXCEPT, INTERSECT, and a NOT EXISTS
#     anti join, all on the same customer-activity predicate so the
#     three answers are directly comparable.
SETOPS_CUSTKEYS = """
SELECT 'except_1995_not_2001' AS op, c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
) t
UNION ALL
SELECT 'intersect_1995_and_2001', c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
) t
UNION ALL
SELECT 'anti_no_orders_before_1996', c.c_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
)
"""

# --- sessionization: 30-minute-gap sessions per user (template: the
#     epoch-milliseconds function differs between dialects)
_EVENTS_SESSIONS_TMPL = """
WITH ordered AS (
  SELECT
    user_id,
    event_id,
    {EPOCH_MS} AS ts_ms,
    lag({EPOCH_MS}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_ms,
    CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, event_id,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_session
GROUP BY user_id
"""

EVENTS_SESSIONS_SPARK = _EVENTS_SESSIONS_TMPL.format(EPOCH_MS="unix_millis(ts)")
EVENTS_SESSIONS_DUCKDB = _EVENTS_SESSIONS_TMPL.format(EPOCH_MS="epoch_ms(ts)")

# --- JSON extraction + aggregation over event props
_EVENTS_JSON_TMPL = """
WITH parsed AS (
  SELECT event_type, CAST({EXTRACT} AS BIGINT) AS k FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM parsed
GROUP BY event_type
"""

EVENTS_JSON_SPARK = _EVENTS_JSON_TMPL.format(EXTRACT="get_json_object(props, '$.k')")
EVENTS_JSON_DUCKDB = _EVENTS_JSON_TMPL.format(EXTRACT="json_extract(props, 'k')")


def register_all() -> None:
    # In-window entries: one per distinct relational shape (join+topk,
    # conditional-agg ratio, multi-grouping, set ops, sessionization
    # window chain, JSON extraction).  tpch_q5/q10 and
    # window_top_customers restate shapes pinned here and register at
    # the catalog tail instead (coverage_queries.register_all); since
    # the r7 rotation tpch_q1 does too (its filter-pushdown + decimal
    # lineitem aggregation is restated in-window by tpch_ratio_aggs'
    # q6 arm — same table, same pushed shipdate/discount filters, same
    # DECIMAL-exact sums), freeing its slot for nb_quality_scores.
    register("tpch_q3_topk", TPCH_Q3)(q_tpch_q3_topk)
    # r12 rotation: corpus_diff takes this window slot — it is the
    # catalog's only snapshot-versioning oracle (the incremental-crawl
    # change-set primitive every between-crawl consumer reads) and
    # more distinctive than tpch_ratio_aggs, whose conditional-agg
    # ratio shape is restated in-window by grouping_orders and whose
    # q6 filter-pushdown + DECIMAL-sum arm is restated by tpch_q1 in
    # the tail.  tpch_ratio_aggs moves to the tail, still fully
    # oracled there.
    from beyond_vector_search_spark.plans.pipeline_queries import (
        CORPUS_DIFF_SQL,
        q_corpus_diff,
    )

    register("corpus_diff", CORPUS_DIFF_SQL)(q_corpus_diff)
    # r13 rotation: line_dedup takes this window slot — the catalog's
    # only LINE-grain dedup oracle (the C4/RefinedWeb boilerplate-strip
    # pass: exact line hashing + per-line keep/drop + document
    # reassembly, a different grain from every doc-level dedup entry).
    # grouping_orders moves to the tail: its multi-grouping/conditional
    # aggregation shape is restated there by tpch_ratio_aggs and
    # pivot_status_priority, and its cube/rollup arm by cube_orders'
    # tests; stays fully oracled in the local artifacts.
    from beyond_vector_search_spark.plans.coverage_queries import (
        _LINE_DEDUP_SQL,
        q_line_dedup,
    )

    register("line_dedup", _LINE_DEDUP_SQL)(q_line_dedup)
    # r11 rotation: fuzzy_contamination takes this window slot now that
    # its fused shared-signature plan is efficient (2 documents scans /
    # 9 exchanges) — it is the only Lee-et-al-style fuzzy
    # decontamination oracle in the catalog.  setops_custkeys (plain
    # union/intersect/except, restated by grouping_orders' conditional
    # aggregation + tests) moves to the tail in its place.
    from beyond_vector_search_spark.plans.pretrain_queries import (
        FUZZY_CONTAMINATION_SQL,
        q_fuzzy_contamination,
    )

    register("fuzzy_contamination", FUZZY_CONTAMINATION_SQL)(
        q_fuzzy_contamination
    )
    register("events_sessions", EVENTS_SESSIONS_DUCKDB)(_sql_fn(EVENTS_SESSIONS_SPARK))
    register("events_json_stats", EVENTS_JSON_DUCKDB)(_sql_fn(EVENTS_JSON_SPARK))


def register_tail() -> None:
    """Entries whose shapes are already pinned in-window: q5 (multi-dim
    join chain — q3/q10 shapes), q10 (join+agg+topk — q3's shape at a
    different fan-out), window_top_customers (partitioned ranking —
    every *_topk entry's window), q1 since the r7 rotation (lineitem
    filter-pushdown + decimal aggregation — tpch_ratio_aggs' q6 arm)."""
    register_shared_sql("tpch_q1", TPCH_Q1)
    register_shared_sql("tpch_q5_region_volume", TPCH_Q5)
    register("tpch_q10_returns", TPCH_Q10)(q_tpch_q10_returns)
    # r12 rotation demotion (corpus_diff took its window slot): the
    # conditional-agg ratio shape is pinned in-window by
    # grouping_orders, the q6 arm's filter-pushdown + DECIMAL sums by
    # tpch_q1 here; stays fully oracled in the local artifacts
    register_shared_sql("tpch_ratio_aggs", TPCH_RATIO_AGGS)
    # r13 rotation demotion (line_dedup took its window slot): the
    # multi-grouping + conditional-agg shape is restated here by
    # tpch_ratio_aggs and pivot_status_priority; fully oracled still
    register_shared_sql("grouping_orders", GROUPING_ORDERS)
    register_shared_sql("window_top_customers", WINDOW_TOP_CUSTOMERS)
