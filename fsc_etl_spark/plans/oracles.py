"""ANSI-SQL oracles for plans.analytics (and later plans.training_data).

Each string is runnable by DuckDB against the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings). The driver compares Spark vs
DuckDB by row-count + schema + order-insensitive value hash, so every
oracle mirrors its Spark query column-for-column (same names, same
final types) and uses the same exact-decimal accumulation trick.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["q1_pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["proj_alias"] = """
SELECT l_orderkey AS okey, l_partkey AS pkey, l_extendedprice AS price FROM lineitem
"""

ORACLES["filter_status"] = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
"""

ORACLES["filter_date_split"] = """
SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
"""

ORACLES["distinct_dim"] = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""

ORACLES["agg_minmax"] = """
SELECT MAX(o_orderkey) AS max_key, MIN(o_orderkey) AS min_key,
       COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_custs
FROM orders
"""

ORACLES["cast_manifest_roundtrip"] = """
SELECT
  CAST(CAST(l_orderkey AS VARCHAR) AS INTEGER) AS okey,
  CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS lineno,
  COALESCE(ROUND(CAST(printf('%.4f', l_extendedprice) AS DOUBLE), 2), 0) AS price,
  COALESCE(ROUND(CAST(printf('%.4f', l_discount) AS DOUBLE), 1), 0) AS disc,
  CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE) AS ship
FROM lineitem
"""

ORACLES["dim_join_broadcast"] = """
SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
"""

ORACLES["star_assembly"] = """
WITH li AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1
), cd AS (
  SELECT c_custkey AS o_custkey, c_name, n_name AS nation_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       COALESCE(li.order_revenue, 0) AS order_revenue,
       COALESCE(li.n_lines, 0) AS n_lines,
       cd.c_name, cd.nation_name
FROM orders o
LEFT JOIN li USING (o_orderkey)
LEFT JOIN cd USING (o_custkey)
"""

ORACLES["semi_join_membership"] = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""

ORACLES["anti_join_orphans"] = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

ORACLES["q5_region_volume"] = """
SELECT n_name AS nation_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""

ORACLES["pivot_event_types"] = """
SELECT user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'click')    AS DOUBLE) AS click,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'error')    AS DOUBLE) AS error,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'signup')   AS DOUBLE) AS signup,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'view')     AS DOUBLE) AS view
FROM events GROUP BY user_id
"""

ORACLES["cdc_snapshot_diff"] = """
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
EXCEPT
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
"""

ORACLES["union_insert_update"] = """
SELECT o_orderkey, o_orderstatus, 'insert' AS src FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
UNION ALL
SELECT o_orderkey, o_orderstatus, 'update' AS src FROM orders
WHERE o_orderdate < TIMESTAMP '2001-01-01 00:00:00' AND o_orderstatus = 'P'
"""

ORACLES["merge_upsert_state"] = """
WITH target AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS updated_at
  FROM orders WHERE o_orderkey % 3 <> 0
), source AS (
  SELECT o_orderkey, o_totalprice * 2 AS price,
         o_orderdate + INTERVAL 30 DAY AS updated_at
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT t.o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL AND s.updated_at >= t.updated_at
            THEN s.price ELSE t.price END AS price,
       CAST(CASE WHEN s.o_orderkey IS NOT NULL AND s.updated_at >= t.updated_at
            THEN s.updated_at ELSE t.updated_at END AS DATE) AS updated_date
FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
UNION ALL
SELECT s.o_orderkey, s.price, CAST(s.updated_at AS DATE) AS updated_date
FROM source s
WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
"""

ORACLES["surrogate_key_assign"] = """
SELECT o_orderkey, o_custkey,
       CAST(1000 + ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS sk
FROM orders
"""

ORACLES["window_topk_per_group"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
  FROM orders
) WHERE rn <= 3
"""

ORACLES["window_running_sum"] = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""

ORACLES["global_topk_orders"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""

ORACLES["rollup_returnflag"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["sessionize_events"] = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec FROM events
), g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(tsec) OVER w IS NULL OR tsec - LAG(tsec) OVER w > 1800
              THEN 1 ELSE 0 END AS newflag
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, event_id,
       CAST(SUM(newflag) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM g
"""

ORACLES["hourly_event_rollup"] = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""
