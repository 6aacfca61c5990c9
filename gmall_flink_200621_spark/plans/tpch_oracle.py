"""DuckDB oracles for plans/tpch.py — same decimal-exact numeric policy:
aggregate in DECIMAL, emit as DOUBLE, so values are bit-identical."""

TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

TPCH_Q3 = """
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

TPCH_Q5 = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
"""

TPCH_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.07
  AND l_quantity < 24
"""

REVENUE_BY_NATION = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""

TOP_CUSTOMERS = """
WITH by_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT c.c_custkey, c.c_name, b.total_spend, b.n_orders
FROM by_cust b JOIN customer c ON b.o_custkey = c.c_custkey
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""

SALES_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

PROMO_REVENUE_SHARE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""

ORDER_PRIORITY_BY_SEGMENT = """
SELECT c.c_mktsegment, o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""

_REV = "CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
GROUP BY 1
"""

TPCH_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {_REV} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
GROUP BY 1, 2, 3
"""

TPCH_Q8 = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(sum(CASE WHEN sn.n_name = 'NATION_19'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
"""

TPCH_Q15 = """
WITH by_supp AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS _rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(b._rev AS DOUBLE) AS total_revenue
FROM by_supp b JOIN supplier s ON b.l_suppkey = s.s_suppkey
WHERE b._rev = (SELECT max(_rev) FROM by_supp)
"""

TPCH_Q19 = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 AND l.l_quantity >= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size <= 30 AND l.l_quantity >= 30)
"""

TPCH_Q9 = f"""
SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
       {_REV} AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
"""

TPCH_Q10 = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {_REV} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

TPCH_Q13 = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
"""

TPCH_Q17 = """
WITH per_part AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN per_part a ON l.l_partkey = a.l_partkey
WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.2 * a.avg_qty
"""

TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS _qty
  FROM lineitem GROUP BY 1
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 180.0
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(b._qty AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

TPCH_Q22 = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""

TPCH_Q21 = """
WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
multi AS (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) > 1),
solo AS (SELECT l_orderkey FROM l1 GROUP BY 1 HAVING count(DISTINCT l_suppkey) = 1)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM l1
JOIN multi USING (l_orderkey)
JOIN solo USING (l_orderkey)
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""

CUSTOMER_RUNNING_SPEND = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
"""

TPCH_Q2 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS supply_cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT ps.l_partkey, ps.supply_cost, s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), mn AS (
  SELECT l_partkey, min(supply_cost) AS min_cost FROM eu GROUP BY 1
)
SELECT CAST(eu.s_acctbal AS DOUBLE) AS s_acctbal, eu.s_name, eu.n_name,
       p.p_partkey, p.p_name, eu.supply_cost
FROM eu
JOIN mn ON eu.l_partkey = mn.l_partkey AND eu.supply_cost = mn.min_cost
JOIN part p ON eu.l_partkey = p.p_partkey
WHERE p.p_size = 5 AND p.p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""

TPCH_Q11 = """
WITH nat_lines AS (
  SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
), by_part AS (
  SELECT l_partkey, sum(v) AS pv FROM nat_lines GROUP BY 1
), total AS (
  SELECT sum(pv) AS t FROM by_part
)
SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
FROM by_part, total
WHERE CAST(pv AS DOUBLE) > 0.0008 * CAST(t AS DOUBLE)
"""

TPCH_Q12 = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1998-01-01'
GROUP BY 1
"""

TPCH_Q14 = """
SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= '1997-09-01' AND l.l_shipdate < '1997-10-01'
"""

TPCH_Q16 = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO' AND p.p_size IN (1, 3, 5, 7, 9)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""

TPCH_Q20 = """
WITH big AS (
  SELECT DISTINCT l.l_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1998-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
  HAVING CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0
)
SELECT s.s_suppkey, s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND s.s_suppkey IN (SELECT l_suppkey FROM big)
"""

TPCH_ORACLES: dict[str, str] = {
    "tpch_q2": TPCH_Q2,
    "tpch_q11": TPCH_Q11,
    "tpch_q12": TPCH_Q12,
    "tpch_q14": TPCH_Q14,
    "tpch_q16": TPCH_Q16,
    "tpch_q20": TPCH_Q20,
    "tpch_q1": TPCH_Q1,
    "tpch_q3": TPCH_Q3,
    "tpch_q4": TPCH_Q4,
    "tpch_q5": TPCH_Q5,
    "tpch_q6": TPCH_Q6,
    "tpch_q7": TPCH_Q7,
    "tpch_q8": TPCH_Q8,
    "tpch_q9": TPCH_Q9,
    "tpch_q10": TPCH_Q10,
    "tpch_q13": TPCH_Q13,
    "tpch_q15": TPCH_Q15,
    "tpch_q17": TPCH_Q17,
    "tpch_q18": TPCH_Q18,
    "tpch_q19": TPCH_Q19,
    "tpch_q21": TPCH_Q21,
    "tpch_q22": TPCH_Q22,
    "customer_running_spend": CUSTOMER_RUNNING_SPEND,
    "revenue_by_nation": REVENUE_BY_NATION,
    "top_customers": TOP_CUSTOMERS,
    "sales_rollup": SALES_ROLLUP,
    "promo_revenue_share": PROMO_REVENUE_SHARE,
    "order_priority_by_segment": ORDER_PRIORITY_BY_SEGMENT,
}
