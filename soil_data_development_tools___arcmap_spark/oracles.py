"""DuckDB oracle SQL twins for every query in ``queries.py``.

Each statement mirrors the Spark implementation's arithmetic EXACTLY
(same integer scaling, same operation order for the few float ops) so
the driver's order-insensitive value-hash matches bit-for-bit. See
queries.py docstring for the determinism contract.
"""

# lineitem as component table (matches queries.li_component)
_BASE = """
base AS (
  SELECT l_orderkey AS okey,
         l_linenumber AS member,
         CAST(l_quantity AS BIGINT) AS comppct_r,
         CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
         CAST(round(l_discount*100) AS BIGINT) AS disc_bp,
         l_returnflag AS rflag,
         month(l_shipdate) AS monthseq
  FROM lineitem
)"""

# customer→orders→lineitem as mapunit→component→horizon (queries.li_horizon)
_HZ = """
hz AS (
  SELECT o.o_custkey AS ckey,
         l.l_orderkey AS okey,
         CAST(round(o.o_totalprice*100) AS BIGINT) AS o_w,
         l.l_linenumber AS lnum,
         CAST((l.l_linenumber-1)*15 AS BIGINT) AS hzdept,
         CAST((l.l_linenumber-1)*15 + 5 + l.l_partkey % 11 AS BIGINT) AS hzdepb,
         CAST(round(l.l_discount*100) AS BIGINT) AS disc_bp,
         CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)"""

# l_returnflag domain ranks (tiebreak.domain_rank_expr over RFLAG_DOMAIN)
_RANK3 = "CASE upper(trim(rflag)) WHEN 'R' THEN 1 WHEN 'A' THEN 2 WHEN 'N' THEN 3 ELSE 4 END"
_RANK_LIM = "CASE upper(trim(rflag)) WHEN 'R' THEN 1 WHEN 'A' THEN 2 ELSE 3 END"


ORACLES: dict[str, str] = {}

ORACLES["sdv_dcp_numeric"] = f"""
WITH {_BASE}
SELECT okey, comppct_r, price_c AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY comppct_r DESC, price_c ASC, member ASC) AS rn
      FROM base)
WHERE rn = 1
"""

ORACLES["sdv_dcp_categorical"] = f"""
WITH {_BASE}
SELECT okey, comppct_r, rflag AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY comppct_r DESC, {_RANK3} ASC, member ASC) AS rn
      FROM base)
WHERE rn = 1
"""

ORACLES["sdv_dcp_tiebreak_higher"] = f"""
WITH {_BASE}
SELECT okey, comppct_r, rflag AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY comppct_r DESC, {_RANK3} DESC, member ASC) AS rn
      FROM base)
WHERE rn = 1
"""

ORACLES["sdv_dcd"] = f"""
WITH {_BASE},
br AS (
  SELECT okey, rflag, SUM(comppct_r) AS sw, MIN(member) AS mm
  FROM base GROUP BY okey, rflag),
tt AS (
  SELECT okey, rflag, sw, mm,
         SUM(sw) OVER (PARTITION BY okey) AS tw,
         row_number() OVER (
           PARTITION BY okey
           ORDER BY sw DESC, {_RANK3} ASC, mm ASC) AS rn
  FROM br),
dcd AS (
  SELECT okey, CAST((200*sw + tw) // (2*tw) AS INTEGER) AS comppct_r,
         rflag AS rating
  FROM tt WHERE rn = 1),
dcp AS (
  SELECT okey, comppct_r AS dcp_w, rflag AS dcp_r
  FROM (SELECT *, row_number() OVER (
          PARTITION BY okey
          ORDER BY comppct_r DESC, {_RANK3} ASC, member ASC) AS rn
        FROM base)
  WHERE rn = 1)
SELECT d.okey, d.comppct_r,
       CASE WHEN p.dcp_w >= 50 THEN p.dcp_r ELSE d.rating END AS rating
FROM dcd d LEFT JOIN dcp p USING (okey)
"""

ORACLES["sdv_wta"] = f"""
WITH {_BASE}
SELECT okey, SUM(comppct_r) AS comppct_r,
       CAST(floor((SUM(comppct_r*price_c)/SUM(comppct_r))*10000) AS BIGINT)
         AS rating_e4
FROM base GROUP BY okey
"""

ORACLES["sdv_maxmin_max"] = f"""
WITH {_BASE}
SELECT okey, comppct_r, price_c AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY price_c DESC, comppct_r DESC, member ASC) AS rn
      FROM base)
WHERE rn = 1
"""

ORACLES["sdv_limiting_most"] = f"""
WITH {_BASE},
r AS (SELECT *, {_RANK_LIM} AS rnk FROM base),
picked AS (
  SELECT okey, rnk AS limit_rank, rflag AS rating
  FROM (SELECT *, row_number() OVER (
          PARTITION BY okey
          ORDER BY CASE WHEN rnk >= 3 THEN 1 ELSE 0 END ASC,
                   rnk ASC, comppct_r DESC, member ASC) AS rn
        FROM r)
  WHERE rn = 1),
cw AS (SELECT okey, rnk, SUM(comppct_r) AS comppct_r FROM r GROUP BY okey, rnk)
SELECT p.okey, c.comppct_r, p.rating
FROM picked p JOIN cw c ON p.okey = c.okey AND p.limit_rank = c.rnk
"""

ORACLES["sdv_pp_sum"] = """
WITH s AS (
  SELECT l_orderkey AS okey,
         SUM(CASE WHEN l_returnflag IN ('R') THEN CAST(l_quantity AS BIGINT)
                  ELSE 0 END) AS rating
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey AS okey, COALESCE(s.rating, 0) AS rating
FROM orders o LEFT JOIN s ON o.o_orderkey = s.okey
"""

ORACLES["sdv_aggregate1"] = """
SELECT o_orderkey AS okey, o_orderpriority AS musym,
       CAST(round(o_totalprice*100) AS BIGINT) AS rating
FROM orders
"""

ORACLES["sdv_hz_wta_sum"] = f"""
WITH {_HZ},
c AS (
  SELECT ckey, okey, o_w,
         SUM(CASE WHEN t0 > 0 THEN t0*disc_bp END) AS txv,
         SUM(CASE WHEN t0 > 0 THEN t0 END) AS t
  FROM (SELECT *, greatest(least(hzdepb, 40) - greatest(hzdept, 10), 0) AS t0
        FROM hz)
  GROUP BY ckey, okey, o_w)
SELECT ckey, SUM(o_w) AS comppct_r,
       CAST(floor((SUM(o_w*txv)/SUM(o_w))*10000) AS BIGINT) AS rating_e4
FROM c WHERE txv IS NOT NULL GROUP BY ckey
"""

ORACLES["sdv_hz_wta_wta"] = f"""
WITH {_HZ},
c AS (
  SELECT ckey, okey, o_w,
         SUM(CASE WHEN t0 > 0 THEN t0*disc_bp END) AS txv,
         SUM(CASE WHEN t0 > 0 THEN t0 END) AS t
  FROM (SELECT *, greatest(least(hzdepb, 40) - greatest(hzdept, 10), 0) AS t0
        FROM hz)
  GROUP BY ckey, okey, o_w),
cv AS (
  SELECT ckey, o_w, CAST(floor((1000000*txv)/t) AS BIGINT) AS cvm
  FROM c WHERE t > 0)
SELECT ckey, SUM(o_w) AS comppct_r,
       CAST(floor(SUM(o_w*cvm)/SUM(o_w)) AS BIGINT) AS rating
FROM cv GROUP BY ckey
"""

ORACLES["sdv_hz_dcp_wta"] = f"""
WITH {_HZ},
dom AS (
  SELECT ckey, okey, o_w
  FROM (SELECT *, row_number() OVER (
          PARTITION BY ckey ORDER BY o_w DESC, okey ASC) AS rn
        FROM (SELECT DISTINCT ckey, okey, o_w FROM hz))
  WHERE rn = 1),
c AS (
  SELECT h.ckey, h.okey, d.o_w,
         SUM(CASE WHEN t0 > 0 THEN t0*disc_bp END) AS txv,
         SUM(CASE WHEN t0 > 0 THEN t0 END) AS t
  FROM (SELECT *, greatest(least(hzdepb, 60) - greatest(hzdept, 0), 0) AS t0
        FROM hz) h
  JOIN dom d ON h.ckey = d.ckey AND h.okey = d.okey
  GROUP BY h.ckey, h.okey, d.o_w)
SELECT ckey, o_w AS comppct_r,
       CAST(floor((txv/t)*1000000) AS BIGINT) AS rating_e6
FROM c WHERE t > 0
"""

ORACLES["sdv_hz_maxmin_wta"] = f"""
WITH {_HZ},
c AS (
  SELECT ckey, okey, o_w,
         MAX(CASE WHEN greatest(least(hzdepb, 30) - greatest(hzdept, 0), 0) > 0
                  THEN qty END) AS hzv
  FROM hz GROUP BY ckey, okey, o_w)
SELECT ckey, SUM(o_w) AS comppct_r,
       CAST(floor((SUM(o_w*hzv)/SUM(o_w))*10000) AS BIGINT) AS rating_e4
FROM c WHERE hzv IS NOT NULL GROUP BY ckey
"""

ORACLES["sdv_mo_wta"] = f"""
WITH {_BASE},
m AS (
  SELECT okey, member, comppct_r, MIN(price_c) AS price_c
  FROM base WHERE monthseq BETWEEN 3 AND 9
  GROUP BY okey, member, comppct_r)
SELECT okey, SUM(comppct_r) AS comppct_r,
       CAST(floor((SUM(comppct_r*price_c)/SUM(comppct_r))*10000) AS BIGINT)
         AS rating_e4
FROM m GROUP BY okey
"""

ORACLES["sdv_mo_maxmin_wrap"] = f"""
WITH {_BASE},
m AS (
  SELECT okey, member, comppct_r, MAX(price_c) AS price_c
  FROM base WHERE monthseq >= 11 OR monthseq <= 2
  GROUP BY okey, member, comppct_r)
SELECT okey, comppct_r, price_c AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY price_c DESC, comppct_r DESC, member ASC) AS rn
      FROM m)
WHERE rn = 1
"""

ORACLES["sdv_dtwt_dcp"] = f"""
WITH {_BASE},
b2 AS (SELECT *, CASE WHEN comppct_r = 50 THEN NULL ELSE comppct_r END AS qty_n
       FROM base),
m AS (
  SELECT okey, member, comppct_r, MAX(COALESCE(qty_n, 201)) AS val
  FROM b2 GROUP BY okey, member, comppct_r)
SELECT okey, comppct_r, val AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY comppct_r DESC, val ASC, member ASC) AS rn
      FROM m)
WHERE rn = 1
"""

ORACLES["valu1_aws_ranges"] = f"""
WITH {_HZ},
x AS (
  SELECT hz.*, r.top, r.bot,
         greatest(least(hzdepb, r.bot) - greatest(hzdept, r.top), 0) AS t0
  FROM hz CROSS JOIN (VALUES (0, 20), (20, 50), (50, 100), (0, 100))
       AS r(top, bot)),
c AS (
  SELECT ckey, okey, o_w, top, bot,
         SUM(t0*qty) AS txv, SUM(t0) AS t
  FROM x GROUP BY ckey, okey, o_w, top, bot)
SELECT ckey, top, bot, SUM(o_w) AS comppct_r,
       CAST(floor((SUM(o_w*txv)/SUM(o_w))*10000) AS BIGINT) AS aws_e4
FROM c WHERE t > 0 GROUP BY ckey, top, bot
"""

ORACLES["valu1_first_restriction"] = """
SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS resdept
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY epoch_ns(ts) ASC, event_id ASC) AS rn
      FROM events WHERE event_type = 'click')
WHERE rn = 1
"""

ORACLES["merge_dedup"] = """
SELECT DISTINCT * FROM (
  SELECT * FROM nation UNION ALL SELECT * FROM nation)
"""

ORACLES["distinct_scan"] = "SELECT DISTINCT o_orderpriority FROM orders"

ORACLES["dominant_member_tool"] = """
SELECT nkey, member, bal_c
FROM (SELECT c_nationkey AS nkey, c_custkey AS member,
             CAST(round(c_acctbal*100) AS BIGINT) AS bal_c,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC,
                        c_custkey DESC) AS rn
      FROM customer)
WHERE rn = 1
"""

ORACLES["acreage_report"] = f"""
WITH {_BASE}
SELECT rflag AS rating, SUM(comppct_r) AS acres, SUM(price_c) AS value_c,
       COUNT(*) AS n
FROM base GROUP BY rflag
"""

ORACLES["count_reconciliation"] = """
SELECT 'region' AS table_name, COUNT(*) AS n FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'events', COUNT(*) FROM events
UNION ALL SELECT 'documents', COUNT(*) FROM documents
UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
"""

ORACLES["validate_depth_gaps"] = f"""
WITH {_HZ},
l AS (SELECT *, lag(hzdepb) OVER (
        PARTITION BY okey ORDER BY hzdept ASC, lnum ASC, hzdepb ASC) AS prev_bot
      FROM hz)
SELECT okey,
       SUM(CAST(prev_bot < hzdept AS INTEGER)) AS n_gaps,
       SUM(CAST(prev_bot > hzdept AS INTEGER)) AS n_overlaps
FROM l GROUP BY okey
"""

ORACLES["q1_pricing_summary"] = """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice*100) AS BIGINT) AS pc,
         CAST(round(l_discount*100) AS BIGINT) AS dbp,
         CAST(round(l_tax*100) AS BIGINT) AS tbp
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
g AS (
  SELECT l_returnflag, l_linestatus,
         SUM(qty) AS sum_qty,
         SUM(pc) AS sum_base_price_c,
         SUM(pc*(100-dbp)) AS sum_disc_price_c2,
         SUM(pc*(100-dbp)*(100+tbp)) AS sum_charge_c3,
         COUNT(*) AS count_order
  FROM b GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_c,
       sum_disc_price_c2, sum_charge_c3,
       CAST(floor((sum_qty/count_order)*10000) AS BIGINT) AS avg_qty_e4,
       CAST(floor((sum_base_price_c/count_order)*10000) AS BIGINT)
         AS avg_price_e4,
       count_order
FROM g
"""

ORACLES["q3_shipping_priority"] = """
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c2
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_c2 DESC, l.l_orderkey ASC
LIMIT 10
"""

ORACLES["q5_local_supplier"] = """
SELECT n.n_name,
       SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c2
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""
