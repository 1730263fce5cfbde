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
SELECT okey, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r,
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
cw AS (SELECT okey, rnk, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r FROM r GROUP BY okey, rnk)
SELECT p.okey, c.comppct_r, p.rating
FROM picked p JOIN cw c ON p.okey = c.okey AND p.limit_rank = c.rnk
"""

_RANK3_REV = (
    "CASE upper(trim(rflag)) WHEN 'N' THEN 1 WHEN 'A' THEN 2 WHEN 'R' THEN 3 ELSE 4 END"
)

ORACLES["sdv_mo_dcp_domain"] = f"""
WITH {_BASE},
mc AS (SELECT DISTINCT okey, member, comppct_r, rflag FROM base)
SELECT okey, comppct_r, rflag AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY comppct_r DESC, {_RANK3} ASC, member ASC) AS rn
      FROM mc)
WHERE rn = 1
"""

ORACLES["sdv_mo_dcd_domain"] = f"""
WITH {_BASE},
mc AS (SELECT DISTINCT okey, member, comppct_r, rflag FROM base),
br AS (
  SELECT okey, rflag, SUM(comppct_r) AS sw, MIN(member) AS mm
  FROM mc GROUP BY okey, rflag),
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
        FROM mc)
  WHERE rn = 1)
SELECT d.okey, d.comppct_r,
       CASE WHEN p.dcp_w >= 50 THEN p.dcp_r ELSE d.rating END AS rating
FROM dcd d LEFT JOIN dcp p USING (okey)
"""

ORACLES["sdv_mo_dcd"] = f"""
WITH {_BASE},
mc AS (
  SELECT okey, member, comppct_r, MAX(rflag) AS rflag
  FROM base WHERE monthseq BETWEEN 4 AND 9
  GROUP BY okey, member, comppct_r),
br AS (
  SELECT okey, rflag, SUM(comppct_r) AS sw, MIN(member) AS mm
  FROM mc GROUP BY okey, rflag),
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
        FROM mc)
  WHERE rn = 1)
SELECT d.okey, d.comppct_r,
       CASE WHEN p.dcp_w >= 50 THEN p.dcp_r ELSE d.rating END AS rating
FROM dcd d LEFT JOIN dcp p USING (okey)
"""

ORACLES["sdv_dcd_domain_reversed"] = f"""
WITH {_BASE},
br AS (
  SELECT okey, rflag, SUM(comppct_r) AS sw, MIN(member) AS mm
  FROM base GROUP BY okey, rflag),
tt AS (
  SELECT okey, rflag, sw, mm,
         SUM(sw) OVER (PARTITION BY okey) AS tw,
         row_number() OVER (
           PARTITION BY okey
           ORDER BY sw DESC, {_RANK3_REV} ASC, mm ASC) AS rn
  FROM br)
SELECT okey, CAST((200*sw + tw) // (2*tw) AS INTEGER) AS comppct_r,
       rflag AS rating
FROM tt WHERE rn = 1
"""

ORACLES["sdv_maxmin_min"] = f"""
WITH {_BASE}
SELECT okey, comppct_r, rflag AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey
        ORDER BY {_RANK3} ASC, comppct_r DESC, member ASC) AS rn
      FROM base)
WHERE rn = 1
"""

ORACLES["sdv_limiting_least"] = f"""
WITH {_BASE},
r AS (SELECT *, {_RANK_LIM} AS rnk FROM base),
picked AS (
  SELECT okey, rnk AS limit_rank, rflag AS rating
  FROM (SELECT *, row_number() OVER (
          PARTITION BY okey
          ORDER BY CASE WHEN rnk >= 3 THEN 1 ELSE 0 END ASC,
                   rnk DESC, comppct_r DESC, member ASC) AS rn
        FROM r)
  WHERE rn = 1),
cw AS (SELECT okey, rnk, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r FROM r GROUP BY okey, rnk)
SELECT p.okey, c.comppct_r, p.rating
FROM picked p JOIN cw c ON p.okey = c.okey AND p.limit_rank = c.rnk
"""

ORACLES["sdv_wta_zero_nulls"] = f"""
WITH {_BASE},
z AS (SELECT okey, comppct_r,
             CASE WHEN rflag = 'R' THEN 0 ELSE price_c END AS pn
      FROM base)
SELECT okey, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r,
       CAST(floor((SUM(comppct_r*pn)/SUM(comppct_r))*10000) AS BIGINT)
         AS rating_e4
FROM z GROUP BY okey
"""

ORACLES["sdv_dtwt_dcd"] = f"""
WITH {_BASE},
mc AS (
  SELECT okey, member, comppct_r,
         MAX(CASE WHEN comppct_r = 50 THEN 201 ELSE comppct_r END) AS v
  FROM base GROUP BY okey, member, comppct_r),
br AS (
  SELECT okey, v, SUM(comppct_r) AS sw, MIN(member) AS mm
  FROM mc GROUP BY okey, v),
tt AS (
  SELECT okey, v, sw, mm,
         SUM(sw) OVER (PARTITION BY okey) AS tw,
         row_number() OVER (
           PARTITION BY okey
           ORDER BY sw DESC, v ASC, mm ASC) AS rn
  FROM br),
dcd AS (
  SELECT okey, CAST((200*sw + tw) // (2*tw) AS INTEGER) AS comppct_r,
         v AS rating
  FROM tt WHERE rn = 1),
dcp AS (
  SELECT okey, comppct_r AS dcp_w, v AS dcp_r
  FROM (SELECT *, row_number() OVER (
          PARTITION BY okey
          ORDER BY comppct_r DESC, v ASC, member ASC) AS rn
        FROM mc)
  WHERE rn = 1)
SELECT d.okey, d.comppct_r,
       CASE WHEN p.dcp_w >= 50 THEN p.dcp_r ELSE d.rating END AS rating
FROM dcd d LEFT JOIN dcp p USING (okey)
"""

ORACLES["sdv_wta_dtwt"] = f"""
WITH {_BASE},
mc AS (
  SELECT okey, member, comppct_r,
         MIN(CASE WHEN comppct_r = 50 THEN 201 ELSE comppct_r END) AS v
  FROM base GROUP BY okey, member, comppct_r)
SELECT okey,
       CAST(SUM(CASE WHEN v <> 201 THEN comppct_r END) AS BIGINT) AS comppct_r,
       CAST(floor((SUM(CASE WHEN v <> 201 THEN comppct_r*v END)
                   / SUM(CASE WHEN v <> 201 THEN comppct_r END))*10000) AS BIGINT)
         AS rating_e4
FROM mc GROUP BY okey
"""

_HZ_MM = """
c AS (
  SELECT ckey, okey, o_w,
         MAX(CASE WHEN greatest(least(hzdepb, 30) - greatest(hzdept, 0), 0) > 0
                  THEN qty END) AS hzv
  FROM hz GROUP BY ckey, okey, o_w)"""

ORACLES["sdv_hz_maxmin_dcd"] = f"""
WITH {_HZ},
{_HZ_MM},
cc AS (SELECT * FROM c WHERE hzv IS NOT NULL),
br AS (
  SELECT ckey, hzv, SUM(o_w) AS sw, MIN(okey) AS mm
  FROM cc GROUP BY ckey, hzv),
tt AS (
  SELECT ckey, hzv, sw, mm,
         SUM(sw) OVER (PARTITION BY ckey) AS tw,
         row_number() OVER (
           PARTITION BY ckey
           ORDER BY sw DESC, hzv ASC, mm ASC) AS rn
  FROM br)
SELECT ckey, CAST((200*sw + tw) // (2*tw) AS INTEGER) AS comppct_r,
       hzv AS rating
FROM tt WHERE rn = 1
"""

ORACLES["sdv_hz_maxmin_dcp"] = f"""
WITH {_HZ},
{_HZ_MM}
SELECT ckey, o_w AS comppct_r, hzv AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY ckey
        ORDER BY o_w DESC, hzv ASC, okey ASC) AS rn
      FROM c WHERE hzv IS NOT NULL)
WHERE rn = 1
"""

ORACLES["sdv_pp_sum"] = """
WITH s AS (
  SELECT l_orderkey AS okey,
         SUM(CASE WHEN l_returnflag IN ('R') THEN CAST(l_quantity AS BIGINT)
                  ELSE 0 END) AS rating
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey AS okey, CAST(COALESCE(s.rating, 0) AS BIGINT) AS rating
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
SELECT ckey, CAST(SUM(o_w) AS BIGINT) AS comppct_r,
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
SELECT ckey, CAST(SUM(o_w) AS BIGINT) AS comppct_r,
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
SELECT ckey, CAST(SUM(o_w) AS BIGINT) AS comppct_r,
       CAST(floor((SUM(o_w*hzv)/SUM(o_w))*10000) AS BIGINT) AS rating_e4
FROM c WHERE hzv IS NOT NULL GROUP BY ckey
"""

ORACLES["sdv_mo_wta"] = f"""
WITH {_BASE},
m AS (
  SELECT okey, member, comppct_r, MIN(price_c) AS price_c
  FROM base WHERE monthseq BETWEEN 3 AND 9
  GROUP BY okey, member, comppct_r)
SELECT okey, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r,
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
SELECT ckey, top, bot, CAST(SUM(o_w) AS BIGINT) AS comppct_r,
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

# ---- synthesized SSURGO-shaped tables (queries.ssurgo_synth twins) ----

# round 11: per-mapunit polygon synthesis twin (q_tools._mu_polygon_wkt)
# — cell-grid parameters only; the oracles derive every cell figure
# from arithmetic-series closed forms, never parsing WKT. col0/row0
# are absolute CELL indices (geometry is ×2 on the even grid).
_MUG = """
mug AS (
  SELECT c_custkey AS mukey,
         c_custkey % 100 AS col0, c_custkey % 57 AS row0,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 4 + 1 AS pw, c_custkey % 3 + 1 AS ph,
         (c_custkey % 3 = 0) AS plain
  FROM customer)"""

#: CELL_CENTER cell count of one synthesized mapunit geometry
_MUG_NCELLS = """(w * h - CASE WHEN has_hole THEN hw * hh ELSE 0 END
         + CASE WHEN plain THEN 0 ELSE pw * ph END)"""

_SYN = """
syn_co AS (
  SELECT o_custkey AS mukey, o_orderkey AS cokey,
         o_orderkey % 97 + 3 AS comppct_r,
         CASE WHEN o_orderkey % 4 <> 0 THEN 'Yes' ELSE 'No' END AS majcompflag,
         CASE WHEN o_orderkey % 5 = 0 THEN 'Miscellaneous area'
              WHEN o_orderkey % 5 = 1 THEN NULL
              ELSE 'Series' END AS compkind,
         CASE WHEN o_orderkey % 23 = 0 THEN 'Water' ELSE 'Soil' END AS compname,
         CASE WHEN o_orderkey % 7 = 0 THEN 'Yes'
              WHEN o_orderkey % 7 = 1 THEN 'Unranked' ELSE 'No' END AS hydricrating,
         CASE WHEN o_orderkey % 3 = 0 THEN 'Poorly drained'
              WHEN o_orderkey % 3 = 1 THEN 'Very poorly drained'
              ELSE 'Well drained' END AS drainagecl,
         CASE WHEN o_orderkey % 11 = 0 THEN 'partially drained' END AS localphase,
         CAST(NULL AS VARCHAR) AS otherph,
         CASE WHEN o_orderkey % 13 = 0 THEN 'Histosols' ELSE 'Mollisols' END AS taxorder,
         CASE WHEN o_orderkey % 17 = 0 THEN 'Histic Epiaquolls'
              ELSE 'Typic Hapludolls' END AS taxsubgrp
  FROM orders)"""

_SYN_QT = """
syn_hz AS (
  SELECT l_orderkey AS cokey, l_orderkey*10 + l_linenumber AS chkey,
         CAST((l_linenumber-1)*15 AS BIGINT) AS hzdept_r,
         CAST((l_linenumber-1)*15 + 5 + l_partkey % 11 AS BIGINT) AS hzdepb_r,
         CAST(l_partkey % 5 AS DOUBLE) AS awc_r,
         CAST(l_partkey % 7 AS DOUBLE) AS om_r,
         1.0 + (l_partkey % 100) / 100.0 AS dbthirdbar_r,
         3.0 + (l_suppkey % 60) / 10.0 AS ph1to1h2o_r,
         CAST(l_suppkey % 20 AS DOUBLE) AS ec_r,
         CAST(l_partkey % 60 + 10 AS DOUBLE) AS sandtotal_r,
         CAST(l_suppkey % 40 + 10 AS DOUBLE) AS silttotal_r,
         CAST(100 - (l_partkey % 60 + 10) - (l_suppkey % 40 + 10) AS DOUBLE)
           AS claytotal_r,
         CASE WHEN l_linenumber % 4 = 0 THEN 'O' WHEN l_linenumber % 4 = 1 THEN 'A'
              WHEN l_linenumber % 4 = 2 THEN 'B' ELSE 'C' END AS desgnmaster
  FROM lineitem),
syn_tex AS (
  SELECT g.chkey, g.texture, x.lieutex
  FROM (SELECT l_orderkey*10 + l_linenumber AS chkey,
               CASE WHEN l_suppkey % 6 = 0 THEN 'No' ELSE 'Yes' END AS rvindicator,
               CASE WHEN l_partkey % 19 = 0 THEN 'MUCK' ELSE 'SL' END AS texture
        FROM lineitem) g
  JOIN (SELECT l_orderkey*10 + l_linenumber AS chtgkey,
               CASE WHEN l_partkey % 23 = 0 THEN 'Peat' END AS lieutex
        FROM lineitem) x ON g.chkey = x.chtgkey
  WHERE g.rvindicator = 'Yes'),
syn_fv AS (
  SELECT l_orderkey*10 + l_linenumber AS chkey,
         SUM(CAST(l_suppkey % 30 AS DOUBLE)) AS fragvol
  FROM lineitem WHERE l_partkey % 3 = 0 GROUP BY 1),
syn_qt AS (
  SELECT c.*, h.chkey, h.hzdept_r, h.hzdepb_r, h.awc_r, h.om_r, h.dbthirdbar_r,
         h.ph1to1h2o_r, h.ec_r, h.sandtotal_r, h.silttotal_r, h.claytotal_r,
         h.desgnmaster, t.texture, t.lieutex, f.fragvol
  FROM syn_co c
  LEFT JOIN syn_hz h ON c.cokey = h.cokey
  LEFT JOIN syn_tex t ON h.chkey = t.chkey
  LEFT JOIN syn_fv f ON h.chkey = f.chkey),
syn_qth AS (
  -- pruned qt: component x horizon only (no texture / fragment
  -- joins) — the AWS / RZ-AWS / SOC branches' input (queries.py
  -- round-3 per-branch qt pruning; SOC adds syn_fv itself)
  SELECT c.*, h.chkey, h.hzdept_r, h.hzdepb_r, h.awc_r, h.om_r, h.dbthirdbar_r
  FROM syn_co c
  LEFT JOIN syn_hz h ON c.cokey = h.cokey),
syn_restr AS (
  SELECT cokey, resdept FROM (
    SELECT cokey, resdept_r AS resdept,
           row_number() OVER (PARTITION BY cokey
                              ORDER BY resdept_r ASC, corestrictkey) AS rn
    FROM (SELECT l_orderkey AS cokey,
                 l_orderkey*10 + l_linenumber AS corestrictkey,
                 CAST(l_suppkey % 180 AS INTEGER) AS resdept_r,
                 CASE WHEN l_suppkey % 8 = 0 THEN 'Lithic bedrock'
                      WHEN l_suppkey % 8 = 1 THEN 'Paralithic bedrock'
                      WHEN l_suppkey % 8 = 2 THEN 'Densic bedrock'
                      WHEN l_suppkey % 8 = 3 THEN 'Fragipan'
                      WHEN l_suppkey % 8 = 4 THEN 'Duripan'
                      WHEN l_suppkey % 8 = 5 THEN 'Sulfuric'
                      WHEN l_suppkey % 8 = 6 THEN 'Petrocalcic'
                      ELSE 'Abrupt textural change' END AS reskind
          FROM lineitem WHERE l_partkey % 13 = 0)
    WHERE reskind IN ('Lithic bedrock','Paralithic bedrock','Densic bedrock',
                      'Fragipan','Duripan','Sulfuric')
      AND resdept_r < 150)
  WHERE rn = 1)"""

_MAJOR_EARTHY = (
    "compkind IS NOT NULL AND compkind <> 'Miscellaneous area' "
    "AND majcompflag = 'Yes'"
)

_ORGANIC = """(CASE WHEN taxorder = 'Histosols'
        OR lower(coalesce(taxsubgrp,'')) LIKE '%histic%' THEN FALSE
  ELSE upper(coalesce(desgnmaster,'')) IN ('O','L')
       OR upper(coalesce(texture,'')) IN
          ('MUCK','MPT','PEAT','SPM','UDOM','PDOM','HPM','MPM')
       OR coalesce(lieutex,'') IN
          ('Muck','Mucky peat','Peat','Coprogenous earth') END)"""

_DENSE = """((dbthirdbar_r
   - (sandtotal_r*1.65 + silttotal_r*1.30 + claytotal_r*1.25)/100.0)
  > (sandtotal_r*0.002081 + silttotal_r*0.003912 + claytotal_r*0.0024351))"""

_LIMITING = f"({_DENSE} OR (ph1to1h2o_r <= 3.5 AND NOT {_ORGANIC}) OR (ec_r >= 16))"

_RZD = f"""
hzl AS (
  SELECT mukey, cokey, comppct_r,
         MIN(CASE WHEN {_LIMITING} THEN hzdept_r END) AS hz_restrict
  FROM syn_qt
  WHERE {_MAJOR_EARTHY} AND hzdept_r IS NOT NULL
  GROUP BY mukey, cokey, comppct_r),
v_rzd AS (
  SELECT h.mukey, h.cokey, h.comppct_r,
         CAST(least(coalesce(hz_restrict, 150), coalesce(r.resdept, 150), 150)
              AS INTEGER) AS rzdepth
  FROM hzl h LEFT JOIN syn_restr r ON h.cokey = r.cokey)"""

_HYD_RANK = (
    "CASE hydricrating WHEN 'Yes' THEN 1 WHEN 'Unranked' THEN 2 "
    "WHEN 'No' THEN 3 ELSE 4 END"
)

ORACLES["planner_sdv_rating"] = f"""
WITH {_SYN},
flt AS (
  SELECT * FROM syn_co
  WHERE comppct_r IS NOT NULL AND comppct_r >= 10
    AND (compname IS NULL OR compname <> 'NOTCOM')
    AND majcompflag = 'Yes'),
br AS (
  SELECT mukey, hydricrating AS v, SUM(comppct_r) AS sw, MIN(cokey) AS mm,
         MAX(comppct_r) AS mw,
         MIN(CASE WHEN comppct_r = mwr THEN cokey END) AS mmd
  FROM (SELECT *, MAX(comppct_r) OVER (PARTITION BY mukey, hydricrating) AS mwr
        FROM flt)
  GROUP BY mukey, hydricrating),
tt AS (
  SELECT mukey, v, sw, mm, mw, mmd,
         SUM(sw) OVER (PARTITION BY mukey) AS tw,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY sw DESC,
                    CASE v WHEN 'Yes' THEN 1 WHEN 'Unranked' THEN 2
                           WHEN 'No' THEN 3 ELSE 4 END ASC, mm ASC) AS rn,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY mw DESC,
                    CASE v WHEN 'Yes' THEN 1 WHEN 'Unranked' THEN 2
                           WHEN 'No' THEN 3 ELSE 4 END ASC, mmd ASC) AS rn_dcp
  FROM br)
SELECT d.mukey,
       CAST((200*d.sw + d.tw) // (2*d.tw) AS INTEGER) AS comppct_r,
       CASE WHEN p.mw >= 50 THEN p.v ELSE d.v END AS rating
FROM (SELECT * FROM tt WHERE rn = 1) d
JOIN (SELECT * FROM tt WHERE rn_dcp = 1) p USING (mukey)
"""

ORACLES["planner_sdv_flood_repair"] = f"""
WITH {_SYN},
co2 AS (
  SELECT *, CASE cokey % 6 WHEN 0 THEN 'None' WHEN 1 THEN 'Very rare'
            WHEN 2 THEN 'Rare' WHEN 3 THEN 'Occasional'
            WHEN 4 THEN 'Frequent' ELSE 'Very frequent' END AS flodfreqcl
  FROM syn_co),
flt AS (
  SELECT * FROM co2
  WHERE comppct_r IS NOT NULL AND comppct_r >= 10
    AND (compname IS NULL OR compname <> 'NOTCOM')
    AND majcompflag = 'Yes'),
br AS (
  SELECT mukey, flodfreqcl AS v, SUM(comppct_r) AS sw, MIN(cokey) AS mm,
         MAX(comppct_r) AS mw,
         MIN(CASE WHEN comppct_r = mwr THEN cokey END) AS mmd
  FROM (SELECT *, MAX(comppct_r) OVER (PARTITION BY mukey, flodfreqcl) AS mwr
        FROM flt)
  GROUP BY mukey, flodfreqcl),
tt AS (
  SELECT mukey, v, sw, mm, mw, mmd,
         SUM(sw) OVER (PARTITION BY mukey) AS tw,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY sw DESC,
                    CASE v WHEN 'None' THEN 1 WHEN 'Very rare' THEN 2
                           WHEN 'Rare' THEN 3 WHEN 'Occasional' THEN 4
                           WHEN 'Frequent' THEN 5 WHEN 'Very frequent' THEN 6
                           ELSE 7 END ASC, mm ASC) AS rn,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY mw DESC,
                    CASE v WHEN 'None' THEN 1 WHEN 'Very rare' THEN 2
                           WHEN 'Rare' THEN 3 WHEN 'Occasional' THEN 4
                           WHEN 'Frequent' THEN 5 WHEN 'Very frequent' THEN 6
                           ELSE 7 END ASC, mmd ASC) AS rn_dcp
  FROM br)
SELECT d.mukey,
       CAST((200*d.sw + d.tw) // (2*d.tw) AS INTEGER) AS comppct_r,
       CASE WHEN p.mw >= 50 THEN p.v ELSE d.v END AS rating
FROM (SELECT * FROM tt WHERE rn = 1) d
JOIN (SELECT * FROM tt WHERE rn_dcp = 1) p USING (mukey)
"""

ORACLES["planner_sdv_hz_top_depth"] = f"""
WITH {_SYN},
hz AS (
  SELECT l_orderkey AS cokey, l_orderkey*10 + l_linenumber AS chkey,
         CAST((l_linenumber-1)*15 AS BIGINT) AS hzdept_r,
         CAST((l_linenumber-1)*15 + 5 + l_partkey % 11 AS BIGINT) AS hzdepb_r
  FROM lineitem),
ctg AS (
  SELECT l_orderkey*10 + l_linenumber AS chkey,
         (l_orderkey*10 + l_linenumber)*10 + 1 AS chtgkey,
         CASE WHEN l_suppkey % 6 = 0 THEN 'No' ELSE 'Yes' END AS rvindicator,
         CASE WHEN l_partkey % 19 = 0 THEN 'MUCK' ELSE 'SL' END AS texture
  FROM lineitem
  UNION ALL
  SELECT l_orderkey*10 + l_linenumber,
         (l_orderkey*10 + l_linenumber)*10 + 2,
         'Yes',
         CASE WHEN l_partkey % 7 = 0 THEN 'CL' ELSE 'FSL' END
  FROM lineitem),
flt AS (
  -- LEFT join: a component with no surface horizon still gets a
  -- null-rating row (the reference's dMissing except-branch,
  -- gSSURGO_CreateSoilMap.py:4527-4530)
  SELECT c.mukey, c.cokey, c.comppct_r, h.chkey
  FROM syn_co c
  LEFT JOIN (SELECT * FROM hz WHERE hzdept_r < 1 AND hzdepb_r > 0) h
    ON c.cokey = h.cokey
  WHERE c.comppct_r IS NOT NULL AND c.comppct_r >= 10
    AND (c.compname IS NULL OR c.compname <> 'NOTCOM')),
fc AS (
  SELECT chkey, texture FROM (
    SELECT chkey, texture,
           row_number() OVER (
             PARTITION BY chkey
             ORDER BY chtgkey ASC, texture ASC NULLS FIRST) AS rn
    FROM ctg WHERE rvindicator = 'Yes')
  WHERE rn = 1),
rws AS (
  SELECT f.mukey, f.cokey, f.comppct_r, t.texture
  FROM flt f LEFT JOIN fc t ON f.chkey = t.chkey)
SELECT mukey, comppct_r, texture AS rating FROM (
  SELECT *, row_number() OVER (
    PARTITION BY mukey
    ORDER BY comppct_r DESC, texture ASC NULLS FIRST, cokey ASC) AS rn
  FROM rws)
WHERE rn = 1
"""

ORACLES["planner_sdv_batch"] = f"""
SELECT b.mukey,
       h.comppct_r AS hydric_comppct_r, h.rating AS hydric_rating,
       d.comppct_r AS drain_comppct_r, d.rating AS drain_rating
FROM (SELECT DISTINCT o_custkey AS mukey FROM orders) b
LEFT JOIN ({ORACLES["planner_sdv_rating"]}) h ON b.mukey = h.mukey
LEFT JOIN (
  WITH {_SYN},
  flt AS (
    SELECT * FROM syn_co
    WHERE comppct_r IS NOT NULL AND comppct_r >= 10
      AND (compname IS NULL OR compname <> 'NOTCOM')
      AND majcompflag = 'Yes')
  SELECT mukey, comppct_r, drainagecl AS rating FROM (
    SELECT *, row_number() OVER (
      PARTITION BY mukey
      ORDER BY comppct_r DESC,
               CASE drainagecl WHEN 'Very poorly drained' THEN 1
                    WHEN 'Poorly drained' THEN 2
                    WHEN 'Well drained' THEN 3 ELSE 4 END ASC,
               cokey ASC) AS rn
    FROM flt)
  WHERE rn = 1
) d ON b.mukey = d.mukey
"""

ORACLES["planner_sdv_soilmoist"] = f"""
WITH {_SYN},
cm AS (
  SELECT cokey, m.monthseq, cokey*16 + m.monthseq AS comonthkey
  FROM syn_co,
       (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12))
         AS m(monthseq)),
sm AS (
  SELECT l_orderkey*16 + (l_partkey % 12 + 1) AS comonthkey,
         CASE WHEN l_suppkey % 5 <> 0
              THEN CAST(l_suppkey % 200 AS DOUBLE) END AS soimoistdept_r
  FROM lineitem),
flt AS (
  SELECT * FROM syn_co
  WHERE comppct_r IS NOT NULL AND comppct_r >= 10
    AND (compname IS NULL OR compname <> 'NOTCOM')),
j AS (
  SELECT c.mukey, c.cokey, c.comppct_r,
         coalesce(s.soimoistdept_r, 201) AS r
  FROM flt c
  JOIN cm ON c.cokey = cm.cokey
  LEFT JOIN sm s ON cm.comonthkey = s.comonthkey
  WHERE cm.monthseq BETWEEN 4 AND 6),
col AS (
  SELECT mukey, cokey, comppct_r, MIN(r) AS r
  FROM j GROUP BY mukey, cokey, comppct_r)
SELECT mukey, CAST(SUM(comppct_r) AS BIGINT) AS sum_pct,
       CAST(floor(SUM(comppct_r*r)/SUM(comppct_r) * 10000) AS BIGINT)
         AS rating_e4
FROM col GROUP BY mukey
"""

ORACLES["raster_lookup_codes"] = f"""
WITH {_SYN},
lu AS (
  SELECT CAST(dense_rank() OVER (ORDER BY mukey ASC) AS BIGINT) AS cellvalue,
         mukey
  FROM (SELECT DISTINCT mukey FROM syn_co))
SELECT l.cellvalue, c.mukey, COUNT(*) AS n_comp
FROM syn_co c JOIN lu l ON c.mukey = l.mukey
GROUP BY l.cellvalue, c.mukey
"""

ORACLES["validate_missing_data"] = f"""
WITH {_SYN},
mu AS (SELECT c_custkey AS mukey,
              CASE WHEN c_custkey % 11 = 0 THEN 'NOTCOM'
                   ELSE 'MU' || CAST(c_custkey AS VARCHAR) END AS musym
       FROM customer),
no_co AS (
  SELECT * FROM mu
  WHERE mukey NOT IN (SELECT DISTINCT mukey FROM syn_co)),
hzc AS (SELECT DISTINCT l_orderkey AS cokey FROM lineitem
        WHERE l_orderkey % 9 <> 0),
co_no_hz AS (
  SELECT mukey, cokey FROM syn_co
  WHERE cokey NOT IN (SELECT cokey FROM hzc)
    AND compname NOT IN ('NOTCOM', 'NOTPUB')
    AND COALESCE(compkind, '') <> 'Miscellaneous area')
SELECT 'mu_no_component' AS kind, mukey, CAST(NULL AS BIGINT) AS cokey
FROM no_co WHERE musym <> 'NOTCOM'
UNION ALL
SELECT 'mu_notcom', mukey, NULL FROM no_co WHERE musym = 'NOTCOM'
UNION ALL
SELECT 'co_no_horizon', mukey, cokey FROM co_no_hz
"""

ORACLES["sdv_attribute_report"] = """
WITH fd AS (
  SELECT foldername, folderkey, foldersequence FROM (
    SELECT r_name AS foldername, r_regionkey AS folderkey,
           r_regionkey + 1 AS foldersequence,
           row_number() OVER (
             PARTITION BY r_name
             ORDER BY r_regionkey + 1 ASC, r_regionkey ASC) AS rn
    FROM region) WHERE rn = 1),
fa AS (SELECT n_regionkey AS folderkey, n_nationkey AS attributekey
       FROM nation),
att AS (
  SELECT n_nationkey AS attributekey,
         n_name || CASE WHEN n_nationkey % 3 = 0 THEN ' (AL)'
                        WHEN n_nationkey % 3 = 1 THEN ' (ZZ)'
                        ELSE '' END AS attributename,
         CASE WHEN n_nationkey % 2 = 0 THEN 'Choice' ELSE 'Float' END
           AS attributelogicaldatatype,
         CASE WHEN n_nationkey % 4 = 0 THEN 'Dominant Condition'
              ELSE 'Weighted Average' END AS algorithmname
  FROM nation),
st AS (
  SELECT DISTINCT CASE WHEN n_nationkey % 2 = 0 THEN 'AL' ELSE 'TX' END AS st
  FROM nation),
j AS (
  SELECT fd.foldername, fd.foldersequence, a.attributekey, a.attributename,
         a.attributelogicaldatatype, a.algorithmname
  FROM fd JOIN fa USING (folderkey) JOIN att a USING (attributekey)
  WHERE NOT EXISTS (
    SELECT 1 FROM st
    WHERE substr(a.attributename, length(a.attributename)-3, 1) = '('
      AND substr(a.attributename, length(a.attributename), 1) = ')'
      AND substr(a.attributename, length(a.attributename)-2, 2) = st.st)),
dd AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY foldername, attributename
      ORDER BY attributelogicaldatatype ASC, algorithmname ASC,
               attributekey ASC) AS rd
    FROM j) WHERE rd = 1)
SELECT foldersequence AS folder_seq, foldername,
       CAST(row_number() OVER (
         PARTITION BY foldername ORDER BY attributename ASC) AS INTEGER)
         AS choice,
       attributename, attributelogicaldatatype, algorithmname
FROM dd
"""

ORACLES["validate_structure"] = """
SELECT 'table' AS "check", 'component' AS subject, 'ok' AS status,
       CAST(NULL AS BIGINT) AS n
UNION ALL SELECT 'table', 'chorizon', 'bad_schema', NULL
UNION ALL SELECT 'table', 'chtexture', 'missing', NULL
UNION ALL SELECT 'table', 'sdvattribute', 'ok', NULL
UNION ALL
SELECT 'sacatalog', 'surveys',
       CASE WHEN COUNT(*) > 0 THEN 'ok' ELSE 'empty' END, COUNT(*)
FROM region
UNION ALL
SELECT 'mapunit_count', 'tabular_vs_component',
       CASE WHEN a.n = b.n THEN 'match' ELSE 'mismatch' END, abs(a.n - b.n)
FROM (SELECT COUNT(DISTINCT c_custkey) AS n FROM customer) a,
     (SELECT COUNT(DISTINCT o_custkey) AS n FROM orders) b
"""

ORACLES["valu1_sum_pct"] = f"""
WITH {_SYN}
SELECT mukey, CAST(SUM(comppct_r) AS BIGINT) AS musumcpct,
       CAST(SUM(CASE WHEN {_MAJOR_EARTHY} THEN comppct_r END) AS BIGINT)
         AS musumcpcta,
       CAST(SUM(CASE WHEN majcompflag = 'Yes' THEN comppct_r END) AS BIGINT)
         AS musumcpcts
FROM syn_co GROUP BY mukey
"""

ORACLES["valu1_rz_depth"] = f"""
WITH {_SYN},{_SYN_QT},{_RZD}
SELECT mukey, cokey, comppct_r, rzdepth FROM v_rzd
"""

ORACLES["valu1_rz_aws_droughty"] = f"""
WITH {_SYN},{_SYN_QT},{_RZD},
rza_c AS (
  SELECT q.mukey, q.cokey, q.comppct_r, d.rzdepth,
         SUM(CASE WHEN q.awc_r IS NOT NULL THEN
               greatest(least(q.hzdepb_r, d.rzdepth)
                        - greatest(q.hzdept_r, 0), 0) * q.awc_r * 10.0 END) AS caws
  FROM syn_qth q JOIN v_rzd d ON q.cokey = d.cokey
  WHERE {_MAJOR_EARTHY}
  GROUP BY q.mukey, q.cokey, q.comppct_r, d.rzdepth)
SELECT mukey, rootznaws, rootznemc,
       CAST(rootznaws <= 152 AS INTEGER) AS droughty
FROM (SELECT mukey,
             round(SUM(comppct_r*caws)
                   / SUM(CASE WHEN caws IS NOT NULL THEN comppct_r END), 0)
               AS rootznaws,
             least(round(SUM(comppct_r*rzdepth)/SUM(comppct_r), 0), 150.0)
               AS rootznemc
      FROM rza_c GROUP BY mukey)
"""

ORACLES["valu1_soc"] = f"""
WITH {_SYN},{_SYN_QT},
soc_hz AS (
  SELECT q.mukey, q.cokey, q.comppct_r, rng.top, rng.bot,
         q.hzdept_r, q.hzdepb_r, q.om_r, q.dbthirdbar_r, f.fragvol, r.resdept
  FROM syn_qth q
  LEFT JOIN syn_fv f ON q.chkey = f.chkey
  LEFT JOIN syn_restr r ON q.cokey = r.cokey,
  (VALUES (0,20),(20,50),(50,100),(0,100)) AS rng(top, bot)),
soc_c AS (
  SELECT mukey, cokey, comppct_r, top, bot,
         SUM(CASE WHEN om_r IS NOT NULL AND dbthirdbar_r IS NOT NULL THEN
               CAST(floor(
                 greatest(least(hzdepb_r, bot, coalesce(resdept, 999))
                          - greatest(hzdept_r, top), 0)
                 * ((1.0 - coalesce(fragvol, 0.0)/100.0) * 10.0
                    * (om_r/1.724) * dbthirdbar_r) * 1000) AS BIGINT)
             END) AS csoc
  FROM soc_hz GROUP BY mukey, cokey, comppct_r, top, bot)
SELECT mukey, top, bot,
       CAST(floor(SUM(comppct_r*csoc)
                  / SUM(CASE WHEN csoc IS NOT NULL THEN comppct_r END))
            AS BIGINT) AS soc
FROM soc_c GROUP BY mukey, top, bot
"""

ORACLES["valu1_nccpi"] = f"""
WITH {_SYN},
syn_ci AS (
  SELECT o_orderkey AS cokey, r.ruledepth, r.rulename,
         CAST((o_orderkey * (r.ruledepth + 2)) % 101 AS DOUBLE) AS interphr
  FROM orders,
       (VALUES (0, 'NCCPI - NCCPI'), (1, 'NCCPI - Corn Submodel'),
               (1, 'NCCPI - Soybeans Submodel')) AS r(ruledepth, rulename))
SELECT mukey,
  CAST(floor(SUM(CASE WHEN ruledepth = 0 THEN interphr*comppct_r END)
        / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
    AS nccpi3all,
  CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Corn%'
                 THEN interphr*comppct_r END)
        / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
    AS nccpi3corn,
  CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Soybean%'
                 THEN interphr*comppct_r END)
        / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
    AS nccpi3soy,
  CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Cotton%'
                 THEN interphr*comppct_r END)
        / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
    AS nccpi3cot,
  CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Small Grain%'
                 THEN interphr*comppct_r END)
        / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
    AS nccpi3sg
FROM syn_co c JOIN syn_ci i ON c.cokey = i.cokey
WHERE majcompflag = 'Yes'
GROUP BY mukey
"""

ORACLES["valu1_pwsl"] = f"""
WITH {_SYN},
w AS (
  SELECT mukey,
    SUM(CASE WHEN compname IN ('Water','WATER','water')
              OR hydricrating = 'Yes'
              OR (hydricrating = 'Unranked' AND
                  (drainagecl IN ('Poorly drained','Very poorly drained')
                   OR lower(coalesce(localphase,'')) LIKE '%drained%'
                   OR lower(coalesce(otherph,'')) LIKE '%drained%'))
         THEN comppct_r END) AS pwsl_pct,
    SUM(CASE WHEN compname IN ('Water','WATER','water')
         THEN comppct_r END) AS water_pct
  FROM syn_co GROUP BY mukey)
SELECT mukey,
       CAST(CASE WHEN water_pct >= 80 THEN 999 ELSE pwsl_pct END AS INTEGER)
         AS pwsl1pomu
FROM w
"""

ORACLES["merge_dedup"] = """
SELECT DISTINCT * FROM (
  SELECT * FROM nation UNION ALL SELECT * FROM nation)
"""

ORACLES["distinct_scan"] = "SELECT DISTINCT o_orderpriority FROM orders"

ORACLES["merge_by_map_tool"] = """
WITH sel AS (
  SELECT DISTINCT 'A' || CAST(c_custkey % 7 AS VARCHAR) AS areasymbol
  FROM customer WHERE c_custkey % 3 = 0),
wanted AS (SELECT areasymbol FROM sel WHERE areasymbol <> 'A1'),
src AS (
  SELECT n.*, 'A' || CAST(n_nationkey % 7 AS VARCHAR) AS areasymbol
  FROM nation n
  UNION ALL
  SELECT n.*, 'A' || CAST(n_nationkey % 7 AS VARCHAR) AS areasymbol
  FROM nation n)
SELECT DISTINCT * FROM src
WHERE areasymbol IN (SELECT areasymbol FROM wanted)
"""

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
SELECT rflag AS rating, CAST(SUM(comppct_r) AS BIGINT) AS acres,
       CAST(SUM(price_c) AS BIGINT) AS value_c,
       COUNT(*) AS n
FROM base GROUP BY rflag
"""

ORACLES["acreage_geom"] = """
WITH p AS (
  SELECT c_nationkey AS nkey,
         -- independent area derivation from the vertex formulas
         -- (the Spark side parses WKT and runs the shoelace fold):
         -- rectangle area2x = 2wh, right-triangle area2x = wh
         CASE WHEN c_custkey % 3 = 0
              THEN (c_custkey % 13 + 1) * (c_custkey % 7 + 1)
              ELSE 2 * (c_custkey % 13 + 1) * (c_custkey % 7 + 1) END AS a2x
  FROM customer)
SELECT nkey, COUNT(*) AS n_poly, CAST(SUM(a2x) AS BIGINT) AS area2x,
       CAST(floor(SUM(a2x) * 0.000247104393 / 2.0 * 10000.0) AS BIGINT)
         AS acres_e4
FROM p GROUP BY nkey
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
       CAST(SUM(CAST(prev_bot < hzdept AS INTEGER)) AS BIGINT) AS n_gaps,
       CAST(SUM(CAST(prev_bot > hzdept AS INTEGER)) AS BIGINT) AS n_overlaps
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
         CAST(SUM(qty) AS BIGINT) AS sum_qty,
         CAST(SUM(pc) AS BIGINT) AS sum_base_price_c,
         CAST(SUM(pc*(100-dbp)) AS BIGINT) AS sum_disc_price_c2,
         CAST(SUM(pc*(100-dbp)*(100+tbp)) AS BIGINT) AS sum_charge_c3,
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
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c2
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
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c2
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

# ----------------------------------------------------------- events
# (ts convention: Spark `ts div 1000` == DuckDB epoch_us(ts))

ORACLES["events_tumbling_daily"] = """
SELECT epoch_us(ts) // 86400000000 AS day_num, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2
"""

# streaming form must equal the batch aggregation at availableNow
ORACLES["events_stream_tumbling"] = ORACLES["events_tumbling_daily"]

ORACLES["q14_promo_share"] = """
SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
         THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l.l_discount*100) AS BIGINT))
         ELSE 0 END) AS BIGINT) AS promo_c2,
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
         * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
         AS total_c2
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-09-01' AND l.l_shipdate < DATE '1995-10-01'
"""

ORACLES["q18_large_volume"] = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice*100) AS BIGINT) AS totalprice_c,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         o.o_totalprice
ORDER BY totalprice_c DESC, o.o_orderdate ASC, o.o_orderkey ASC
LIMIT 100
"""

ORACLES["q6_forecast_revenue"] = """
SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
         * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c2
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

ORACLES["events_enriched_daily"] = """
WITH dim(event_type, category) AS (VALUES
  ('click', 'engagement'), ('view', 'engagement'),
  ('signup', 'acquisition'), ('purchase', 'revenue'), ('error', 'ops'))
SELECT (epoch_us(ts) // 86400000000) AS day_num, d.category,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
FROM events e JOIN dim d USING (event_type)
GROUP BY 1, 2
"""

ORACLES["events_stream_enriched"] = ORACLES["events_enriched_daily"]

ORACLES["events_attribution"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
  AND epoch_us(c.ts) <= epoch_us(p.ts)
"""

ORACLES["events_stream_attribution"] = ORACLES["events_attribution"]

ORACLES["events_stream_dedup"] = """
SELECT event_id,
       epoch_us(ts) // 86400000000 AS day_num,
       event_type,
       CAST(round(value*100) AS BIGINT) AS value_c
FROM events
"""

ORACLES["events_attribution_outer"] = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
"""

ORACLES["events_stream_attribution_outer"] = ORACLES["events_attribution_outer"]

ORACLES["events_sessionize_stateful"] = """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events)
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN ts_us - prev > 1800*1000000
                              THEN 1 ELSE 0 END), 0) + 1 AS BIGINT)
         AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""

ORACLES["events_sessionize"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT *, lag(ts_us) OVER (
        PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS prev
      FROM e)
SELECT user_id,
       CAST(COALESCE(SUM(CAST(ts_us - prev > 1800000000 AS INTEGER)), 0) + 1
            AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM l GROUP BY user_id
"""

ORACLES["legend_class_breaks"] = """
WITH s AS (
  SELECT MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS mn,
         MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS mx
  FROM orders)
SELECT CAST(gs.i AS INTEGER) AS class_idx,
       mn + ((mx - mn) * gs.i) // 5 AS brk
FROM s, generate_series(0, 5) AS gs(i)
"""

ORACLES["natmusym_attach"] = """
SELECT o_orderkey AS okey, o_orderpriority AS musym,
       substr(md5(o_orderpriority), 1, 8) AS natmusym
FROM orders
"""

ORACLES["events_topk_per_type"] = """
SELECT event_type, event_id, value_c, CAST(rn AS INTEGER) AS rn
FROM (SELECT event_type, event_id,
             CAST(round(value*100) AS BIGINT) AS value_c,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(round(value*100) AS BIGINT) DESC,
                        event_id ASC) AS rn
      FROM events)
WHERE rn <= 3
"""

ORACLES["events_json_extract"] = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""

# -------------------------------------------------------- documents

_DOCS_T = "SELECT doc_id, string_split(text, ' ') AS t, length(text) AS lc FROM documents"

# k=3 shingles, matching functions.dedup.shingles
_SHINGLES = """
sh AS (
  SELECT doc_id AS did,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]
                || ' ' || t[CAST(i AS INT) + 2])) AS ss
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))"""

# freq-capped exploded shingles (max_freq=100) + full-set sizes
_JACCARD_COMMON = f"""
{_SHINGLES},
exf AS (SELECT did, unnest(ss) AS s FROM sh),
freq AS (SELECT s, COUNT(*) AS f FROM exf GROUP BY s),
ex AS (SELECT did, exf.s FROM exf JOIN freq ON exf.s = freq.s WHERE f <= 100),
sizes AS (SELECT did, len(ss) AS nsh FROM sh)"""

ORACLES["docs_token_count"] = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]'))
            AS INTEGER) AS n_subtok,
       CAST(length(text) AS INTEGER) AS n_chars_calc
FROM documents
"""

ORACLES["docs_quality"] = f"""
WITH d AS ({_DOCS_T}),
x AS (SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd,
             len(list_filter(t, w -> w IN
                 ('the','a','and','of','to','in'))) AS ns,
             lc
      FROM d)
SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
       CAST(floor((nd/n)*10000) AS BIGINT) AS ttr_e4,
       CAST(floor((ns/n)*10000) AS BIGINT) AS stop_e4,
       CAST(floor(((lc - (n-1))/n)*10000) AS BIGINT) AS mean_len_e4
FROM x
"""

ORACLES["docs_langid"] = f"""
WITH d AS ({_DOCS_T}),
s AS (SELECT doc_id,
        len(list_filter(t, w -> w IN ('hash','sort','value'))) AS s_de,
        len(list_filter(t, w -> w IN ('the','a','data','order'))) AS s_en,
        len(list_filter(t, w -> w IN ('query','row','table'))) AS s_es,
        len(list_filter(t, w -> w IN ('group','line','vector'))) AS s_fr,
        len(list_filter(t, w -> w IN ('spark','big','dup'))) AS s_zh
      FROM d)
SELECT doc_id,
       CASE WHEN s_de = b THEN 'de' WHEN s_en = b THEN 'en'
            WHEN s_es = b THEN 'es' WHEN s_fr = b THEN 'fr'
            ELSE 'zh' END AS lang_pred,
       CAST(b AS INTEGER) AS lang_score
FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS b FROM s)
"""

ORACLES["docs_fingerprint"] = """
SELECT doc_id, substr(md5(text), 1, 15) AS fp FROM documents
"""

ORACLES["docs_exact_dedup"] = """
SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
FROM documents GROUP BY md5(text)
"""

def _ngram_jaccard_sql(threshold_e4: int) -> str:
    return f"""
WITH {_JACCARD_COMMON},
inter AS (
  SELECT a.did AS i, b.did AS j, COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.did < b.did
  GROUP BY 1, 2)
SELECT i, j, jac_e4 FROM (
  SELECT i, j,
         CAST(floor((inter/(si.ni + sj.nj - inter))*10000) AS BIGINT) AS jac_e4
  FROM inter
  JOIN (SELECT did AS i, nsh AS ni FROM sizes) si USING (i)
  JOIN (SELECT did AS j, nsh AS nj FROM sizes) sj USING (j))
WHERE jac_e4 >= {threshold_e4}
"""


ORACLES["docs_ngram_jaccard"] = _ngram_jaccard_sql(3000)

ORACLES["docs_source_stats"] = """
WITH tok AS (
  SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents),
r AS (
  SELECT source, n_tok,
         row_number() OVER (PARTITION BY source ORDER BY n_tok ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM tok)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(CASE
         WHEN n % 2 = 1 AND rn = (n + 1) / 2 THEN 2 * n_tok
         WHEN n % 2 = 0 AND (rn = n / 2 OR rn = n / 2 + 1) THEN n_tok
         ELSE 0 END) AS BIGINT) AS med2_tok,
       CAST(MAX(CASE WHEN rn = (19 * (n - 1)) // 20 + 1 THEN n_tok END)
            AS INTEGER) AS p95_tok
FROM r GROUP BY source
"""

ORACLES["docs_decontaminate"] = f"""
WITH {_SHINGLES},
bench AS (SELECT DISTINCT unnest(ss) AS s FROM sh WHERE did % 97 = 0),
tr AS (SELECT did, unnest(ss) AS s FROM sh WHERE did % 97 <> 0),
hits AS (
  SELECT did, COUNT(*) AS n_hits
  FROM tr JOIN bench USING (s)
  GROUP BY did)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) > 0 AS INTEGER) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN (SELECT did AS doc_id, n_hits FROM hits) h USING (doc_id)
"""

ORACLES["docs_mix_sample"] = """
WITH w AS (
  SELECT source,
         (CAST(substr(source, 4, 8) AS BIGINT) % 5 + 1) * 2 AS rate
  FROM (SELECT DISTINCT source FROM documents))
SELECT d.doc_id, d.source
FROM documents d JOIN w USING (source)
WHERE d.doc_id % 10 < w.rate
"""

_MH = ", ".join(
    f"MIN(substr(md5('{i // 4}#' || s), {1 + 8 * (i % 4)}, 8)) AS mh{i}"
    for i in range(16)
)

ORACLES["docs_minhash_signatures"] = f"""
WITH {_SHINGLES},
ex AS (SELECT did, unnest(ss) AS s FROM sh)
SELECT did, {_MH}
FROM ex GROUP BY did
"""

_BANDS = " UNION ALL ".join(
    f"SELECT did, {b} AS band_id, mh{4*b} || '|' || mh{4*b+1} || '|' || "
    f"mh{4*b+2} || '|' || mh{4*b+3} AS key FROM sig"
    for b in range(4)
)

ORACLES["docs_minhash_lsh"] = f"""
WITH {_JACCARD_COMMON},
exs AS (SELECT did, unnest(ss) AS s FROM sh),
sig AS (SELECT did, {_MH} FROM exs GROUP BY did),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT a.did AS i, b.did AS j
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.key = b.key AND a.did < b.did),
inter AS (
  SELECT c.i, c.j, COUNT(*) AS inter
  FROM cand c
  JOIN ex a ON a.did = c.i
  JOIN ex b ON b.did = c.j AND a.s = b.s
  GROUP BY c.i, c.j)
SELECT i, j, jac_e4 FROM (
  SELECT i, j,
         CAST(floor((inter/(si.ni + sj.nj - inter))*10000) AS BIGINT) AS jac_e4
  FROM inter
  JOIN (SELECT did AS i, nsh AS ni FROM sizes) si USING (i)
  JOIN (SELECT did AS j, nsh AS nj FROM sizes) sj USING (j))
WHERE jac_e4 >= 3000
"""

ORACLES["docs_chunk"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
s AS (SELECT doc_id, t, unnest(generate_series(0, greatest(len(t)-1, 0), 24))
        AS start
      FROM t)
SELECT doc_id, CAST(start // 24 AS INTEGER) AS chunk_idx,
       CAST(len(list_slice(t, start+1, start+32)) AS INTEGER) AS n_tok,
       substr(md5(array_to_string(list_slice(t, start+1, start+32), ' ')),
              1, 16) AS chunk_fp
FROM s
"""

ORACLES["docs_pack_chunks"] = f"""
WITH chunks AS ({ORACLES["docs_chunk"]})
SELECT doc_id, chunk_idx, CAST(doc_id % 64 AS INTEGER) AS shard,
       CAST(COALESCE(SUM(n_tok) OVER (
              PARTITION BY doc_id % 64
              ORDER BY doc_id ASC, chunk_idx ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 128 AS INTEGER) AS batch_id
FROM chunks
"""

ORACLES["docs_top_ngrams"] = f"""
WITH {_SHINGLES},
ex AS (SELECT did, unnest(ss) AS s FROM sh),
counts AS (SELECT s, COUNT(*) AS n FROM ex GROUP BY s)
SELECT s, n, rank FROM (
  SELECT s, n, row_number() OVER (ORDER BY n DESC, s ASC) AS rank
  FROM counts)
WHERE rank <= 20
"""

ORACLES["docs_dup_groups"] = f"""
WITH RECURSIVE
pairs AS ({ORACLES["docs_ngram_jaccard"]}),
edges AS (SELECT i AS a, j AS b FROM pairs
          UNION ALL SELECT j, i FROM pairs),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS doc_id, MIN(dst) AS group_rep,
       CAST(CASE WHEN src = MIN(dst) THEN 1 ELSE 0 END AS INTEGER) AS is_rep
FROM reach GROUP BY src
"""

ORACLES["docs_dup_triangles"] = f"""
WITH pairs AS ({ORACLES["docs_ngram_jaccard"]}),
p AS (SELECT i, j FROM pairs),
und AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
deg AS (SELECT i AS v, COUNT(*) AS deg FROM und GROUP BY i),
pd AS (
  SELECT p.i, p.j, di.deg AS di, dj.deg AS dj
  FROM p JOIN deg di ON di.v = p.i JOIN deg dj ON dj.v = p.j),
oriented AS (
  SELECT CASE WHEN (di < dj) OR (di = dj AND i < j) THEN i ELSE j END AS src,
         CASE WHEN (di < dj) OR (di = dj AND i < j) THEN j ELSE i END AS dst,
         CASE WHEN (di < dj) OR (di = dj AND i < j) THEN dj ELSE di END AS ddst
  FROM pd),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
  WHERE (e1.ddst < e2.ddst) OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
tris AS (
  SELECT w.a, w.b, w.c FROM wedges w
  JOIN oriented o ON o.src = w.b AND o.dst = w.c),
corners AS (
  SELECT a AS v FROM tris UNION ALL SELECT b AS v FROM tris
  UNION ALL SELECT c AS v FROM tris),
ntri AS (SELECT v, COUNT(*) AS n_tri FROM corners GROUP BY v)
SELECT d.v AS doc_id, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(n.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(CASE WHEN d.deg >= 2
                 THEN 2000 * COALESCE(n.n_tri, 0) // (d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS cc_permille
FROM deg d LEFT JOIN ntri n ON n.v = d.v
"""

def _wedge_gaps_sql(threshold_e4: int) -> str:
    return f"""
WITH {_JACCARD_COMMON},
pairs AS ({_ngram_jaccard_sql(threshold_e4)}),
p AS (SELECT i, j FROM pairs),
und AS (SELECT i AS ctr, j AS nb FROM p UNION ALL SELECT j, i FROM p),
cand AS (
  SELECT i, j, cn FROM (
    SELECT e1.nb AS i, e2.nb AS j, COUNT(*) AS cn
    FROM und e1 JOIN und e2 ON e1.ctr = e2.ctr AND e1.nb < e2.nb
    GROUP BY 1, 2) w
  WHERE cn >= 2
    AND NOT EXISTS (SELECT 1 FROM p WHERE p.i = w.i AND p.j = w.j)),
ver AS (
  SELECT c.i, c.j, COUNT(*) AS inter
  FROM cand c
  JOIN ex a ON a.did = c.i
  JOIN ex b ON b.did = c.j AND b.s = a.s
  GROUP BY c.i, c.j)
SELECT c.i, c.j, CAST(c.cn AS BIGINT) AS cn,
       CAST(COALESCE(
         floor((v.inter / (si.ni + sj.nj - v.inter)) * 10000), 0)
         AS BIGINT) AS jacc_e4
FROM cand c
JOIN (SELECT did AS i, nsh AS ni FROM sizes) si USING (i)
JOIN (SELECT did AS j, nsh AS nj FROM sizes) sj USING (j)
LEFT JOIN ver v ON v.i = c.i AND v.j = c.j
"""


ORACLES["docs_dup_wedge_gaps"] = _wedge_gaps_sql(3000)

# the default-threshold graph is transitive at every gate SF (0 rows),
# which makes its hash check vacuous for the oracle's own arithmetic;
# the DENSE variant (threshold 0.02) plants real bridges at sf0.01 so
# the wedge/cn/jacc SQL is certified on non-empty output
ORACLES["docs_dup_wedge_gaps_dense"] = _wedge_gaps_sql(200)

# audit twin of dedup.minhash_band_stats at bucket_cap=2 (tiny on
# purpose so the salt-split path actually fires at sf0.01)
_LSH_STATS_CAP = 2

ORACLES["docs_lsh_band_stats"] = f"""
WITH {_SHINGLES},
exs AS (SELECT did, unnest(ss) AS s FROM sh),
sig AS (SELECT did, {_MH} FROM exs GROUP BY did),
bands AS ({_BANDS}),
withn AS (
  SELECT did, band_id, key,
         COUNT(*) OVER (PARTITION BY band_id, key) AS bn
  FROM bands),
salted AS (
  SELECT did, band_id, key, bn,
         CASE WHEN bn <= {_LSH_STATS_CAP} THEN 0
              ELSE did % CAST(ceil(bn * 1.0 / {_LSH_STATS_CAP}) AS BIGINT)
         END AS salt
  FROM withn WHERE bn > 1),
sub AS (
  SELECT band_id, key, salt, MAX(bn) AS bn, COUNT(*) AS sz
  FROM salted GROUP BY band_id, key, salt
  HAVING COUNT(*) > 1)
SELECT band_id, COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN bn > {_LSH_STATS_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_split_sub_buckets,
       CAST(MAX(bn) AS BIGINT) AS max_raw_bucket,
       CAST(SUM(sz*(sz-1)//2) AS BIGINT) AS n_cand_pairs
FROM sub GROUP BY band_id
"""

_SIMHASH_BITS = ", ".join(
    "SUM(CASE WHEN substr(h, %d, 1) IN ('8','9','a','b','c','d','e','f') "
    "THEN 1 ELSE -1 END) AS b%d" % (i + 1, i)
    for i in range(16)
)
_SIMHASH_SIG = " + ".join(
    f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16)
)

ORACLES["docs_simhash"] = f"""
WITH ex AS (
  SELECT doc_id AS did, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents),
h AS (SELECT did, md5(w) AS h FROM ex),
bits AS (SELECT did, {_SIMHASH_BITS} FROM h GROUP BY did)
SELECT did, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM bits
"""

# ------------------------------------------------------- embeddings

_EMB_Q = """
e AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
      FROM embeddings)"""

_COS = ("CAST(floor((list_dot_product(qv, cv)/"
        "(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))))"
        "*1000000) AS BIGINT)")

# multimodal: documents.text is pure ASCII in the synthetic data
# (verified octet_length == length for every row), so byte-level Pandas
# UDF results are reproducible with DuckDB string functions.

ORACLES["docs_media_metadata"] = """
SELECT doc_id AS did,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS content_md5,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END
         AS format
FROM documents
"""

ORACLES["docs_media_features"] = """
SELECT doc_id AS did,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER)
         AS n_space,
       CAST(floor(sqrt(octet_length(encode(text)))) AS INTEGER) AS side
FROM documents
"""

ORACLES["docs_frame_sample"] = """
SELECT d.doc_id AS did, CAST(gs.i AS INTEGER) AS frame_idx,
       md5(substr(d.text, CAST(gs.i*64 + 1 AS INTEGER), 64)) AS frame_md5
FROM documents d
JOIN generate_series(0, 4096, 4) AS gs(i)
  ON gs.i <= (length(d.text) + 63) // 64 - 1
"""

ORACLES["emb_knn_bruteforce"] = f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
s AS (SELECT qid, cid, {_COS} AS cos_e6 FROM c CROSS JOIN q)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

ORACLES["emb_knn_lsh"] = f"""
WITH {_EMB_Q},
planes AS (
  SELECT p, list_transform(generate_series(0, 63),
           i -> CASE WHEN substr(md5(p || '#' || i), 1, 1) IN
                     ('8','9','a','b','c','d','e','f')
                THEN 1 ELSE -1 END) AS sv
  FROM (SELECT unnest(generate_series(0, 7)) AS p)),
bkt AS (
  SELECT e.vec_id,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.sv) > 0
                       THEN (1 << p) ELSE 0 END) AS INTEGER) AS bkt
  FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
q AS (SELECT e.vec_id AS qid, v AS qv, bkt FROM e JOIN bkt USING (vec_id)
      WHERE vec_id < 8),
c AS (SELECT e.vec_id AS cid, v AS cv, bkt FROM e JOIN bkt USING (vec_id)
      WHERE vec_id >= 8),
s AS (SELECT qid, cid, {_COS} AS cos_e6 FROM c JOIN q USING (bkt))
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""


ORACLES["emb_knn_ivf"] = f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
k AS (SELECT vec_id AS kid, v AS kv FROM e WHERE vec_id >= 8 AND vec_id < 24),
asg AS (
  SELECT cid, cv, kid FROM (
    SELECT cid, cv, kid,
           row_number() OVER (PARTITION BY cid
             ORDER BY CAST(floor((list_dot_product(cv, kv)/(sqrt(list_dot_product(cv, cv))*sqrt(list_dot_product(kv, kv))))*1000000) AS BIGINT) DESC, kid ASC) AS arn
    FROM c CROSS JOIN k)
  WHERE arn = 1),
probes AS (
  SELECT qid, qv, kid FROM (
    SELECT qid, qv, kid,
           row_number() OVER (PARTITION BY qid
             ORDER BY CAST(floor((list_dot_product(qv, kv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(kv, kv))))*1000000) AS BIGINT) DESC, kid ASC) AS prn
    FROM q CROSS JOIN k)
  WHERE prn <= 4),
s AS (SELECT qid, cid, CAST(floor((list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))))*1000000) AS BIGINT) AS cos_e6
      FROM asg JOIN probes USING (kid))
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""


# ---- the wide Valu1 assembly (valu1_wide) ----

_V1_RANGES = [(0, 20), (20, 50), (50, 100), (0, 100)]
_V1_VALUES = ",".join(f"({t},{b})" for t, b in _V1_RANGES)
_AWS_HZT = "greatest(least(hzdepb_r, rng.bot) - greatest(hzdept_r, rng.top), 0)"
_AWS_P = ",\n         ".join(
    f"MAX(CASE WHEN top={t} AND bot={b} THEN aws END) AS aws{t}_{b}"
    for t, b in _V1_RANGES
) + ",\n         " + ",\n         ".join(
    f"MAX(CASE WHEN top={t} AND bot={b} THEN tk END) AS tk{t}_{b}a"
    for t, b in _V1_RANGES
)
_SOC_P = ",\n         ".join(
    f"MAX(CASE WHEN top={t} AND bot={b} THEN soc END) AS soc{t}_{b}"
    for t, b in _V1_RANGES
)
_V1_OUT = ", ".join(
    ["s.mukey", "s.musumcpct", "s.musumcpcta", "s.musumcpcts"]
    + [f"a.aws{t}_{b}" for t, b in _V1_RANGES]
    + [f"a.tk{t}_{b}a" for t, b in _V1_RANGES]
    + [f"so.soc{t}_{b}" for t, b in _V1_RANGES]
    + ["r.rootznaws", "r.rootznemc", "r.droughty"]
    + ["n.nccpi3all", "n.nccpi3corn", "n.nccpi3soy", "n.nccpi3cot", "n.nccpi3sg"]
    + ["p.pwsl1pomu"]
)

ORACLES["valu1_wide"] = f"""
WITH {_SYN},{_SYN_QT},{_RZD},
sp AS (
  SELECT mukey, CAST(SUM(comppct_r) AS BIGINT) AS musumcpct,
         CAST(SUM(CASE WHEN {_MAJOR_EARTHY} THEN comppct_r END) AS BIGINT)
           AS musumcpcta,
         CAST(SUM(CASE WHEN majcompflag = 'Yes' THEN comppct_r END) AS BIGINT)
           AS musumcpcts
  FROM syn_co GROUP BY mukey),
aws_c AS (
  SELECT mukey, cokey, comppct_r, rng.top, rng.bot,
         SUM(CASE WHEN awc_r IS NOT NULL THEN {_AWS_HZT} * awc_r * 10.0 END)
           AS caws,
         SUM(CASE WHEN awc_r IS NOT NULL THEN {_AWS_HZT} END) AS ctk
  FROM syn_qth, (VALUES {_V1_VALUES}) AS rng(top, bot)
  GROUP BY mukey, cokey, comppct_r, rng.top, rng.bot),
aws_m AS (
  SELECT mukey, top, bot,
         CAST(floor((SUM(comppct_r*caws)
              / SUM(CASE WHEN caws IS NOT NULL THEN comppct_r END))*10000)
           AS BIGINT) AS aws,
         CAST(floor((SUM(comppct_r*ctk)
              / SUM(CASE WHEN ctk IS NOT NULL THEN comppct_r END))*10000)
           AS BIGINT) AS tk
  FROM aws_c GROUP BY mukey, top, bot),
aws_p AS (
  SELECT mukey,
         {_AWS_P}
  FROM aws_m GROUP BY mukey),
soc_hz AS (
  SELECT q.mukey, q.cokey, q.comppct_r, rng.top, rng.bot,
         q.hzdept_r, q.hzdepb_r, q.om_r, q.dbthirdbar_r, f.fragvol, r.resdept
  FROM syn_qth q
  LEFT JOIN syn_fv f ON q.chkey = f.chkey
  LEFT JOIN syn_restr r ON q.cokey = r.cokey,
  (VALUES {_V1_VALUES}) AS rng(top, bot)),
soc_c AS (
  SELECT mukey, cokey, comppct_r, top, bot,
         SUM(CASE WHEN om_r IS NOT NULL AND dbthirdbar_r IS NOT NULL THEN
               CAST(floor(
                 greatest(least(hzdepb_r, bot, coalesce(resdept, 999))
                          - greatest(hzdept_r, top), 0)
                 * ((1.0 - coalesce(fragvol, 0.0)/100.0) * 10.0
                    * (om_r/1.724) * dbthirdbar_r) * 1000) AS BIGINT)
             END) AS csoc
  FROM soc_hz GROUP BY mukey, cokey, comppct_r, top, bot),
soc_m AS (
  SELECT mukey, top, bot,
         CAST(floor(SUM(comppct_r*csoc)
                    / SUM(CASE WHEN csoc IS NOT NULL THEN comppct_r END))
              AS BIGINT) AS soc
  FROM soc_c GROUP BY mukey, top, bot),
soc_p AS (
  SELECT mukey,
         {_SOC_P}
  FROM soc_m GROUP BY mukey),
rza_c AS (
  SELECT q.mukey, q.cokey, q.comppct_r, d.rzdepth,
         SUM(CASE WHEN q.awc_r IS NOT NULL THEN
               greatest(least(q.hzdepb_r, d.rzdepth)
                        - greatest(q.hzdept_r, 0), 0) * q.awc_r * 10.0 END) AS caws
  FROM syn_qth q JOIN v_rzd d ON q.cokey = d.cokey
  WHERE {_MAJOR_EARTHY}
  GROUP BY q.mukey, q.cokey, q.comppct_r, d.rzdepth),
rz_m AS (
  SELECT mukey, rootznaws, rootznemc,
         CAST(rootznaws <= 152 AS INTEGER) AS droughty
  FROM (SELECT mukey,
               round(SUM(comppct_r*caws)
                     / SUM(CASE WHEN caws IS NOT NULL THEN comppct_r END), 0)
                 AS rootznaws,
               least(round(SUM(comppct_r*rzdepth)/SUM(comppct_r), 0), 150.0)
                 AS rootznemc
        FROM rza_c GROUP BY mukey)),
syn_ci AS (
  SELECT o_orderkey AS cokey, r.ruledepth, r.rulename,
         CAST((o_orderkey * (r.ruledepth + 2)) % 101 AS DOUBLE) AS interphr
  FROM orders,
       (VALUES (0, 'NCCPI - NCCPI'), (1, 'NCCPI - Corn Submodel'),
               (1, 'NCCPI - Soybeans Submodel')) AS r(ruledepth, rulename)),
nc AS (
  SELECT mukey,
    CAST(floor(SUM(CASE WHEN ruledepth = 0 THEN interphr*comppct_r END)
          / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
      AS nccpi3all,
    CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Corn%'
                   THEN interphr*comppct_r END)
          / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
      AS nccpi3corn,
    CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Soybean%'
                   THEN interphr*comppct_r END)
          / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
      AS nccpi3soy,
    CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Cotton%'
                   THEN interphr*comppct_r END)
          / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
      AS nccpi3cot,
    CAST(floor(SUM(CASE WHEN ruledepth = 1 AND rulename LIKE '%Small Grain%'
                   THEN interphr*comppct_r END)
          / SUM(CASE WHEN ruledepth = 0 THEN comppct_r END) * 1000) AS BIGINT)
      AS nccpi3sg
  FROM syn_co c JOIN syn_ci i ON c.cokey = i.cokey
  WHERE majcompflag = 'Yes'
  GROUP BY mukey),
pw AS (
  SELECT mukey,
         CAST(CASE WHEN water_pct >= 80 THEN 999 ELSE pwsl_pct END AS INTEGER)
           AS pwsl1pomu
  FROM (
    SELECT mukey,
      SUM(CASE WHEN compname IN ('Water','WATER','water')
                OR hydricrating = 'Yes'
                OR (hydricrating = 'Unranked' AND
                    (drainagecl IN ('Poorly drained','Very poorly drained')
                     OR lower(coalesce(localphase,'')) LIKE '%drained%'
                     OR lower(coalesce(otherph,'')) LIKE '%drained%'))
           THEN comppct_r END) AS pwsl_pct,
      SUM(CASE WHEN compname IN ('Water','WATER','water')
           THEN comppct_r END) AS water_pct
    FROM syn_co GROUP BY mukey))
SELECT {_V1_OUT}
FROM sp s
LEFT JOIN aws_p a USING (mukey)
LEFT JOIN soc_p so USING (mukey)
LEFT JOIN rz_m r USING (mukey)
LEFT JOIN nc n USING (mukey)
LEFT JOIN pw p USING (mukey)
"""


# the composed nightly run: planner-batch ratings x the wide Valu1
# table on the shared mapunit spine (the Spark side additionally
# routes the component table through the pipe-text round trip, which
# is value-preserving — certified by this join of the two stage
# oracles)
ORACLES["nightly_gssurgo"] = f"""
WITH pb AS ({ORACLES["planner_sdv_batch"]}),
vw AS ({ORACLES["valu1_wide"]})
SELECT pb.*, vw.* EXCLUDE (mukey)
FROM pb JOIN vw ON pb.mukey = vw.mukey
"""

# ---- planner horizon / month path twins ----

ORACLES["planner_sdv_hz_rating"] = f"""
WITH {_SYN},
syn_hz AS (
  SELECT l_orderkey AS cokey,
         CAST((l_linenumber-1)*15 AS BIGINT) AS hzdept_r,
         CAST((l_linenumber-1)*15 + 5 + l_partkey % 11 AS BIGINT) AS hzdepb_r,
         CAST(l_partkey % 5 AS DOUBLE) AS awc_r
  FROM lineitem),
flt AS (
  SELECT c.mukey, c.cokey, c.comppct_r, h.hzdept_r, h.hzdepb_r, h.awc_r
  FROM syn_co c JOIN syn_hz h ON c.cokey = h.cokey
  WHERE c.comppct_r IS NOT NULL
    AND (c.compname IS NULL OR c.compname <> 'NOTCOM')
    AND h.hzdept_r < 100 AND h.hzdepb_r > 0),
comp AS (
  SELECT mukey, cokey, comppct_r,
         MAX(CASE WHEN greatest(least(hzdepb_r, 100) - greatest(hzdept_r, 0), 0) > 0
                  THEN awc_r END) AS hzv
  FROM flt GROUP BY mukey, cokey, comppct_r)
SELECT mukey, CAST(SUM(comppct_r) AS BIGINT) AS comppct_r,
       SUM(comppct_r*hzv)/SUM(comppct_r) AS rating
FROM comp WHERE hzv IS NOT NULL GROUP BY mukey
"""

ORACLES["planner_sdv_rv_low_high"] = f"""
WITH {_SYN},
syn_hz AS (
  SELECT l_orderkey AS cokey,
         CAST((l_linenumber-1)*15 AS BIGINT) AS hzdept_r,
         CAST((l_linenumber-1)*15 + 5 + l_partkey % 11 AS BIGINT) AS hzdepb_r,
         CAST(floor((l_partkey % 5) / 2) AS DOUBLE) AS awc_l,
         CAST((l_partkey % 5) * 2 + 1 AS DOUBLE) AS awc_h
  FROM lineitem),
flt AS (
  SELECT c.mukey, c.cokey, c.comppct_r, h.hzdept_r, h.hzdepb_r,
         h.awc_l, h.awc_h
  FROM syn_co c JOIN syn_hz h ON c.cokey = h.cokey
  WHERE c.comppct_r IS NOT NULL
    AND (c.compname IS NULL OR c.compname <> 'NOTCOM')
    AND h.hzdept_r < 100 AND h.hzdepb_r > 0),
comp AS (
  SELECT mukey, cokey, comppct_r,
         MAX(CASE WHEN greatest(least(hzdepb_r, 100) - greatest(hzdept_r, 0), 0) > 0
                  THEN awc_l END) AS hzl,
         MAX(CASE WHEN greatest(least(hzdepb_r, 100) - greatest(hzdept_r, 0), 0) > 0
                  THEN awc_h END) AS hzh
  FROM flt GROUP BY mukey, cokey, comppct_r),
lo AS (
  SELECT mukey, SUM(comppct_r*hzl)/SUM(comppct_r) AS rating_low
  FROM comp WHERE hzl IS NOT NULL GROUP BY mukey),
hi AS (
  SELECT mukey, SUM(comppct_r*hzh)/SUM(comppct_r) AS rating_high
  FROM comp WHERE hzh IS NOT NULL GROUP BY mukey)
SELECT lo.mukey, rating_low, rating_high
FROM lo JOIN hi ON lo.mukey = hi.mukey
"""

ORACLES["valu1_nccpi2"] = f"""
WITH {_SYN},
syn_ci2 AS (
  SELECT o_orderkey AS cokey, r.ruledepth, r.rulename,
         CASE WHEN o_orderkey % 31 <> 0
              THEN CAST((o_orderkey * (r.ruledepth + 5) + 7) % 101 AS DOUBLE)
         END AS interphr
  FROM orders,
       (VALUES
         (0, 'NCCPI - National Commodity Crop Productivity Index (Ver 2.0)'),
         (1, 'NCCPI - NCCPI Corn and Soybeans Submodel (II)'),
         (1, 'NCCPI - NCCPI Cotton Submodel (II)'),
         (1, 'NCCPI - NCCPI Small Grains Submodel (II)'))
         AS r(ruledepth, rulename)),
den AS (
  SELECT mukey, SUM(comppct_r) AS sumpct
  FROM syn_co WHERE majcompflag = 'Yes' GROUP BY mukey),
num AS (
  SELECT mukey,
    SUM(CASE WHEN ruledepth = 0 THEN interphr*comppct_r END) AS n_all,
    SUM(CASE WHEN ruledepth = 1 AND rulename =
        'NCCPI - NCCPI Corn and Soybeans Submodel (II)'
        THEN interphr*comppct_r END) AS n_cs,
    SUM(CASE WHEN ruledepth = 1 AND rulename =
        'NCCPI - NCCPI Cotton Submodel (II)'
        THEN interphr*comppct_r END) AS n_co,
    SUM(CASE WHEN ruledepth = 1 AND rulename =
        'NCCPI - NCCPI Small Grains Submodel (II)'
        THEN interphr*comppct_r END) AS n_sg
  FROM syn_co c JOIN syn_ci2 i ON c.cokey = i.cokey
  WHERE majcompflag = 'Yes'
  GROUP BY mukey)
SELECT n.mukey,
       CAST(floor(n_cs / sumpct * 1000) AS BIGINT) AS nccpi2cs,
       CAST(floor(n_co / sumpct * 1000) AS BIGINT) AS nccpi2co,
       CAST(floor(n_sg / sumpct * 1000) AS BIGINT) AS nccpi2sg,
       CAST(floor(n_all / sumpct * 1000) AS BIGINT) AS nccpi2all
FROM num n JOIN den d ON n.mukey = d.mukey
"""

ORACLES["planner_sdv_month_rating"] = f"""
WITH {_BASE},
mc AS (
  SELECT okey AS mukey, member AS cokey, comppct_r, MIN(rflag) AS v
  FROM base
  WHERE monthseq BETWEEN 3 AND 9 AND comppct_r IS NOT NULL
  GROUP BY okey, member, comppct_r)
SELECT mukey, comppct_r, v AS rating
FROM (SELECT *, row_number() OVER (
        PARTITION BY mukey
        ORDER BY comppct_r DESC,
                 CASE upper(trim(v)) WHEN 'R' THEN 1 WHEN 'A' THEN 2
                      WHEN 'N' THEN 3 ELSE 4 END ASC,
                 cokey ASC) AS rn
      FROM mc)
WHERE rn = 1
"""


ORACLES["emb_cosine_dups"] = f"""
WITH {_EMB_Q},
planes AS (
  SELECT p, list_transform(generate_series(0, 63),
           i -> CASE WHEN substr(md5(p || '#' || i), 1, 1) IN
                     ('8','9','a','b','c','d','e','f')
                THEN 1 ELSE -1 END) AS sv
  FROM (SELECT unnest(generate_series(0, 47)) AS p)),
bkt AS (
  SELECT e.vec_id, CAST(p // 8 AS INTEGER) AS band_id,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.sv) > 0
                       THEN (1 << (p % 8)) ELSE 0 END) AS BIGINT) AS key
  FROM e CROSS JOIN planes pl GROUP BY e.vec_id, p // 8),
cand AS (
  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
  FROM bkt a JOIN bkt b
    ON a.band_id = b.band_id AND a.key = b.key AND a.vec_id < b.vec_id),
vv AS (SELECT vec_id AS did, v FROM e)
SELECT c.i, c.j,
       CAST(floor((list_dot_product(a.v, b.v)/
            (sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v))))
            *1000000) AS BIGINT) AS cos_e6
FROM cand c JOIN vv a ON a.did = c.i JOIN vv b ON b.did = c.j
WHERE (list_dot_product(a.v, b.v)/
       (sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v))))
      *1000000 >= 300000
"""


ORACLES["emb_dup_groups"] = f"""
WITH RECURSIVE
pairs AS ({ORACLES["emb_cosine_dups"]}),
edges AS (SELECT i AS a, j AS b FROM pairs
          UNION ALL SELECT j, i FROM pairs),
reach(src, dst) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS vec_id, MIN(dst) AS group_rep,
       CAST(CASE WHEN src = MIN(dst) THEN 1 ELSE 0 END AS INTEGER) AS is_rep
FROM reach GROUP BY src
"""

ORACLES["merge_rating_tables_tool"] = f"""
SELECT b.okey,
       d.comppct_r AS dcp_comppct_r, d.rating AS dcp_rating,
       w.comppct_r AS wta_comppct_r, w.rating_e4 AS wta_rating_e4,
       p.rating AS pp_rating
FROM (SELECT DISTINCT o_orderkey AS okey FROM orders) b
LEFT JOIN ({ORACLES["sdv_dcp_categorical"]}) d ON b.okey = d.okey
LEFT JOIN ({ORACLES["sdv_wta"]}) w ON b.okey = w.okey
LEFT JOIN ({ORACLES["sdv_pp_sum"]}) p ON b.okey = p.okey
"""


ORACLES["events_sliding_window"] = """
SELECT (epoch_us(ts) // 86400000000) + gs.i AS win_end_day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
FROM events JOIN generate_series(0, 6) AS gs(i) ON TRUE
GROUP BY 1, 2
"""


ORACLES["events_stream_sliding"] = ORACLES["events_sliding_window"]


ORACLES["docs_clean_corpus"] = f"""
WITH d AS ({_DOCS_T}),
q AS (SELECT doc_id FROM d WHERE len(t) >= 20),
la AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           CASE WHEN s_de = b THEN 'de' WHEN s_en = b THEN 'en'
                WHEN s_es = b THEN 'es' WHEN s_fr = b THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS b FROM (
      SELECT doc_id,
        len(list_filter(t, w -> w IN ('hash','sort','value'))) AS s_de,
        len(list_filter(t, w -> w IN ('the','a','data','order'))) AS s_en,
        len(list_filter(t, w -> w IN ('query','row','table'))) AS s_es,
        len(list_filter(t, w -> w IN ('group','line','vector'))) AS s_fr,
        len(list_filter(t, w -> w IN ('spark','big','dup'))) AS s_zh
      FROM d)))
  WHERE lang_pred = 'en'),
ke AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
nj AS (SELECT DISTINCT j AS doc_id FROM ({ORACLES["docs_ngram_jaccard"]}))
SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
       substr(md5(text), 1, 15) AS fp
FROM documents JOIN d USING (doc_id)
WHERE doc_id IN (SELECT doc_id FROM q)
  AND doc_id IN (SELECT doc_id FROM la)
  AND doc_id IN (SELECT doc_id FROM ke)
  AND doc_id NOT IN (SELECT doc_id FROM nj)
"""


ORACLES["planner_sdv_interp"] = f"""
WITH {_SYN},
ci0 AS (SELECT o_orderkey AS cokey,
               CAST((o_orderkey * 2) % 101 AS DOUBLE) AS interphr
        FROM orders)
SELECT c.mukey, CAST(SUM(c.comppct_r) AS BIGINT) AS comppct_r,
       CAST(floor((SUM(c.comppct_r*i.interphr)/SUM(c.comppct_r))*10000)
            AS BIGINT) AS rating_e4
FROM syn_co c JOIN ci0 i ON c.cokey = i.cokey
WHERE c.comppct_r IS NOT NULL
  AND (c.compname IS NULL OR c.compname <> 'NOTCOM')
GROUP BY c.mukey
"""

ORACLES["validate_component_pct"] = f"""
WITH {_SYN}
SELECT mukey, CAST(SUM(comppct_r) AS BIGINT) AS sum_pct,
       COUNT(*) AS n_comp,
       CAST(SUM(comppct_r) <> 100 AS INTEGER) AS flag_pct,
       CAST(SUM(CASE WHEN majcompflag = 'Yes' THEN 1 ELSE 0 END) = 0
            AS INTEGER) AS flag_no_major
FROM syn_co GROUP BY mukey
"""


ORACLES["planner_sdv_mapunit"] = """
SELECT DISTINCT c_custkey AS mukey,
       CAST(c_custkey % 200 AS DOUBLE) AS aws025
FROM customer
"""

ORACLES["planner_sdv_no_agg"] = f"""
WITH {_SYN}
SELECT mukey, cokey, comppct_r, drainagecl AS rating
FROM syn_co
WHERE comppct_r IS NOT NULL
  AND (compname IS NULL OR compname <> 'NOTCOM')
"""


_IRANK = """CASE WHEN interp IS NULL THEN 0
     WHEN upper(trim(interp)) = 'NOT RATED' THEN 1
     WHEN upper(trim(interp)) = 'SLIGHT' THEN 2
     WHEN upper(trim(interp)) = 'MODERATE' THEN 3
     WHEN upper(trim(interp)) = 'SEVERE' THEN 4 ELSE 5 END"""

ORACLES["sdv_interp_dcd_not_rated"] = f"""
WITH ib AS (
  SELECT l_orderkey AS okey, l_linenumber AS member,
         CAST(l_quantity AS BIGINT) AS comppct_r,
         CASE WHEN l_partkey % 13 = 0 THEN NULL
              WHEN l_partkey % 7 = 0 THEN 'Not rated'
              WHEN l_returnflag = 'R' THEN 'Severe'
              WHEN l_returnflag = 'A' THEN 'Moderate'
              ELSE 'Slight' END AS interp
  FROM lineitem),
br AS (
  SELECT okey, interp, SUM(comppct_r) AS sw, MIN(member) AS mm,
         MAX(comppct_r) AS mw,
         MIN(CASE WHEN comppct_r = mwr THEN member END) AS mmd
  FROM (SELECT *, MAX(comppct_r) OVER (PARTITION BY okey, interp) AS mwr
        FROM ib)
  GROUP BY okey, interp),
tt AS (
  SELECT okey, interp, sw, mm, mw,
         SUM(sw) OVER (PARTITION BY okey) AS tw,
         row_number() OVER (
           PARTITION BY okey
           ORDER BY sw DESC, {_IRANK} DESC, mm ASC) AS rn,
         row_number() OVER (
           PARTITION BY okey
           ORDER BY mw DESC, {_IRANK} DESC, mmd ASC) AS rn_dcp
  FROM br)
SELECT d.okey,
       CAST((200*d.sw + d.tw) // (2*d.tw) AS INTEGER) AS comppct_r,
       CASE WHEN p.mw >= 50 THEN p.interp ELSE d.interp END AS rating
FROM (SELECT * FROM tt WHERE rn = 1) d
JOIN (SELECT * FROM tt WHERE rn_dcp = 1) p USING (okey)
"""


ORACLES["legend_unique_values"] = f"""
SELECT rating AS value, COUNT(*) AS n
FROM ({ORACLES["sdv_dcp_categorical"]})
GROUP BY rating
"""


# ------------------------------------------- round-3 breadth batch

_TTR = """
SELECT doc_id, CAST(floor((len(list_distinct(t))/len(t))*10000) AS BIGINT)
       AS ttr_e4
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""

ORACLES["docs_dedup_keep_best"] = f"""
WITH g AS ({ORACLES["docs_dup_groups"]}),
q AS ({_TTR}),
j AS (SELECT g.group_rep, g.doc_id, q.ttr_e4 AS score
      FROM g JOIN q USING (doc_id))
SELECT group_rep, keep_id, best_score, n_members FROM (
  SELECT group_rep, doc_id AS keep_id, score AS best_score,
         row_number() OVER (PARTITION BY group_rep
                            ORDER BY score DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY group_rep) AS n_members
  FROM j)
WHERE rn = 1
"""

ORACLES["docs_quality_buckets"] = f"""
WITH q AS ({_TTR}),
j AS (SELECT d.doc_id, d.lang, q.ttr_e4
      FROM documents d JOIN q USING (doc_id))
SELECT doc_id, lang, ttr_e4, CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket
FROM (SELECT *,
             row_number() OVER (PARTITION BY lang
                                ORDER BY ttr_e4 ASC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM j)
"""

ORACLES["emb_norm_stats"] = """
WITH n AS (
  SELECT label,
         CAST(list_aggregate(
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) *
                  CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
           'sum') AS BIGINT) AS n2
  FROM embeddings)
SELECT label, COUNT(*) AS n_vecs, MIN(n2) AS min_n2, MAX(n2) AS max_n2,
       CAST(SUM(n2) AS BIGINT) AS sum_n2
FROM n GROUP BY label
"""

ORACLES["emb_drift"] = """
WITH comp AS (
  SELECT vec_id % 2 = 1 AS is_new, d.i AS dim,
         CAST(floor(CAST(embedding[d.i + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS v
  FROM embeddings, (SELECT unnest(range(64)) AS i) d),
agg AS (
  SELECT dim,
         CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS n_old,
         CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN NOT is_new THEN v END) AS BIGINT) AS sum_old_e6,
         CAST(SUM(CASE WHEN is_new THEN v END) AS BIGINT) AS sum_new_e6
  FROM comp GROUP BY dim),
d2 AS (
  SELECT *, sum_new_e6 * n_old - sum_old_e6 * n_new AS delta_xn FROM agg)
SELECT CAST(dim AS BIGINT) AS dim, n_old, n_new, sum_old_e6, sum_new_e6,
       CAST(delta_xn AS BIGINT) AS delta_xn,
       CAST(ROW_NUMBER() OVER (ORDER BY abs(delta_xn) DESC, dim)
            AS BIGINT) AS drift_rank
FROM d2
"""

ORACLES["events_pivot_daily"] = """
SELECT epoch_us(ts) // 86400000000 AS day_num,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS n_click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0)
            AS BIGINT) AS n_error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
            AS BIGINT) AS n_purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0)
            AS BIGINT) AS n_signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)
            AS BIGINT) AS n_view
FROM events GROUP BY 1
"""

ORACLES["events_type_rollup"] = """
SELECT event_type, day_num,
       CAST(GROUPING(event_type) * 2 + GROUPING(day_num) AS INTEGER) AS gid,
       COUNT(*) AS n,
       CAST(SUM(vc) AS BIGINT) AS value_c
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events)
GROUP BY ROLLUP(event_type, day_num)
"""

# >= gap (not the batch form's strict >): F.session_window's
# [t, t+gap) windows do not overlap when the gap is exactly met
ORACLES["events_stream_session_window"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT *, lag(ts_us) OVER (
        PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS prev
      FROM e)
SELECT user_id,
       CAST(COALESCE(SUM(CAST(ts_us - prev >= 1800000000 AS INTEGER)), 0) + 1
            AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM l GROUP BY user_id
"""

ORACLES["q13_customer_distribution"] = """
WITH o AS (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'),
pc AS (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
       FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
       GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist FROM pc GROUP BY c_count
"""

ORACLES["q22_sales_opportunity"] = """
WITH pool AS (SELECT * FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
a AS (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
             COUNT(*) AS k
      FROM pool WHERE c_acctbal > 0)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_c
FROM pool, a
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * a.k > a.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# ------------------------------------------- round-3 batch 2

ORACLES["docs_gopher_rules"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                  length(text) AS nc FROM documents),
f AS (SELECT doc_id,
             len(w) AS n,
             nc - (len(w) - 1) AS chars,
             len(list_distinct(w)) AS nd,
             len(list_intersect(list_distinct(w),
                 ['the', 'a', 'and', 'of', 'to', 'in'])) AS ns
      FROM t)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_tokens,
       CAST(n >= 20 AND n <= 80 AS INTEGER) AS r_wordcount,
       CAST(chars >= n * 4 AND chars <= n * 5 AS INTEGER)
         AS r_mean_word_len,
       CAST(ns >= 2 AS INTEGER) AS r_stopwords,
       CAST(nd * 20 >= n * 7 AS INTEGER) AS r_ttr,
       CAST((n >= 20 AND n <= 80) AND (chars >= n * 4 AND chars <= n * 5)
            AND ns >= 2 AND nd * 20 >= n * 7 AS INTEGER) AS keep
FROM f
"""

ORACLES["docs_repetition"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM t),
per AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       SUM(c) AS n_grams,
       MAX(c) AS top_gram_n,
       COUNT(*) AS n_distinct_grams,
       (MAX(c) * 10000) // SUM(c) AS top_frac_e4
FROM per GROUP BY doc_id
"""

ORACLES["events_funnel"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
a AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
        OVER (PARTITION BY user_id) AS t1 FROM e),
b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1
        AND ts_us <= t1 + 86400000000
        THEN ts_us END) OVER (PARTITION BY user_id) AS t2 FROM a),
c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
        AND ts_us <= t2 + 86400000000
        THEN ts_us END) OVER (PARTITION BY user_id) AS t3 FROM b),
u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM c)
SELECT COUNT(*) AS n_users, COUNT(t1) AS n_view,
       COUNT(t2) AS n_click, COUNT(t3) AS n_purchase
FROM u
"""

ORACLES["events_hll_registers"] = """
WITH h AS (SELECT DISTINCT
             ((user_id * 48271) % 2147483647) * 48271 % 2147483647 AS h2
           FROM events),
r AS (SELECT h2 % 64 AS bucket, h2 // 64 AS q FROM h)
SELECT bucket,
       MAX(CASE WHEN q = 0 THEN 26
                ELSE bit_count((q & -q) - 1) + 1 END) AS max_rho,
       COUNT(*) AS n_hashes
FROM r GROUP BY bucket
"""

ORACLES["q7_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c2
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1997-01-01'
  AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
       OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
GROUP BY 1, 2, 3
"""

ORACLES["q10_returned_items"] = """
WITH per_c AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_c2
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-04-01'
  GROUP BY o.o_custkey)
SELECT c.c_custkey, c.c_name, p.revenue_c2,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
       n.n_name
FROM per_c p
JOIN customer c ON p.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY p.revenue_c2 DESC, c.c_custkey ASC
LIMIT 20
"""

ORACLES["q12_late_lines"] = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1996-01-01'
GROUP BY 1
"""

ORACLES["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS total_revenue_c2
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue_c2
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue_c2 = (SELECT MAX(total_revenue_c2) FROM rev)
"""

ORACLES["q17_small_quantity"] = """
WITH li AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#1'),
stats AS (SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_lines
          FROM li GROUP BY l_partkey),
q AS (SELECT li.l_extendedprice
      FROM li JOIN stats USING (l_partkey)
      WHERE li.qty * 5 * stats.n_lines < stats.sum_qty)
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_c,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT)
         AS avg_yearly_c
FROM q
"""

ORACLES["q21_waiting_suppliers"] = """
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'),
l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s.s_suppkey, s.s_name
"""


ORACLES["docs_dup_spans"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 3),
                    i -> list_aggregate(w[i:i + 4], 'string_agg', ' ')))
               AS gram
      FROM t),
pop AS (SELECT gram, CAST(MIN(doc_id) <> MAX(doc_id) AS INTEGER) AS dup
        FROM g GROUP BY gram),
j AS (SELECT g.doc_id, pop.dup FROM g JOIN pop USING (gram))
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(dup) AS BIGINT) AS n_dup_spans,
       (SUM(dup) * 10000) // COUNT(*) AS dup_frac_e4
FROM j GROUP BY doc_id
"""


# streaming funnel ≡ batch funnel (same counts row)
ORACLES["events_stream_funnel"] = ORACLES["events_funnel"]


# --- TPC-H completion batch (partsupp-adapted; see queries.py) ---

ORACLES["q2_min_cost_supplier"] = """
WITH supp AS (
  SELECT s_suppkey, s_name, n_name,
         CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_c
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
offers AS (
  SELECT l.l_partkey AS p_partkey, s.s_suppkey, s.s_name, s.n_name,
         s.s_acctbal_c,
         MIN(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS cost_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supp s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
  GROUP BY 1,2,3,4,5),
best AS (
  SELECT p_partkey AS bp, MIN(cost_c) AS min_cost_c
  FROM offers GROUP BY 1)
SELECT o.s_acctbal_c, o.s_name, o.n_name, o.p_partkey, b.min_cost_c
FROM offers o
JOIN best b ON o.p_partkey = b.bp AND o.cost_c = b.min_cost_c
ORDER BY o.s_acctbal_c DESC, o.n_name, o.s_name, o.p_partkey
LIMIT 100
"""

ORACLES["q8_market_share"] = """
WITH v AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0 END)
            AS BIGINT) AS nation_vol_c2,
       CAST(SUM(vol) AS BIGINT) AS total_vol_c2,
       CAST(floor(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0 END)
            * 10000 / SUM(vol)) AS BIGINT) AS mkt_share_e4
FROM v GROUP BY o_year
"""

ORACLES["q9_product_profit"] = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l.l_discount*100) AS BIGINT))
            - CAST(round(p.p_retailprice*100) AS BIGINT)
              * CAST(l.l_quantity AS BIGINT) * 100) AS BIGINT)
         AS sum_profit_c2
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE 'red %'
GROUP BY 1, 2
"""

ORACLES["q11_important_stock"] = """
WITH v AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS value_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1)
SELECT l_partkey, value_c
FROM v, (SELECT SUM(value_c) AS total_c FROM v) t
WHERE value_c * 1000 > total_c
"""

ORACLES["q16_supplier_cnt"] = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

ORACLES["q19_discounted_revenue"] = """
SELECT CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

ORACLES["q20_potential_promotion"] = """
WITH pairs AS (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'hot %'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(CASE WHEN year(l.l_shipdate) = 1996
                  THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) * 4
         > SUM(CAST(l.l_quantity AS BIGINT)) * 3),
qual AS (
  SELECT l_suppkey FROM pairs GROUP BY 1 HAVING COUNT(*) >= 10)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
"""


# ------------------------------------------------- round 4 additions

ORACLES["legend_color_ramp"] = """
WITH nn AS (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n
            FROM orders),
ctrl AS (SELECT * FROM (VALUES (0,255,0,0),(1,255,255,0),(2,0,255,0),
                               (3,0,255,255),(4,0,0,255)) t(ci,r,g,b)),
pairs AS (
  SELECT a.ci AS p, a.r sr, a.g sg, a.b sb, f.r fr, f.g fg, f.b fb
  FROM ctrl a JOIN ctrl f ON f.ci = a.ci + 1),
pts AS (
  SELECT p, gs.j, CAST(gs.j AS DOUBLE) / (nn.n - 1) AS t, nn.n,
         sr, sg, sb, fr, fg, fb
  FROM pairs, nn, unnest(generate_series(0, nn.n - 1)) gs(j)),
colors AS (
  SELECT p * n + j AS pos,
         CAST(floor((1.0 - t) * sr) + floor(t * fr) AS BIGINT) AS r,
         CAST(floor((1.0 - t) * sg) + floor(t * fg) AS BIGINT) AS g,
         CAST(floor((1.0 - t) * sb) + floor(t * fb) AS BIGINT) AS b,
         n
  FROM pts),
lagd AS (
  SELECT *, lag(r) OVER (ORDER BY pos) pr, lag(g) OVER (ORDER BY pos) pg,
         lag(b) OVER (ORDER BY pos) pb
  FROM colors),
master AS (
  SELECT row_number() OVER (ORDER BY pos) - 1 AS i, r, g, b, n
  FROM lagd
  WHERE pr IS NULL OR r <> pr OR g <> pg OR b <> pb),
sized AS (
  SELECT *, MAX(i) OVER () + 1 AS m FROM master),
kept AS (
  SELECT *,
     CAST(round((m - n) / CAST(n - 1 AS DOUBLE)) AS BIGINT) AS skip
  FROM sized)
SELECT CAST(row_number() OVER (ORDER BY i) AS BIGINT) AS class_idx,
       r, g, b,
       '#' || printf('%02x%02x%02x', r, g, b) AS hex
FROM kept WHERE i % (skip + 1) = 0
"""

ORACLES["report_number_format"] = """
WITH agg AS (
  SELECT o_orderpriority AS rating, COUNT(*) AS n,
         SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS total_c
  FROM orders GROUP BY 1)
SELECT rating,
       format('{:,}', CAST(n AS BIGINT)) AS n_fmt,
       format('{:,}', CAST(total_c // 100 AS BIGINT)) || '.' ||
         lpad(CAST(total_c % 100 AS VARCHAR), 2, '0') AS total_fmt
FROM agg
"""

ORACLES["map_offset_angle"] = """
WITH pt AS (
  SELECT c_custkey AS okey,
         CAST(c_custkey % 50 AS DOUBLE) AS bx,
         CAST(c_custkey % 30 AS DOUBLE) AS by,
         CAST(c_custkey % 50 AS DOUBLE) + CAST(1 + c_custkey % 13 AS DOUBLE) AS ax,
         CAST(c_custkey % 30 AS DOUBLE) + CAST(2 + c_custkey % 7 AS DOUBLE) AS ay,
         CAST(c_custkey % 50 AS DOUBLE) + CAST(3 + c_custkey % 11 AS DOUBLE) AS cx,
         CAST(c_custkey % 30 AS DOUBLE) - CAST(1 + c_custkey % 5 AS DOUBLE) AS cy
  FROM customer),
ang AS (
  SELECT okey, ax, ay, bx, by,
    CAST(round(sign(cx - ax) * (-1.0 *
      round(degrees(acos(
        LEAST(GREATEST(
          ((ax-bx)*(cx-bx) + (ay-by)*(cy-by)) /
          (sqrt((ax-bx)*(ax-bx) + (ay-by)*(ay-by)) *
           sqrt((cx-bx)*(cx-bx) + (cy-by)*(cy-by))),
        -1.0), 1.0))), 1)) * 10) AS BIGINT) AS angle_d10
  FROM pt)
SELECT okey, angle_d10,
  CAST(round((bx + cos(radians(CAST(angle_d10 AS DOUBLE)/10.0))*(ax-bx)
                 - sin(radians(CAST(angle_d10 AS DOUBLE)/10.0))*(ay-by))
             * 10000) AS BIGINT) AS rx_e4,
  CAST(round((by + sin(radians(CAST(angle_d10 AS DOUBLE)/10.0))*(ax-bx)
                 + cos(radians(CAST(angle_d10 AS DOUBLE)/10.0))*(ay-by))
             * 10000) AS BIGINT) AS ry_e4
FROM ang
"""

ORACLES["events_asof_attribution"] = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('click', 'purchase')),
m AS (
  SELECT *,
    last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS) OVER w AS lc_id,
    last_value(CASE WHEN event_type = 'click' THEN ts_us END
               IGNORE NULLS) OVER w AS lc_ts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id AS purchase_id,
       CASE WHEN ts_us - lc_ts <= 3600000000 THEN lc_id END AS click_id,
       CASE WHEN ts_us - lc_ts <= 3600000000 THEN ts_us - lc_ts END AS gap_us
FROM m WHERE event_type = 'purchase'
"""

ORACLES["emb_knn_cluster"] = f"""
WITH {_EMB_Q},
el AS (SELECT e.vec_id, emb.label, e.v
       FROM e JOIN embeddings emb USING (vec_id)),
q AS (SELECT vec_id AS qid, label, v AS qv FROM el WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, label, v AS cv FROM el WHERE vec_id >= 8),
s AS (SELECT qid, cid, {_COS} AS cos_e6 FROM c JOIN q USING (label))
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

ORACLES["emb_cluster_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({ORACLES["emb_knn_cluster"]}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

ORACLES["emb_semdedup"] = """
WITH e AS (
  SELECT vec_id AS vid, label AS cl,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
  FROM embeddings),
n2 AS (
  SELECT vid, cl, v, list_dot_product(v, v) AS n2 FROM e),
dropped AS (
  SELECT DISTINCT b.cl, b.vid
  FROM n2 a JOIN n2 b ON a.cl = b.cl AND a.vid < b.vid
  WHERE list_dot_product(a.v, b.v) > 0
    AND list_dot_product(a.v, b.v) * list_dot_product(a.v, b.v) * 10000
        > 900 * a.n2 * b.n2),
kept AS (
  SELECT e.cl, COUNT(*) AS n_kept
  FROM n2 e LEFT JOIN dropped d ON e.cl = d.cl AND e.vid = d.vid
  WHERE d.vid IS NULL GROUP BY e.cl)
SELECT e.cl AS label, COUNT(*) AS n_vecs, k.n_kept,
       COUNT(*) - k.n_kept AS n_dropped
FROM n2 e JOIN kept k ON e.cl = k.cl
GROUP BY e.cl, k.n_kept
"""

ORACLES["report_pagination"] = """
WITH rows_ AS (
  SELECT o_orderkey AS okey,
         CAST(round(o_totalprice*100) AS BIGINT) AS c,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders)
SELECT (rn - 1) // 50 + 1 AS page, COUNT(*) AS n_lines,
       MIN(okey) AS first_okey, MAX(okey) AS last_okey,
       SUM(c) AS page_total_c
FROM rows_ GROUP BY 1
"""

# Bloom pre-prune changes the plan, not the result
ORACLES["docs_decontaminate_bloom"] = ORACLES["docs_decontaminate"]

ORACLES["state_survey_partition"] = """
SELECT n.n_name AS areaname, COUNT(*) AS n_surveys,
       MIN('AS' || lpad(CAST(c.c_custkey AS VARCHAR), 6, '0'))
         AS first_areasymbol,
       MAX('AS' || lpad(CAST(c.c_custkey AS VARCHAR), 6, '0'))
         AS last_areasymbol
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

ORACLES["emb_hard_negatives"] = f"""
WITH {_EMB_Q},
el AS (SELECT e.vec_id, emb.label, e.v
       FROM e JOIN embeddings emb USING (vec_id)),
q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM el WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, label AS clabel, v AS cv FROM el WHERE vec_id >= 8),
s AS (SELECT qid, cid, {_COS} AS cos_e6
      FROM c JOIN q ON c.clabel <> q.qlabel)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

# left fold over the SORTED count list reproduces Spark's
# F.aggregate(0.0, acc - (c/n)*log2(c/n)) double-for-double:
# 0.0 - t1 == -t1 exactly, then the same ordered subtraction chain.
ORACLES["docs_char_entropy"] = """
WITH chars AS (
  SELECT doc_id AS did, unnest(regexp_extract_all(text, '.', 0, 's')) AS ch
  FROM documents),
counts AS (
  SELECT did, ch, COUNT(*) AS c FROM chars GROUP BY did, ch),
per_doc AS (
  SELECT did, list(c ORDER BY c) AS cs, SUM(c) AS n
  FROM counts GROUP BY did)
SELECT did, CAST(n AS BIGINT) AS n_chars_counted,
  CAST(floor(list_reduce(
    list_transform(cs,
      c -> -(CAST(c AS DOUBLE)/n) * log2(CAST(c AS DOUBLE)/n)),
    (a, b) -> a + b) * 1000000) AS BIGINT) AS entropy_e6
FROM per_doc
"""

ORACLES["docs_pii_scrub"] = """
WITH planted AS (
  SELECT doc_id AS did,
         text ||
         CASE WHEN doc_id % 13 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 17 = 0
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
              ELSE '' END AS text
  FROM documents)
SELECT did,
  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS INTEGER)
    AS n_emails,
  CAST(len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+'))
    AS INTEGER) AS n_ips,
  md5(regexp_replace(
        regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g')) AS scrubbed_md5
FROM planted
"""

ORACLES["events_volume_anomaly"] = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num, COUNT(*) AS x
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS s2
  FROM daily GROUP BY 1)
SELECT d.event_type, d.day_num, d.x,
       CAST(CASE WHEN (n*x - s)*(n*x - s) > 4*(n*s2 - s*s)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM daily d JOIN stats USING (event_type)
"""

ORACLES["events_cogroup_profile"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type
  FROM events WHERE event_type IN ('click', 'purchase')),
c AS (SELECT user_id, ts_us FROM ev WHERE event_type = 'click'),
p AS (SELECT user_id, ts_us FROM ev WHERE event_type = 'purchase'),
keys AS (SELECT DISTINCT user_id FROM ev),
nc AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY 1),
np AS (SELECT user_id, COUNT(*) AS n_purchases FROM p GROUP BY 1),
na AS (
  SELECT p.user_id, COUNT(*) AS n_attributed
  FROM p
  WHERE EXISTS (SELECT 1 FROM c
                WHERE c.user_id = p.user_id
                  AND c.ts_us <= p.ts_us
                  AND c.ts_us >= p.ts_us - 3600000000)
  GROUP BY 1)
SELECT k.user_id,
       COALESCE(nc.n_clicks, 0) AS n_clicks,
       COALESCE(np.n_purchases, 0) AS n_purchases,
       COALESCE(na.n_attributed, 0) AS n_attributed
FROM keys k
LEFT JOIN nc ON k.user_id = nc.user_id
LEFT JOIN np ON k.user_id = np.user_id
LEFT JOIN na ON k.user_id = na.user_id
"""

# truth derived from the rectangle bounds, NOT by re-running the
# ray cast — an independent certification of the WKT parse + crossing
ORACLES["clip_select_by_location"] = """
SELECT c_custkey AS okey,
       (c_custkey % 100) * 2 + (c_custkey % 23) * 2 - 9 AS px,
       (c_custkey % 57) * 2 + (c_custkey % 19) * 2 - 7 AS py,
       CAST(CASE WHEN (c_custkey % 23) * 2 - 9 > 0
                  AND (c_custkey % 23) * 2 - 9 < (c_custkey % 13 + 1) * 2
                  AND (c_custkey % 19) * 2 - 7 > 0
                  AND (c_custkey % 19) * 2 - 7 < (c_custkey % 7 + 1) * 2
            THEN 1 ELSE 0 END AS INTEGER) AS inside
FROM customer
"""

# round 10: intersection-clip truth derived from CLOSED FORMS — the
# rect∩rect overlap product and the corner inclusion–exclusion identity
# area{{x+y>=c in [a,b]x[p,q]}} = [f(b+q-c) - f(a+q-c) - f(b+p-c)
# + f(a+p-c)]/2 with f(u)=max(0,u)^2 — never a vertex clip, so the
# Spark side's Sutherland–Hodgman + shoelace is certified end-to-end
ORACLES["clip_polygon_intersect"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS s, c_custkey % 7 + 1 AS h,
         (c_custkey % 3 = 0) AS tri,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer),
d AS (
  SELECT okey, tri, s, h, ax0, ay0, ax1, ay1, x0, y0,
         x0 + s AS x1,
         CASE WHEN tri THEN y0 + s ELSE y0 + h END AS y1,
         x0 + y0 + s AS c,
         GREATEST(x0, ax0) AS a, GREATEST(y0, ay0) AS p
  FROM g)
SELECT okey,
       CAST(CASE WHEN tri THEN s * s ELSE 2 * s * h END AS BIGINT)
         AS poly_a2x,
       CAST(2 * (ax1 - ax0) * (ay1 - ay0) AS BIGINT) AS aoi_a2x,
       CAST(CASE
         WHEN NOT tri THEN
           2 * GREATEST(0, LEAST(x1, ax1) - GREATEST(x0, ax0))
             * GREATEST(0, LEAST(y1, ay1) - GREATEST(y0, ay0))
         WHEN a >= ax1 OR p >= ay1 THEN 0
         ELSE 2 * (ax1 - a) * (ay1 - p)
              - (GREATEST(0, ax1 + ay1 - c) * GREATEST(0, ax1 + ay1 - c)
                 - GREATEST(0, a + ay1 - c) * GREATEST(0, a + ay1 - c)
                 - GREATEST(0, ax1 + p - c) * GREATEST(0, ax1 + p - c)
                 + GREATEST(0, a + p - c) * GREATEST(0, a + p - c))
       END AS BIGINT) AS clip_a2x
FROM d
"""

# round 10: holes clip — pure closed form: overlap(ext, AOI) minus
# overlap(hole, AOI); hole geometry mirrored from the synthesis
ORACLES["clip_polygon_holes"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer)
SELECT okey,
       CAST(2 * w * h
            - CASE WHEN has_hole THEN 2 * hw * hh ELSE 0 END AS BIGINT)
         AS poly_a2x,
       CAST(2 * GREATEST(0, LEAST(x0 + w, ax1) - GREATEST(x0, ax0))
              * GREATEST(0, LEAST(y0 + h, ay1) - GREATEST(y0, ay0))
            - CASE WHEN has_hole THEN
                2 * GREATEST(0, LEAST(x0 + 1 + hw, ax1) - GREATEST(x0 + 1, ax0))
                  * GREATEST(0, LEAST(y0 + 1 + hh, ay1) - GREATEST(y0 + 1, ay0))
              ELSE 0 END
          AS BIGINT) AS clip_a2x
FROM g
"""

# round 10: hole-aware containment — truth from the rectangle bounds
# (inside exterior AND NOT inside hole), never a ray cast
ORACLES["clip_select_with_holes"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 2) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 2) * 2 AS y1,
         (c_custkey % 100) * 2 + 2 AS hx0, (c_custkey % 57) * 2 + 2 AS hy0,
         LEAST((c_custkey % 100) * 2 + 2 + (c_custkey % 3 + 1) * 2,
               (c_custkey % 100) * 2 + (c_custkey % 13 + 2) * 2) AS hx1,
         (c_custkey % 57) * 2 + 4 AS hy1,
         (c_custkey % 100) * 2 + (c_custkey % 23) * 2 - 9 AS px,
         (c_custkey % 57) * 2 + (c_custkey % 19) * 2 - 7 AS py
  FROM customer)
SELECT okey, px, py,
       CAST(CASE WHEN px > x0 AND px < x1 AND py > y0 AND py < y1
                  AND NOT (px > hx0 AND px < hx1 AND py > hy0 AND py < hy1)
            THEN 1 ELSE 0 END AS INTEGER) AS inside
FROM g
"""

# round 10: multipolygon clip — closed-form overlap sums over the
# parts (plain-POLYGON rows have no part 2)
ORACLES["clip_multipolygon"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 4 + 1 AS pw, c_custkey % 3 + 1 AS ph,
         (c_custkey % 3 = 0) AS plain,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 29 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer)
SELECT okey,
       CAST(2 * GREATEST(0, LEAST(x0 + w, ax1) - GREATEST(x0, ax0))
              * GREATEST(0, LEAST(y0 + h, ay1) - GREATEST(y0, ay0))
            - CASE WHEN has_hole THEN
                2 * GREATEST(0, LEAST(x0 + 1 + hw, ax1) - GREATEST(x0 + 1, ax0))
                  * GREATEST(0, LEAST(y0 + 1 + hh, ay1) - GREATEST(y0 + 1, ay0))
              ELSE 0 END
            + CASE WHEN plain THEN 0 ELSE
                2 * GREATEST(0, LEAST(x0 + 20 + pw, ax1) - GREATEST(x0 + 20, ax0))
                  * GREATEST(0, LEAST(y0 + ph, ay1) - GREATEST(y0, ay0))
              END
          AS BIGINT) AS clip_a2x
FROM g
"""

# round 10: clipped-GEOMETRY oracle — constructs the overlap
# rectangle's canonical WKT (CCW from the lexicographic-min vertex)
# straight from the closed form; string equality certifies the
# clipped vertex set, not just its area
ORACLES["clip_polygon_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 100 + c_custkey % 13 + 1 AS x1,
         c_custkey % 57 + c_custkey % 7 + 1 AS y1,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer),
o AS (
  SELECT okey,
         GREATEST(x0, ax0) AS a, LEAST(x1, ax1) AS b,
         GREATEST(y0, ay0) AS p, LEAST(y1, ay1) AS q
  FROM g)
SELECT okey,
       CASE WHEN b > a AND q > p THEN
         'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p || ', '
           || b || ' ' || q || ', ' || a || ' ' || q || ', '
           || a || ' ' || p || '))'
       ELSE 'POLYGON EMPTY' END AS clip_wkt,
       CAST(CASE WHEN b > a AND q > p THEN 2 * (b - a) * (q - p)
            ELSE 0 END AS BIGINT) AS clip_a2x
FROM o
"""

# round 10: multi-ring clipped-geometry oracle — both overlap rects
# constructed in canonical form; EMPTY when the exterior's clip dies
# or the hole's clip fills it (AOI inside the lake)
ORACLES["clip_polygon_wkt_holes"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer),
o AS (
  SELECT okey, has_hole,
         GREATEST(x0, ax0) AS a, LEAST(x0 + w, ax1) AS b,
         GREATEST(y0, ay0) AS p, LEAST(y0 + h, ay1) AS q,
         GREATEST(x0 + 1, ax0) AS ja, LEAST(x0 + 1 + hw, ax1) AS jb,
         GREATEST(y0 + 1, ay0) AS jp, LEAST(y0 + 1 + hh, ay1) AS jq
  FROM g),
d AS (
  SELECT okey, a, b, p, q, ja, jb, jp, jq,
         (b > a AND q > p) AS e_ok,
         (has_hole AND jb > ja AND jq > jp) AS h_ok
  FROM o)
SELECT okey,
       CASE
         WHEN NOT e_ok THEN 'POLYGON EMPTY'
         WHEN h_ok AND ja = a AND jb = b AND jp = p AND jq = q
           THEN 'POLYGON EMPTY'
         WHEN NOT h_ok THEN
           'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p || ', '
             || b || ' ' || q || ', ' || a || ' ' || q || ', '
             || a || ' ' || p || '))'
         ELSE
           'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p || ', '
             || b || ' ' || q || ', ' || a || ' ' || q || ', '
             || a || ' ' || p || '), ('
             || ja || ' ' || jp || ', ' || jb || ' ' || jp || ', '
             || jb || ' ' || jq || ', ' || ja || ' ' || jq || ', '
             || ja || ' ' || jp || '))'
       END AS clip_wkt,
       CAST(CASE WHEN NOT e_ok THEN 0 ELSE
         2 * (b - a) * (q - p)
         - CASE WHEN h_ok THEN 2 * (jb - ja) * (jq - jp) ELSE 0 END
       END AS BIGINT) AS clip_a2x
FROM d
"""

# round 10: multipart clipped-geometry oracle — each surviving part
# constructed from overlap closed forms, then the same canonical
# collapse (EMPTY / POLYGON / MULTIPOLYGON by surviving part count)
ORACLES["clip_multipolygon_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 4 + 1 AS pw, c_custkey % 3 + 1 AS ph,
         (c_custkey % 3 = 0) AS plain,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 29 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer),
o AS (
  SELECT okey, has_hole, plain,
         GREATEST(x0, ax0) AS a, LEAST(x0 + w, ax1) AS b,
         GREATEST(y0, ay0) AS p, LEAST(y0 + h, ay1) AS q,
         GREATEST(x0 + 1, ax0) AS ja, LEAST(x0 + 1 + hw, ax1) AS jb,
         GREATEST(y0 + 1, ay0) AS jp, LEAST(y0 + 1 + hh, ay1) AS jq,
         GREATEST(x0 + 20, ax0) AS pa, LEAST(x0 + 20 + pw, ax1) AS pb,
         GREATEST(y0, ay0) AS pp, LEAST(y0 + ph, ay1) AS pq
  FROM g),
d AS (
  SELECT *,
         (b > a AND q > p) AS e_ok,
         (has_hole AND jb > ja AND jq > jp) AS h_ok,
         (NOT plain AND pb > pa AND pq > pp) AS p2_ok
  FROM o),
parts AS (
  SELECT okey,
         CASE WHEN e_ok
               AND NOT (h_ok AND ja = a AND jb = b AND jp = p AND jq = q)
         THEN '((' || a || ' ' || p || ', ' || b || ' ' || p || ', '
              || b || ' ' || q || ', ' || a || ' ' || q || ', '
              || a || ' ' || p || ')'
              || CASE WHEN h_ok THEN
                   ', (' || ja || ' ' || jp || ', ' || jb || ' ' || jp
                   || ', ' || jb || ' ' || jq || ', ' || ja || ' ' || jq
                   || ', ' || ja || ' ' || jp || ')'
                 ELSE '' END || ')'
         END AS part1,
         CASE WHEN p2_ok
         THEN '((' || pa || ' ' || pp || ', ' || pb || ' ' || pp || ', '
              || pb || ' ' || pq || ', ' || pa || ' ' || pq || ', '
              || pa || ' ' || pp || '))'
         END AS part2,
         CASE WHEN e_ok
               AND NOT (h_ok AND ja = a AND jb = b AND jp = p AND jq = q)
         THEN 2 * (b - a) * (q - p)
              - CASE WHEN h_ok THEN 2 * (jb - ja) * (jq - jp) ELSE 0 END
         ELSE 0 END
         + CASE WHEN p2_ok THEN 2 * (pb - pa) * (pq - pp) ELSE 0 END
           AS a2x
  FROM d)
SELECT okey,
       CASE
         WHEN part1 IS NULL AND part2 IS NULL THEN 'POLYGON EMPTY'
         WHEN part2 IS NULL THEN 'POLYGON ' || part1
         WHEN part1 IS NULL THEN 'POLYGON ' || part2
         ELSE 'MULTIPOLYGON (' || part1 || ', ' || part2 || ')'
       END AS clip_wkt,
       CAST(a2x AS BIGINT) AS clip_a2x
FROM parts
"""

# round 10: composed clip → acreage workflow — per-polygon closed-form
# overlap (exterior − hole) summed per musym, one acre conversion per
# group mirroring acres_e4 (floor(sum · convAcres / 2 · 1e4))
ORACLES["clip_acreage_summary"] = """
WITH g AS (
  SELECT c_custkey % 7 AS musym,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1
  FROM customer),
p AS (
  SELECT musym,
         2 * GREATEST(0, LEAST(x0 + w, ax1) - GREATEST(x0, ax0))
           * GREATEST(0, LEAST(y0 + h, ay1) - GREATEST(y0, ay0))
         - CASE WHEN has_hole THEN
             2 * GREATEST(0, LEAST(x0 + 1 + hw, ax1) - GREATEST(x0 + 1, ax0))
               * GREATEST(0, LEAST(y0 + 1 + hh, ay1) - GREATEST(y0 + 1, ay0))
           ELSE 0 END AS a2x
  FROM g)
SELECT CAST(musym AS INTEGER) AS musym,
       COUNT(*) AS n_polys,
       CAST(SUM(CASE WHEN a2x > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       CAST(SUM(a2x) AS BIGINT) AS clip_a2x,
       CAST(FLOOR(SUM(a2x) * 0.000247104393 / 2.0 * 10000.0) AS BIGINT)
         AS acres_e4
FROM p GROUP BY musym
"""

# round 10: multipart containment — truth from rectangle bounds
# ((in ext AND NOT in hole) OR in part 2), never a ray cast
ORACLES["clip_select_multipart"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 2) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 2) * 2 AS y1,
         (c_custkey % 100) * 2 + 2 AS hx0, (c_custkey % 57) * 2 + 2 AS hy0,
         LEAST((c_custkey % 100) * 2 + 2 + (c_custkey % 3 + 1) * 2,
               (c_custkey % 100) * 2 + (c_custkey % 13 + 2) * 2) AS hx1,
         (c_custkey % 57) * 2 + 4 AS hy1,
         (c_custkey % 100) * 2 + 40 AS px0,
         (c_custkey % 57) * 2 AS py0,
         (c_custkey % 100) * 2 + 40 + (c_custkey % 4 + 1) * 2 AS px1,
         (c_custkey % 57) * 2 + (c_custkey % 3 + 1) * 2 AS py1,
         (c_custkey % 3 = 0) AS plain,
         (c_custkey % 100) * 2 + (c_custkey % 29) * 2 - 9 AS px,
         (c_custkey % 57) * 2 + (c_custkey % 19) * 2 - 7 AS py
  FROM customer)
SELECT okey, px, py,
       CAST(CASE WHEN
              (px > x0 AND px < x1 AND py > y0 AND py < y1
               AND NOT (px > hx0 AND px < hx1 AND py > hy0 AND py < hy1))
              OR (NOT plain AND px > px0 AND px < px1
                  AND py > py0 AND py < py1)
            THEN 1 ELSE 0 END AS INTEGER) AS inside
FROM g
"""

# round 10: convex pentagon AOI — closed-form rect overlap minus the
# corner inclusion–exclusion cut, exterior and hole independently;
# never runs a vertex clip
ORACLES["clip_convex_aoi"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1
           + c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1
           - c_custkey % 4 AS cc
  FROM customer),
r AS (
  SELECT okey, 1 AS sgn, x0 AS sx0, y0 AS sy0,
         x0 + w AS sx1, y0 + h AS sy1, ax0, ay0, ax1, ay1, cc FROM g
  UNION ALL
  SELECT okey, -1, x0 + 1, y0 + 1, x0 + 1 + hw, y0 + 1 + hh,
         ax0, ay0, ax1, ay1, cc FROM g WHERE has_hole),
o AS (
  SELECT okey, sgn,
         GREATEST(sx0, ax0) AS a, LEAST(sx1, ax1) AS b,
         GREATEST(sy0, ay0) AS p, LEAST(sy1, ay1) AS q, cc FROM r),
c AS (
  SELECT okey,
         SUM(sgn * CASE WHEN b > a AND q > p THEN
           2 * (b - a) * (q - p)
           - (GREATEST(0, b + q - cc) * GREATEST(0, b + q - cc)
              - GREATEST(0, a + q - cc) * GREATEST(0, a + q - cc)
              - GREATEST(0, b + p - cc) * GREATEST(0, b + p - cc)
              + GREATEST(0, a + p - cc) * GREATEST(0, a + p - cc))
           ELSE 0 END) AS clip2x
  FROM o GROUP BY okey)
SELECT g.okey,
       CAST(2 * w * h
            - CASE WHEN has_hole THEN 2 * hw * hh ELSE 0 END AS BIGINT)
         AS poly_a2x,
       CAST(COALESCE(c.clip2x, 0) AS BIGINT) AS clip_a2x
FROM g LEFT JOIN c ON g.okey = c.okey
"""

# round 10: concave staircase AOI — the three decomposition pieces
# mirrored as a VALUES list (pinned against rectilinear_decompose by
# tests/test_round10.py); closed-form overlap per piece, never a clip
ORACLES["clip_concave_aoi"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole
  FROM customer),
p (px0, py0, px1, py1) AS (
  VALUES (10, 5, 95, 20), (10, 20, 70, 35), (10, 35, 45, 50)),
c AS (
  SELECT okey,
         SUM(2 * GREATEST(0, LEAST(x0 + w, px1) - GREATEST(x0, px0))
               * GREATEST(0, LEAST(y0 + h, py1) - GREATEST(y0, py0))
             - CASE WHEN has_hole THEN
                 2 * GREATEST(0, LEAST(x0 + 1 + hw, px1)
                                 - GREATEST(x0 + 1, px0))
                   * GREATEST(0, LEAST(y0 + 1 + hh, py1)
                                 - GREATEST(y0 + 1, py0))
               ELSE 0 END) AS clip2x
  FROM g CROSS JOIN p GROUP BY okey)
SELECT g.okey,
       CAST(2 * w * h
            - CASE WHEN has_hole THEN 2 * hw * hh ELSE 0 END AS BIGINT)
         AS poly_a2x,
       CAST(COALESCE(c.clip2x, 0) AS BIGINT) AS clip_a2x
FROM g LEFT JOIN c ON g.okey = c.okey
"""

# round 10: concave-diagonal AOI — the oracle computes the clip on
# the UNION's closed form (bottom rect [10,90]x[5,25] + top piece
# [10,50]x[25,45] cut by x+y<=75), never seeing the triangulation
ORACLES["clip_concave_diagonal_aoi"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole
  FROM customer),
r AS (
  SELECT okey, 1 AS sgn, x0 AS sx0, y0 AS sy0,
         x0 + w AS sx1, y0 + h AS sy1 FROM g
  UNION ALL
  SELECT okey, -1, x0 + 1, y0 + 1, x0 + 1 + hw, y0 + 1 + hh
  FROM g WHERE has_hole),
c AS (
  SELECT okey,
         SUM(sgn * (
           2 * GREATEST(0, LEAST(sx1, 90) - GREATEST(sx0, 10))
             * GREATEST(0, LEAST(sy1, 25) - GREATEST(sy0, 5))
           + CASE WHEN LEAST(sx1, 50) > GREATEST(sx0, 10)
                   AND LEAST(sy1, 45) > GREATEST(sy0, 25) THEN
               2 * (LEAST(sx1, 50) - GREATEST(sx0, 10))
                 * (LEAST(sy1, 45) - GREATEST(sy0, 25))
               - (GREATEST(0, LEAST(sx1, 50) + LEAST(sy1, 45) - 75)
                    * GREATEST(0, LEAST(sx1, 50) + LEAST(sy1, 45) - 75)
                  - GREATEST(0, GREATEST(sx0, 10) + LEAST(sy1, 45) - 75)
                    * GREATEST(0, GREATEST(sx0, 10) + LEAST(sy1, 45) - 75)
                  - GREATEST(0, LEAST(sx1, 50) + GREATEST(sy0, 25) - 75)
                    * GREATEST(0, LEAST(sx1, 50) + GREATEST(sy0, 25) - 75)
                  + GREATEST(0, GREATEST(sx0, 10) + GREATEST(sy0, 25) - 75)
                    * GREATEST(0, GREATEST(sx0, 10) + GREATEST(sy0, 25) - 75))
             ELSE 0 END)) AS clip2x
  FROM r GROUP BY okey)
SELECT g.okey,
       CAST(2 * w * h
            - CASE WHEN has_hole THEN 2 * hw * hh ELSE 0 END AS BIGINT)
         AS poly_a2x,
       CAST(COALESCE(c.clip2x, 0) AS BIGINT) AS clip_a2x
FROM g LEFT JOIN c ON g.okey = c.okey
"""

# round 10: NLCD snap arithmetic recomputed with DIFFERENT algebra —
# double TRUNC / ROUND here vs the Spark side's integral mod division
# (both equal the reference's Python-2 int()/round() semantics)
ORACLES["raster_snap_nlcd"] = """
WITH e AS (
  SELECT c_custkey AS okey,
         532695 + (c_custkey % 997) * 7 - 3000 AS x1,
         1550295 + (c_custkey % 883) * 5 - 2000 AS y1,
         532695 + (c_custkey % 997) * 7 - 3000
           + (c_custkey % 211 + 1) * 3 AS x2,
         1550295 + (c_custkey % 883) * 5 - 2000
           + (c_custkey % 173 + 1) * 2 AS y2
  FROM customer),
s AS (
  SELECT okey, x1, y1, x2, y2,
         30 * CAST(TRUNC(CAST(x1 - 532695 AS DOUBLE) / 30) AS BIGINT)
           + 532695 - 60 AS snap_x1,
         30 * CAST(TRUNC(CAST(y1 - 1550295 AS DOUBLE) / 30) AS BIGINT)
           + 1550295 - 60 AS snap_y1
  FROM e),
n AS (
  SELECT *, CAST(ROUND((x2 - snap_x1) / 30.0) AS BIGINT) + 2 AS n_cols,
            CAST(ROUND((y2 - snap_y1) / 30.0) AS BIGINT) + 2 AS n_rows
  FROM s)
SELECT okey, x1, y1, x2, y2, snap_x1, snap_y1,
       30 * n_cols + snap_x1 AS snap_x2,
       30 * n_rows + snap_y1 AS snap_y2,
       n_cols, n_rows, n_rows * 3 AS n_rows_i10
FROM n
"""

ORACLES["emb_ivf_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({ORACLES["emb_knn_ivf"]}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

# floor(log2(n)) as bit length, integer-exact in both engines
ORACLES["docs_length_histogram"] = """
SELECT CAST(length(to_binary_string_no) - 1 AS INTEGER) AS log2_bucket,
       COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM (SELECT n_chars, bin(n_chars) AS to_binary_string_no
      FROM documents WHERE n_chars >= 1)
GROUP BY 1
"""

ORACLES["events_stream_volume_anomaly"] = ORACLES["events_volume_anomaly"]

ORACLES["events_dau_wau"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_num
  FROM events),
dau AS (
  SELECT day_num, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
wau AS (
  SELECT ud.day_num + gs.off AS day_num, COUNT(DISTINCT user_id) AS wau
  FROM ud, generate_series(0, 6) gs(off)
  GROUP BY 1)
SELECT d.day_num, d.dau, w.wau
FROM dau d JOIN wau w ON d.day_num = w.day_num
"""

ORACLES["docs_rare_bigram_score"] = """
WITH toks AS (
  SELECT doc_id AS did, string_split(text, ' ') AS tk FROM documents),
bg AS (
  SELECT did, tk[i] || ' ' || tk[i+1] AS b
  FROM toks, unnest(generate_series(1, len(tk) - 1)) gs(i)
  WHERE len(tk) >= 2),
gc AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b)
SELECT did, COUNT(*) AS n_bigrams,
       SUM(CASE WHEN c <= 5 THEN 1 ELSE 0 END) AS n_rare,
       (SUM(CASE WHEN c <= 5 THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
         AS rare_e6
FROM bg JOIN gc USING (b)
GROUP BY did
"""

ORACLES["events_stream_dau"] = """
SELECT epoch_us(ts) // 86400000000 AS day_num,
       COUNT(DISTINCT user_id) AS dau
FROM events GROUP BY 1
"""

# UDTF path, same semantics as the declarative chunker
ORACLES["docs_chunk_udtf"] = ORACLES["docs_chunk"]

ORACLES["events_stream_wau"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_num
  FROM events),
wau AS (
  SELECT ud.day_num + gs.off AS day_num, COUNT(DISTINCT user_id) AS wau
  FROM ud, generate_series(0, 6) gs(off)
  GROUP BY 1)
SELECT day_num, wau FROM wau
WHERE day_num <= (SELECT MAX(epoch_us(ts) // 86400000000) FROM events)
"""

ORACLES["merge_upsert_latest"] = """
WITH base AS (
  SELECT o_orderkey AS okey, 1 AS version,
         CAST(round(o_totalprice*100) AS BIGINT) AS total_c
  FROM orders),
revised AS (
  SELECT o_orderkey AS okey, 2 AS version,
         CAST(round(o_totalprice*100) AS BIGINT) + 100 AS total_c
  FROM orders WHERE o_orderkey % 5 = 0),
merged AS (SELECT * FROM base UNION ALL SELECT * FROM revised)
SELECT okey, CAST(version AS INTEGER) AS version, total_c
FROM (SELECT *, row_number() OVER (
        PARTITION BY okey ORDER BY version DESC, total_c DESC) AS rn
      FROM merged)
WHERE rn = 1
"""

ORACLES["events_late_data_audit"] = """
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS ts_us FROM events),
lat AS (
  SELECT GREATEST(COALESCE(MAX(ts_us) OVER (ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_us, 0),
         0) AS late_us
  FROM ev)
SELECT CAST(late_us // 86400000000 AS BIGINT) AS late_days,
       COUNT(*) AS n_events
FROM lat GROUP BY 1
"""

ORACLES["docs_remove_dup_spans"] = """
WITH toks AS (
  SELECT doc_id AS did, string_split(text, ' ') AS tk FROM documents),
g AS (
  SELECT did, i - 1 AS i0, array_to_string(list_slice(tk, i, i+4), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(tk) - 4)) gs(i)
  WHERE len(tk) >= 5),
pop AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
st AS (SELECT did, list(i0) AS starts FROM g JOIN pop USING (gram) GROUP BY did),
cl AS (
  SELECT t.did, t.tk, COALESCE(s.starts, []) AS starts
  FROM toks t LEFT JOIN st s ON t.did = s.did),
k AS (
  SELECT did, len(tk) AS n_tokens,
         list_filter(tk, (x, i) ->
           len(list_filter(starts, s -> i-1 >= s AND i-1 <= s+4)) = 0)
           AS kept
  FROM cl)
SELECT did, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_tokens - len(kept) AS INTEGER) AS n_removed,
       -- array_to_string([]) is NULL in DuckDB but concat_ws gives ''
       md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_fp
FROM k
"""

ORACLES["events_burst_users"] = """
WITH m AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT user_id, MAX(n) AS peak_per_hour,
       CAST(CASE WHEN MAX(n) >= 3 THEN 1 ELSE 0 END AS INTEGER) AS burst_flag,
       SUM(n) AS n_events
FROM m GROUP BY user_id
"""

ORACLES["docs_pipeline_funnel"] = f"""
WITH d AS ({_DOCS_T}),
q AS (SELECT doc_id FROM d WHERE len(t) >= 20),
la AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           CASE WHEN s_de = b THEN 'de' WHEN s_en = b THEN 'en'
                WHEN s_es = b THEN 'es' WHEN s_fr = b THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS b FROM (
      SELECT doc_id,
        len(list_filter(t, w -> w IN ('hash','sort','value'))) AS s_de,
        len(list_filter(t, w -> w IN ('the','a','data','order'))) AS s_en,
        len(list_filter(t, w -> w IN ('query','row','table'))) AS s_es,
        len(list_filter(t, w -> w IN ('group','line','vector'))) AS s_fr,
        len(list_filter(t, w -> w IN ('spark','big','dup'))) AS s_zh
      FROM d)))
  WHERE lang_pred = 'en'),
ke AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
nj AS (SELECT DISTINCT j AS doc_id FROM ({ORACLES["docs_ngram_jaccard"]})),
s1 AS (SELECT doc_id FROM documents WHERE doc_id IN (SELECT doc_id FROM q)),
s2 AS (SELECT doc_id FROM s1 WHERE doc_id IN (SELECT doc_id FROM la)),
s3 AS (SELECT doc_id FROM s2 WHERE doc_id IN (SELECT doc_id FROM ke)),
s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM nj))
SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM documents
UNION ALL SELECT '1_quality', COUNT(*) FROM s1
UNION ALL SELECT '2_language', COUNT(*) FROM s2
UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM s3
UNION ALL SELECT '4_near_dedup', COUNT(*) FROM s4
"""


# ------------------------------------------------- round 5 additions

ORACLES["ingest_full_catalog"] = """
SELECT 'legend' AS table_name, CAST(1 AS INTEGER) AS load_rank,
       CAST(14 AS INTEGER) AS n_cols,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(r_regionkey) AS BIGINT) AS key_sum,
       CAST(SUM(CASE WHEN r_regionkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(0 AS BIGINT) AS n_special
FROM region
UNION ALL
SELECT 'legendtext', 2, 7, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(r_regionkey) AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN r_regionkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM region
UNION ALL
SELECT 'mapunit', 3, 24, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(n_nationkey) AS BIGINT),
       CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM nation
UNION ALL
SELECT 'component', 4, 109, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(c_custkey) AS BIGINT),
       CAST(SUM(CASE WHEN c_custkey % 5 = 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT)
FROM customer
UNION ALL
SELECT 'cotaxmoistcl', 5, 3, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(c_custkey) AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM customer
"""

_TAXMOIST_RANK = (
    "CASE v WHEN 'Aquic' THEN 1 WHEN 'Udic' THEN 2 WHEN 'Ustic' THEN 3 "
    "WHEN 'Xeric' THEN 4 WHEN 'Aridic' THEN 5 ELSE 6 END"
)

ORACLES["planner_sdv_extended"] = f"""
WITH {_SYN},
syn_tax AS (
  SELECT cokey,
         CASE WHEN cokey % 11 <> 0 THEN
           (['Aquic','Udic','Ustic','Xeric','Aridic'])[cokey % 5 + 1]
         END AS taxmoistcl
  FROM syn_co),
flt AS (
  SELECT c.mukey, c.cokey, c.comppct_r, t.taxmoistcl
  FROM syn_co c LEFT JOIN syn_tax t ON c.cokey = t.cokey
  WHERE c.comppct_r IS NOT NULL AND c.comppct_r >= 10
    AND (c.compname IS NULL OR c.compname <> 'NOTCOM')),
br AS (
  SELECT mukey, taxmoistcl AS v, SUM(comppct_r) AS sw, MIN(cokey) AS mm,
         MAX(comppct_r) AS mw,
         MIN(CASE WHEN comppct_r = mwr THEN cokey END) AS mmd
  FROM (SELECT *, MAX(comppct_r) OVER (PARTITION BY mukey, taxmoistcl) AS mwr
        FROM flt)
  GROUP BY mukey, taxmoistcl),
tt AS (
  SELECT mukey, v, sw, mm, mw, mmd,
         SUM(sw) OVER (PARTITION BY mukey) AS tw,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY sw DESC, {_TAXMOIST_RANK} ASC, mm ASC) AS rn,
         row_number() OVER (
           PARTITION BY mukey
           ORDER BY mw DESC, {_TAXMOIST_RANK} ASC, mmd ASC) AS rn_dcp
  FROM br)
SELECT d.mukey,
       CAST((200*d.sw + d.tw) // (2*d.tw) AS INTEGER) AS comppct_r,
       CASE WHEN p.mw >= 50 THEN p.v ELSE d.v END AS rating
FROM (SELECT * FROM tt WHERE rn = 1) d
JOIN (SELECT * FROM tt WHERE rn_dcp = 1) p USING (mukey)
"""

ORACLES["tile_survey_partition"] = """
WITH surveys AS (
  SELECT 'AS' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS areasymbol,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS y1,
         (c_custkey % 100) * 2 + 1 AS px, (c_custkey % 57) * 2 + 1 AS py
  FROM customer),
tiles AS (
  SELECT n_nationkey AS tile_id,
         (n_nationkey % 5) * 48 AS tx0, (n_nationkey // 5) * 28 AS ty0,
         (n_nationkey % 5) * 48 + 48 AS tx1,
         (n_nationkey // 5) * 28 + 28 AS ty1
  FROM nation WHERE n_nationkey < 25),
j AS (
  SELECT t.tile_id, s.areasymbol,
         CASE WHEN s.px > t.tx0 AND s.px < t.tx1
               AND s.py > t.ty0 AND s.py < t.ty1 THEN 1 ELSE 0 END AS anch
  FROM surveys s JOIN tiles t
    ON s.x0 < t.tx1 AND s.x1 > t.tx0 AND s.y0 < t.ty1 AND s.y1 > t.ty0)
SELECT tile_id, CAST(COUNT(*) AS BIGINT) AS n_intersect,
       CAST(SUM(anch) AS BIGINT) AS n_anchored,
       MIN(CASE WHEN anch = 1 THEN areasymbol END) AS first_areasymbol,
       MAX(CASE WHEN anch = 1 THEN areasymbol END) AS last_areasymbol
FROM j GROUP BY tile_id
"""

ORACLES["project_coordinates"] = """
WITH params AS (
  SELECT (sin(radians(29.5)) + sin(radians(45.5))) / 2 AS n,
         cos(radians(29.5))*cos(radians(29.5))
           + 2*(sin(radians(29.5)) + sin(radians(45.5)))/2*sin(radians(29.5))
           AS c,
         6370997.0 AS r),
p2 AS (SELECT n, c, r, r * sqrt(c - 2*n*sin(radians(23.0))) / n AS rho0
       FROM params),
pts AS (
  SELECT c_custkey AS okey,
         -125.0 + (c_custkey % 561) / 10.0 AS lon,
         24.0 + (c_custkey % 251) / 10.0 AS lat
  FROM customer),
fwd AS (
  SELECT okey, lon, lat, n, c, r, rho0,
         r * sqrt(c - 2*n*sin(radians(lat))) / n AS rho,
         n * (radians(lon) - radians(-96.0)) AS theta
  FROM pts, p2),
xy AS (
  SELECT okey, lon, lat, n, c, r, rho0,
         rho * sin(theta) AS x, rho0 - rho * cos(theta) AS y
  FROM fwd),
inv AS (
  SELECT okey, lon, lat, x, y, n,
         degrees(asin((c - (sqrt(x*x + (rho0-y)*(rho0-y))*n/r)
                          *(sqrt(x*x + (rho0-y)*(rho0-y))*n/r)) / (2*n)))
           AS rlat,
         -96.0 + degrees(atan2(x, rho0 - y) / n) AS rlon
  FROM xy)
SELECT okey,
       CAST(round(x * 100) AS BIGINT) AS x_cm,
       CAST(round(y * 100) AS BIGINT) AS y_cm,
       CAST(round(rlon * 1000000) AS BIGINT) AS rt_lon_e6,
       CAST(round(rlat * 1000000) AS BIGINT) AS rt_lat_e6,
       CAST(round(rlon * 1000000) = round(lon * 1000000) AS INTEGER)
         AS roundtrip_ok
FROM inv
"""

ORACLES["validate_referential_integrity"] = f"""
WITH {_SYN},
syn_hz AS (
  SELECT l_orderkey
           + CASE WHEN (l_orderkey*10 + l_linenumber) % 37 = 0
                  THEN 10000000000 ELSE 0 END AS cokey,
         l_orderkey*10 + l_linenumber AS chkey
  FROM lineitem),
syn_tg AS (
  SELECT (l_orderkey*10 + l_linenumber)
           + CASE WHEN (l_orderkey*10 + l_linenumber) % 53 = 0
                  THEN 10000000000 ELSE 0 END AS chkey,
         l_orderkey*10 + l_linenumber AS chtgkey
  FROM lineitem),
syn_tx AS (
  SELECT l_orderkey*10 + l_linenumber AS chtgkey FROM lineitem),
syn_rs AS (
  SELECT l_orderkey AS cokey FROM lineitem WHERE l_partkey % 13 = 0),
mu AS (SELECT DISTINCT mukey FROM syn_co)
SELECT * FROM (
SELECT 'chorizon' AS parent_table, 'chtexturegrp' AS child_table,
       'chkey' AS fk_col, CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN chkey IN (SELECT chkey FROM syn_hz)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_orphans
FROM syn_tg
UNION ALL
SELECT 'chtexturegrp', 'chtexture', 'chtgkey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN chtgkey IN (SELECT chtgkey FROM syn_tg)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM syn_tx
UNION ALL
SELECT 'component', 'chorizon', 'cokey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN cokey IN (SELECT cokey FROM syn_co)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM syn_hz
UNION ALL
SELECT 'component', 'corestrictions', 'cokey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN cokey IN (SELECT cokey FROM syn_co)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM syn_rs
UNION ALL
SELECT 'mapunit', 'component', 'mukey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN mukey IN (SELECT mukey FROM mu)
                THEN 0 ELSE 1 END) AS BIGINT)
FROM syn_co)
"""

ORACLES["docs_bm25_search"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT COUNT(*)*1.0 / COUNT(DISTINCT doc_id) FROM toks) AS avgdl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES (0,'hash'),(0,'join'),(1,'window'),(1,'sort'),
                            (2,'stream'),(2,'batch'),(2,'data')) v(qid, term)),
scored AS (
  SELECT q.qid, tf.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
  FROM tf
  JOIN q ON tf.term = q.term
  JOIN dft d ON tf.term = d.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s),
agg AS (
  SELECT qid, doc_id, CAST(floor(SUM(c) * 10000) AS BIGINT) AS score_e4,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM scored GROUP BY qid, doc_id),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score_e4 DESC, doc_id ASC) AS rank
  FROM agg)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score_e4, n_terms_hit
FROM r WHERE rank <= 10
"""

ORACLES["docs_train_split"] = """
SELECT doc_id,
       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok
FROM (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5('split1:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 100 AS b
  FROM documents)
"""

_PQ = f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
subs AS (SELECT j FROM (VALUES (0),(1),(2),(3)) s(j)),
cb AS (
  SELECT CAST(cid - 8 AS INTEGER) AS kid, j,
         list_slice(cv, j*16 + 1, j*16 + 16) AS kv
  FROM c, subs WHERE cid < 24),
cs AS (
  SELECT cid, j, list_slice(cv, j*16 + 1, j*16 + 16) AS sv
  FROM c, subs),
dist AS (
  SELECT cs.cid, cs.j, cb.kid, cb.kv,
         list_dot_product(sv, sv) - 2*list_dot_product(sv, kv)
           + list_dot_product(kv, kv) AS d
  FROM cs JOIN cb USING (j)),
best AS (
  SELECT cid, j, kv FROM (
    SELECT *, row_number() OVER (PARTITION BY cid, j
                                 ORDER BY d ASC, kid ASC) AS rnk
    FROM dist) WHERE rnk = 1),
recon AS (
  SELECT cid, flatten(list(kv ORDER BY j)) AS rv
  FROM best GROUP BY cid),
s AS (
  SELECT qid, cid,
         CASE WHEN list_dot_product(qv, qv) = 0
                OR list_dot_product(rv, rv) = 0 THEN -2000000
              ELSE CAST(floor((list_dot_product(qv, rv)/
                     (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(rv, rv))))*1000000) AS BIGINT)
         END AS cos_e6
  FROM recon CROSS JOIN q)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

ORACLES["emb_knn_pq"] = _PQ

# trained-PQ twin: per-subspace Lloyd's k-means (train_ivf_centroids
# semantics, default first-N seeding — only the IVF twins below use
# the farthest-first _ff_init) unrolled for the fixed 3 iterations —
# assignment by the same floored-cosine + kid tie-break, update =
# floored per-dim mean, empty clusters keep their previous centroid.
# Every step is exact-integer or one deterministic double division,
# so DuckDB reproduces the Spark codebook bit-for-bit.
_PQ_KCOS = (
    "CASE WHEN list_dot_product(sv, sv) = 0 OR list_dot_product(kv, kv) = 0 "
    "THEN -2000000 ELSE CAST(floor((list_dot_product(sv, kv)/"
    "(sqrt(list_dot_product(sv, sv))*sqrt(list_dot_product(kv, kv))))"
    "*1000000) AS BIGINT) END"
)

#: floored-cosine template over two list columns (shared by the
#: seeding, trained-IVF and IVF-PQ twins)
_IVFPQ_KCOS = (
    "CASE WHEN list_dot_product({a}, {a}) = 0 "
    "OR list_dot_product({b}, {b}) = 0 THEN -2000000 "
    "ELSE CAST(floor((list_dot_product({a}, {b})/"
    "(sqrt(list_dot_product({a}, {a}))*sqrt(list_dot_product({b}, {b}))))"
    "*1000000) AS BIGINT) END"
)


def _ff_init(k: int) -> str:
    """Farthest-first seeding, unrolled (train_ivf_centroids
    init="farthest" twin): per subspace j, seed 0 is the min-cid
    vector; each later seed is the point whose best floored-cosine to
    any chosen seed is LOWEST (ties by cid). Integer-exact throughout,
    so the traversal — and therefore the whole learned quantizer — is
    reproduced bit-for-bit. MATERIALIZED on each fs level: every stage
    references the previous chosen-set three times, and CTE inlining
    would make re-evaluation exponential (the BPE-stage lesson)."""
    kcos = _IVFPQ_KCOS.format(a="cs.sv", b="f.kv")
    out = """
f0 AS (
  SELECT j, CAST(0 AS INTEGER) AS kid, cid, sv AS kv
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY j ORDER BY cid) AS rn0
        FROM cs) WHERE rn0 = 1),
fs0 AS MATERIALIZED (SELECT j, kid, cid, kv FROM f0),"""
    for i in range(1, k):
        out += f"""
bs{i} AS (
  SELECT cs.j, cs.cid, MAX({kcos}) AS bs
  FROM cs JOIN fs{i - 1} f ON cs.j = f.j
  WHERE NOT EXISTS (SELECT 1 FROM fs{i - 1} x
                    WHERE x.j = cs.j AND x.cid = cs.cid)
  GROUP BY cs.j, cs.cid),
pk{i} AS (
  SELECT j, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY j
                                 ORDER BY bs ASC, cid ASC) AS rn
    FROM bs{i}) WHERE rn = 1),
f{i} AS (
  SELECT cs.j, CAST({i} AS INTEGER) AS kid, cs.cid, cs.sv AS kv
  FROM cs JOIN pk{i} p ON cs.j = p.j AND cs.cid = p.cid),
fs{i} AS MATERIALIZED (
  SELECT * FROM fs{i - 1} UNION ALL SELECT * FROM f{i}),"""
    out += f"""
cb0 AS (SELECT kid, j, kv FROM fs{k - 1}),"""
    return out


def _pq_train_iter(i: int, sub: int = 16) -> str:
    return f"""
a{i} AS (
  SELECT cid, j, sv, kid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid, j
                                 ORDER BY kcos DESC, kid ASC) AS rn
    FROM (SELECT cs.cid, cs.j, cs.sv, cb.kid, cb.kv,
                 {_PQ_KCOS} AS kcos
          FROM cs JOIN cb{i} cb ON cs.j = cb.j))
  WHERE rn = 1),
u{i} AS (
  SELECT kid, j, list(CAST(floor(m) AS BIGINT) ORDER BY p) AS kv
  FROM (SELECT kid, j, p, AVG(sv[p]) AS m
        FROM a{i}, (SELECT unnest(range(1, {sub + 1})) AS p) pos
        GROUP BY kid, j, p)
  GROUP BY kid, j),
cb{i + 1} AS (
  SELECT cb.kid, cb.j, COALESCE(u.kv, cb.kv) AS kv
  FROM cb{i} cb LEFT JOIN u{i} u ON cb.kid = u.kid AND cb.j = u.j),"""


_PQ_TRAINED = f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
subs AS (SELECT j FROM (VALUES (0),(1),(2),(3)) s(j)),
cs AS MATERIALIZED (
  SELECT cid, j, list_slice(cv, j*16 + 1, j*16 + 16) AS sv
  FROM c, subs),
cb0 AS (
  SELECT CAST(cid - 8 AS INTEGER) AS kid, j, sv AS kv
  FROM cs WHERE cid < 24),{_pq_train_iter(0)}{_pq_train_iter(1)}{_pq_train_iter(2)}
dist AS (
  SELECT cs.cid, cs.j, cb.kid, cb.kv,
         list_dot_product(sv, sv) - 2*list_dot_product(sv, kv)
           + list_dot_product(kv, kv) AS d
  FROM cs JOIN cb3 cb ON cs.j = cb.j),
best AS (
  SELECT cid, j, kv FROM (
    SELECT *, row_number() OVER (PARTITION BY cid, j
                                 ORDER BY d ASC, kid ASC) AS rnk
    FROM dist) WHERE rnk = 1),
recon AS (
  SELECT cid, flatten(list(kv ORDER BY j)) AS rv
  FROM best GROUP BY cid),
s AS (
  SELECT qid, cid,
         CASE WHEN list_dot_product(qv, qv) = 0
                OR list_dot_product(rv, rv) = 0 THEN -2000000
              ELSE CAST(floor((list_dot_product(qv, rv)/
                     (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(rv, rv))))*1000000) AS BIGINT)
         END AS cos_e6
  FROM recon CROSS JOIN q)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

ORACLES["emb_knn_pq_trained"] = _PQ_TRAINED

# trained IVF: Lloyd's k-means over the FULL 64-dim vectors, unrolled
# for the fixed 3 iterations via the same template (one j=0 "subspace"
# of width 64), then the standard IVF probe/score path with the
# learned centroids. {{init}} is the seeding block: first-N for the
# default path, _ff_init(16) for the farthest-first variant.
_IVF_TRAINED_TMPL = f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
cs AS MATERIALIZED (SELECT cid, 0 AS j, cv AS sv FROM c),{{init}}{_pq_train_iter(0, 64)}{_pq_train_iter(1, 64)}{_pq_train_iter(2, 64)}
asg AS (
  SELECT cid, cv, kid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid
                                 ORDER BY kcos DESC, kid ASC) AS rn
    FROM (SELECT c.cid, c.cv, cb.kid,
                 {_IVFPQ_KCOS.format(a="c.cv", b="cb.kv")} AS kcos
          FROM c, cb3 cb))
  WHERE rn = 1),
probes AS (
  SELECT qid, qv, kid FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY kcos DESC, kid ASC) AS prn
    FROM (SELECT q.qid, q.qv, cb.kid,
                 {_IVFPQ_KCOS.format(a="q.qv", b="cb.kv")} AS kcos
          FROM q, cb3 cb))
  WHERE prn <= 4),
s AS (
  SELECT p.qid, a.cid,
         {_IVFPQ_KCOS.format(a="p.qv", b="a.cv")} AS cos_e6
  FROM asg a JOIN probes p ON a.kid = p.kid)
SELECT qid, cid, cos_e6, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

_IVF_FIRSTN_INIT = """
cb0 AS (
  SELECT CAST(cid - 8 AS INTEGER) AS kid, j, sv AS kv
  FROM cs WHERE cid < 24),"""

_IVF_TRAINED = _IVF_TRAINED_TMPL.format(init=_IVF_FIRSTN_INIT)
#: farthest-first-seeded twin (train_ivf_centroids init="farthest")
_IVF_TRAINED_FF = _IVF_TRAINED_TMPL.format(init=_ff_init(16))

ORACLES["emb_knn_ivf_trained"] = _IVF_TRAINED
ORACLES["emb_knn_ivf_ff"] = _IVF_TRAINED_FF


def _ivf_recall_sql(approx: str) -> str:
    return f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({approx}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""


ORACLES["emb_ivf_recall_trained"] = _ivf_recall_sql(_IVF_TRAINED)
ORACLES["emb_ivf_recall_ff"] = _ivf_recall_sql(_IVF_TRAINED_FF)

# round 10: SAMPLE-THEN-TRAIN — the training set cs becomes a fixed-
# size deterministic sample (top-48 candidates by md5(cid), the SQL
# twin of Spark's TakeOrdered sample), seeding = first-16 of the
# sample by cid (rank-based: the sample's cids are arbitrary, so the
# full-corpus 'cid < 24' first-N form does not apply)
_IVF_SAMPLED_INIT = """
cb0 AS (
  SELECT CAST(rn - 1 AS INTEGER) AS kid, j, sv AS kv
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cid) AS rn FROM cs)
  WHERE rn <= 16),"""

_IVF_TRAINED_SAMPLED = _IVF_TRAINED_TMPL.format(
    init=_IVF_SAMPLED_INIT
).replace(
    "cs AS MATERIALIZED (SELECT cid, 0 AS j, cv AS sv FROM c),",
    "cs AS MATERIALIZED (SELECT cid, 0 AS j, cv AS sv FROM c"
    " ORDER BY md5(CAST(cid AS VARCHAR)), cid LIMIT 48),",
)
assert "LIMIT 48" in _IVF_TRAINED_SAMPLED  # replace anchor must hold

ORACLES["emb_ivf_recall_sampled"] = _ivf_recall_sql(_IVF_TRAINED_SAMPLED)

# IVF-PQ: coarse inverted lists (first-8 stand-in centroids) + PQ over
# RESIDUALS (first-16 stand-in residual codebook); queries probe their
# 2 nearest lists and score the centroid+decoded-residual
# reconstruction — mirrors functions/similarity.ivfpq_topk exactly.
def _ivfpq_sql(topk: int) -> str:
    return f"""
WITH {_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
cents AS (
  SELECT CAST(cid - 8 AS INTEGER) AS kid, cv AS kv FROM c WHERE cid < 16),
asg0 AS (
  SELECT c.cid, c.cv, ct.kid, ct.kv,
         {_IVFPQ_KCOS.format(a="c.cv", b="ct.kv")} AS kcos
  FROM c, cents ct),
asg AS (
  SELECT cid, kid, kv,
         list_transform(range(1, 65), i -> cv[i] - kv[i]) AS rv
  FROM (SELECT *, row_number() OVER (PARTITION BY cid
                                     ORDER BY kcos DESC, kid ASC) AS rn
        FROM asg0)
  WHERE rn = 1),
subs AS (SELECT j FROM (VALUES (0),(1),(2),(3)) s(j)),
cb AS (
  SELECT CAST(cid - 8 AS INTEGER) AS pid, j,
         list_slice(rv, j*16 + 1, j*16 + 16) AS pv
  FROM asg, subs WHERE cid < 24),
cs AS (
  SELECT cid, j, list_slice(rv, j*16 + 1, j*16 + 16) AS sv
  FROM asg, subs),
dist AS (
  SELECT cs.cid, cs.j, cb.pid, cb.pv,
         list_dot_product(sv, sv) - 2*list_dot_product(sv, pv)
           + list_dot_product(pv, pv) AS d
  FROM cs JOIN cb USING (j)),
bestd AS (
  SELECT cid, j, pv FROM (
    SELECT *, row_number() OVER (PARTITION BY cid, j
                                 ORDER BY d ASC, pid ASC) AS rnk
    FROM dist) WHERE rnk = 1),
rres AS (SELECT cid, flatten(list(pv ORDER BY j)) AS rr
         FROM bestd GROUP BY cid),
recon AS (
  SELECT a.cid, a.kid,
         list_transform(range(1, 65), i -> a.kv[i] + r.rr[i]) AS rv
  FROM asg a JOIN rres r ON a.cid = r.cid),
probes0 AS (
  SELECT q.qid, q.qv, ct.kid,
         {_IVFPQ_KCOS.format(a="q.qv", b="ct.kv")} AS kcos
  FROM q, cents ct),
probes AS (
  SELECT qid, qv, kid FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY kcos DESC, kid ASC) AS prn
    FROM probes0) WHERE prn <= 2),
s AS (
  SELECT p.qid, r.cid,
         {_IVFPQ_KCOS.format(a="p.qv", b="r.rv")} AS cos_e6
  FROM recon r JOIN probes p ON r.kid = p.kid)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= {topk}
"""


_IVFPQ = _ivfpq_sql(5)

ORACLES["emb_knn_ivfpq"] = _IVFPQ

ORACLES["emb_knn_ivfpq_rerank"] = f"""
WITH short AS ({_ivfpq_sql(16)}),
{_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
s AS (SELECT sh.qid, sh.cid, {_COS} AS cos_e6
      FROM short sh JOIN q ON q.qid = sh.qid JOIN c ON c.cid = sh.cid)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
WHERE rn <= 5
"""

ORACLES["emb_ivfpq_rerank_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({ORACLES["emb_knn_ivfpq_rerank"]}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

ORACLES["emb_ivfpq_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({_IVFPQ}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

ORACLES["emb_pq_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({_PQ_TRAINED}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

_SQ8 = f"""
WITH {_EMB_Q},
dims AS (SELECT unnest(range(1, 65)) AS i),
st AS (
  SELECT i, MIN(cv[i]) AS mn, MAX(cv[i]) - MIN(cv[i]) AS r
  FROM (SELECT v AS cv FROM e WHERE vec_id >= 8) CROSS JOIN dims GROUP BY i),
stats AS (
  SELECT list(mn ORDER BY i) AS mins, list(r ORDER BY i) AS rng FROM st),
c AS (
  SELECT vec_id AS cid,
         list_transform(range(1, 65),
           i -> s.mins[i]
                + (CASE WHEN s.rng[i] = 0 THEN 0
                        ELSE (((v[i] - s.mins[i]) * 255 // s.rng[i])
                              * s.rng[i]) // 255 END)) AS cv
  FROM e CROSS JOIN stats s WHERE vec_id >= 8),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
s2 AS (SELECT qid, cid, {_COS} AS cos_e6 FROM c CROSS JOIN q)
SELECT qid, cid, cos_e6, CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s2)
WHERE rn <= 5
"""

ORACLES["emb_knn_sq8"] = _SQ8

ORACLES["emb_sq8_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
approx AS ({_SQ8}),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

ORACLES["raster_tile_export"] = """
WITH cells AS (
  SELECT c_custkey % 4 AS tile_id, c_custkey % 16 AS row,
         (c_custkey // 16) % 16 AS col,
         MAX(c_custkey % 97 + 1) AS cellvalue
  FROM customer GROUP BY 1, 2, 3)
SELECT tile_id, CAST(256 AS INTEGER) AS n_pixels,
       CAST(256 - COUNT(*) AS INTEGER) AS n_nodata
FROM cells GROUP BY tile_id
"""

ORACLES["docs_mix_temperature"] = """
WITH sizes AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
mx AS (SELECT MAX(n_s) AS n_max FROM sizes),
rates AS (
  SELECT source, n_s,
         CAST(floor(sqrt(CAST(n_s AS DOUBLE))
                    / sqrt(CAST(n_max AS DOUBLE)) * 1000000) AS BIGINT)
           AS rate_e6
  FROM sizes, mx),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                             1, 15)) AS BIGINT) % 1000000 < r.rate_e6
  GROUP BY d.source)
SELECT r.source, r.n_s, r.rate_e6,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""

ORACLES["q4_order_priority"] = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""

ORACLES["q12_shipmode_priority"] = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""

ORACLES["q19_disjunctive_revenue"] = """
SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["shapefile_merge_acres"] = """
SELECT 'AS' || CAST(n_regionkey AS VARCHAR) AS areasymbol,
       CAST(COUNT(*) AS BIGINT) AS n_polys,
       CAST(SUM(2 * (n_nationkey % 5 + 1) * (n_nationkey % 3 + 1)) AS BIGINT)
         AS area2x
FROM nation GROUP BY n_regionkey
"""

ORACLES["lineitem_profile"] = """
WITH src AS (
  SELECT CAST(l_quantity AS BIGINT) AS quantity,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CASE WHEN l_linenumber <> 1 THEN l_suppkey END AS suppkey_sparse
  FROM lineitem),
long AS (
  SELECT 'quantity' AS col_name, quantity AS v FROM src
  UNION ALL SELECT 'price_c', price_c FROM src
  UNION ALL SELECT 'suppkey_sparse', suppkey_sparse FROM src),
nn AS (SELECT col_name, v FROM long WHERE v IS NOT NULL),
r AS (
  SELECT col_name, v,
         row_number() OVER (PARTITION BY col_name ORDER BY v ASC) AS rn,
         COUNT(*) OVER (PARTITION BY col_name) AS n
  FROM nn),
tot AS (SELECT COUNT(*) AS n_rows FROM src)
SELECT col_name, CAST(MAX(n) AS BIGINT) AS n,
       CAST((SELECT n_rows FROM tot) - MAX(n) AS BIGINT) AS n_null,
       MIN(v) AS vmin, MAX(v) AS vmax,
       CAST(SUM(CASE
         WHEN n % 2 = 1 AND rn = (n + 1) // 2 THEN 2 * v
         WHEN n % 2 = 0 AND (rn = n // 2 OR rn = n // 2 + 1) THEN v
         ELSE 0 END) AS BIGINT) AS med2,
       MAX(CASE WHEN rn = (19 * (n - 1)) // 20 + 1 THEN v END) AS p95
FROM r GROUP BY col_name
"""

ORACLES["docs_training_manifest"] = f"""
WITH cleaned AS ({ORACLES["docs_clean_corpus"]}),
cd AS (
  SELECT d.doc_id, d.text,
         CASE WHEN CAST(('0x' || substr(md5('split1:'
                || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90
              THEN 'train'
              WHEN CAST(('0x' || substr(md5('split1:'
                || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95
              THEN 'val' ELSE 'test' END AS split
  FROM documents d JOIN cleaned c ON d.doc_id = c.doc_id),
t AS (SELECT doc_id, split, string_split(text, ' ') AS t FROM cd),
s AS (SELECT doc_id, split, t,
             unnest(generate_series(0, greatest(len(t)-1, 0), 24)) AS start
      FROM t),
ch AS (
  SELECT doc_id, split,
         len(list_slice(t, start+1, start+32)) AS n_tok,
         substr(md5(array_to_string(list_slice(t, start+1, start+32), ' ')),
                1, 8) AS fp8
  FROM s)
SELECT split, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(('0x' || fp8) AS BIGINT)) AS BIGINT) AS fp_sum
FROM ch GROUP BY split
"""

ORACLES["docs_shuffle_shards"] = """
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shuffle1:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h,
         len(string_split(text, ' ')) AS n_tok
  FROM documents)
SELECT doc_id, h % 8 AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
            AS INTEGER) AS pos,
       CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_offset,
       CAST(n_tok AS INTEGER) AS n_tok
FROM k
"""

ORACLES["docs_incremental_dedup"] = """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
old AS (SELECT DISTINCT h FROM h WHERE doc_id % 3 != 0),
new AS (SELECT doc_id, h,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM h WHERE doc_id % 3 = 0)
SELECT n.doc_id,
       CASE WHEN o.h IS NOT NULL THEN 'dup_of_old'
            WHEN n.rn > 1 THEN 'dup_in_new'
            ELSE 'kept' END AS status
FROM new n LEFT JOIN old o ON n.h = o.h
"""

ORACLES["docs_quality_classifier"] = """
WITH s AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tok,
         COALESCE(list_sum(list_transform(string_split(text, ' '),
           t -> CAST(('0x' || substr(md5('w1:' || t), 1, 15)) AS BIGINT)
                % 2001 - 1000)), 0) AS score
  FROM documents)
SELECT doc_id, source, CAST(n_tok AS INTEGER) AS n_tok,
       CAST(score AS BIGINT) AS score,
       CAST(CASE WHEN score * 64 > n_tok * -640 THEN 1 ELSE 0 END AS INTEGER)
         AS keep
FROM s
"""

ORACLES["events_transition_matrix"] = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
pairs AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
tot AS (SELECT SUM(n) AS total FROM pairs)
SELECT prev_type, event_type, n,
       CAST(n * 1000000 // total AS BIGINT) AS ppm
FROM pairs, tot
"""

ORACLES["events_skew_audit"] = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
stats AS (SELECT SUM(n) AS total_rows, COUNT(*) AS total_keys FROM counts)
SELECT user_id, n,
       CAST(n * 1000000 // total_rows AS BIGINT) AS ppm,
       CAST(CASE WHEN n * total_keys > 8 * total_rows THEN 1 ELSE 0 END
            AS INTEGER) AS skew_flag
FROM counts, stats
ORDER BY n DESC, user_id ASC
LIMIT 10
"""

ORACLES["bucketed_rating_join"] = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""

ORACLES["docs_sample_per_source"] = """
WITH keyed AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('sample1:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 1000000 AS h
  FROM documents),
ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
              AS INTEGER) AS rk
  FROM keyed)
SELECT doc_id, source, rk FROM ranked WHERE rk <= 20
"""

ORACLES["docs_kmv_vocab"] = """
WITH tk AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
hashed AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5('kmv1:' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 AS h
  FROM tk),
ranked AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed),
agg AS (
  SELECT source, COUNT(*) AS n_sketch,
         MAX(CASE WHEN rk = 64 THEN h END) AS h_k
  FROM ranked WHERE rk <= 64 GROUP BY source),
est AS (
  SELECT source, n_sketch,
         CASE WHEN n_sketch < 64 THEN n_sketch
              ELSE (63 * 1000000000000) // h_k END AS est_distinct
  FROM agg),
exact AS (
  SELECT source, COUNT(*) AS exact_distinct FROM tk GROUP BY source)
SELECT e.source, CAST(e.n_sketch AS BIGINT) AS n_sketch,
       CAST(e.est_distinct AS BIGINT) AS est_distinct,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       CAST(abs(e.est_distinct - x.exact_distinct) * 1000
            // x.exact_distinct AS BIGINT) AS err_permille
FROM est e JOIN exact x ON e.source = x.source
"""

ORACLES["docs_kmv_setops"] = """
WITH tk AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
hashed AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5('kmv1:' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 AS h
  FROM tk),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
    FROM hashed) WHERE rk <= 64),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
members AS (
  SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.source = p.src_a
  UNION ALL
  SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.source = p.src_b),
merged AS (
  SELECT src_a, src_b, h, COUNT(*) AS n_sides
  FROM members GROUP BY src_a, src_b, h),
usk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
    FROM merged) WHERE rk <= 64),
est0 AS (
  SELECT src_a, src_b, MAX(CASE WHEN rk = 64 THEN h END) AS h_k,
         COUNT(*) AS n_u,
         SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS n_both
  FROM usk GROUP BY src_a, src_b),
est AS (
  SELECT src_a, src_b,
         CASE WHEN n_u < 64 THEN n_u
              ELSE (63 * 1000000000000) // h_k END AS union_est,
         n_both * 1000 // n_u AS jaccard_permille, n_u, n_both
  FROM est0),
est2 AS (
  SELECT src_a, src_b, union_est,
         union_est * n_both // n_u AS inter_est, jaccard_permille
  FROM est),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter_exact
  FROM tk a JOIN tk b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source),
sizes AS (SELECT source, COUNT(*) AS n FROM tk GROUP BY source)
SELECT e.src_a, e.src_b, CAST(e.union_est AS BIGINT) AS union_est,
       CAST(e.inter_est AS BIGINT) AS inter_est,
       CAST(e.jaccard_permille AS BIGINT) AS jaccard_permille,
       CAST(sa.n + sb.n - i.inter_exact AS BIGINT) AS union_exact,
       CAST(i.inter_exact AS BIGINT) AS inter_exact
FROM est2 e
JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
JOIN sizes sa ON sa.source = e.src_a
JOIN sizes sb ON sb.source = e.src_b
"""

ORACLES["docs_priority_sample"] = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         CAST(('0x' || substr(md5('psamp1:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 1000000000000 AS u,
         GREATEST(n_chars, 1) AS w_
  FROM documents),
k2 AS (SELECT *, u * 1000000 // w_ AS skey FROM keyed),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS INTEGER)
              AS prank
  FROM k2),
top AS (SELECT * FROM ranked WHERE prank <= 51),
tau AS (SELECT MIN(CASE WHEN prank = 51 THEN skey END) AS tau_key FROM top),
samp AS (SELECT * FROM top WHERE prank <= 50),
ht AS (
  SELECT CAST(SUM(GREATEST(w_, 1000000000000000000 // tau_key)) AS BIGINT)
           AS ht_total
  FROM samp, tau),
exact AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS exact_total FROM documents),
est AS (
  SELECT ht_total, exact_total,
         CAST(abs(ht_total - exact_total) * 1000 // exact_total AS BIGINT)
           AS err_permille
  FROM ht, exact)
SELECT s.doc_id, s.source, s.n_chars, s.prank,
       e.ht_total, e.exact_total, e.err_permille
FROM samp s, est e
"""

ORACLES["docs_cms_heavy_hitters"] = """
WITH tok AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
per_src AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
cand AS (
  SELECT DISTINCT tok FROM (
    SELECT source, tok,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rk
    FROM per_src) WHERE rk <= 12),
rows3 AS (SELECT unnest([0, 1, 2]) AS r),
cells AS (
  SELECT r,
         CAST(('0x' || substr(md5('cms' || r || ':' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 % 512 AS c,
         COUNT(*) AS cnt
  FROM tok CROSS JOIN rows3 GROUP BY 1, 2),
probes AS (
  SELECT tok, r,
         CAST(('0x' || substr(md5('cms' || r || ':' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 % 512 AS c
  FROM cand CROSS JOIN rows3),
est AS (
  SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS cms_est
  FROM probes p LEFT JOIN cells s ON s.r = p.r AND s.c = p.c
  GROUP BY p.tok),
exact AS (
  SELECT t.tok, COUNT(*) AS exact_cnt
  FROM tok t JOIN cand USING (tok) GROUP BY t.tok)
SELECT e.tok, CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - x.exact_cnt AS BIGINT) AS overcount
FROM est e JOIN exact x ON e.tok = x.tok
"""

ORACLES["docs_cms_drift"] = """
WITH tok AS (
  SELECT source, doc_id % 2 = 1 AS is_new, tok FROM (
    SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents)
  WHERE tok <> ''),
cand AS (
  SELECT DISTINCT tok FROM (
    SELECT is_new, source, tok,
           ROW_NUMBER() OVER (PARTITION BY is_new, source
                              ORDER BY c DESC, tok) AS rk
    FROM (SELECT is_new, source, tok, COUNT(*) AS c
          FROM tok GROUP BY is_new, source, tok))
  WHERE rk <= 12),
rows3 AS (SELECT unnest([0, 1, 2]) AS r),
cells AS (
  SELECT is_new, r,
         CAST(('0x' || substr(md5('cms' || r || ':' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 % 512 AS c,
         COUNT(*) AS cnt
  FROM tok CROSS JOIN rows3 GROUP BY 1, 2, 3),
probes AS (
  SELECT tok, r,
         CAST(('0x' || substr(md5('cms' || r || ':' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 % 512 AS c
  FROM cand CROSS JOIN rows3),
est_o AS (
  SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS est_old0
  FROM probes p
  LEFT JOIN (SELECT r, c, cnt FROM cells WHERE NOT is_new) s
    ON s.r = p.r AND s.c = p.c
  GROUP BY p.tok),
est_n AS (
  SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS est_new0
  FROM probes p
  LEFT JOIN (SELECT r, c, cnt FROM cells WHERE is_new) s
    ON s.r = p.r AND s.c = p.c
  GROUP BY p.tok),
est AS (
  SELECT o.tok, o.est_old0, n.est_new0
  FROM est_o o JOIN est_n n ON n.tok = o.tok),
exact AS (
  SELECT t.tok,
         SUM(CASE WHEN NOT t.is_new THEN 1 ELSE 0 END) AS exact_old,
         SUM(CASE WHEN t.is_new THEN 1 ELSE 0 END) AS exact_new
  FROM tok t JOIN cand USING (tok) GROUP BY t.tok)
SELECT c.tok,
       CAST(COALESCE(x.exact_old, 0) AS BIGINT) AS exact_old,
       CAST(COALESCE(x.exact_new, 0) AS BIGINT) AS exact_new,
       CAST(COALESCE(e.est_old0, 0) AS BIGINT) AS est_old,
       CAST(COALESCE(e.est_new0, 0) AS BIGINT) AS est_new,
       CAST(COALESCE(e.est_new0, 0) - COALESCE(e.est_old0, 0) AS BIGINT)
         AS delta_est,
       CAST(COALESCE(x.exact_new, 0) - COALESCE(x.exact_old, 0) AS BIGINT)
         AS delta_exact
FROM cand c
LEFT JOIN est e ON e.tok = c.tok
LEFT JOIN exact x ON x.tok = c.tok
"""

ORACLES["events_quantile_sketch"] = """
WITH ev AS (
  SELECT event_type,
         GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) AS v_c
  FROM events),
bk AS (
  SELECT event_type,
         (length(bin(v_c)) - 1) * 8
         + ((v_c >> greatest(length(bin(v_c)) - 4, 0)) & 7) AS b,
         COUNT(*) AS cnt
  FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bk),
rep AS (
  SELECT *, CASE WHEN b < 24 THEN b % 8
                 ELSE ((8 + b % 8) << (b // 8 - 3))
                      + (CASE WHEN b // 8 > 3
                              THEN CAST(1 AS BIGINT) << (b // 8 - 4)
                              ELSE 0 END)
            END AS rep
  FROM cum),
est AS (
  SELECT event_type, MAX(n) AS n_events, COUNT(*) AS n_buckets,
         MIN(CASE WHEN cum * 1000 >= 500 * n THEN rep END) AS p50_est,
         MIN(CASE WHEN cum * 1000 >= 950 * n THEN rep END) AS p95_est,
         MIN(CASE WHEN cum * 1000 >= 990 * n THEN rep END) AS p99_est
  FROM rep GROUP BY event_type),
hist AS (
  SELECT event_type, v_c, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
hcum AS (
  SELECT event_type, v_c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist),
exact AS (
  SELECT event_type,
         MIN(CASE WHEN cum * 1000 >= 500 * n THEN v_c END) AS p50_exact,
         MIN(CASE WHEN cum * 1000 >= 950 * n THEN v_c END) AS p95_exact,
         MIN(CASE WHEN cum * 1000 >= 990 * n THEN v_c END) AS p99_exact
  FROM hcum GROUP BY event_type)
SELECT e.event_type, CAST(e.n_events AS BIGINT) AS n_events,
       CAST(e.n_buckets AS BIGINT) AS n_buckets,
       CAST(e.p50_est AS BIGINT) AS p50_est,
       CAST(x.p50_exact AS BIGINT) AS p50_exact,
       CAST(e.p95_est AS BIGINT) AS p95_est,
       CAST(x.p95_exact AS BIGINT) AS p95_exact,
       CAST(e.p99_est AS BIGINT) AS p99_est,
       CAST(x.p99_exact AS BIGINT) AS p99_exact,
       CAST(abs(e.p95_est - x.p95_exact) * 1000
            // greatest(x.p95_exact, 1) AS BIGINT) AS err95_permille
FROM est e JOIN exact x ON e.event_type = x.event_type
"""

ORACLES["sda_source_counts"] = """
SELECT n.n_name AS areasymbol, CAST(COUNT(*) AS BIGINT) AS n
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

ORACLES["docs_media_decode_ppm"] = """
SELECT doc_id AS did,
       CAST(6 + doc_id % 7 AS INTEGER) AS height,
       CAST(8 + doc_id % 5 AS INTEGER) AS width,
       CAST(SUM(
         (299 * (((gs.k % (8 + doc_id % 5)) * 7
                  + (gs.k // (8 + doc_id % 5)) * 13 + doc_id) % 256)
        + 587 * (((gs.k % (8 + doc_id % 5)) * 3
                  + (gs.k // (8 + doc_id % 5)) * 5 + 2 * doc_id) % 256)
        + 114 * (((gs.k % (8 + doc_id % 5)) * 11
                  + (gs.k // (8 + doc_id % 5)) + 3 * doc_id) % 256)) // 1000
       ) AS BIGINT) AS head_sum
FROM documents, generate_series(0, 15) AS gs(k)
GROUP BY doc_id
"""

ORACLES["docs_media_decode_wav"] = """
SELECT doc_id AS did,
       CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
       CAST(64 + doc_id % 17 AS INTEGER) AS n_samples,
       CAST(SUM(abs(((doc_id * 31 + gs.k * 17) % 4096) - 2048)) AS BIGINT)
         AS abs_sum,
       CAST(MAX(abs(((doc_id * 31 + gs.k * 17) % 4096) - 2048)) AS INTEGER)
         AS peak
FROM documents,
     LATERAL unnest(generate_series(0, 64 + doc_id % 17 - 1)) AS gs(k)
GROUP BY doc_id
"""

ORACLES["docs_media_phash_dups"] = """
WITH px AS (
  SELECT doc_id, gs.k % 16 AS x, gs.k // 16 AS y,
         ((gs.k % 16) * 7 + (gs.k // 16) * 13 + (doc_id % 37) * 29) % 240
           + (doc_id % 7) AS r,
         ((gs.k % 16) * 3 + (gs.k // 16) * 5 + (doc_id % 37) * 17) % 240
           + (doc_id % 7) AS g,
         ((gs.k % 16) * 11 + (gs.k // 16) + (doc_id % 37) * 23) % 240
           + (doc_id % 7) AS b
  FROM documents, generate_series(0, 255) AS gs(k)),
pool AS (
  SELECT doc_id, y // 2 AS py, x // 2 AS pxc,
         SUM((299 * r + 587 * g + 114 * b) // 1000) // 4 AS p
  FROM px GROUP BY doc_id, y // 2, x // 2),
m AS (SELECT doc_id, SUM(p) // 64 AS mean FROM pool GROUP BY doc_id),
bits AS (
  SELECT pool.doc_id, py * 8 + pxc AS bidx,
         CASE WHEN p > mean THEN 1 ELSE 0 END AS bit
  FROM pool JOIN m ON pool.doc_id = m.doc_id),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bidx < 32
                  THEN bit * (CAST(1 AS BIGINT) << (31 - bidx))
                  ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN bidx >= 32
                  THEN bit * (CAST(1 AS BIGINT) << (63 - bidx))
                  ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM bits GROUP BY doc_id)
SELECT doc_id AS did, ahash_hi, ahash_lo,
       MIN(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo) AS group_rep,
       COUNT(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS group_n
FROM h
"""

ORACLES["docs_media_clean_manifest"] = f"""
WITH ph AS ({ORACLES["docs_media_phash_dups"]}),
k AS (SELECT did, CASE WHEN did = group_rep THEN 1 ELSE 0 END AS is_rep
      FROM ph)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(k.is_rep) AS BIGINT) AS n_kept,
       CAST(1000 * SUM(k.is_rep) // COUNT(*) AS BIGINT) AS kept_permille
FROM documents d JOIN k ON k.did = d.doc_id
GROUP BY d.source
"""

ORACLES["docs_stream_media_phash"] = f"""
WITH ph AS ({ORACLES["docs_media_phash_dups"]})
SELECT n.did AS new_did, c.did AS corpus_did, n.ahash_hi, n.ahash_lo
FROM ph n JOIN ph c ON n.ahash_hi = c.ahash_hi AND n.ahash_lo = c.ahash_lo
WHERE n.did % 2 = 1 AND c.did % 2 = 0
"""

ORACLES["docs_media_audio_fp"] = """
WITH s AS (
  SELECT doc_id, gs.k AS k,
         (((doc_id % 23) * 37 + gs.k * 29) % 512 - 256) * (1 + doc_id % 3)
           AS v
  FROM documents, generate_series(0, 95) AS gs(k)),
e AS (SELECT doc_id, k // 8 AS w, SUM(v * v) AS en
      FROM s GROUP BY doc_id, k // 8),
d AS (SELECT doc_id, w,
             CASE WHEN en > LAG(en) OVER (PARTITION BY doc_id ORDER BY w)
                  THEN 1 ELSE 0 END AS bit
      FROM e),
f AS (SELECT doc_id,
             CAST(SUM(CASE WHEN w > 0
                      THEN bit * (CAST(1 AS BIGINT) << (11 - w))
                      ELSE 0 END) AS BIGINT) AS fp
      FROM d GROUP BY doc_id)
SELECT doc_id AS did, fp, CAST(12 AS INTEGER) AS n_windows,
       MIN(doc_id) OVER (PARTITION BY fp) AS group_rep,
       COUNT(*) OVER (PARTITION BY fp) AS group_n
FROM f
"""

ORACLES["docs_stream_media_audio"] = f"""
WITH af AS ({ORACLES["docs_media_audio_fp"]})
SELECT n.did AS new_did, c.did AS corpus_did, n.fp, n.n_windows
FROM af n JOIN af c ON n.fp = c.fp AND n.n_windows = c.n_windows
WHERE n.did % 2 = 1 AND c.did % 2 = 0
"""


ORACLES["docs_media_video_neardup"] = """
WITH v AS (SELECT doc_id, 24 + doc_id % 5 AS n FROM documents),
f AS (
  SELECT v.doc_id AS did, gs.j AS j,
         md5(rpad(CASE WHEN (gs.j + v.doc_id) % 10 = 0
                       THEN 'u' || CAST(v.doc_id AS VARCHAR)
                       ELSE 'b' || CAST(v.doc_id % 29 AS VARCHAR) END
                  || ':' || CAST(gs.j AS VARCHAR), 64, ' ')) AS h
  FROM v, generate_series(0, 28) AS gs(j)
  WHERE gs.j < v.n),
c AS (SELECT did, COUNT(*) AS nf FROM f GROUP BY did),
disc AS (
  SELECT did, h FROM f
  WHERE h IN (SELECT h FROM f GROUP BY h HAVING COUNT(*) <= 1000)),
p AS (SELECT a.did AS did_a, b.did AS did_b, COUNT(*) AS shared
      FROM disc a JOIN disc b ON a.h = b.h AND a.did < b.did
      GROUP BY a.did, b.did)
SELECT p.did_a, p.did_b, CAST(p.shared AS BIGINT) AS shared,
       CAST(ca.nf AS BIGINT) AS nf_a, CAST(cb.nf AS BIGINT) AS nf_b,
       CAST(1000 * p.shared // (ca.nf + cb.nf - p.shared) AS BIGINT)
         AS jacc_e3
FROM p JOIN c ca ON ca.did = p.did_a JOIN c cb ON cb.did = p.did_b
WHERE 1000 * p.shared // (ca.nf + cb.nf - p.shared) >= 500
"""

ORACLES["wss_source_ingest"] = """
SELECT 'NE' || CAST(100 + r_regionkey AS VARCHAR) AS areasymbol,
       CAST(20200101 + r_regionkey AS BIGINT) AS surveydate,
       'ok' AS status,
       CAST(20200000 + (1 + r_regionkey) * 100 + 10 + r_regionkey AS BIGINT)
         AS tabular_date,
       CAST(2 AS INTEGER) AS n_files
FROM region
"""


ORACLES["emb_matryoshka_recall"] = f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
e16 AS (SELECT vec_id,
             list_transform(list_slice(embedding, 1, 16),
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
      FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e16 WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e16 WHERE vec_id >= 8),
s AS (SELECT qid, cid, {_COS} AS cos_e6 FROM c CROSS JOIN q),
approx AS (
  SELECT qid, cid FROM (SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
  WHERE rn <= 5),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid
"""

# --- Round 5 breadth batch C ------------------------------------------------

ORACLES["events_scd2_history"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
chg AS (
  SELECT * FROM (
    SELECT user_id, us, event_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) AS prev_state
    FROM ev)
  WHERE prev_state IS NULL OR prev_state <> event_type)
SELECT user_id, event_type AS state, us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS INTEGER) AS version,
       CAST(CASE WHEN LEAD(us) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) IS NULL
            THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM chg
"""

ORACLES["events_decayed_engagement"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
ref AS (SELECT MAX(day) AS rd FROM ev)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(day) AS BIGINT) AS last_day,
       CAST(SUM(vc * (CAST(1 AS BIGINT)
                      << (20 - least(rd - day, 20)))) AS BIGINT)
         AS decayed_score
FROM ev CROSS JOIN ref
GROUP BY user_id
"""

ORACLES["events_retention_cohorts"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_num
  FROM events),
c AS (
  SELECT user_id, day_num,
         MIN(day_num) OVER (PARTITION BY user_id) AS cohort_day
  FROM ud),
ret AS (
  SELECT cohort_day, day_num - cohort_day AS day_offset,
         COUNT(DISTINCT user_id) AS retained
  FROM c GROUP BY 1, 2),
sz AS (SELECT cohort_day, retained AS cohort_n FROM ret WHERE day_offset = 0)
SELECT r.cohort_day, r.day_offset, r.retained, s.cohort_n,
       r.retained * 1000000 // s.cohort_n AS ppm
FROM ret r JOIN sz s USING (cohort_day)
"""


def _zorder_sql() -> str:
    from .functions.layout import morton_sql

    z = morton_sql("u", "d", 6, " // ")
    return f"""
WITH pts AS (
  SELECT user_id % 64 AS u,
         (epoch_us(ts) // 86400000000) % 64 AS d
  FROM events),
zs AS (SELECT u, d, {z} AS zval FROM pts)
SELECT 'zorder' AS layout, zval // 256 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(u) AS min_u, MAX(u) AS max_u, MIN(d) AS min_d, MAX(d) AS max_d
FROM zs GROUP BY 2
UNION ALL
SELECT 'linear' AS layout, u // 4 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(u) AS min_u, MAX(u) AS max_u, MIN(d) AS min_d, MAX(d) AS max_d
FROM pts GROUP BY 2
"""


ORACLES["layout_zorder"] = _zorder_sql()

ORACLES["docs_inverted_index"] = """
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       unnest(generate_series(1, len(tk))) gs(i)
  WHERE tk[i] <> ''),
perdoc AS (
  SELECT term, doc_id, COUNT(*) AS tf,
         array_to_string(list_sort(list(pos)), ',') AS ps
  FROM tok GROUP BY term, doc_id),
terms AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM perdoc GROUP BY term),
postings AS (
  SELECT p.term,
         string_agg(p.doc_id || ':' || p.ps, ';' ORDER BY p.doc_id)
           AS postings
  FROM perdoc p JOIN terms t USING (term)
  WHERE t.df <= 32
  GROUP BY p.term)
SELECT t.term, t.df, t.cf, po.postings
FROM terms t LEFT JOIN postings po USING (term)
"""


def _pagerank_sql(iters: int = 10) -> str:
    sql = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
pairs AS (
  SELECT src, dst FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) AS src,
           event_type AS dst
    FROM ev)
  WHERE src IS NOT NULL),
edges AS (SELECT src, dst, COUNT(*) AS c FROM pairs GROUP BY src, dst),
nodes AS (SELECT DISTINCT event_type AS node FROM ev),
outd AS (SELECT src, SUM(c) AS outc FROM edges GROUP BY src),
pr0 AS (
  SELECT node,
         CAST(1000000 // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS r
  FROM nodes)"""
    for k in range(iters):
        sql += f""",
acc{k} AS (
  SELECT e.dst AS node, SUM((p.r * e.c) // o.outc) AS acc
  FROM pr{k} p JOIN edges e ON e.src = p.node
  JOIN outd o ON o.src = p.node
  GROUP BY e.dst),
pr{k + 1} AS (
  SELECT n.node,
         CAST(150000 // (SELECT COUNT(*) FROM nodes)
              + (850000 * COALESCE(a.acc, 0)) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN acc{k} a USING (node))"""
    return sql + f"\nSELECT node, r FROM pr{iters}"


ORACLES["events_pagerank"] = _pagerank_sql()

ORACLES["docs_normalize_text"] = """
SELECT doc_id,
       CAST(length(trim(regexp_replace(lower(text), '[ \\t]+', ' ', 'g')))
            AS INTEGER) AS n_chars_norm,
       md5(trim(regexp_replace(lower(text), '[ \\t]+', ' ', 'g')))
         AS norm_md5,
       CAST(CASE WHEN trim(regexp_replace(lower(text), '[ \\t]+', ' ', 'g'))
                      <> text THEN 1 ELSE 0 END AS INTEGER) AS changed
FROM documents
"""

ORACLES["events_stream_transition"] = ORACLES["events_transition_matrix"]

# --- Round 5 breadth batch D ------------------------------------------------

ORACLES["events_point_in_time_join"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
u AS (
  SELECT user_id, us, event_id, event_type AS state, 0 AS kind
  FROM ev WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, us, event_id, CAST(NULL AS VARCHAR) AS state, 1 AS kind
  FROM ev WHERE event_type = 'purchase'),
e AS (
  SELECT user_id, us, event_id, kind,
         last_value(state IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, kind, event_id
           ROWS UNBOUNDED PRECEDING) AS state_asof
  FROM u)
SELECT event_id, user_id, us, state_asof FROM e WHERE kind = 1
"""

ORACLES["docs_collocations"] = """
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       unnest(generate_series(1, len(tk))) gs(i)
  WHERE tk[i] <> ''),
sq AS (
  SELECT doc_id, pos, w,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok),
pairs AS (
  SELECT w AS x, nxt AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM sq WHERE nxt IS NOT NULL
  GROUP BY w, nxt),
xm AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM pairs GROUP BY x),
ym AS (SELECT y, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM pairs GROUP BY y),
n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_bg FROM pairs)
SELECT p.x, p.y, p.c_xy, xm.c_x, ym.c_y,
       (p.c_xy * n.n_bg * 1000000) // (xm.c_x * ym.c_y) AS pmi_e6
FROM pairs p JOIN xm USING (x) JOIN ym USING (y), n
WHERE p.c_xy >= 5
ORDER BY pmi_e6 DESC, p.x ASC, p.y ASC
LIMIT 100
"""

ORACLES["docs_lm_quality"] = """
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, tk[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       unnest(generate_series(1, len(tk))) gs(i)
  WHERE tk[i] <> ''),
sq AS (
  SELECT doc_id, pos, w,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok),
bg AS (SELECT doc_id, w AS x, nxt AS y FROM sq WHERE nxt IS NOT NULL),
ref AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM bg WHERE doc_id % 10 = 0 GROUP BY x, y),
rx AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM ref GROUP BY x),
v AS (SELECT CAST(COUNT(DISTINCT y) AS BIGINT) AS vocab FROM ref),
sc AS (
  SELECT b.doc_id,
         ((COALESCE(r.c_xy, 0) + 1) * 1000000)
           // (COALESCE(rx.c_x, 0) + v.vocab) AS p_e6
  FROM bg b
  LEFT JOIN ref r ON b.x = r.x AND b.y = r.y
  LEFT JOIN rx ON b.x = rx.x, v)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
       CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS score_e6
FROM sc GROUP BY doc_id
"""

ORACLES["docs_dsir_sample"] = """
WITH tok AS (
  SELECT doc_id, source, i - 1 AS pos, tk[i] AS w
  FROM (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
       unnest(generate_series(1, len(tk))) gs(i)
  WHERE tk[i] <> ''),
sq AS (
  SELECT doc_id, source, pos, w,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok),
bg AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('dsir:' || w || ' ' || nxt), 1, 15))
              AS BIGINT) % 1000000000000 % 1024 AS b
  FROM sq WHERE nxt IS NOT NULL),
cp AS (SELECT b, COUNT(*) AS c_p FROM bg WHERE source = 'src0' GROUP BY b),
cq AS (SELECT b, COUNT(*) AS c_q FROM bg WHERE source <> 'src0' GROUP BY b),
np AS (SELECT COUNT(*) AS n_p FROM bg WHERE source = 'src0'),
nq AS (SELECT COUNT(*) AS n_q FROM bg WHERE source <> 'src0'),
ratio AS (
  SELECT COALESCE(cp.b, cq.b) AS b,
         ((COALESCE(c_p, 0) + 1) * (n_q + 1024) * 1000000)
           // ((COALESCE(c_q, 0) + 1) * (n_p + 1024)) AS r_e6
  FROM cp FULL OUTER JOIN cq ON cp.b = cq.b, np, nq),
wdoc AS (
  SELECT g.doc_id, g.source, COUNT(*) AS n_bg,
         SUM(r.r_e6) // COUNT(*) AS w_e6
  FROM bg g JOIN ratio r ON r.b = g.b
  WHERE g.source <> 'src0'
  GROUP BY g.doc_id, g.source),
pool AS (SELECT SUM(w_e6) // COUNT(*) AS pool_mean_w_e6 FROM wdoc),
keyed AS (
  SELECT doc_id, source, n_bg, w_e6,
         CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 1000000000000 AS u,
         GREATEST(w_e6, 1) AS wt
  FROM wdoc),
k2 AS (SELECT *, u * 1000000 // wt AS skey FROM keyed),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS INTEGER)
              AS prank
  FROM k2)
SELECT r.doc_id, r.source, CAST(r.n_bg AS BIGINT) AS n_bg,
       CAST(r.w_e6 AS BIGINT) AS w_e6, r.prank,
       CAST(p.pool_mean_w_e6 AS BIGINT) AS pool_mean_w_e6
FROM ranked r, pool p WHERE r.prank <= 50
"""

# BPE merge-rule training: 8 rounds unrolled — each stage re-splits
# the fused corpus, counts adjacent pairs, takes the deterministic
# argmax, and fuses with the SAME canonical single replace the Spark
# side uses: the corpus lives on a DOUBLE-SPACED canvas (tokens joined
# by two spaces, one at each end), so one non-overlapping left-to-
# right replace of ' x  y ' IS the textbook greedy walk — a match
# consumes one boundary space per side, leaving the next adjacency
# pattern-visible (the single-spaced form mis-paired identical-token
# runs). An empty win{i} (no adjacent pair anywhere) leaves the corpus
# untouched via LEFT JOIN ON TRUE + COALESCE, matching Spark's loop
# break. MATERIALIZED hints: each stage references its predecessor
# more than once and CTE inlining would re-evaluate exponentially.
def _bpe_stage(i: int) -> str:
    fuse = (
        f"replace(d.s, ' '||w.x||'  '||w.y||' ', "
        f"' '||w.x||chr(31)||w.y||' ')"
    )
    return f"""
tok{i} AS (
  SELECT doc_id, i2 - 1 AS pos, tk[i2] AS w
  FROM (SELECT doc_id, string_split(s, ' ') AS tk FROM s{i - 1}),
       unnest(generate_series(1, len(tk))) gs(i2)
  WHERE tk[i2] <> ''),
cnt{i} AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT w AS x,
               LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS y
        FROM tok{i})
  WHERE y IS NOT NULL GROUP BY x, y),
win{i} AS MATERIALIZED (
  SELECT CAST({i} AS INTEGER) AS rank, x, y, c
  FROM cnt{i} ORDER BY c DESC, x ASC, y ASC LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT d.doc_id, COALESCE({fuse}, d.s) AS s
  FROM s{i - 1} d LEFT JOIN win{i} w ON TRUE),"""


def _bpe_canvas_sql(cte: str, where: str = "") -> str:
    return (
        f"{cte} AS (SELECT doc_id, ' ' || array_to_string("
        "list_filter(string_split(text, ' '), t -> t <> ''), '  ') || ' ' AS s"
        f" FROM documents{where}),"
    )


_BPE_CANVAS = "WITH " + _bpe_canvas_sql("s0")

ORACLES["docs_bpe_train"] = (
    _BPE_CANVAS
    + "".join(_bpe_stage(i) for i in range(1, 9)).rstrip(",")
    + "\n"
    + "\nUNION ALL\n".join(f"SELECT rank, x, y, c FROM win{i}" for i in range(1, 9))
)

ORACLES["docs_bpe_apply"] = (
    _BPE_CANVAS
    + "".join(_bpe_stage(i) for i in range(1, 9)).rstrip(",")
    + """
SELECT doc_id,
  len(list_filter(string_split(s, ' '), x -> x <> '')) AS n_pieces,
  len(list_filter(string_split(s, ' '),
                  x -> x <> '' AND contains(x, chr(31)))) AS n_fused,
  len(flatten(list_transform(
        list_filter(string_split(s, ' '), x -> x <> ''),
        x -> string_split(x, chr(31))))) AS n_raw_tokens
FROM s8
"""
)

# train/serve split: rules trained on the even half (the same s/win
# chain, s0 restricted), applied to the held-out odd half as a chain
# of the SAME literal canvas replaces (LEFT JOIN ON TRUE so missing
# rules are identity), stats from h8 — mirrors docs_bpe_tokenize.
ORACLES["docs_bpe_tokenize"] = (
    "WITH "
    + _bpe_canvas_sql("s0", " WHERE doc_id % 2 = 0")
    + "".join(_bpe_stage(i) for i in range(1, 9))
    + _bpe_canvas_sql("h0", " WHERE doc_id % 2 = 1")
    + "".join(
        f"""
h{i} AS MATERIALIZED (
  SELECT d.doc_id,
         COALESCE(replace(d.s, ' '||w.x||'  '||w.y||' ',
                          ' '||w.x||chr(31)||w.y||' '), d.s) AS s
  FROM h{i - 1} d LEFT JOIN win{i} w ON TRUE),"""
        for i in range(1, 9)
    ).rstrip(",")
    + """
SELECT doc_id,
  len(list_filter(string_split(s, ' '), x -> x <> '')) AS n_pieces,
  len(list_filter(string_split(s, ' '),
                  x -> x <> '' AND contains(x, chr(31)))) AS n_fused,
  len(flatten(list_transform(
        list_filter(string_split(s, ' '), x -> x <> ''),
        x -> string_split(x, chr(31))))) AS n_raw_tokens
FROM h8
"""
)

# streaming near-dup gate: batch twin of streaming/docs.py — per-row
# shingle sets + minhash (same '<g>#' md5 substrings), odd-ids probe
# the even-id band index (any-band match), exact Jaccard verify.
_RW_MH = ",\n    ".join(
    f"list_min(list_transform(ss, s -> substr(md5('{i // 4}#' || s), "
    f"{1 + 8 * (i % 4)}, 8))) AS mh{i}"
    for i in range(16)
)
_RW_BANDS = ",\n    ".join(
    " || '|' || ".join(f"mh{b * 4 + r}" for r in range(4)) + f" AS b{b}"
    for b in range(4)
)

ORACLES["docs_stream_kmv_vocab"] = """
WITH tk AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
hashed AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5('kmv1:' || tok), 1, 15)) AS BIGINT)
           % 1000000000000 AS h
  FROM tk),
ranked AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed),
agg AS (
  SELECT source, COUNT(*) AS n_sketch,
         MAX(CASE WHEN rk = 64 THEN h END) AS h_k
  FROM ranked WHERE rk <= 64 GROUP BY source)
SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
       CAST(CASE WHEN n_sketch < 64 THEN n_sketch
                 ELSE (63 * 1000000000000) // h_k END AS BIGINT)
         AS est_distinct
FROM agg
"""

ORACLES["docs_stream_priority_sample"] = ORACLES["docs_priority_sample"]

# the drift stream's final state is bit-equal to the batch aggregation
# (linear moments), so the batch oracle certifies the stream verbatim
ORACLES["emb_stream_drift"] = ORACLES["emb_drift"]

ORACLES["docs_stream_cms_grid"] = """
WITH tok AS (
  SELECT tok FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
rows3 AS (SELECT unnest([0, 1, 2]) AS r)
SELECT CAST(r AS BIGINT) AS r,
       CAST(('0x' || substr(md5('cms' || r || ':' || tok), 1, 15)) AS BIGINT)
         % 1000000000000 % 512 AS c,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM tok CROSS JOIN rows3 GROUP BY 1, 2
"""

ORACLES["events_stream_quantile"] = """
WITH ev AS (
  SELECT event_type,
         GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) AS v_c
  FROM events),
bk AS (
  SELECT event_type,
         (length(bin(v_c)) - 1) * 8
         + ((v_c >> greatest(length(bin(v_c)) - 4, 0)) & 7) AS b,
         COUNT(*) AS cnt
  FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bk),
rep AS (
  SELECT *, CASE WHEN b < 24 THEN b % 8
                 ELSE ((8 + b % 8) << (b // 8 - 3))
                      + (CASE WHEN b // 8 > 3
                              THEN CAST(1 AS BIGINT) << (b // 8 - 4)
                              ELSE 0 END)
            END AS rep
  FROM cum)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MIN(CASE WHEN cum * 1000 >= 500 * n THEN rep END) AS BIGINT)
         AS p50_est,
       CAST(MIN(CASE WHEN cum * 1000 >= 950 * n THEN rep END) AS BIGINT)
         AS p95_est,
       CAST(MIN(CASE WHEN cum * 1000 >= 990 * n THEN rep END) AS BIGINT)
         AS p99_est
FROM rep GROUP BY event_type
"""

ORACLES["docs_stream_neardup"] = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         ELSE CAST([] AS VARCHAR[]) END AS ss
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)),
sigs AS (
  SELECT doc_id, ss,
    {_RW_MH}
  FROM base WHERE len(ss) > 0),
banded AS (
  SELECT doc_id, ss,
    {_RW_BANDS}
  FROM sigs),
cand AS (
  SELECT n.doc_id AS new_did, c.doc_id AS corpus_did,
         n.ss AS nss, c.ss AS css
  FROM banded n JOIN banded c
    ON (n.b0 = c.b0 OR n.b1 = c.b1 OR n.b2 = c.b2 OR n.b3 = c.b3)
  WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0)
SELECT new_did, corpus_did, jac_e4 FROM (
  SELECT new_did, corpus_did,
         CAST(floor(CAST(len(list_intersect(nss, css)) AS DOUBLE)
              / (len(nss) + len(css) - len(list_intersect(nss, css)))
              * 10000) AS BIGINT) AS jac_e4
  FROM cand)
WHERE jac_e4 >= 3000
"""

ORACLES["docs_length_deciles"] = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
hist AS (SELECT n_tok, COUNT(*) AS cnt FROM d GROUP BY n_tok),
cum AS (
  SELECT n_tok,
         SUM(cnt) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) - cnt
           AS below
  FROM hist),
tot AS (SELECT SUM(cnt) AS n_total FROM hist)
SELECT d.doc_id, CAST(d.n_tok AS INTEGER) AS n_tok,
       (10 * c.below) // t.n_total AS decile
FROM d JOIN cum c USING (n_tok), tot t
"""

# --- Round 5 breadth batch E ------------------------------------------------

ORACLES["events_multitouch_attribution"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
t AS (
  SELECT user_id, us, event_id, event_type,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
           AS n_touches
  FROM ev)
SELECT event_id, user_id, us,
       CAST(COALESCE(n_touches, 0) AS BIGINT) AS n_touches,
       CASE WHEN COALESCE(n_touches, 0) > 0
            THEN 1000000 // n_touches END AS credit_ppm
FROM t WHERE event_type = 'purchase'
"""

ORACLES["events_session_paths"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
g AS (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                   > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM ev),
s AS (
  SELECT user_id, us, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g),
p AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path
  FROM s GROUP BY user_id, sess_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""

ORACLES["docs_containment"] = f"""
WITH {_JACCARD_COMMON},
inter AS (
  SELECT a.did AS src, b.did AS dst, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ex a JOIN ex b ON a.s = b.s AND a.did <> b.did
  GROUP BY 1, 2)
SELECT i.src, i.dst, i.n_common, CAST(sz.nsh AS BIGINT) AS n_sh,
       (i.n_common * 1000000) // sz.nsh AS containment_ppm
FROM inter i JOIN sizes sz ON sz.did = i.src
WHERE i.n_common * 2 >= sz.nsh * 1
"""

ORACLES["events_stream_scd2"] = ORACLES["events_scd2_history"]

ORACLES["events_conversion_latency"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
t AS (
  SELECT user_id, us, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN us END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_us
  FROM ev),
lat AS (
  SELECT CASE WHEN click_us IS NOT NULL
              THEN CAST(length(bin((us - click_us) // 1000000)) AS INTEGER)
         END AS bucket_log2s
  FROM t WHERE event_type = 'purchase')
SELECT bucket_log2s, CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM lat GROUP BY bucket_log2s
"""

ORACLES["partitioned_sink_prune"] = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events),
fd AS (SELECT MIN(day_num) AS d0 FROM ev)
SELECT day_num, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v_c) AS BIGINT) AS value_c
FROM ev, fd
WHERE day_num >= fd.d0 AND day_num < fd.d0 + 7
GROUP BY day_num, event_type
"""

ORACLES["events_incremental_rollup"] = """
SELECT epoch_us(ts) // 86400000000 AS day_num, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events
GROUP BY 1, 2
"""

ORACLES["events_props_variant"] = """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM e GROUP BY event_type
"""

ORACLES["events_cdc_diff"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         epoch_us(ts) // 86400000000
           - (SELECT MIN(epoch_us(ts) // 86400000000) FROM events) AS d
  FROM events),
old AS (
  SELECT user_id, event_type AS old_state FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM ev WHERE d < 20) WHERE rn = 1),
new AS (
  SELECT user_id, event_type AS new_state FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM ev WHERE d >= 10) WHERE rn = 1)
SELECT COALESCE(o.user_id, n.user_id) AS user_id, o.old_state, n.new_state,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.old_state <> n.new_state THEN 'update' END AS change
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
WHERE CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.old_state <> n.new_state THEN 'update' END IS NOT NULL
"""

ORACLES["events_rollup_cube"] = """
SELECT epoch_us(ts) // 86400000000 AS day_num, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
       CAST(GROUPING(epoch_us(ts) // 86400000000) * 2
            + GROUPING(event_type) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP (epoch_us(ts) // 86400000000, event_type)
"""

ORACLES["docs_weighted_sample"] = """
WITH d AS (
  SELECT doc_id,
         GREATEST(len(string_split(text, ' ')), 1) AS w,
         CAST(('0x' || substr(md5('wsample1:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM documents)
SELECT doc_id, CAST(w AS INTEGER) AS w, h // w AS priority
FROM d
ORDER BY priority ASC, doc_id ASC
LIMIT 100
"""

ORACLES["events_ab_assignment"] = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id),
a AS (
  SELECT user_id, converted,
         CASE WHEN CAST(('0x' || substr(md5('exp1:' ||
                CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 500
              THEN 'treatment' ELSE 'control' END AS arm
  FROM u)
SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       SUM(converted) * 1000000 // COUNT(*) AS conv_ppm
FROM a GROUP BY arm
"""

ORACLES["docs_simhash_pairs"] = f"""
WITH ex AS (
  SELECT doc_id AS did, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents),
h AS (SELECT did, md5(w) AS h FROM ex),
bits AS (SELECT did, {_SIMHASH_BITS} FROM h GROUP BY did),
sig AS (SELECT did, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM bits),
bands AS (
  SELECT did, simhash, b.band,
         (simhash // CASE b.band WHEN 0 THEN 1 WHEN 1 THEN 16
                                 WHEN 2 THEN 256 ELSE 4096 END) % 16 AS bv
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b),
cand AS (
  SELECT DISTINCT a.did AS i, b.did AS j,
                  a.simhash AS si, b.simhash AS sj
  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
  WHERE a.did < b.did)
SELECT i, j, CAST(bit_count(xor(si, sj)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(si, sj)) <= 3
"""

ORACLES["events_value_profile"] = """
WITH src AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM src WHERE v IS NOT NULL)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       MIN(v) AS vmin, MAX(v) AS vmax,
       CAST(SUM(CASE
         WHEN n % 2 = 1 AND rn = (n + 1) // 2 THEN 2 * v
         WHEN n % 2 = 0 AND (rn = n // 2 OR rn = n // 2 + 1) THEN v
         ELSE 0 END) AS BIGINT) AS med2,
       MAX(CASE WHEN rn = (19 * (n - 1)) // 20 + 1 THEN v END) AS p95
FROM r GROUP BY event_type
"""


# --- Round 9: growing-index ingest gates ------------------------------------

#: the ingest-mix planted-group seed (functions/multimodal.py::
#: ingest_mix_group) — piecewise so all three gate outcomes coexist:
#: cross-parity small classes (corpus dups), parity-separated 8-blocks
#: (within-stream chains), singletons (novel admits)
#: three families interleaved mod 3 (disjoint without corpus-size
#: constants); the gm reduction (mod 2**22) bounds every hash product
#: under 2**63 in both engines — see multimodal._MIX_HASH_MOD
_MIX_G = """CASE WHEN doc_id % 5 < 2 THEN 3 * (doc_id % 23)
         WHEN doc_id % 5 < 4 THEN 3 * (2 * (doc_id // 8) + doc_id % 2) + 1
         ELSE 3 * doc_id + 2 END"""

# growing IMAGE gate: aHash over the ingest-mix planted images; exact
# fingerprints are transitive, so the sequential fold collapses to
# min-doc_id-per-fingerprint (the single availableNow trigger makes
# arrival order doc_id order)
ORACLES["docs_stream_image_gate_grow"] = f"""
WITH grp AS (SELECT doc_id, ({_MIX_G}) % 4194304 AS gm FROM documents),
px AS (
  SELECT doc_id, gs.k % 16 AS x, gs.k // 16 AS y,
         ((gm + 1) * (3 * gs.k + 1) * 2654435761) % 4294967296
           // 65536 % 240 + (doc_id % 7) AS r,
         ((gm + 1) * (3 * gs.k + 2) * 2654435761) % 4294967296
           // 65536 % 240 + (doc_id % 7) AS gg,
         ((gm + 1) * (3 * gs.k + 3) * 2654435761) % 4294967296
           // 65536 % 240 + (doc_id % 7) AS b
  FROM grp, generate_series(0, 255) AS gs(k)),
pool AS (
  SELECT doc_id, y // 2 AS py, x // 2 AS pxc,
         SUM((299 * r + 587 * gg + 114 * b) // 1000) // 4 AS p
  FROM px GROUP BY doc_id, y // 2, x // 2),
m AS (SELECT doc_id, SUM(p) // 64 AS mean FROM pool GROUP BY doc_id),
bits AS (
  SELECT pool.doc_id, py * 8 + pxc AS bidx,
         CASE WHEN p > mean THEN 1 ELSE 0 END AS bit
  FROM pool JOIN m ON pool.doc_id = m.doc_id),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bidx < 32
                  THEN bit * (CAST(1 AS BIGINT) << (31 - bidx))
                  ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN bidx >= 32
                  THEN bit * (CAST(1 AS BIGINT) << (63 - bidx))
                  ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM bits GROUP BY doc_id),
idx AS (
  SELECT ahash_hi, ahash_lo, MIN(doc_id) AS cd
  FROM h WHERE doc_id % 2 = 0 GROUP BY 1, 2),
s AS (
  SELECT doc_id, ahash_hi, ahash_lo,
         MIN(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo) AS first_did
  FROM h WHERE doc_id % 2 = 1)
SELECT s.doc_id AS did, s.ahash_hi, s.ahash_lo,
       CASE WHEN i.cd IS NOT NULL THEN 'dup_corpus'
            WHEN s.doc_id = s.first_did THEN 'admit'
            ELSE 'dup_stream' END AS status,
       CASE WHEN i.cd IS NOT NULL THEN i.cd
            WHEN s.doc_id = s.first_did THEN NULL
            ELSE s.first_did END AS match_did
FROM s LEFT JOIN idx i
  ON s.ahash_hi = i.ahash_hi AND s.ahash_lo = i.ahash_lo
"""

# growing AUDIO gate: energy-delta FP over the ingest-mix hash
# waveform (multiplicative orbit per group; the sawtooth family's
# fingerprints collapse to ~46 values, see planted_audio)
ORACLES["docs_stream_audio_gate_grow"] = f"""
WITH grp AS (SELECT doc_id, ({_MIX_G}) % 4194304 AS gm FROM documents),
s AS (
  SELECT doc_id, gs.k AS k,
         ((gm + 1) * (gs.k + 1) * 2654435761) % 4294967296 // 16777216 - 128
           AS v0
  FROM grp, generate_series(0, 95) AS gs(k)),
sv AS (SELECT doc_id, k, v0 * (1 + doc_id % 3) AS v FROM s),
e AS (SELECT doc_id, k // 8 AS w, SUM(v * v) AS en
      FROM sv GROUP BY doc_id, k // 8),
d AS (SELECT doc_id, w,
             CASE WHEN en > LAG(en) OVER (PARTITION BY doc_id ORDER BY w)
                  THEN 1 ELSE 0 END AS bit
      FROM e),
f AS (SELECT doc_id,
             CAST(SUM(CASE WHEN w > 0
                      THEN bit * (CAST(1 AS BIGINT) << (11 - w))
                      ELSE 0 END) AS BIGINT) AS fp
      FROM d GROUP BY doc_id),
idx AS (SELECT fp, MIN(doc_id) AS cd FROM f WHERE doc_id % 2 = 0 GROUP BY fp),
st AS (
  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS first_did
  FROM f WHERE doc_id % 2 = 1)
SELECT st.doc_id AS did, st.fp, CAST(12 AS INTEGER) AS n_windows,
       CASE WHEN i.cd IS NOT NULL THEN 'dup_corpus'
            WHEN st.doc_id = st.first_did THEN 'admit'
            ELSE 'dup_stream' END AS status,
       CASE WHEN i.cd IS NOT NULL THEN i.cd
            WHEN st.doc_id = st.first_did THEN NULL
            ELSE st.first_did END AS match_did
FROM st LEFT JOIN idx i ON st.fp = i.fp
"""

# round 10: the SPECTRAL-SHAPE audio family — same planted hash
# waveform, fingerprint = per-frame signs of adjacent comb-filter-bank
# band-energy differences (28 bits vs the delta family's 11); exact
# fingerprints are transitive, so the fold is min-per-fp like the
# delta gate's
ORACLES["docs_stream_audio_gate_grow_spectral"] = f"""
WITH grp AS (SELECT doc_id, ({_MIX_G}) % 4194304 AS gm FROM documents),
s AS (
  SELECT doc_id, gs.k AS k,
         ((gm + 1) * (gs.k + 1) * 2654435761) % 4294967296 // 16777216 - 128
           AS v0
  FROM grp, generate_series(0, 95) AS gs(k)),
sv AS (SELECT doc_id, k, v0 * (1 + doc_id % 3) AS v FROM s),
c AS (
  SELECT doc_id, k // 24 AS f, bs.b AS b,
         SUM(CASE WHEN ((k % 24) // (bs.b + 1)) % 2 = 0 THEN v ELSE -v END)
           AS corr
  FROM sv, generate_series(0, 7) AS bs(b)
  GROUP BY doc_id, k // 24, bs.b),
e AS (SELECT doc_id, f, b, corr * corr AS en FROM c),
d AS (SELECT doc_id, f, b,
             CASE WHEN en > LAG(en) OVER (PARTITION BY doc_id, f ORDER BY b)
                  THEN 1 ELSE 0 END AS bit
      FROM e),
fpt AS (SELECT doc_id,
             CAST(SUM(CASE WHEN b > 0
                      THEN bit * (CAST(1 AS BIGINT) << (27 - (f * 7 + b - 1)))
                      ELSE 0 END) AS BIGINT) AS fp
      FROM d GROUP BY doc_id),
idx AS (SELECT fp, MIN(doc_id) AS cd FROM fpt WHERE doc_id % 2 = 0
        GROUP BY fp),
st AS (
  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS first_did
  FROM fpt WHERE doc_id % 2 = 1)
SELECT st.doc_id AS did, st.fp, CAST(4 AS INTEGER) AS n_windows,
       CASE WHEN i.cd IS NOT NULL THEN 'dup_corpus'
            WHEN st.doc_id = st.first_did THEN 'admit'
            ELSE 'dup_stream' END AS status,
       CASE WHEN i.cd IS NOT NULL THEN i.cd
            WHEN st.doc_id = st.first_did THEN NULL
            ELSE st.first_did END AS match_did
FROM st LEFT JOIN idx i ON st.fp = i.fp
"""

# round 10: the RANK-ORDER audio family — the joint argsort of all 32
# frame×band energies, md5-packed; near-injective on the waveform
ORACLES["docs_stream_audio_gate_grow_rank"] = f"""
WITH grp AS (SELECT doc_id, ({_MIX_G}) % 4194304 AS gm FROM documents),
s AS (
  SELECT doc_id, gs.k AS k,
         ((gm + 1) * (gs.k + 1) * 2654435761) % 4294967296 // 16777216 - 128
           AS v0
  FROM grp, generate_series(0, 95) AS gs(k)),
sv AS (SELECT doc_id, k, v0 * (1 + doc_id % 3) AS v FROM s),
c AS (
  SELECT doc_id, (k // 24) * 8 + bs.b AS pos,
         SUM(CASE WHEN ((k % 24) // (bs.b + 1)) % 2 = 0 THEN v ELSE -v END)
           AS corr
  FROM sv, generate_series(0, 7) AS bs(b)
  GROUP BY doc_id, (k // 24) * 8 + bs.b),
o AS (SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY corr * corr, pos) AS rn
      FROM c),
fpt AS (SELECT doc_id,
               md5(string_agg(CAST(pos AS VARCHAR), '|' ORDER BY rn)) AS fp
        FROM o GROUP BY doc_id),
idx AS (SELECT fp, MIN(doc_id) AS cd FROM fpt WHERE doc_id % 2 = 0
        GROUP BY fp),
st AS (
  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS first_did
  FROM fpt WHERE doc_id % 2 = 1)
SELECT st.doc_id AS did, st.fp, CAST(4 AS INTEGER) AS n_windows,
       CASE WHEN i.cd IS NOT NULL THEN 'dup_corpus'
            WHEN st.doc_id = st.first_did THEN 'admit'
            ELSE 'dup_stream' END AS status,
       CASE WHEN i.cd IS NOT NULL THEN i.cd
            WHEN st.doc_id = st.first_did THEN NULL
            ELSE st.first_did END AS match_did
FROM st LEFT JOIN idx i ON st.fp = i.fp
"""

# growing TEXT near-dup gate: Jaccard is NOT transitive, so the
# sequential fold is genuine — a recursive CTE replays admission in
# doc_id order (the single availableNow trigger makes arrival order
# doc_id order): a doc is dup iff it has a band-colliding verified
# match in the corpus (dup_corpus) or among EARLIER-ADMITTED stream
# docs (dup_stream); otherwise it is admitted and joins the index
ORACLES["docs_stream_text_gate_grow"] = f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         ELSE CAST([] AS VARCHAR[]) END AS ss
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)),
sigs AS MATERIALIZED (SELECT doc_id, ss, {{RW_MH}} FROM base WHERE len(ss) > 0),
banded AS MATERIALIZED (SELECT doc_id, ss, {{RW_BANDS}} FROM sigs),
cm AS MATERIALIZED (
  SELECT n.doc_id AS did, MIN(c.doc_id) AS cmatch
  FROM banded n JOIN banded c
    ON (n.b0 = c.b0 OR n.b1 = c.b1 OR n.b2 = c.b2 OR n.b3 = c.b3)
  WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
    AND CAST(floor(CAST(len(list_intersect(n.ss, c.ss)) AS DOUBLE)
        / (len(n.ss) + len(c.ss) - len(list_intersect(n.ss, c.ss)))
        * 10000) AS BIGINT) >= 3000
  GROUP BY n.doc_id),
sp AS MATERIALIZED (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM banded a JOIN banded b
    ON (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1 AND a.doc_id < b.doc_id
    AND CAST(floor(CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
        / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)))
        * 10000) AS BIGINT) >= 3000),
ord AS MATERIALIZED (
  SELECT s.doc_id AS did, cm.cmatch,
         ROW_NUMBER() OVER (ORDER BY s.doc_id) AS rn
  FROM sigs s LEFT JOIN cm ON cm.did = s.doc_id
  WHERE s.doc_id % 2 = 1),
fold(rn, did, status, match_did, admitted) AS (
  SELECT 0, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST([] AS BIGINT[])
  UNION ALL
  SELECT o.rn, o.did,
    CASE WHEN o.cmatch IS NOT NULL THEN 'dup_corpus'
         WHEN (SELECT MIN(p.i) FROM sp p
               WHERE p.j = o.did AND list_contains(f.admitted, p.i))
              IS NOT NULL THEN 'dup_stream'
         ELSE 'admit' END,
    COALESCE(o.cmatch,
      (SELECT MIN(p.i) FROM sp p
       WHERE p.j = o.did AND list_contains(f.admitted, p.i))),
    CASE WHEN o.cmatch IS NULL
          AND (SELECT MIN(p.i) FROM sp p
               WHERE p.j = o.did
                 AND list_contains(f.admitted, p.i)) IS NULL
         THEN list_append(f.admitted, o.did) ELSE f.admitted END
  FROM fold f JOIN ord o ON o.rn = f.rn + 1)
SELECT did, status, match_did FROM fold WHERE rn > 0
"""
ORACLES["docs_stream_text_gate_grow"] = ORACLES[
    "docs_stream_text_gate_grow"
].replace("{RW_MH}", _RW_MH).replace("{RW_BANDS}", _RW_BANDS)


# --- Round 9: partitioned gSSURGO lake + incremental nightly ----------------

# single-survey pruned rating: the planner result restricted to the
# AS7 partition's mukeys (areasymbol = 'AS' || mukey % 20)
ORACLES["gssurgo_lake_prune"] = f"""
SELECT 'AS7' AS areasymbol, q.* FROM ({ORACLES["planner_sdv_rating"]}) q
WHERE q.mukey % 20 = 7
"""

# the incremental refresh must equal the FULL recompute — the oracle
# IS the full-recompute SQL, so the hash match proves the stale
# partitions were replaced and per-mukey independence holds
ORACLES["nightly_gssurgo_incremental"] = f"""
SELECT 'AS' || CAST(mukey % 20 AS VARCHAR) AS areasymbol, q.*
FROM ({ORACLES["nightly_gssurgo"]}) q
"""


# --- Round 9: IVF nprobe sweep (recall + scan cost) --------------------------

def _ivf_nprobe_sql(nprobe: int) -> str:
    """recall@5 + scanned-candidate count at a given nprobe — the
    stand-in-centroid IVF (emb_knn_ivf) unrolled with a parameterized
    probe width and the probed-list size surfaced per query."""
    return f"""
WITH exact AS ({ORACLES["emb_knn_bruteforce"]}),
{_EMB_Q},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 8),
k AS (SELECT vec_id AS kid, v AS kv FROM e WHERE vec_id >= 8 AND vec_id < 24),
asg AS (
  SELECT cid, cv, kid FROM (
    SELECT cid, cv, kid,
           row_number() OVER (PARTITION BY cid
             ORDER BY CAST(floor((list_dot_product(cv, kv)/(sqrt(list_dot_product(cv, cv))*sqrt(list_dot_product(kv, kv))))*1000000) AS BIGINT) DESC, kid ASC) AS arn
    FROM c CROSS JOIN k)
  WHERE arn = 1),
probes AS (
  SELECT qid, qv, kid FROM (
    SELECT qid, qv, kid,
           row_number() OVER (PARTITION BY qid
             ORDER BY CAST(floor((list_dot_product(qv, kv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(kv, kv))))*1000000) AS BIGINT) DESC, kid ASC) AS prn
    FROM q CROSS JOIN k)
  WHERE prn <= {nprobe}),
s AS (SELECT qid, cid, CAST(floor((list_dot_product(qv, cv)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(cv, cv))))*1000000) AS BIGINT) AS cos_e6
      FROM asg JOIN probes USING (kid)),
approx AS (
  SELECT qid, cid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY cos_e6 DESC, cid ASC) AS rn FROM s)
  WHERE rn <= 5),
scan AS (SELECT qid, COUNT(*) AS scanned FROM s GROUP BY qid),
hits AS (
  SELECT e.qid, COUNT(*) AS hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid)
SELECT e.qid, COUNT(*) AS k,
       CAST(COALESCE(MAX(h.hits), 0) AS BIGINT) AS hits,
       CAST(COALESCE(MAX(sc.scanned), 0) AS BIGINT) AS scanned
FROM exact e
LEFT JOIN hits h ON e.qid = h.qid
LEFT JOIN scan sc ON e.qid = sc.qid
GROUP BY e.qid
"""


ORACLES["emb_ivf_recall_nprobe1"] = _ivf_nprobe_sql(1)
ORACLES["emb_ivf_recall_nprobe2"] = _ivf_nprobe_sql(2)
ORACLES["emb_ivf_recall_nprobe4"] = _ivf_nprobe_sql(4)


# growing VIDEO gate: frame-set Jaccard over the ingest-mix planted
# videos (same frame formula as docs_media_video_neardup with the mix
# group seed); like the text gate, admission replays as a recursive
# sequential fold — frame-set Jaccard is not transitive either
ORACLES["docs_stream_video_gate_grow"] = f"""
WITH RECURSIVE
v AS MATERIALIZED (
  SELECT doc_id, 24 + doc_id % 5 AS n, ({_MIX_G}) AS g FROM documents),
f AS MATERIALIZED (
  SELECT v.doc_id AS did,
         md5(rpad(CASE WHEN (gs.j + v.doc_id) % 10 = 0
                       THEN 'u' || CAST(v.doc_id AS VARCHAR)
                       ELSE 'b' || CAST(g AS VARCHAR) END
                  || ':' || CAST(gs.j AS VARCHAR), 64, ' ')) AS h
  FROM v, generate_series(0, 28) AS gs(j)
  WHERE gs.j < v.n),
c AS MATERIALIZED (SELECT did, COUNT(*) AS nf FROM f GROUP BY did),
cm AS MATERIALIZED (
  SELECT s.did, MIN(s.cdid) AS cmatch FROM (
    SELECT a.did, b.did AS cdid, COUNT(*) AS shared
    FROM f a JOIN f b ON a.h = b.h
    WHERE a.did % 2 = 1 AND b.did % 2 = 0
    GROUP BY a.did, b.did) s
  JOIN c ca ON ca.did = s.did JOIN c cb ON cb.did = s.cdid
  WHERE CAST(floor(CAST(s.shared AS DOUBLE)
        / (ca.nf + cb.nf - s.shared) * 10000) AS BIGINT) >= 5000
  GROUP BY s.did),
sp AS MATERIALIZED (
  SELECT s.i, s.j FROM (
    SELECT a.did AS i, b.did AS j, COUNT(*) AS shared
    FROM f a JOIN f b ON a.h = b.h
    WHERE a.did % 2 = 1 AND b.did % 2 = 1 AND a.did < b.did
    GROUP BY a.did, b.did) s
  JOIN c ca ON ca.did = s.i JOIN c cb ON cb.did = s.j
  WHERE CAST(floor(CAST(s.shared AS DOUBLE)
        / (ca.nf + cb.nf - s.shared) * 10000) AS BIGINT) >= 5000),
ord AS MATERIALIZED (
  SELECT c.did, cm.cmatch, ROW_NUMBER() OVER (ORDER BY c.did) AS rn
  FROM c LEFT JOIN cm ON cm.did = c.did
  WHERE c.did % 2 = 1),
fold(rn, did, status, match_did, admitted) AS (
  SELECT 0, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST([] AS BIGINT[])
  UNION ALL
  SELECT o.rn, o.did,
    CASE WHEN o.cmatch IS NOT NULL THEN 'dup_corpus'
         WHEN (SELECT MIN(p.i) FROM sp p
               WHERE p.j = o.did AND list_contains(f.admitted, p.i))
              IS NOT NULL THEN 'dup_stream'
         ELSE 'admit' END,
    COALESCE(o.cmatch,
      (SELECT MIN(p.i) FROM sp p
       WHERE p.j = o.did AND list_contains(f.admitted, p.i))),
    CASE WHEN o.cmatch IS NULL
          AND (SELECT MIN(p.i) FROM sp p
               WHERE p.j = o.did
                 AND list_contains(f.admitted, p.i)) IS NULL
         THEN list_append(f.admitted, o.did) ELSE f.admitted END
  FROM fold f JOIN ord o ON o.rn = f.rn + 1)
SELECT did, status, match_did FROM fold WHERE rn > 0
"""


# the wide (window=4, 24-window/23-bit) audio gate: same skeleton with
# the wider bit packing — the fingerprint-width lever
ORACLES["docs_stream_audio_gate_grow_wide"] = f"""
WITH grp AS (SELECT doc_id, ({_MIX_G}) % 4194304 AS gm FROM documents),
s AS (
  SELECT doc_id, gs.k AS k,
         ((gm + 1) * (gs.k + 1) * 2654435761) % 4294967296 // 16777216 - 128
           AS v0
  FROM grp, generate_series(0, 95) AS gs(k)),
sv AS (SELECT doc_id, k, v0 * (1 + doc_id % 3) AS v FROM s),
e AS (SELECT doc_id, k // 4 AS w, SUM(v * v) AS en
      FROM sv GROUP BY doc_id, k // 4),
d AS (SELECT doc_id, w,
             CASE WHEN en > LAG(en) OVER (PARTITION BY doc_id ORDER BY w)
                  THEN 1 ELSE 0 END AS bit
      FROM e),
f AS (SELECT doc_id,
             CAST(SUM(CASE WHEN w > 0
                      THEN bit * (CAST(1 AS BIGINT) << (23 - w))
                      ELSE 0 END) AS BIGINT) AS fp
      FROM d GROUP BY doc_id),
idx AS (SELECT fp, MIN(doc_id) AS cd FROM f WHERE doc_id % 2 = 0 GROUP BY fp),
st AS (
  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS first_did
  FROM f WHERE doc_id % 2 = 1)
SELECT st.doc_id AS did, st.fp, CAST(24 AS INTEGER) AS n_windows,
       CASE WHEN i.cd IS NOT NULL THEN 'dup_corpus'
            WHEN st.doc_id = st.first_did THEN 'admit'
            ELSE 'dup_stream' END AS status,
       CASE WHEN i.cd IS NOT NULL THEN i.cd
            WHEN st.doc_id = st.first_did THEN NULL
            ELSE st.first_did END AS match_did
FROM st LEFT JOIN idx i ON st.fp = i.fp
"""

# round 11: real polygon→cell rasterization — cell count and the
# coordinate sums of the CELL_CENTER set from arithmetic-series
# closed forms (centers x0+1+2i: Σ = w·x0 + w², etc.); never parses
# WKT, never rasterizes, never ray-casts
ORACLES["raster_polygon_cells"] = f"""
WITH {_MUG}
SELECT mukey AS okey,
       CAST({_MUG_NCELLS} AS BIGINT) AS n_cells,
       CAST(h * (w * x0 + w * w)
            - CASE WHEN has_hole
                   THEN hh * (hw * (x0 + 2) + hw * hw) ELSE 0 END
            + CASE WHEN plain THEN 0
                   ELSE ph * (pw * (x0 + 40) + pw * pw) END
         AS BIGINT) AS sum_cx,
       CAST(w * (h * y0 + h * h)
            - CASE WHEN has_hole
                   THEN hw * (hh * (y0 + 2) + hh * hh) ELSE 0 END
            + CASE WHEN plain THEN 0
                   ELSE pw * (ph * y0 + ph * ph) END
         AS BIGINT) AS sum_cy
FROM mug
"""

# round 11: rating raster over the REAL cell inventory — dominant
# drainage class per mapunit × closed-form cell counts
ORACLES["raster_rating_cells_geom"] = f"""
WITH {_SYN},
{_MUG},
rated AS (
  SELECT mukey, drainagecl AS rating
  FROM (SELECT mukey, drainagecl,
               row_number() OVER (PARTITION BY mukey
                 ORDER BY comppct_r DESC, cokey ASC) AS rn
        FROM syn_co)
  WHERE rn = 1),
j AS (
  SELECT rating, r.mukey, {_MUG_NCELLS} AS n_cells
  FROM rated r JOIN mug g ON r.mukey = g.mukey)
SELECT rating, COUNT(DISTINCT mukey) AS n_mapunits,
       CAST(SUM(n_cells) AS BIGINT) AS n_cells,
       CAST(floor(SUM(n_cells) * 4.0 * 0.000247104393 * 10000.0)
         AS BIGINT) AS acres_e4
FROM j GROUP BY rating
"""

# round 12: clipped-geometry WKT for the diagonal-concave AOI — the
# canonical ring constructed from the closed-form case tree of
# rect' ∩ ({y<=25} ∪ {x+y<=75}), rect' = subject ∩ AOI bbox; never
# clips or dissolves a vertex
ORACLES["clip_concave_diagonal_aoi_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         GREATEST(c_custkey % 100, 10) AS a,
         LEAST(c_custkey % 100 + c_custkey % 13 + 1, 90) AS b,
         GREATEST(c_custkey % 57, 5) AS p,
         LEAST(c_custkey % 57 + c_custkey % 7 + 1, 45) AS q
  FROM customer),
d AS (SELECT *, (b > a AND q > p AND (p < 25 OR a + p < 75)) AS ok
      FROM g)
SELECT okey,
  CASE WHEN NOT ok THEN 'POLYGON EMPTY'
       WHEN p >= 25 THEN
         CASE WHEN 75 >= b + q THEN
           'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p
             || ', ' || b || ' ' || q || ', ' || a || ' ' || q
             || ', ' || a || ' ' || p || '))'
         ELSE
           'POLYGON ((' || a || ' ' || p
           || ', ' || CASE WHEN 75 >= b + p THEN b || ' ' || p
                           ELSE (75 - p) || ' ' || p END
           || CASE WHEN 75 > b + p
                   THEN ', ' || b || ' ' || (75 - b) ELSE '' END
           || CASE WHEN 75 > a + q
                   THEN ', ' || (75 - q) || ' ' || q ELSE '' END
           || ', ' || CASE WHEN 75 >= a + q THEN a || ' ' || q
                           ELSE a || ' ' || (75 - a) END
           || ', ' || a || ' ' || p || '))'
         END
       WHEN q <= 25 OR b + q <= 75 THEN
         'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p
           || ', ' || b || ' ' || q || ', ' || a || ' ' || q
           || ', ' || a || ' ' || p || '))'
       ELSE
         'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p
         || ', ' || b || ' ' || GREATEST(25, 75 - b)
         || CASE WHEN a < 50 AND b > 50 THEN ', 50 25' ELSE '' END
         || CASE WHEN a >= 50 THEN ', ' || a || ' 25'
                 WHEN a + q < 75 THEN
                   ', ' || (75 - q) || ' ' || q || ', ' || a || ' ' || q
                 WHEN a + q = 75 THEN ', ' || a || ' ' || q
                 ELSE ', ' || a || ' ' || (75 - a) END
         || ', ' || a || ' ' || p || '))'
  END AS clip_wkt,
  CAST(CASE WHEN b > a THEN
    2 * (b - a) * GREATEST(0, LEAST(q, 25) - p)
    + CASE WHEN q > GREATEST(p, 25) THEN
        2 * (b - a) * (q - GREATEST(p, 25))
        - (GREATEST(0, b + q - 75) * GREATEST(0, b + q - 75)
           - GREATEST(0, a + q - 75) * GREATEST(0, a + q - 75)
           - GREATEST(0, b + GREATEST(p, 25) - 75)
             * GREATEST(0, b + GREATEST(p, 25) - 75)
           + GREATEST(0, a + GREATEST(p, 25) - 75)
             * GREATEST(0, a + GREATEST(p, 25) - 75))
      ELSE 0 END
    ELSE 0 END AS BIGINT) AS clip_a2x
FROM d
"""

# round 12: concave-SUBJECT clip — MULTIPOLYGON when the window
# disconnects the U-shaped subject; one- or two-part canonical string
# from the closed-form case tree (empty / split arms / rect / U-bite)
ORACLES["clip_concave_subject_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 50 AS x0, c_custkey % 31 AS y0,
         c_custkey % 12 + 5 AS w, c_custkey % 7 + 4 AS h,
         c_custkey % 2 AS k2, c_custkey % 3 AS k3,
         c_custkey % 5 AS k5, c_custkey % 6 AS k6
  FROM customer),
d AS (
  SELECT okey,
         x0 + 2 AS nx0,
         x0 + 2 + LEAST(k2 + 1, w - 4) AS nx1,
         y0 + LEAST(k3 + 1, h - 1) AS ny0,
         x0 + k2 AS wx0, x0 + w - k2 AS wx1,
         GREATEST(y0, y0 - 1 + k6) AS yb,
         LEAST(y0 + h, y0 - 1 + k6 + 2 + k5) AS yt
  FROM g)
SELECT okey,
  CASE WHEN yt <= yb THEN 'POLYGON EMPTY'
       WHEN yb >= ny0 THEN
         'MULTIPOLYGON (((' || wx0 || ' ' || yb || ', ' || nx0 || ' '
           || yb || ', ' || nx0 || ' ' || yt || ', ' || wx0 || ' '
           || yt || ', ' || wx0 || ' ' || yb || ')), ((' || nx1
           || ' ' || yb || ', ' || wx1 || ' ' || yb || ', ' || wx1
           || ' ' || yt || ', ' || nx1 || ' ' || yt || ', ' || nx1
           || ' ' || yb || ')))'
       WHEN yt <= ny0 THEN
         'POLYGON ((' || wx0 || ' ' || yb || ', ' || wx1 || ' ' || yb
           || ', ' || wx1 || ' ' || yt || ', ' || wx0 || ' ' || yt
           || ', ' || wx0 || ' ' || yb || '))'
       ELSE
         'POLYGON ((' || wx0 || ' ' || yb || ', ' || wx1 || ' ' || yb
           || ', ' || wx1 || ' ' || yt || ', ' || nx1 || ' ' || yt
           || ', ' || nx1 || ' ' || ny0 || ', ' || nx0 || ' ' || ny0
           || ', ' || nx0 || ' ' || yt || ', ' || wx0 || ' ' || yt
           || ', ' || wx0 || ' ' || yb || '))'
  END AS clip_wkt,
  CAST(CASE WHEN yt <= yb THEN 0
       WHEN yb >= ny0 THEN
         2 * ((nx0 - wx0) + (wx1 - nx1)) * (yt - yb)
       WHEN yt <= ny0 THEN 2 * (wx1 - wx0) * (yt - yb)
       ELSE 2 * ((wx1 - wx0) * (yt - yb) - (nx1 - nx0) * (yt - ny0))
  END AS BIGINT) AS clip_a2x
FROM d
"""

# round 12: multipart concave subject — per-part closed-form case
# trees assembled into the canonical POLYGON/MULTIPOLYGON/EMPTY text
# with DuckDB list functions (0-3 parts per feature)
ORACLES["clip_concave_multipart_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 50 AS x0, c_custkey % 31 AS y0,
         c_custkey % 12 + 5 AS w, c_custkey % 7 + 4 AS h,
         c_custkey % 2 AS k2, c_custkey % 3 AS k3,
         c_custkey % 4 AS k4, c_custkey % 5 AS k5,
         c_custkey % 6 AS k6
  FROM customer),
d AS (
  SELECT okey,
         x0 + 2 AS nx0,
         x0 + 2 + LEAST(k2 + 1, w - 4) AS nx1,
         y0 + LEAST(k3 + 1, h - 1) AS ny0,
         x0 + w AS x1u,
         x0 + w + 2 AS p2x0,
         LEAST(x0 + w + 2 + k4 + 1,
               x0 + w + 2 + k4 + 1
                 - CASE WHEN k5 = 0 THEN 1 ELSE 0 END) AS p2x1w,
         x0 + k2 AS wx0,
         GREATEST(y0, y0 - 1 + k6) AS yb,
         LEAST(y0 + h, y0 - 1 + k6 + 2 + k5) AS yt,
         LEAST(y0 + k4 + 2, y0 - 1 + k6 + 2 + k5) AS yt2
  FROM g),
parts AS (
  SELECT okey,
    CASE WHEN yt <= yb THEN []::VARCHAR[]
         WHEN yb >= ny0 THEN [
           wx0 || ' ' || yb || ', ' || nx0 || ' ' || yb || ', '
             || nx0 || ' ' || yt || ', ' || wx0 || ' ' || yt || ', '
             || wx0 || ' ' || yb,
           nx1 || ' ' || yb || ', ' || x1u || ' ' || yb || ', '
             || x1u || ' ' || yt || ', ' || nx1 || ' ' || yt || ', '
             || nx1 || ' ' || yb]
         WHEN yt <= ny0 THEN [
           wx0 || ' ' || yb || ', ' || x1u || ' ' || yb || ', '
             || x1u || ' ' || yt || ', ' || wx0 || ' ' || yt || ', '
             || wx0 || ' ' || yb]
         ELSE [
           wx0 || ' ' || yb || ', ' || x1u || ' ' || yb || ', '
             || x1u || ' ' || yt || ', ' || nx1 || ' ' || yt || ', '
             || nx1 || ' ' || ny0 || ', ' || nx0 || ' ' || ny0 || ', '
             || nx0 || ' ' || yt || ', ' || wx0 || ' ' || yt || ', '
             || wx0 || ' ' || yb]
    END
    || CASE WHEN yt2 > yb AND p2x1w > p2x0 THEN [
           p2x0 || ' ' || yb || ', ' || p2x1w || ' ' || yb || ', '
             || p2x1w || ' ' || yt2 || ', ' || p2x0 || ' ' || yt2
             || ', ' || p2x0 || ' ' || yb]
       ELSE []::VARCHAR[] END AS ps,
    CASE WHEN yt <= yb THEN 0
         WHEN yb >= ny0 THEN
           2 * ((nx0 - wx0) + (x1u - nx1)) * (yt - yb)
         WHEN yt <= ny0 THEN 2 * (x1u - wx0) * (yt - yb)
         ELSE 2 * ((x1u - wx0) * (yt - yb) - (nx1 - nx0) * (yt - ny0))
    END
    + 2 * GREATEST(0, p2x1w - p2x0) * GREATEST(0, yt2 - yb) AS a2x
  FROM d)
SELECT okey,
  CASE WHEN len(ps) = 0 THEN 'POLYGON EMPTY'
       WHEN len(ps) = 1 THEN 'POLYGON ((' || ps[1] || '))'
       ELSE 'MULTIPOLYGON (' || array_to_string(
              list_transform(ps, x -> '((' || x || '))'), ', ') || ')'
  END AS clip_wkt,
  CAST(a2x AS BIGINT) AS clip_a2x
FROM parts
"""

# round 12: raster attribute table + missing-mapunit reconciliation
# (SSURGO_ExportMuRaster.py:1543-1590) — cells enumerated per mapunit,
# deduped max-mukey across overlaps, left-joined back to the layer
ORACLES["raster_rat"] = f"""
WITH {_MUG},
ext AS (
  SELECT mukey, col0 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 12) i(i), generate_series(0, 6) j(j)
  WHERE i.i <= w - 1 AND j.j <= h - 1
    AND NOT (has_hole AND i.i >= 1 AND i.i <= hw
             AND j.j >= 1 AND j.j <= hh)),
p2 AS (
  SELECT mukey, col0 + 20 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 3) i(i), generate_series(0, 2) j(j)
  WHERE NOT plain AND i.i <= pw - 1 AND j.j <= ph - 1),
ded AS (
  SELECT colx, rowy, MAX(mukey) AS mukey
  FROM (SELECT * FROM ext UNION ALL SELECT * FROM p2)
  GROUP BY 1, 2),
rat AS (SELECT mukey, COUNT(*) AS n FROM ded GROUP BY 1)
SELECT CAST(g.mukey AS BIGINT) AS mukey,
       CAST(g.mukey + 1 AS BIGINT) AS cellvalue,
       CAST(COALESCE(r.n, 0) AS BIGINT) AS n_cells,
       CAST(floor(COALESCE(r.n, 0) * 4.0 * 0.000247104393 * 10000.0)
         AS BIGINT) AS acres_e4,
       r.n IS NOT NULL AS in_raster
FROM mug g LEFT JOIN rat r ON g.mukey = r.mukey
"""

# round 11: tile manifest facts from the enumerated cell set — cells
# materialized via bounded generate_series + membership closed forms
# (ext minus hole, plus part 2), deduped across overlapping polygons,
# grouped by the 16-cell tile lattice
ORACLES["raster_tile_export_geom"] = f"""
WITH {_MUG},
ext AS (
  SELECT col0 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 12) i(i), generate_series(0, 6) j(j)
  WHERE i.i <= w - 1 AND j.j <= h - 1
    AND NOT (has_hole AND i.i >= 1 AND i.i <= hw
             AND j.j >= 1 AND j.j <= hh)),
p2 AS (
  SELECT col0 + 20 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 3) i(i), generate_series(0, 2) j(j)
  WHERE NOT plain AND i.i <= pw - 1 AND j.j <= ph - 1),
cells AS (
  SELECT DISTINCT colx, rowy
  FROM (SELECT * FROM ext UNION ALL SELECT * FROM p2)),
tiles AS (
  SELECT colx // 16 AS tx, rowy // 16 AS ty, COUNT(*) AS n
  FROM cells GROUP BY 1, 2)
SELECT CAST(ty * 1000 + tx AS BIGINT) AS tile_id,
       CAST(256 AS INTEGER) AS n_pixels,
       CAST(256 - n AS INTEGER) AS n_nodata
FROM tiles
"""

# round 11: Reclassify composed onto real cells — the oracle bins by
# a CASE-WHEN break chain (no interval join) and counts cells by the
# arithmetic closed form (no rasterization)
ORACLES["raster_reclassify_cells"] = f"""
WITH {_MUG},
rated AS (
  SELECT o_custkey AS mukey, MAX(o_orderkey % 97 + 3) AS v
  FROM orders GROUP BY 1),
mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM rated),
cls AS (
  SELECT mukey, v, mn, mx,
         CASE WHEN v < mn + ((mx - mn) * 1) // 5 THEN 0
              WHEN v < mn + ((mx - mn) * 2) // 5 THEN 1
              WHEN v < mn + ((mx - mn) * 3) // 5 THEN 2
              WHEN v < mn + ((mx - mn) * 4) // 5 THEN 3
              ELSE 4 END AS class_idx
  FROM rated, mm),
j AS (
  SELECT class_idx, mn, mx, c.mukey, {_MUG_NCELLS} AS n_cells
  FROM cls c JOIN mug g ON c.mukey = g.mukey)
SELECT CAST(class_idx AS INTEGER) AS class_idx,
       CAST(mn + ((mx - mn) * class_idx) // 5 AS BIGINT) AS lo,
       CAST(CASE WHEN class_idx = 4 THEN mx
            ELSE mn + ((mx - mn) * (class_idx + 1)) // 5 END
         AS BIGINT) AS hi,
       COUNT(DISTINCT mukey) AS n_mapunits,
       CAST(SUM(n_cells) AS BIGINT) AS n_cells,
       CAST(floor(SUM(n_cells) * 4.0 * 0.000247104393 * 10000.0)
         AS BIGINT) AS acres_e4
FROM j GROUP BY class_idx, mn, mx
"""

# round 11: convex-pentagon clipped GEOMETRY — canonical vertex list
# constructed from the closed-form case analysis of
# rect ∩ rect ∩ {x+y <= cc} (rectangle / pentagon / quad / triangle /
# empty); never clips a vertex
ORACLES["clip_convex_aoi_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         GREATEST(c_custkey % 100,
                  c_custkey % 100 + c_custkey % 5 - 2) AS a,
         LEAST(c_custkey % 100 + c_custkey % 13 + 1,
               c_custkey % 100 + c_custkey % 5 - 2
                 + c_custkey % 11 + 1) AS b,
         GREATEST(c_custkey % 57,
                  c_custkey % 57 + c_custkey % 4 - 1) AS p,
         LEAST(c_custkey % 57 + c_custkey % 7 + 1,
               c_custkey % 57 + c_custkey % 4 - 1
                 + c_custkey % 6 + 1) AS q,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1
           + c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1
           - c_custkey % 4 AS cc
  FROM customer),
d AS (SELECT *, (b > a AND q > p AND cc > a + p) AS ok FROM g)
SELECT okey,
  CASE WHEN NOT ok THEN 'POLYGON EMPTY'
       WHEN cc >= b + q THEN
         'POLYGON ((' || a || ' ' || p || ', ' || b || ' ' || p || ', '
           || b || ' ' || q || ', ' || a || ' ' || q || ', '
           || a || ' ' || p || '))'
       ELSE
         'POLYGON ((' || a || ' ' || p
         || ', ' || CASE WHEN cc >= b + p THEN b || ' ' || p
                         ELSE (cc - p) || ' ' || p END
         || CASE WHEN cc > b + p
                 THEN ', ' || b || ' ' || (cc - b) ELSE '' END
         || CASE WHEN cc > a + q
                 THEN ', ' || (cc - q) || ' ' || q ELSE '' END
         || ', ' || CASE WHEN cc >= a + q THEN a || ' ' || q
                         ELSE a || ' ' || (cc - a) END
         || ', ' || a || ' ' || p || '))'
  END AS clip_wkt,
  CAST(CASE WHEN b > a AND q > p THEN
    2 * (b - a) * (q - p)
    - (GREATEST(0, b + q - cc) * GREATEST(0, b + q - cc)
       - GREATEST(0, a + q - cc) * GREATEST(0, a + q - cc)
       - GREATEST(0, b + p - cc) * GREATEST(0, b + p - cc)
       + GREATEST(0, a + p - cc) * GREATEST(0, a + p - cc))
    ELSE 0 END AS BIGINT) AS clip_a2x
FROM d
"""

# round 11: concave-staircase clipped GEOMETRY — the dissolved union
# ring from band overlap closed forms (first/last survivor CASEs +
# per-boundary step pieces); never clips, never dissolves
ORACLES["clip_concave_aoi_wkt"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 100 + c_custkey % 13 + 1 AS x1,
         c_custkey % 57 + c_custkey % 7 + 1 AS y1
  FROM customer),
b AS (
  SELECT okey, GREATEST(x0, 10) AS lx,
         LEAST(x1, 95) AS r0, GREATEST(y0, 5)  AS lo0,
         LEAST(y1, 20) AS hi0,
         LEAST(x1, 70) AS r1, GREATEST(y0, 20) AS lo1,
         LEAST(y1, 35) AS hi1,
         LEAST(x1, 45) AS r2, GREATEST(y0, 35) AS lo2,
         LEAST(y1, 50) AS hi2
  FROM g),
s AS (
  SELECT *,
         (r0 > lx AND hi0 > lo0) AS s0,
         (r1 > lx AND hi1 > lo1) AS s1,
         (r2 > lx AND hi2 > lo2) AS s2
  FROM b),
v AS (
  SELECT *,
         CASE WHEN s0 THEN lo0 WHEN s1 THEN lo1 ELSE lo2 END AS lof,
         CASE WHEN s0 THEN r0 WHEN s1 THEN r1 ELSE r2 END AS rf,
         CASE WHEN s2 THEN r2 WHEN s1 THEN r1 ELSE r0 END AS rl,
         CASE WHEN s2 THEN hi2 WHEN s1 THEN hi1 ELSE hi0 END AS hil
  FROM s)
SELECT okey,
  CASE WHEN NOT (s0 OR s1 OR s2) THEN 'POLYGON EMPTY'
  ELSE 'POLYGON ((' || lx || ' ' || lof || ', ' || rf || ' ' || lof
    || CASE WHEN s0 AND s1 AND r1 <> r0
            THEN ', ' || r0 || ' ' || hi0 || ', ' || r1 || ' ' || hi0
            ELSE '' END
    || CASE WHEN s1 AND s2 AND r2 <> r1
            THEN ', ' || r1 || ' ' || hi1 || ', ' || r2 || ' ' || hi1
            ELSE '' END
    || ', ' || rl || ' ' || hil || ', ' || lx || ' ' || hil
    || ', ' || lx || ' ' || lof || '))'
  END AS clip_wkt,
  CAST(CASE WHEN s0 THEN 2 * (r0 - lx) * (hi0 - lo0) ELSE 0 END
     + CASE WHEN s1 THEN 2 * (r1 - lx) * (hi1 - lo1) ELSE 0 END
     + CASE WHEN s2 THEN 2 * (r2 - lx) * (hi2 - lo2) ELSE 0 END
     AS BIGINT) AS clip_a2x
FROM v
"""

# round 11: line-FC report — segment lengths from the synthesis
# deltas directly (floor(1e4·sqrt(dx²+dy²)) per segment, exact
# integer sum); never parses WKT
ORACLES["featline_length_report"] = """
WITH g AS (
  SELECT 'AS' || CAST(c_custkey % 7 AS VARCHAR) AS areasymbol,
         c_custkey % 5 + 3 AS dx1,
         c_custkey % 6 AS dy2,
         c_custkey % 4 + 1 AS pw, c_custkey % 3 AS ph,
         (c_custkey % 3 = 0) AS plain
  FROM customer),
f AS (
  SELECT areasymbol,
         CASE WHEN plain THEN 1 ELSE 2 END AS n_parts,
         CASE WHEN plain THEN 3 ELSE 5 END AS n_vertices,
         CAST(floor(sqrt(CAST(dx1 * dx1 + 16 AS DOUBLE)) * 10000.0)
              AS BIGINT)
         + CAST(floor(sqrt(CAST(dy2 * dy2 AS DOUBLE)) * 10000.0)
                AS BIGINT)
         + CASE WHEN plain THEN 0
                ELSE CAST(floor(sqrt(CAST(pw * pw + ph * ph AS DOUBLE))
                                * 10000.0) AS BIGINT) END AS len_e4
  FROM g)
SELECT areasymbol, COUNT(*) AS n_lines,
       CAST(SUM(n_parts) AS BIGINT) AS n_parts,
       CAST(SUM(n_vertices) AS BIGINT) AS n_vertices,
       CAST(SUM(len_e4) AS BIGINT) AS len_e4
FROM f GROUP BY areasymbol
"""

# round 11: multi-ring convex-AOI clipped geometry — the pentagon-case
# canonical ring constructed PER RING from the closed-form case
# analysis, then the same EMPTY / exterior-only / two-ring collapse
ORACLES["clip_convex_aoi_wkt_holes"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 13 + 1 AS w, c_custkey % 7 + 1 AS h,
         LEAST(c_custkey % 13 + 1 - 2, c_custkey % 3 + 1) AS hw,
         LEAST(c_custkey % 7 + 1 - 2, c_custkey % 2 + 1) AS hh,
         (c_custkey % 13 + 1 >= 3 AND c_custkey % 7 + 1 >= 3) AS has_hole,
         c_custkey % 100 + c_custkey % 5 - 2 AS ax0,
         c_custkey % 57 + c_custkey % 4 - 1 AS ay0,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1 AS ax1,
         c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1 AS ay1,
         c_custkey % 100 + c_custkey % 5 - 2 + c_custkey % 11 + 1
           + c_custkey % 57 + c_custkey % 4 - 1 + c_custkey % 6 + 1
           - c_custkey % 4 AS cc
  FROM customer),
r AS (
  SELECT okey, 'e' AS kind, x0 AS sx0, y0 AS sy0,
         x0 + w AS sx1, y0 + h AS sy1, ax0, ay0, ax1, ay1, cc FROM g
  UNION ALL
  SELECT okey, 'h', x0 + 1, y0 + 1, x0 + 1 + hw, y0 + 1 + hh,
         ax0, ay0, ax1, ay1, cc FROM g WHERE has_hole),
o AS (
  SELECT okey, kind,
         GREATEST(sx0, ax0) AS a, LEAST(sx1, ax1) AS b,
         GREATEST(sy0, ay0) AS p, LEAST(sy1, ay1) AS q, cc FROM r),
rb AS (
  SELECT okey, kind,
    CASE WHEN NOT (b > a AND q > p AND cc > a + p) THEN NULL
         WHEN cc >= b + q THEN
           '(' || a || ' ' || p || ', ' || b || ' ' || p || ', '
             || b || ' ' || q || ', ' || a || ' ' || q || ', '
             || a || ' ' || p || ')'
         ELSE
           '(' || a || ' ' || p
           || ', ' || CASE WHEN cc >= b + p THEN b || ' ' || p
                           ELSE (cc - p) || ' ' || p END
           || CASE WHEN cc > b + p
                   THEN ', ' || b || ' ' || (cc - b) ELSE '' END
           || CASE WHEN cc > a + q
                   THEN ', ' || (cc - q) || ' ' || q ELSE '' END
           || ', ' || CASE WHEN cc >= a + q THEN a || ' ' || q
                           ELSE a || ' ' || (cc - a) END
           || ', ' || a || ' ' || p || ')'
    END AS body,
    CASE WHEN b > a AND q > p THEN
      2 * (b - a) * (q - p)
      - (GREATEST(0, b + q - cc) * GREATEST(0, b + q - cc)
         - GREATEST(0, a + q - cc) * GREATEST(0, a + q - cc)
         - GREATEST(0, b + p - cc) * GREATEST(0, b + p - cc)
         + GREATEST(0, a + p - cc) * GREATEST(0, a + p - cc))
      ELSE 0 END AS a2x
  FROM o),
e AS (SELECT okey, body AS eb, a2x AS ea FROM rb WHERE kind = 'e'),
hx AS (SELECT okey, body AS hb, a2x AS ha FROM rb WHERE kind = 'h')
SELECT g.okey,
  CASE WHEN e.eb IS NULL THEN 'POLYGON EMPTY'
       WHEN hx.hb IS NOT NULL AND e.ea = hx.ha THEN 'POLYGON EMPTY'
       WHEN hx.hb IS NULL THEN 'POLYGON (' || e.eb || ')'
       ELSE 'POLYGON (' || e.eb || ', ' || hx.hb || ')'
  END AS clip_wkt,
  CAST(CASE WHEN e.eb IS NULL THEN 0
            WHEN hx.hb IS NOT NULL AND e.ea = hx.ha THEN 0
            ELSE e.ea - COALESCE(hx.ha, 0) END AS BIGINT) AS clip_a2x
FROM g JOIN e ON g.okey = e.okey
LEFT JOIN hx ON g.okey = hx.okey
"""

# round 11: point-FC select-by-location — direct bound comparisons on
# the synthesis formulas (no WKT, no ray cast)
ORACLES["featpoint_select_report"] = """
WITH g AS (
  SELECT 'AS' || CAST(c_custkey % 7 AS VARCHAR) AS areasymbol,
         (c_custkey % 100) * 2 + (c_custkey % 23) * 2 - 9 AS cx,
         (c_custkey % 57) * 2 + (c_custkey % 19) * 2 - 7 AS cy
  FROM customer)
SELECT areasymbol, COUNT(*) AS n_points,
       CAST(SUM(CASE WHEN cx > 30 AND cx < 130 AND cy > 20 AND cy < 80
                THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       CAST(SUM(CASE WHEN cx > 30 AND cx < 130 AND cy > 20 AND cy < 80
                THEN cx ELSE 0 END) AS BIGINT) AS sum_cx_inside
FROM g GROUP BY areasymbol
"""

# round 11: line-FC clip — the same Liang–Barsky parametric algebra
# applied to the SYNTHESIS deltas (never parses WKT); every float op
# mirrors the engine expression verbatim
ORACLES["featline_clip_length"] = """
WITH g AS (
  SELECT c_custkey AS okey,
         c_custkey % 100 AS x0, c_custkey % 57 AS y0,
         c_custkey % 5 + 3 AS dx1, c_custkey % 6 AS dy2,
         c_custkey % 4 + 1 AS pw, c_custkey % 3 AS ph,
         (c_custkey % 3 = 0) AS plain,
         CAST(c_custkey % 100 + c_custkey % 5 - 2 AS DOUBLE) AS ax0,
         CAST(c_custkey % 57 + c_custkey % 4 - 1 AS DOUBLE) AS ay0,
         CAST(c_custkey % 100 + c_custkey % 5 - 2
              + c_custkey % 11 + 1 AS DOUBLE) AS ax1,
         CAST(c_custkey % 57 + c_custkey % 4 - 1
              + c_custkey % 6 + 1 AS DOUBLE) AS ay1
  FROM customer),
segs AS (
  SELECT okey, CAST(x0 AS DOUBLE) AS sx, CAST(y0 AS DOUBLE) AS sy,
         CAST(dx1 AS DOUBLE) AS dx, CAST(4 AS DOUBLE) AS dy,
         ax0, ay0, ax1, ay1 FROM g
  UNION ALL
  SELECT okey, CAST(x0 + dx1 AS DOUBLE), CAST(y0 + 4 AS DOUBLE),
         CAST(0 AS DOUBLE), CAST(dy2 AS DOUBLE),
         ax0, ay0, ax1, ay1 FROM g
  UNION ALL
  SELECT okey, CAST(x0 + 50 AS DOUBLE), CAST(y0 AS DOUBLE),
         CAST(pw AS DOUBLE), CAST(ph AS DOUBLE),
         ax0, ay0, ax1, ay1 FROM g WHERE NOT plain),
t AS (
  SELECT okey, dx, dy,
    CASE WHEN dx <> 0
         THEN LEAST((ax0 - sx) / dx, (ax1 - sx) / dx)
         ELSE 0.0 END AS tx0,
    CASE WHEN dx <> 0
         THEN GREATEST((ax0 - sx) / dx, (ax1 - sx) / dx)
         ELSE 1.0 END AS tx1,
    (dx <> 0 OR (sx >= ax0 AND sx <= ax1)) AS okx,
    CASE WHEN dy <> 0
         THEN LEAST((ay0 - sy) / dy, (ay1 - sy) / dy)
         ELSE 0.0 END AS ty0,
    CASE WHEN dy <> 0
         THEN GREATEST((ay0 - sy) / dy, (ay1 - sy) / dy)
         ELSE 1.0 END AS ty1,
    (dy <> 0 OR (sy >= ay0 AND sy <= ay1)) AS oky
  FROM segs),
c AS (
  SELECT okey,
    CAST(FLOOR(SQRT(dx * dx + dy * dy) * 10000.0) AS BIGINT) AS seg_len,
    CASE WHEN okx AND oky
          AND LEAST(1.0, tx1, ty1) > GREATEST(0.0, tx0, ty0)
         THEN CAST(FLOOR(SQRT(dx * dx + dy * dy)
                   * (LEAST(1.0, tx1, ty1) - GREATEST(0.0, tx0, ty0))
                   * 10000.0) AS BIGINT)
         ELSE 0 END AS seg_clip
  FROM t)
SELECT okey, CAST(SUM(seg_len) AS BIGINT) AS len_e4,
       CAST(SUM(seg_clip) AS BIGINT) AS clip_len_e4
FROM c GROUP BY okey
"""

# round 12: layer x layer spatial joins — truth derived from the
# synthetic rectangle bounds / closed forms via naive inequality joins
# (affordable at sf0.01; the Spark side is the PBSM grid-bucketed plan
# that survives 100 TB). Certifies bucketing + ray-cast / SH refine.
ORACLES["spatial_join_points"] = """
WITH p AS (
  SELECT c_custkey AS okey,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS y1
  FROM customer),
q AS (
  SELECT o_orderkey AS pkey,
         2 * (o_orderkey % 101) + 1 AS px,
         2 * (o_orderkey % 59) + 1 AS py
  FROM orders WHERE o_orderkey % 4 = 0)
SELECT okey, pkey, px, py
FROM p JOIN q ON px > x0 AND px < x1 AND py > y0 AND py < y1
"""

ORACLES["spatial_join_overlap"] = """
WITH a AS (
  SELECT c_custkey AS akey,
         (c_custkey % 100) * 2 AS ax0, (c_custkey % 57) * 2 AS ay0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS ax1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS ay1
  FROM customer),
b AS (
  SELECT p_partkey AS bkey,
         (p_partkey % 97) * 2 AS bx0, (p_partkey % 53) * 2 AS by0,
         (p_partkey % 97) * 2 + (p_partkey % 11 + 1) * 2 AS bx1,
         (p_partkey % 53) * 2 + (p_partkey % 5 + 1) * 2 AS by1
  FROM part WHERE p_partkey % 7 = 0)
SELECT akey, bkey,
       CAST(2 * (LEAST(ax1, bx1) - GREATEST(ax0, bx0))
              * (LEAST(ay1, by1) - GREATEST(ay0, by0)) AS BIGINT) AS ov_a2x
FROM a JOIN b
  ON LEAST(ax1, bx1) > GREATEST(ax0, bx0)
 AND LEAST(ay1, by1) > GREATEST(ay0, by0)
"""

ORACLES["spatial_join_within_distance"] = """
WITH s AS (
  SELECT c_custkey AS skey,
         c_custkey % 199 AS sx, c_custkey % 113 AS sy
  FROM customer),
q AS (
  SELECT o_orderkey AS pkey,
         o_orderkey % 211 AS px, o_orderkey % 127 AS py
  FROM orders WHERE o_orderkey % 3 = 0)
SELECT skey, pkey,
       CAST((sx - px) * (sx - px) + (sy - py) * (sy - py) AS BIGINT) AS dist2
FROM s JOIN q
  ON (sx - px) * (sx - px) + (sy - py) * (sy - py) <= 25
"""

# round 12: geofence (stream-static spatial join) — same oracle
# certifies the batch twin and the stateless streaming form
ORACLES["events_geofence"] = """
WITH p AS (
  SELECT c_custkey AS okey,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS y1
  FROM customer),
e AS (
  SELECT event_id,
         2 * (event_id % 101) + 1 AS px,
         2 * (event_id % 59) + 1 AS py
  FROM events WHERE event_id % 16 = 0)
SELECT e.event_id, p.okey, e.px, e.py
FROM p JOIN e ON px > x0 AND px < x1 AND py > y0 AND py < y1
"""

ORACLES["events_stream_geofence"] = ORACLES["events_geofence"]

ORACLES["spatial_join_nearest"] = """
WITH s AS (
  SELECT c_custkey AS skey,
         c_custkey % 199 AS sx, c_custkey % 113 AS sy
  FROM customer),
q AS (
  SELECT o_orderkey AS pkey,
         o_orderkey % 211 AS px, o_orderkey % 127 AS py
  FROM orders WHERE o_orderkey % 3 = 0),
cand AS (
  SELECT pkey, skey,
         CAST((sx - px) * (sx - px) + (sy - py) * (sy - py) AS BIGINT)
           AS dist2
  FROM s JOIN q
    ON (sx - px) * (sx - px) + (sy - py) * (sy - py) <= 25)
SELECT pkey, skey, dist2 FROM (
  SELECT pkey, skey, dist2,
         ROW_NUMBER() OVER (PARTITION BY pkey ORDER BY dist2, skey) AS rn
  FROM cand)
WHERE rn = 1
"""

# round 12: spatial lake pruning — pruning is lossless by the padded
# min-corner construction, so the oracle is the UNpruned closed-form
# intersect + rect∩rect overlap over the whole layer
ORACLES["spatial_lake_prune"] = """
WITH a AS (
  SELECT c_custkey AS okey,
         (c_custkey % 100) * 2 AS x0, (c_custkey % 57) * 2 AS y0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS x1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS y1
  FROM customer)
SELECT okey,
       CAST(2 * (LEAST(x1, 140) - GREATEST(x0, 60))
              * (LEAST(y1, 90) - GREATEST(y0, 30)) AS BIGINT) AS ov_a2x
FROM a
WHERE x0 < 140 AND x1 > 60 AND y0 < 90 AND y1 > 30
"""

# round 12b: Intersect_analysis geometry output — the oracle never
# clips; it CONSTRUCTS each intersection rectangle's canonical WKT
# (lexicographic-min-first CCW, the normalize_ring convention) from
# the two rects' closed-form bounds
ORACLES["spatial_join_overlap_wkt"] = """
WITH a AS (
  SELECT c_custkey AS akey,
         (c_custkey % 100) * 2 AS ax0, (c_custkey % 57) * 2 AS ay0,
         (c_custkey % 100) * 2 + (c_custkey % 13 + 1) * 2 AS ax1,
         (c_custkey % 57) * 2 + (c_custkey % 7 + 1) * 2 AS ay1
  FROM customer),
b AS (
  SELECT p_partkey AS bkey,
         (p_partkey % 97) * 2 AS bx0, (p_partkey % 53) * 2 AS by0,
         (p_partkey % 97) * 2 + (p_partkey % 11 + 1) * 2 AS bx1,
         (p_partkey % 53) * 2 + (p_partkey % 5 + 1) * 2 AS by1
  FROM part WHERE p_partkey % 7 = 0),
o AS (
  SELECT akey, bkey,
         GREATEST(ax0, bx0) AS xa, LEAST(ax1, bx1) AS xb,
         GREATEST(ay0, by0) AS yp, LEAST(ay1, by1) AS yq
  FROM a JOIN b
    ON LEAST(ax1, bx1) > GREATEST(ax0, bx0)
   AND LEAST(ay1, by1) > GREATEST(ay0, by0))
SELECT akey, bkey,
       'POLYGON ((' || xa || ' ' || yp || ', ' || xb || ' ' || yp || ', '
         || xb || ' ' || yq || ', ' || xa || ' ' || yq || ', '
         || xa || ' ' || yp || '))' AS clip_wkt,
       CAST(2 * (xb - xa) * (yq - yp) AS BIGINT) AS ov_a2x
FROM o
"""

# round 12b: the shared deduplicated mu raster (CELL_CENTER inventory
# of the _MUG synthesis, max-mukey overlap resolution, 1-based
# CELLVALUE) as a reusable CTE fragment
_MU_DED = f"""
{_MUG},
ext AS (
  SELECT mukey, col0 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 12) i(i), generate_series(0, 6) j(j)
  WHERE i.i <= w - 1 AND j.j <= h - 1
    AND NOT (has_hole AND i.i >= 1 AND i.i <= hw
             AND j.j >= 1 AND j.j <= hh)),
p2 AS (
  SELECT mukey, col0 + 20 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 3) i(i), generate_series(0, 2) j(j)
  WHERE NOT plain AND i.i <= pw - 1 AND j.j <= ph - 1),
ded AS (
  SELECT colx, rowy, MAX(mukey) + 1 AS cellvalue
  FROM (SELECT * FROM ext UNION ALL SELECT * FROM p2)
  GROUP BY 1, 2)"""

# Aggregate/BlockStatistics MAJORITY resample: per-block value counts,
# tie→lowest for the Aggregate column, tie→nodata(0) for the
# BlockStatistics column — derived via rank over (cnt DESC, value ASC)
# plus a top-count tie tally
ORACLES["raster_block_aggregate"] = f"""
WITH {_MU_DED},
pv AS (
  SELECT CAST(floor(colx / 3.0) AS BIGINT) AS bcol,
         CAST(floor(rowy / 3.0) AS BIGINT) AS brow,
         cellvalue, COUNT(*) AS cnt
  FROM ded GROUP BY 1, 2, 3),
rk AS (
  SELECT bcol, brow, cellvalue, cnt,
         ROW_NUMBER() OVER (PARTITION BY bcol, brow
                            ORDER BY cnt DESC, cellvalue ASC) AS rn,
         COUNT(*) FILTER (WHERE TRUE)
           OVER (PARTITION BY bcol, brow) AS nv,
         MAX(cnt) OVER (PARTITION BY bcol, brow) AS topc,
         SUM(cnt) OVER (PARTITION BY bcol, brow) AS n_data
  FROM pv),
ties AS (
  SELECT bcol, brow, COUNT(*) AS n_top
  FROM rk WHERE cnt = topc GROUP BY 1, 2)
SELECT r.bcol, r.brow,
       CAST(r.n_data AS BIGINT) AS n_data,
       CAST(r.cellvalue AS BIGINT) AS agg_majority,
       CAST(CASE WHEN t.n_top > 1 THEN 0 ELSE r.cellvalue END
         AS BIGINT) AS blockstat_majority
FROM rk r JOIN ties t ON r.bcol = t.bcol AND r.brow = t.brow
WHERE r.rn = 1
"""

# NEAREST pyramid levels: level L keeps the block-origin cells
# (colx % 2^L = 0 AND rowy % 2^L = 0) — a pure filter per level
ORACLES["raster_pyramid_levels"] = f"""
WITH {_MU_DED}
SELECT CAST(lv.l AS BIGINT) AS level, cellvalue,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM ded, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) lv(l, s)
WHERE colx % lv.s = 0 AND rowy % lv.s = 0
GROUP BY 1, 2
"""

# ZonalStatisticsAsTable (categorical): count / variety / majority
# (tie→lowest) / min / max mukey per zone rectangle, cell membership
# by the odd CENTER coordinate strictly inside the even-edged zone
ORACLES["raster_zonal_stats"] = f"""
WITH {_MU_DED},
z AS (
  SELECT p_partkey AS zone,
         (p_partkey % 97) * 2 AS zx0, (p_partkey % 53) * 2 AS zy0,
         (p_partkey % 97) * 2 + (p_partkey % 11 + 1) * 2 AS zx1,
         (p_partkey % 53) * 2 + (p_partkey % 5 + 1) * 2 AS zy1
  FROM part WHERE p_partkey % 7 = 0),
pm AS (
  SELECT z.zone, d.cellvalue - 1 AS mukey, COUNT(*) AS cnt
  FROM z JOIN ded d
    ON 2 * d.colx + 1 > z.zx0 AND 2 * d.colx + 1 < z.zx1
   AND 2 * d.rowy + 1 > z.zy0 AND 2 * d.rowy + 1 < z.zy1
  GROUP BY 1, 2),
rk AS (
  SELECT zone, mukey, cnt,
         ROW_NUMBER() OVER (PARTITION BY zone
                            ORDER BY cnt DESC, mukey ASC) AS rn,
         SUM(cnt) OVER (PARTITION BY zone) AS n_cells,
         COUNT(*) OVER (PARTITION BY zone) AS variety,
         MIN(mukey) OVER (PARTITION BY zone) AS min_mukey,
         MAX(mukey) OVER (PARTITION BY zone) AS max_mukey
  FROM pm)
SELECT zone,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(variety AS BIGINT) AS variety,
       CAST(mukey AS BIGINT) AS majority_mukey,
       CAST(min_mukey AS BIGINT) AS min_mukey,
       CAST(max_mukey AS BIGINT) AS max_mukey
FROM rk WHERE rn = 1
"""

# MEAN resample branch (continuous ratings): dominant-component
# comppct joined onto the cell raster, per-block exact integer sum +
# one float division rounded once
ORACLES["raster_block_mean"] = f"""
WITH {_SYN},
{_MU_DED},
rated AS (
  SELECT mukey, comppct_r AS val
  FROM (SELECT mukey, comppct_r,
               row_number() OVER (PARTITION BY mukey
                 ORDER BY comppct_r DESC, cokey ASC) AS rn
        FROM syn_co)
  WHERE rn = 1),
b AS (
  SELECT CAST(floor(colx / 3.0) AS BIGINT) AS bcol,
         CAST(floor(rowy / 3.0) AS BIGINT) AS brow,
         r.val
  FROM ded d JOIN rated r ON d.cellvalue - 1 = r.mukey)
SELECT bcol, brow,
       CAST(COUNT(*) AS BIGINT) AS n_data,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(floor(SUM(val) * 10000.0 / COUNT(*)) AS BIGINT) AS mean_e4
FROM b GROUP BY 1, 2
"""

# MosaicToNewRaster MAXIMUM: per-(mukey%5)-tile max-resolved rasters,
# mosaic = cross-tile MAX + seam tally
ORACLES["raster_mosaic_max"] = f"""
WITH {_MUG},
ext AS (
  SELECT mukey, col0 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 12) i(i), generate_series(0, 6) j(j)
  WHERE i.i <= w - 1 AND j.j <= h - 1
    AND NOT (has_hole AND i.i >= 1 AND i.i <= hw
             AND j.j >= 1 AND j.j <= hh)),
p2 AS (
  SELECT mukey, col0 + 20 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 3) i(i), generate_series(0, 2) j(j)
  WHERE NOT plain AND i.i <= pw - 1 AND j.j <= ph - 1),
tiled AS (
  SELECT mukey % 5 AS tile, colx, rowy, MAX(mukey) + 1 AS cellvalue
  FROM (SELECT * FROM ext UNION ALL SELECT * FROM p2)
  GROUP BY 1, 2, 3),
mos AS (
  SELECT colx, rowy, MAX(cellvalue) AS cellvalue,
         COUNT(*) AS n_tiles
  FROM tiled GROUP BY 1, 2)
SELECT cellvalue, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN n_tiles > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seam_cells
FROM mos GROUP BY cellvalue
"""

# CalculateStatistics with skip factors: exact integer moments per
# sampled lattice, mean/var scaled and floored once
ORACLES["raster_statistics"] = f"""
WITH {_MU_DED},
s AS (
  SELECT 1 AS x_skip, 1 AS y_skip, cellvalue FROM ded
  UNION ALL
  SELECT 4, 2, cellvalue FROM ded WHERE colx % 4 = 0 AND rowy % 2 = 0)
SELECT CAST(x_skip AS BIGINT) AS x_skip,
       CAST(y_skip AS BIGINT) AS y_skip,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(MIN(cellvalue) AS BIGINT) AS min_val,
       CAST(MAX(cellvalue) AS BIGINT) AS max_val,
       CAST(SUM(cellvalue) AS BIGINT) AS sum_val,
       CAST(SUM(cellvalue * cellvalue) AS BIGINT) AS sumsq_val,
       CAST(floor(SUM(cellvalue) * 10000.0 / COUNT(*)) AS BIGINT)
         AS mean_e4,
       CAST(floor((COUNT(*) * SUM(cellvalue * cellvalue)
                   - SUM(cellvalue) * SUM(cellvalue)) * 10000.0
                  / (COUNT(*) * COUNT(*))) AS BIGINT) AS var_e4
FROM s GROUP BY 1, 2
"""

# MakeGraph data half: domain-ordered acreage bar series + the
# reference's own layout-scalar formulas
ORACLES["acreage_graph_series"] = f"""
WITH {_SYN},
{_MU_DED},
rated AS (
  SELECT mukey, drainagecl AS rating
  FROM (SELECT mukey, drainagecl,
               row_number() OVER (PARTITION BY mukey
                 ORDER BY comppct_r DESC, cokey ASC) AS rn
        FROM syn_co)
  WHERE rn = 1),
allc AS (
  SELECT mukey, colx, rowy FROM ext
  UNION ALL SELECT mukey, colx, rowy FROM p2),
summary AS (
  SELECT r.rating,
         CASE r.rating WHEN 'Very poorly drained' THEN 1
                       WHEN 'Poorly drained' THEN 2
                       WHEN 'Well drained' THEN 3 END AS bar_index,
         CAST(floor(COUNT(*) * 4.0 * 0.000247104393 * 10000.0)
           AS BIGINT) AS acres_e4,
         LENGTH(r.rating) AS label_len
  FROM allc c JOIN rated r ON c.mukey = r.mukey
  GROUP BY 1),
tot AS (
  SELECT CAST((SUM(label_len) + 10) * 8 AS BIGINT) AS graph_width,
         CAST(500 AS BIGINT) AS graph_height,
         CAST(SUM(acres_e4) AS BIGINT) AS total_acres_e4
  FROM summary)
SELECT rating, CAST(bar_index AS BIGINT) AS bar_index, acres_e4,
       CAST(label_len AS BIGINT) AS label_len,
       graph_width, graph_height, total_acres_e4
FROM summary CROSS JOIN tot
"""

# ClassBreaksJSON layer-definition string, rebuilt closed-form: the
# same 2-decimal integer-hundredths formatting, label scheme, color
# order, and key order as functions/legend.py:class_breaks_layer_json
ORACLES["legend_class_breaks_json"] = """
WITH s AS (
  SELECT MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS mn,
         MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS mx
  FROM orders),
p AS (
  SELECT mn, mx,
         CASE WHEN mn = mx THEN 1 ELSE 5 END AS n,
         CAST(round((mx - mn)
           / (CASE WHEN mn = mx THEN 1.0 ELSE 5.0 END)) AS BIGINT) AS step
  FROM s),
cls AS (
  SELECT p.mn, p.mx, p.n, i.i,
         p.mn + i.i * p.step AS low,
         p.mn + (i.i + 1) * p.step AS high
  FROM p, generate_series(0, 4) i(i) WHERE i.i < p.n),
fm AS (
  SELECT *,
         CAST(low // 100 AS VARCHAR) || '.'
           || lpad(CAST(low % 100 AS VARCHAR), 2, '0') AS flow,
         CAST(high // 100 AS VARCHAR) || '.'
           || lpad(CAST(high % 100 AS VARCHAR), 2, '0') AS fhigh,
         CASE i WHEN 0 THEN '[255, 0, 0, 255]'
                WHEN 1 THEN '[255, 255, 0, 255]'
                WHEN 2 THEN '[0, 255, 0, 255]'
                WHEN 3 THEN '[0, 255, 255, 255]'
                ELSE '[0, 0, 255, 255]' END AS color
  FROM cls),
oj AS (
  SELECT '{"type": "esriSLS", "style": "esriSLSSolid", '
         || '"color": [0, 0, 0, 0], "width": 0.4}' AS o),
infos AS (
  SELECT fm.mn, fm.mx,
         string_agg(
           '{"classMinValue": ' || flow
           || ', "classMaxValue": ' || fhigh
           || ', "label": "'
           || CASE WHEN i = 0 THEN '<= ' || fhigh
                   ELSE '> ' || flow || ' and <= ' || fhigh END
           || '", "description": "", "outline": ' || oj.o
           || ', "symbol": {"type": "esriSFS", "style": "esriSFSSolid", '
           || '"color": ' || color || ', "outline": ' || oj.o || '}}',
           ', ' ORDER BY i) AS body
  FROM fm, oj GROUP BY fm.mn, fm.mx)
SELECT 'SDV_pricing.rating_c' AS field,
       mn AS min_e2, mx AS max_e2,
       CAST(mn // 100 AS VARCHAR) || '.'
         || lpad(CAST(mn % 100 AS VARCHAR), 2, '0') AS min_txt,
       '{"drawingInfo": {"renderer": {"type": "classBreaks", '
       || '"classificationMethod": "esriClassifyManual", '
       || '"field": "SDV_pricing.rating_c", "minValue": '
       || CAST(mn // 100 AS VARCHAR) || '.'
       || lpad(CAST(mn % 100 AS VARCHAR), 2, '0')
       || ', "classBreakInfos": [' || body || ']}}}' AS legend_json
FROM infos
"""

# UniqueValuesJSON layer-definition string: same sorted domain, color
# cycling, gray 'Not rated'/'<Null>' items, and envelope key order as
# functions/legend.py:unique_values_layer_json
ORACLES["legend_unique_values_json"] = f"""
WITH vals AS (
  SELECT DISTINCT rating FROM ({ORACLES["sdv_dcp_categorical"]})
  WHERE rating IS NOT NULL),
rk AS (
  SELECT rating, row_number() OVER (ORDER BY rating) - 1 AS i FROM vals),
items AS (
  SELECT string_agg(
    '{{"value": "' || rating || '", "description": "", "label": "'
    || rating || '", "symbol": {{"type": "esriSFS", "style": '
    || '"esriSFSSolid", "color": '
    || CASE i % 5 WHEN 0 THEN '[255, 0, 0, 255]'
                  WHEN 1 THEN '[255, 255, 0, 255]'
                  WHEN 2 THEN '[0, 255, 0, 255]'
                  WHEN 3 THEN '[0, 255, 255, 255]'
                  ELSE '[0, 0, 255, 255]' END
    || ', "outline": {{"color": [0, 0, 0, 0], "width": 0.4, '
    || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}',
    ', ' ORDER BY i) AS body,
    COUNT(*) AS n
  FROM rk)
SELECT 'SDV_drainage.rating' AS field1,
       CAST(n AS BIGINT) AS n_values,
       '{{"drawingInfo": {{"renderer": {{"uniqueValueInfos": ['
       || body
       || ', {{"value": "Not rated", "description": "", '
       || '"label": "Not rated", "symbol": {{"type": "esriSFS", '
       || '"style": "esriSFSSolid", "color": [110, 110, 110, 255], '
       || '"outline": {{"color": [0, 0, 0, 0], "width": 0.0, '
       || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}'
       || ', {{"value": "<Null>", "description": "", "label": "Null", '
       || '"symbol": {{"type": "esriSFS", "style": "esriSFSSolid", '
       || '"color": [175, 175, 175, 255], '
       || '"outline": {{"color": [0, 0, 0, 0], "width": 0.0, '
       || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}'
       || '], "type": "uniqueValue", "field1": "SDV_drainage.rating", '
       || '"field2": "", "field3": "", "fielddelimiter": ";"}}}}}}'
       AS legend_json
FROM items
"""


# DefinedBreaksJSON layer-definition string (Hydric template): static
# metadata breaks, data-derived minValue embedded into the same text
_DBJ_PREFIX = '{"drawingInfo": {"renderer": {"type": "classBreaks", "classificationMethod": "esriClassifyManual", "field": "SDV_hydric.rating", "minValue": '
_DBJ_SUFFIX = ', "classBreakInfos": [{"classMinValue": 0, "classMaxValue": 20, "label": "0 - 20", "description": "", "symbol": {"type": "esriSFS", "style": "esriSFSSolid", "color": [255, 0, 0, 255], "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, {"classMinValue": 20, "classMaxValue": 40, "label": "20 - 40", "description": "", "symbol": {"type": "esriSFS", "style": "esriSFSSolid", "color": [255, 255, 0, 255], "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, {"classMinValue": 40, "classMaxValue": 60, "label": "40 - 60", "description": "", "symbol": {"type": "esriSFS", "style": "esriSFSSolid", "color": [0, 255, 0, 255], "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, {"classMinValue": 60, "classMaxValue": 80, "label": "60 - 80", "description": "", "symbol": {"type": "esriSFS", "style": "esriSFSSolid", "color": [0, 255, 255, 255], "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, {"classMinValue": 80, "classMaxValue": 100, "label": "80 - 100", "description": "", "symbol": {"type": "esriSFS", "style": "esriSFSSolid", "color": [0, 0, 255, 255], "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}, "outline": {"type": "esriSLS", "style": "esriSLSSolid", "color": [0, 0, 0, 0], "width": 0.4}}]}}}'
ORACLES["legend_defined_breaks_json"] = (
    "WITH m AS (SELECT MIN(rating) AS mn FROM ("
    + ORACLES["sdv_pp_sum"]
    + """) )
SELECT 'SDV_hydric.rating' AS field,
       CAST(mn AS BIGINT) AS min_value,
       '"""
    + _DBJ_PREFIX.replace("'", "''")
    + """' || CAST(mn AS VARCHAR) || '"""
    + _DBJ_SUFFIX.replace("'", "''")
    + """' AS legend_json
FROM m
"""
)

# The composed CreateSoilMap manifest: planner rating + per-polygon
# cell acreage + UniqueValuesJSON, assembled from the same closed
# forms the three subsystems' own oracles use
ORACLES["soil_map_layer_manifest"] = f"""
WITH rat AS ({ORACLES["planner_sdv_rating"]}),
{_MUG},
ext AS (
  SELECT mukey, col0 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 12) i(i), generate_series(0, 6) j(j)
  WHERE i.i <= w - 1 AND j.j <= h - 1
    AND NOT (has_hole AND i.i >= 1 AND i.i <= hw
             AND j.j >= 1 AND j.j <= hh)),
p2 AS (
  SELECT mukey, col0 + 20 + i.i AS colx, row0 + j.j AS rowy
  FROM mug, generate_series(0, 3) i(i), generate_series(0, 2) j(j)
  WHERE NOT plain AND i.i <= pw - 1 AND j.j <= ph - 1),
allc AS (
  SELECT mukey FROM ext UNION ALL SELECT mukey FROM p2),
cst AS (
  SELECT COUNT(*) AS n_cells,
         CAST(floor(COUNT(*) * 4.0 * 0.000247104393 * 10000.0) AS BIGINT)
           AS acres_e4
  FROM allc c JOIN rat r ON c.mukey = r.mukey),
rst AS (
  SELECT COUNT(*) AS n_mapunits,
         SUM(CASE WHEN rating IS NOT NULL THEN 1 ELSE 0 END) AS n_rated
  FROM rat),
vals AS (SELECT DISTINCT rating FROM rat WHERE rating IS NOT NULL),
rk AS (
  SELECT rating, row_number() OVER (ORDER BY rating) - 1 AS i FROM vals),
leg AS (
  SELECT string_agg(
    '{{"value": "' || rating || '", "description": "", "label": "'
    || rating || '", "symbol": {{"type": "esriSFS", "style": '
    || '"esriSFSSolid", "color": '
    || CASE i % 5 WHEN 0 THEN '[255, 0, 0, 255]'
                  WHEN 1 THEN '[255, 255, 0, 255]'
                  WHEN 2 THEN '[0, 255, 0, 255]'
                  WHEN 3 THEN '[0, 255, 255, 255]'
                  ELSE '[0, 0, 255, 255]' END
    || ', "outline": {{"color": [0, 0, 0, 0], "width": 0.4, '
    || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}',
    ', ' ORDER BY i) AS body
  FROM rk)
SELECT 'Hydric Rating Synth' AS attributename,
       CAST(rst.n_mapunits AS BIGINT) AS n_mapunits,
       CAST(rst.n_rated AS BIGINT) AS n_rated,
       CAST(cst.n_cells AS BIGINT) AS n_cells,
       cst.acres_e4,
       '{{"drawingInfo": {{"renderer": {{"uniqueValueInfos": ['
       || leg.body
       || ', {{"value": "Not rated", "description": "", '
       || '"label": "Not rated", "symbol": {{"type": "esriSFS", '
       || '"style": "esriSFSSolid", "color": [110, 110, 110, 255], '
       || '"outline": {{"color": [0, 0, 0, 0], "width": 0.0, '
       || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}'
       || ', {{"value": "<Null>", "description": "", "label": "Null", '
       || '"symbol": {{"type": "esriSFS", "style": "esriSFSSolid", '
       || '"color": [175, 175, 175, 255], '
       || '"outline": {{"color": [0, 0, 0, 0], "width": 0.0, '
       || '"style": "esriSLSSolid", "type": "esriSLS"}}}}}}'
       || '], "type": "uniqueValue", "field1": "SDV_hydric.rating", '
       || '"field2": "", "field3": "", "fielddelimiter": ";"}}}}}}'
       AS legend_json
FROM rst, cst, leg
"""

# In-engine NB quality classifier: exact integer counts; one ln of an
# exact rational per token floored into micro-units (the cosine-e6
# quantization class)
_NB_MODEL = """
toks AS (
  SELECT CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN 1 ELSE 0 END AS is_pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents),
tok2 AS (SELECT * FROM toks WHERE token <> ''),
per_tok AS (
  SELECT token, SUM(is_pos) AS cnt_pos,
         SUM(1 - is_pos) AS cnt_neg
  FROM tok2 GROUP BY token),
tot AS (
  SELECT SUM(cnt_pos) AS t_pos, SUM(cnt_neg) AS t_neg,
         COUNT(*) AS vocab
  FROM per_tok),
model AS (
  SELECT token, CAST(cnt_pos AS BIGINT) AS cnt_pos,
         CAST(cnt_neg AS BIGINT) AS cnt_neg,
         CAST(floor(ln(
             CAST((cnt_pos + 1) * (t_neg + vocab) AS DOUBLE)
             / CAST((cnt_neg + 1) * (t_pos + vocab) AS DOUBLE)
           ) * 1e6) AS BIGINT) AS w_e6
  FROM per_tok, tot
  WHERE cnt_pos + cnt_neg >= 3)"""

ORACLES["docs_nb_train"] = f"""
WITH {_NB_MODEL}
SELECT * FROM model
"""

ORACLES["docs_nb_classify"] = f"""
WITH {_NB_MODEL},
dt AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS token
  FROM documents)
SELECT d.doc_id, d.source,
       CAST(COUNT(*) AS BIGINT) AS n_model_tok,
       CAST(SUM(m.w_e6) AS BIGINT) AS score_e6,
       CAST(CASE WHEN SUM(m.w_e6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM dt d JOIN model m ON d.token = m.token
WHERE d.token <> ''
GROUP BY d.doc_id, d.source
"""

# streaming NB gate: batch LEFT-join twin — every document scored
# (missing tokens contribute 0), same keep rule
ORACLES["docs_stream_nb_gate"] = f"""
WITH {_NB_MODEL},
dt AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS token
  FROM documents)
SELECT d.doc_id, ANY_VALUE(d.source) AS source,
       CAST(COALESCE(SUM(m.w_e6), 0) AS BIGINT) AS score_e6,
       CAST(CASE WHEN COALESCE(SUM(m.w_e6), 0) > 0 THEN 1 ELSE 0 END
         AS BIGINT) AS keep
FROM dt d LEFT JOIN model m ON d.token = m.token
WHERE d.token <> ''
GROUP BY d.doc_id
"""
