"""End-to-end planner tests: sdvattribute row → create_soil_map →
rating table, on SSURGO-shaped fixtures."""

from __future__ import annotations

import pytest
from conftest import rows_to_dict
from ssurgo_fixtures import DOMDET, RELATIONS, SDV_ROWS, build_tables

from soil_data_development_tools___arcmap_spark.plans import (
    create_soil_map,
    join_path,
    parse_where,
)
from soil_data_development_tools___arcmap_spark.plans.planner import hydrate


def test_join_path_walk():
    path = join_path(RELATIONS, "cosoilmoist")
    assert [p[1] for p in path] == ["component", "comonth", "cosoilmoist"]
    assert path[0][0] == "mapunit"
    with pytest.raises(ValueError):
        join_path(RELATIONS, "nosuchtable")


def test_whereclause_parser(spark):
    df = spark.createDataFrame(
        [("A", 60, None), ("NOTCOM", 10, "x")],
        "compname string, comppct_r int, localphase string",
    )
    out = df.where(
        parse_where("COMPPCT_R >= 15 AND COMPNAME <> 'NOTCOM'")
    ).collect()
    assert len(out) == 1 and out[0]["compname"] == "A"
    assert df.where(parse_where("localphase IS NULL")).count() == 1
    assert df.where(parse_where("compname IN ('A', 'B') OR comppct_r < 5")).count() == 1
    assert df.where(parse_where("compname LIKE 'NOT%'")).count() == 1


def test_wta_component_property(spark):
    tables = build_tables(spark)
    req = hydrate(SDV_ROWS["rsprod"], DOMDET)
    out = rows_to_dict(
        create_soil_map(tables, RELATIONS, req), "mukey", "rsprod"
    )
    assert out["mu1"] == pytest.approx((60 * 80 + 40 * 40) / 100)
    assert out["mu3"] == pytest.approx(20.0)  # null-rating comp excluded
    assert "mu4" not in out  # NOTCOM filtered


def test_dcd_ordinal_domain(spark):
    tables = build_tables(spark)
    req = hydrate(SDV_ROWS["nirrcapcl"], DOMDET)
    df = create_soil_map(tables, RELATIONS, req)
    r = {x["mukey"]: x for x in df.collect()}
    assert r["mu1"]["nirrcapcl"] == "2"  # c11 60% >= 50 -> DCP override
    # mu2: tie 50/50 -> tiebreak Lower wins -> domain rank of '1' < '3'
    assert r["mu2"]["nirrcapcl"] == "1"


def test_hz_wta_depth_weighted(spark):
    tables = build_tables(spark)
    req = hydrate(SDV_ROWS["awc"], DOMDET, top=0, bot=50)
    out = rows_to_dict(create_soil_map(tables, RELATIONS, req), "mukey", "awc")
    # c11: (10*.1+40*.2)/50 = .18 ; c12: 50*.3/50 = .3
    assert out["mu1"] == pytest.approx(round((60 * 0.18 + 40 * 0.30) / 100, 3))
    # c21 horizon [20,80) clipped to [20,50): value .15; c22 no horizons
    assert out["mu2"] == pytest.approx(0.15)


def test_interp_fuzzy_and_rule_filter(spark):
    tables = build_tables(spark)
    req = hydrate(SDV_ROWS["interp"], DOMDET)
    assert req.fuzzy and req.attributecolumnname == "interphr"
    out = rows_to_dict(
        create_soil_map(tables, RELATIONS, req), "mukey", "suitability"
    )
    # mu1: (60*.85 + 40*.40)/100 ; the 'Other Rule' row (i5) must not leak
    assert out["mu1"] == pytest.approx(0.67)
    # mu2: c21 null fuzzy excluded -> c22 .60 over 50 pct
    assert out["mu2"] == pytest.approx(0.60)


def test_mapunit_satellite_passthrough(spark):
    tables = build_tables(spark)
    req = hydrate(SDV_ROWS["aws0100"], DOMDET)
    out = rows_to_dict(
        create_soil_map(tables, RELATIONS, req), "mukey", "aws0100"
    )
    assert out["mu1"] == pytest.approx(15.5)
    assert out["mu3"] is None  # left join null-pads missing satellites


def test_month_distinct_collapse_dcp(spark):
    tables = build_tables(spark)
    row = dict(
        attributename="Flooding Frequency",
        attributetablename="comonth",
        attributecolumnname="flodfreqcl",
        attributetype="Property",
        algorithmname="Dominant Component",
        complevelattribflag=1,
        cmonthlevelattribflag=1,
        resultcolumnname="flodfreq",
    )
    req = hydrate(row, DOMDET)
    df = create_soil_map(tables, RELATIONS, req)
    # 12x-replicated months must collapse to ONE row per component
    # before DCP (comppct trap, gSSURGO_CreateSoilMap.py:10710-10716)
    assert df.where("mukey = 'mu1'").count() == 1


def test_repair_sdvattribute_floodbandaid():
    """floodBandaid (gSSURGO_CreateSoilMap.py:166-204): flooding
    tiebreak domain restored, paren/IN sqlwhereclauses rewritten,
    input never mutated, healthy rows untouched."""
    from soil_data_development_tools___arcmap_spark.plans.planner import (
        repair_sdvattribute,
    )
    from soil_data_development_tools___arcmap_spark.plans.whereclause import (
        parse_where,
    )

    broken = {"attributekey": 12, "tiebreakdomainname": None}
    fixed = repair_sdvattribute(broken)
    assert fixed["tiebreakdomainname"] == "flooding_frequency_class"
    assert broken["tiebreakdomainname"] is None  # copy, not mutation
    # key 12 with a populated domain is left alone
    ok = {"attributekey": 12, "tiebreakdomainname": "some_dom"}
    assert repair_sdvattribute(ok)["tiebreakdomainname"] == "some_dom"
    # other attributes never gain the flooding domain
    assert repair_sdvattribute({"attributekey": 7}).get("tiebreakdomainname") is None

    eco = ("(coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or "
           "coecoclass.ecoclasstypename = 'NRCS Forestland Site')")
    out = repair_sdvattribute({"sqlwhereclause": eco})["sqlwhereclause"]
    assert not out.startswith("(")
    res = ("corestrictions.reskind IN ('Densic bedrock', 'Paralithic bedrock', "
           "'Lithic bedrock')")
    out2 = repair_sdvattribute({"sqlwhereclause": res})["sqlwhereclause"]
    assert "IN" not in out2 and out2.count("OR") == 2
    # both the broken and repaired forms parse to valid Columns here
    for clause in (eco, res, out, out2):
        parse_where(clause)


def test_hydrate_rv_low_high_swap():
    """RV low/high column swap (gSSURGO_CreateSoilMap.py:3774-3783):
    'Low'/'High' rates the _l/_h sibling of an _r column; interps
    (fuzzy) and columns without catalog siblings never swap."""
    row = dict(
        attributename="AWC",
        attributetablename="chorizon",
        attributecolumnname="awc_r",
        algorithmname="Weighted Average",
        horzlevelattribflag=1,
    )
    cols = {"awc_r", "awc_l", "awc_h", "hzdept_r", "hzdepb_r"}
    assert hydrate(row, None, rv="Low", columns=cols).attributecolumnname == "awc_l"
    assert hydrate(row, None, rv="High", columns=cols).attributecolumnname == "awc_h"
    # default / representative keeps _r
    assert hydrate(row, None).attributecolumnname == "awc_r"
    assert hydrate(row, None, rv="Representative",
                   columns=cols).attributecolumnname == "awc_r"
    # no _l/_h sibling in the catalog -> no swap
    assert hydrate(row, None, rv="Low",
                   columns={"awc_r"}).attributecolumnname == "awc_r"
    # no catalog given -> reference behavior, swap unguarded
    assert hydrate(row, None, rv="High").attributecolumnname == "awc_h"
    # non-_r columns never swap
    row2 = dict(row, attributecolumnname="drainagecl")
    assert hydrate(row2, None, rv="Low", columns=cols
                   ).attributecolumnname == "drainagecl"
    # interps rate INTERPHR; the swap is explicitly unsupported there
    irow = dict(
        attributename="DHS - Suitability",
        attributetablename="cointerp",
        attributecolumnname="interphrc_r",
        algorithmname="Dominant Condition",
        complevelattribflag=1,
        attributetype="Interpretation",
        effectivelogicaldatatype="Float",
    )
    req = hydrate(irow, None, rv="Low")
    assert req.fuzzy and req.attributecolumnname == "interphr"
