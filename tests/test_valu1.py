"""Valu1 pipeline tests on SSURGO-shaped fixtures with hand-computed
root-zone / AWS / SOC / PWSL expectations."""

from __future__ import annotations

import pytest
from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.valu1 import (
    build_query_table,
    build_valu1,
    calc_aws,
    calc_pwsl,
    calc_rz_aws,
    calc_rz_depth,
    get_co_restrictions,
    get_sum_pct,
)


def tables(spark):
    component = spark.createDataFrame(
        [
            # mukey, cokey, compname, pct, majcomp, compkind, hydric,
            # drainage, localphase, otherph, taxorder, taxsubgrp
            ("mu1", "c1", "Alpha", 60, "Yes", "Series", "No",
             "Well drained", None, None, "Alfisols", "Typic"),
            ("mu1", "c2", "Beta", 40, "Yes", "Series", "Yes",
             "Poorly drained", None, None, "Alfisols", "Typic"),
            ("mu2", "c3", "Water", 90, "No", "Miscellaneous area", None,
             None, None, None, None, None),
            ("mu2", "c4", "Gamma", 10, "Yes", "Series", "Unranked",
             "Very poorly drained", None, None, "Alfisols", "Typic"),
        ],
        "mukey string, cokey string, compname string, comppct_r int, "
        "majcompflag string, compkind string, hydricrating string, "
        "drainagecl string, localphase string, otherph string, "
        "taxorder string, taxsubgrp string",
    )
    chorizon = spark.createDataFrame(
        [
            # c1: 0-50 good, 50-100 pH 3.0 (root-zone stopper at 50)
            ("h1", "c1", 0, 50, 0.20, 6.5, 1.0, 1.40, 2.0, 40.0, 40.0, 20.0, None),
            ("h2", "c1", 50, 100, 0.10, 3.0, 1.0, 1.40, 1.0, 40.0, 40.0, 20.0, None),
            # c2: 0-150 uniform
            ("h3", "c2", 0, 150, 0.15, 6.0, 1.0, 1.30, 3.0, 30.0, 40.0, 30.0, "O"),
        ],
        "chkey string, cokey string, hzdept_r int, hzdepb_r int, awc_r double, "
        "ph1to1h2o_r double, ec_r double, dbthirdbar_r double, om_r double, "
        "sandtotal_r double, silttotal_r double, claytotal_r double, "
        "desgnmaster string",
    )
    corestrictions = spark.createDataFrame(
        [
            ("r1", "c2", "Lithic bedrock", None, 120),
            ("r2", "c2", "Lithic bedrock", None, 130),  # deeper dup ignored
            ("r3", "c1", "Abrupt textural change", None, 10),  # non-qualifying
        ],
        "corestrictkey string, cokey string, reskind string, reshard string, "
        "resdept_r int",
    )
    return component, chorizon, corestrictions


def test_sum_pct(spark):
    component, _, _ = tables(spark)
    r = {x["mukey"]: x for x in get_sum_pct(component).collect()}
    assert r["mu1"]["musumcpct"] == 100
    assert r["mu2"]["musumcpcta"] == 10  # Water/Misc excluded from major-earthy


def test_first_restriction(spark):
    _, _, corestrictions = tables(spark)
    out = rows_to_dict(get_co_restrictions(corestrictions), "cokey", "resdept")
    assert out == {"c2": 120}  # shallowest qualifying kind only


def test_rz_depth_ph_and_restriction(spark):
    component, chorizon, corestrictions = tables(spark)
    qt = build_query_table(component, chorizon)
    rz = rows_to_dict(
        calc_rz_depth(qt, get_co_restrictions(corestrictions)), "cokey", "rzdepth"
    )
    assert rz["c1"] == 50  # pH 3.0 horizon starts at 50
    assert rz["c2"] == 120  # bedrock at 120 beats the 150 default


def test_rz_aws(spark):
    component, chorizon, corestrictions = tables(spark)
    qt = build_query_table(component, chorizon)
    rz = calc_rz_depth(qt, get_co_restrictions(corestrictions))
    out = {x["mukey"]: x for x in calc_rz_aws(qt, rz).collect()}
    # c1: 50cm*0.2*10 = 100mm ; c2: 120cm*0.15*10 = 180mm
    expect = round((60 * 100 + 40 * 180) / 100)
    assert out["mu1"]["rootznaws"] == expect
    assert out["mu1"]["droughty"] == (1 if expect <= 152 else 0)


def test_aws_ranges_single_pass(spark):
    component, chorizon, _ = tables(spark)
    qt = build_query_table(component, chorizon)
    out = calc_aws(qt, ranges=[(0, 20), (0, 100)])
    r = {(x["mukey"], x["top"], x["bot"]): x["aws"] for x in out.collect()}
    # mu1 (0,20): c1 20*0.2*10=40, c2 20*0.15*10=30 -> .6*40+.4*30=36
    assert r[("mu1", 0, 20)] == pytest.approx(36.0)
    # mu1 (0,100): c1 50*2+50*1=150, c2 100*1.5=150
    assert r[("mu1", 0, 100)] == pytest.approx(150.0)


def test_pwsl(spark):
    component, _, _ = tables(spark)
    out = rows_to_dict(calc_pwsl(component), "mukey", "pwsl1pomu")
    assert out["mu1"] == 40  # hydric c2
    assert out["mu2"] == 999  # Water >= 80% sentinel


def test_build_valu1_wide(spark):
    component, chorizon, corestrictions = tables(spark)
    wide = build_valu1(
        component, chorizon, corestrictions, ranges=[(0, 20), (0, 100)]
    )
    row = {x["mukey"]: x for x in wide.collect()}
    assert row["mu1"]["aws0_20"] == pytest.approx(36.0)
    assert row["mu1"]["pwsl1pomu"] == 40
    assert row["mu1"]["musumcpct"] == 100
    assert "soc0_100" in wide.columns


def test_nccpi_mainrule_resolution():
    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        NCCPI_V2_RULE,
        NCCPI_V3_RULE,
        resolve_nccpi_mainrule,
    )

    # prefer v3 when both generations are present
    assert resolve_nccpi_mainrule([NCCPI_V2_RULE, NCCPI_V3_RULE]) == NCCPI_V3_RULE
    # single name wins outright (even a non-standard one)
    assert resolve_nccpi_mainrule([NCCPI_V2_RULE]) == NCCPI_V2_RULE
    assert resolve_nccpi_mainrule(["custom"]) == "custom"
    # several names, none v3 -> v2
    assert resolve_nccpi_mainrule(["custom", NCCPI_V2_RULE]) == NCCPI_V2_RULE
    with pytest.raises(ValueError):
        resolve_nccpi_mainrule([])


def test_calc_nccpi2_combined_submodel_and_denominator(spark):
    """v2 layout: Corn+Soybeans is ONE submodel; unrated major
    components still count in the major-pct denominator."""
    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        NCCPI_V2_RULE,
        calc_nccpi2,
    )

    component = spark.createDataFrame(
        [
            ("mu1", "c1", 60, "Yes"),
            ("mu1", "c2", 40, "Yes"),  # major but NO cointerp rows
            ("mu1", "c3", 10, "No"),  # non-major: excluded everywhere
        ],
        "mukey string, cokey string, comppct_r int, majcompflag string",
    )
    cointerp = spark.createDataFrame(
        [
            ("c1", 0, "NCCPI - National Commodity Crop Productivity Index (Ver 2.0)",
             NCCPI_V2_RULE, 0.8),
            ("c1", 1, "NCCPI - NCCPI Corn and Soybeans Submodel (II)",
             NCCPI_V2_RULE, 0.5),
            ("c1", 1, "NCCPI - NCCPI Cotton Submodel (II)", NCCPI_V2_RULE, 0.25),
            # v3-generation row must be ignored by the v2 calc
            ("c1", 0, "NCCPI - National Commodity Crop Productivity Index",
             "NCCPI - National Commodity Crop Productivity Index (Ver 3.0)", 0.9),
        ],
        "cokey string, ruledepth int, rulename string, mrulename string,"
        " interphr double",
    )
    row = calc_nccpi2(component, cointerp).collect()[0]
    # denominator = 100 (60 rated + 40 unrated major), not 60
    assert row["nccpi2all"] == pytest.approx(round(0.8 * 60 / 100, 3))
    assert row["nccpi2cs"] == pytest.approx(round(0.5 * 60 / 100, 3))
    assert row["nccpi2co"] == pytest.approx(round(0.25 * 60 / 100, 3))
    assert row["nccpi2sg"] is None
