"""SSURGO-shaped fixture tables (FIXTURES.md) for planner tests.

Encodes the edge cases from SURVEY §5: comppct ties, NOTCOM, null
ratings, 'Not rated' interps, partial horizon overlap, 12×-replicated
month data, DCD >=50 override material.
"""

from __future__ import annotations

RELATIONS = [
    # ltab (parent), rtab (child), relname, lcol, rcol
    dict(ltabphyname="mapunit", rtabphyname="component",
         relationshipname="x", ltabcolphyname="mukey", rtabcolphyname="mukey"),
    dict(ltabphyname="component", rtabphyname="chorizon",
         relationshipname="x", ltabcolphyname="cokey", rtabcolphyname="cokey"),
    dict(ltabphyname="component", rtabphyname="cointerp",
         relationshipname="x", ltabcolphyname="cokey", rtabcolphyname="cokey"),
    dict(ltabphyname="component", rtabphyname="comonth",
         relationshipname="x", ltabcolphyname="cokey", rtabcolphyname="cokey"),
    dict(ltabphyname="comonth", rtabphyname="cosoilmoist",
         relationshipname="x", ltabcolphyname="comonthkey",
         rtabcolphyname="comonthkey"),
    dict(ltabphyname="mapunit", rtabphyname="muaggatt",
         relationshipname="x", ltabcolphyname="mukey", rtabcolphyname="mukey"),
]

DOMDET = [
    dict(domainname="capclass", choice="1", choicesequence=1, choiceobsolete="No"),
    dict(domainname="capclass", choice="2", choicesequence=2, choiceobsolete="No"),
    dict(domainname="capclass", choice="3", choicesequence=3, choiceobsolete="No"),
    dict(domainname="capclass", choice="8", choicesequence=4, choiceobsolete="No"),
]


def build_tables(spark):
    mapunit = spark.createDataFrame(
        [
            ("mu1", "Aa", "Alpha loam", "l1", "Prime farmland"),
            ("mu2", "Bb", "Beta clay", "l1", None),
            ("mu3", "Cc", "Gamma sand", "l1", "Not prime"),
            ("mu4", "Dd", "NOTCOM unit", "l1", None),
        ],
        "mukey string, musym string, muname string, lkey string, farmlndcl string",
    )
    component = spark.createDataFrame(
        [
            # mu1: dominant c11 60%, c12 40%
            ("c11", "mu1", "Alpha", 60, "Yes", None, "2", 80.0),
            ("c12", "mu1", "Beta", 40, "No", None, "1", 40.0),
            # mu2: tie 50/50
            ("c21", "mu2", "Gamma", 50, "Yes", None, "3", 10.0),
            ("c22", "mu2", "Delta", 50, "Yes", None, "1", 30.0),
            # mu3: null rating component + rated minor
            ("c31", "mu3", "Epsilon", 70, "Yes", None, None, None),
            ("c32", "mu3", "Zeta", 30, "No", None, "2", 20.0),
            # mu4: NOTCOM only
            ("c41", "mu4", "NOTCOM", 100, "No", None, None, None),
        ],
        "cokey string, mukey string, compname string, comppct_r int, "
        "majcompflag string, compkind string, nirrcapcl string, rsprod_r double",
    )
    chorizon = spark.createDataFrame(
        [
            # c11: two horizons, awc varies
            ("h1", "c11", 0, 10, 0.10),
            ("h2", "c11", 10, 50, 0.20),
            # c12: single deep horizon
            ("h3", "c12", 0, 200, 0.30),
            # c21: horizon straddles the range bound
            ("h4", "c21", 20, 80, 0.15),
            # c22: no horizons -> excluded, weights renormalize
            # c31: null awc
            ("h5", "c31", 0, 30, None),
        ],
        "chkey string, cokey string, hzdept_r int, hzdepb_r int, awc_r double",
    )
    comonth = spark.createDataFrame(
        [(f"m{c}{m}", c, m, None) for c in ("c11", "c12") for m in range(1, 13)]
        + [("mx", "c21", 6, None)],
        "comonthkey string, cokey string, monthseq int, flodfreqcl string",
    )
    cointerp = spark.createDataFrame(
        [
            ("i1", "c11", "r1", "Crop Suitability", "r1", "Crop Suitability",
             0, 0.85, "Well suited"),
            ("i2", "c12", "r1", "Crop Suitability", "r1", "Crop Suitability",
             0, 0.40, "Poorly suited"),
            ("i3", "c21", "r1", "Crop Suitability", "r1", "Crop Suitability",
             0, None, "Not rated"),
            ("i4", "c22", "r1", "Crop Suitability", "r1", "Crop Suitability",
             0, 0.60, "Moderately suited"),
            # a different rule that must be filtered out
            ("i5", "c11", "r2", "Other Rule", "r2", "Other Rule", 0, 0.1, "Bad"),
        ],
        "cointerpkey string, cokey string, mrulekey string, mrulename string, "
        "rulekey string, rulename string, ruledepth int, interphr double, "
        "interphrc string",
    )
    muaggatt = spark.createDataFrame(
        [("mu1", 15.5, "Well drained"), ("mu2", 9.1, "Poorly drained")],
        "mukey string, aws0100wta double, drclassdcd string",
    )
    return dict(
        mapunit=mapunit,
        component=component,
        chorizon=chorizon,
        comonth=comonth,
        cointerp=cointerp,
        muaggatt=muaggatt,
    )


SDV_ROWS = {
    # component-level numeric property
    "rsprod": dict(
        attributename="Range Production",
        attributetablename="component",
        attributecolumnname="rsprod_r",
        attributetype="Property",
        algorithmname="Weighted Average",
        complevelattribflag=1,
        resultcolumnname="rsprod",
        tiebreakrule=-1,
    ),
    # component-level ordinal with domain
    "nirrcapcl": dict(
        attributename="Capability Class",
        attributetablename="component",
        attributecolumnname="nirrcapcl",
        attributetype="Property",
        algorithmname="Dominant Condition",
        complevelattribflag=1,
        tiebreakdomainname="capclass",
        resultcolumnname="nirrcapcl",
        tiebreakrule=-1,
    ),
    # horizon-level property
    "awc": dict(
        attributename="Available Water Capacity",
        attributetablename="chorizon",
        attributecolumnname="awc_r",
        attributetype="Property",
        algorithmname="Weighted Average",
        complevelattribflag=1,
        horzlevelattribflag=1,
        resultcolumnname="awc",
        attributeprecision=3,
        tiebreakrule=-1,
    ),
    # interpretation (fuzzy + class)
    "interp": dict(
        attributename="Crop Suitability",
        attributetablename="cointerp",
        attributecolumnname="interphrc",
        attributetype="Interpretation",
        effectivelogicaldatatype="float",
        algorithmname="Weighted Average",
        complevelattribflag=1,
        resultcolumnname="suitability",
        tiebreakrule=-1,
    ),
    # mapunit-level satellite
    "aws0100": dict(
        attributename="AWS 0-100",
        attributetablename="muaggatt",
        attributecolumnname="aws0100wta",
        attributetype="Property",
        algorithmname="No Aggregation Necessary",
        mapunitlevelattribflag=1,
        resultcolumnname="aws0100",
    ),
}
