"""StructTypes for the core SSURGO tables (FIXTURES.md minimum column
sets; types per the reference's XML workspace field defs — keys stay
strings, matching gSSURGO_CONUS_5070.xml String(30) keys).

Only the columns the reference actually reads are declared; the ingest
loader accepts wider pipe-text rows and selects these (the reference's
explicit field lists, gSSURGO_CreateSoilMap.py:9754-9760)."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    FloatType,
    ShortType,
    StringType,
    StructField,
    StructType,
)


def _s(*names: str) -> list[StructField]:
    return [StructField(n, StringType()) for n in names]


def _f(*names: str) -> list[StructField]:
    return [StructField(n, FloatType()) for n in names]


def _sh(*names: str) -> list[StructField]:
    return [StructField(n, ShortType()) for n in names]


SSURGO_SCHEMAS: dict[str, StructType] = {
    "legend": StructType(_s("lkey", "areasymbol", "areatypename")),
    "mapunit": StructType(_s("mukey", "musym", "muname", "lkey", "farmlndcl")),
    "component": StructType(
        _s("cokey", "mukey", "compname")
        + _sh("comppct_r")
        + _s(
            "majcompflag",
            "compkind",
            "localphase",
            "otherph",
            "taxorder",
            "taxsubgrp",
            "hydricrating",
            "drainagecl",
            "nirrcapcl",
        )
        + _f("rsprod_r")
    ),
    "chorizon": StructType(
        _s("chkey", "cokey", "hzname", "desgnmaster")
        + _sh("hzdept_r", "hzdepb_r")
        + _f(
            "sandtotal_r",
            "silttotal_r",
            "claytotal_r",
            "om_r",
            "dbthirdbar_r",
            "ec_r",
            "ph1to1h2o_r",
            "awc_r",
        )
        + _s("kffact")
    ),
    "chfrags": StructType(_s("chfragskey", "chkey") + _f("fragvol_r")),
    "chtexturegrp": StructType(_s("chtgkey", "chkey", "texture", "rvindicator")),
    "chtexture": StructType(_s("chtkey", "chtgkey", "lieutex")),
    "corestrictions": StructType(
        _s("corestrictkey", "cokey", "reskind", "reshard") + _sh("resdept_r")
    ),
    "cointerp": StructType(
        _s("cointerpkey", "cokey", "mrulekey", "mrulename", "rulekey", "rulename")
        + _sh("ruledepth")
        + [StructField("interphr", DoubleType())]
        + _s("interphrc")
    ),
    "distinterpmd": StructType(_s("rulekey", "rulename")),
    "comonth": StructType(
        _s("comonthkey", "cokey")
        + _sh("monthseq")
        + _s("month", "flodfreqcl", "pondfreqcl")
    ),
    "cosoilmoist": StructType(
        _s("cosoilmoistkey", "comonthkey")
        + _sh("soimoistdept_r")
        + _s("soimoiststat")
    ),
    "muaggatt": StructType(
        _s("mukey") + _f("aws0100wta") + _s("drclassdcd", "hydgrpdcd")
    ),
    "sdvattribute": StructType(
        _sh("attributekey")
        + _s(
            "attributename",
            "attributetablename",
            "attributecolumnname",
            "attributelogicaldatatype",
            "effectivelogicaldatatype",
        )
        + _sh("attributeprecision")
        + _s("attributetype", "algorithmname", "nasisrulename")
        + _sh("ruledesign")
        + _sh(
            "mapunitlevelattribflag",
            "complevelattribflag",
            "cmonthlevelattribflag",
            "horzlevelattribflag",
        )
        + _s("tiebreakdomainname")
        + _sh("tiebreakrule")
        + _s("tiebreaklowlabel", "tiebreakhighlabel", "notratedphrase")
        + _s("nullratingreplacementvalue")
        + _sh("interpnullsaszeroflag")
        + _s("sqlwhereclause", "resultcolumnname", "attributeuomabbrev")
    ),
    "mdstatrshipdet": StructType(
        _s(
            "ltabphyname",
            "rtabphyname",
            "relationshipname",
            "ltabcolphyname",
            "rtabcolphyname",
        )
    ),
    "mdstatdomdet": StructType(
        _s("domainname", "choice") + _sh("choicesequence") + _s("choiceobsolete")
    ),
    "month": StructType(_sh("monthseq") + _s("monthname")),
}

# text-file base name per table (SSURGO export layout; the ordered
# 61-file list lives in SSURGO_Convert_to_Geodatabase.py:1227-1234 —
# only the tables this engine consumes are mapped here)
SSURGO_TXT_FILES: dict[str, str] = {
    "legend": "legend",
    "mapunit": "mapunit",
    "component": "comp",
    "chorizon": "chorizon",
    "chfrags": "chfrags",
    "chtexturegrp": "chtexgrp",
    "chtexture": "chtextur",
    "corestrictions": "crstrcts",
    "cointerp": "cinterp",
    "comonth": "cmonth",
    "cosoilmoist": "csmoist",
    "muaggatt": "muaggatt",
    "sdvattribute": "sdvattribute",
    "mdstatrshipdet": "msrsdet",
    "mdstatdomdet": "msdomdet",
    "distinterpmd": "sdvalgorithm",  # placeholder mapping
}

# primary keys for the sdv* load-time dedup
# (SSURGO_Convert_to_Geodatabase.py:1165-1168, :1392-1412)
SDV_PK: dict[str, list[str]] = {
    "sdvattribute": ["attributekey"],
    "sdvfolder": ["folderkey"],
    "sdvfolderattribute": ["attributekey"],
    "sdvalgorithm": ["algorithmsequence"],
}
