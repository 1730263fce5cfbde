"""End-to-end lifecycle test (SURVEY §3.1 + §3.3): pipe-delimited
SSURGO text → typed ingest → relationship-walk planner → SDV
aggregation, in one pass — the ingest and the rating engine working
against each other rather than tested in isolation."""

from __future__ import annotations

import os

from ssurgo_fixtures import RELATIONS

from soil_data_development_tools___arcmap_spark.plans.planner import (
    create_soil_map,
    hydrate,
)
from soil_data_development_tools___arcmap_spark.sources.ssurgo_text import (
    read_ssurgo_table,
)


def write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w", encoding="cp1252") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_text_to_rating(spark, tmp_path):
    mapunit = read_ssurgo_table(
        spark,
        write(tmp_path, "mapunit.txt", [
            "mu1|Aa|Alpha|l1|",
            "mu2|Bb|Beta|l1|",
            "mu3|Cc|Gamma (NOTCOM only)|l1|",
        ]),
        "mapunit",
    )
    # cokey|mukey|compname|comppct_r|majcompflag|compkind|... (14 cols)
    component = read_ssurgo_table(
        spark,
        write(tmp_path, "comp.txt", [
            "c1|mu1|Alpha|60|Yes|Series|||||Yes|Well drained||",
            "c2|mu1|Alpha minor|40|No|Series|||||No|Well drained||",
            "c3|mu2|Beta|50|Yes|Series|||||Unranked|Poorly drained||",
            "c4|mu2|Beta wet|50|Yes|Series|||||Yes|Very poorly drained||",
            "c5|mu3|NOTCOM|100|Yes||||||||",
        ]),
        "component",
    )
    tables = {"mapunit": mapunit, "component": component}
    sdv_row = {
        "attributename": "Hydric Rating",
        "attributetablename": "component",
        "attributecolumnname": "hydricrating",
        "algorithmname": "Dominant Condition",
        "complevelattribflag": 1,
        "tiebreakrule": 0,
        "tiebreakdomainname": "hyd",
    }
    domdet = [
        dict(domainname="hyd", choice=c, choicesequence=i + 1)
        for i, c in enumerate(["Yes", "Unranked", "No"])
    ]
    req = hydrate(sdv_row, domdet)
    out = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in create_soil_map(tables, RELATIONS, req).collect()
    }
    # mu1: DCP-override (c1 has 60 >= 50) -> 'Yes'; DCD pct = 60/100 -> 60
    assert out["mu1"] == (60, "Yes")
    # mu2: tie 50/50 between Unranked (c3) and Yes (c4); DCD tiebreak
    # 'Lower' picks the earlier domain class 'Yes'; the 50% DCP winner
    # (c3 vs c4: equal pct, domain rank breaks -> c4 'Yes') confirms it
    assert out["mu2"] == (50, "Yes")
    # mu3: NOTCOM filtered out -> mapunit drops from the rating
    assert "mu3" not in out


def test_text_to_rating_with_cutoff_and_where(spark, tmp_path):
    mapunit = read_ssurgo_table(
        spark, write(tmp_path, "mu.txt", ["mu1|Aa|Alpha|l1|"]), "mapunit"
    )
    component = read_ssurgo_table(
        spark,
        write(tmp_path, "co.txt", [
            "c1|mu1|Alpha|70|Yes|Series|||||Yes|Well drained||",
            "c2|mu1|Tiny|5|No|Series|||||No|Well drained||",
        ]),
        "component",
    )
    sdv_row = {
        "attributename": "Hydric Rating",
        "attributetablename": "component",
        "attributecolumnname": "hydricrating",
        "algorithmname": "Dominant Component",
        "complevelattribflag": 1,
        "tiebreakrule": 0,
        "sqlwhereclause": "majcompflag = 'Yes'",
    }
    req = hydrate(sdv_row, None, cutoff=10)
    out = create_soil_map(
        {"mapunit": mapunit, "component": component}, RELATIONS, req
    ).collect()
    assert [(r["mukey"], r["comppct_r"], r["rating"]) for r in out] == [
        ("mu1", 70, "Yes")
    ]
