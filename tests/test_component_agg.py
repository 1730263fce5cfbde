"""Fixture tests for the SDV component-level aggregation operators,
covering the FIXTURES.md edge-case list (ties, null policy, 'Not
rated' placement, DCD >=50 override)."""

from __future__ import annotations

from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.operators import (
    RatingSpec,
    agg_dcd,
    agg_dcp,
    agg_limiting,
    agg_maxmin,
    agg_pp_sum,
    agg_wta,
)

DOMAIN = ["A", "B", "C"]

ROWS = [
    # mu1: clear dominant component
    ("mu1", "c11", 60, "B", 2.0),
    ("mu1", "c12", 40, "A", 4.0),
    # mu2: comppct tie -> tiebreak decides
    ("mu2", "c21", 50, "C", 1.0),
    ("mu2", "c22", 50, "A", 3.0),
    # mu3: null ratings (numeric col only)
    ("mu3", "c31", 70, None, None),
    ("mu3", "c32", 30, "B", 5.0),
    # mu4: 'Not rated' should lose to a real class in Limiting
    ("mu4", "c41", 80, "Not rated", None),
    ("mu4", "c42", 20, "B", 1.0),
    # mu5: all 'Not rated'
    ("mu5", "c51", 100, "Not rated", None),
    # mu6: DCD condition winner B(60) vs DCP winner A(55>=50) -> override
    ("mu6", "c61", 55, "A", 1.0),
    ("mu6", "c62", 30, "B", 1.0),
    ("mu6", "c63", 30, "B", 1.0),
]


def comp(spark):
    return spark.createDataFrame(
        ROWS, "mukey string, cokey string, comppct_r int, cls string, val double"
    )


def spec_cls(**kw):
    return RatingSpec(rating_col="cls", domain=DOMAIN, out_col="rating", **kw)


def test_dcp_dominant_and_tiebreak(spark):
    out = rows_to_dict(agg_dcp(comp(spark), spec_cls()), "mukey", "rating")
    assert out["mu1"] == "B"
    assert out["mu2"] == "A"  # tie -> Lower label wins
    assert out["mu6"] == "A"


def test_dcp_tiebreak_higher(spark):
    out = rows_to_dict(
        agg_dcp(comp(spark), spec_cls(tiebreak_higher=True)), "mukey", "rating"
    )
    assert out["mu2"] == "C"


def test_dcd_with_override(spark):
    df = agg_dcd(comp(spark), spec_cls(), dcp_override=True)
    r = {x["mukey"]: x for x in df.collect()}
    assert r["mu1"]["rating"] == "B" and r["mu1"]["comppct_r"] == 60
    # mu6: condition winner is B (60/115) but DCP winner A has 55 >= 50
    assert r["mu6"]["rating"] == "A"
    assert r["mu6"]["comppct_r"] == 52  # round(100*60/115)
    # without override the condition winner stands
    df2 = agg_dcd(comp(spark), spec_cls(), dcp_override=False)
    assert rows_to_dict(df2, "mukey", "rating")["mu6"] == "B"


def test_wta_null_policy(spark):
    spec = RatingSpec(rating_col="val", out_col="rating")
    out = rows_to_dict(agg_wta(comp(spark), spec), "mukey", "rating")
    assert out["mu3"] == 5.0  # null row excluded from num and den
    spec0 = RatingSpec(rating_col="val", out_col="rating", zero_nulls=True)
    out0 = rows_to_dict(agg_wta(comp(spark), spec0), "mukey", "rating")
    assert abs(out0["mu3"] - 1.5) < 1e-9  # (70*0 + 30*5)/100


def test_maxmin_domain(spark):
    out = rows_to_dict(
        agg_maxmin(comp(spark), spec_cls(), maximum=True), "mukey", "rating"
    )
    # max domain index among real classes; 'Not rated' ranks past 'C'
    assert out["mu1"] == "B"
    assert out["mu2"] == "C"
    assert out["mu4"] == "Not rated"  # rank 4 > rank of B
    out_min = rows_to_dict(
        agg_maxmin(comp(spark), spec_cls(), maximum=False), "mukey", "rating"
    )
    assert out_min["mu6"] == "A"


def test_limiting_not_rated_placement(spark):
    out = agg_limiting(comp(spark), spec_cls(), most=True)
    r = {x["mukey"]: x for x in out.collect()}
    # real class beats 'Not rated' even at 80 pct
    assert r["mu4"]["rating"] == "B" and r["mu4"]["comppct_r"] == 20
    # all-not-rated group keeps 'Not rated'
    assert r["mu5"]["rating"] == "Not rated"
    assert r["mu1"]["rating"] == "A"  # most limiting = lowest domain rank


def test_pp_sum_zero_fill(spark):
    parent = spark.createDataFrame(
        [("mu1",), ("mu2",), ("mu9",)], "mukey string"
    )
    spec = RatingSpec(rating_col="cls", out_col="rating")
    out = rows_to_dict(
        agg_pp_sum(comp(spark), spec, ["B"], parent=parent), "mukey", "rating"
    )
    assert out["mu1"] == 60
    assert out["mu2"] == 0
    assert out["mu9"] == 0  # mapunit with no components at all


def test_domain_reversed_suitability(spark):
    # ruledesign=2 reverses the domain (suitability interps)
    out = rows_to_dict(
        agg_dcp(comp(spark), spec_cls(domain_reversed=True)), "mukey", "rating"
    )
    assert out["mu2"] == "C"  # reversed domain: C ranks first now


def test_not_rated_and_null_placement(spark):
    """Reference domain assembly (gSSURGO_CreateSoilMap.py:9913-9967):
    notratedphrase inserts at the domain start (pre-reversal); nulls
    rank first under 'Higher' (losing DESC ties) and last otherwise."""
    from soil_data_development_tools___arcmap_spark.operators import (
        RatingSpec,
        agg_dcp,
    )

    df = spark.createDataFrame(
        [
            # mukey 1: tie between a real class and 'Not rated'
            (1, 1, 50, "Slight"),
            (1, 2, 50, "Not rated"),
            # mukey 2: tie between a real class and NULL
            (2, 1, 50, "Severe"),
            (2, 2, 50, None),
        ],
        "mukey int, cokey int, comppct_r int, interp string",
    )
    base = dict(
        rating_col="interp",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        domain=["Slight", "Moderate", "Severe"],
        not_rated="Not rated",
        out_col="rating",
    )
    # tiebreak Lower: 'Not rated' (inserted at rank 1) WINS the tie
    # in mukey 1; NULL ranks last and loses in mukey 2
    low = {r["mukey"]: r["rating"]
           for r in agg_dcp(df, RatingSpec(**base)).collect()}
    assert low == {1: "Not rated", 2: "Severe"}
    # tiebreak Higher: real classes outrank 'Not rated' under DESC,
    # and NULL ranks 0 so it still loses
    hi = {r["mukey"]: r["rating"]
          for r in agg_dcp(df, RatingSpec(tiebreak_higher=True, **base)).collect()}
    assert hi == {1: "Slight", 2: "Severe"}
