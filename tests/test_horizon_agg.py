"""Fixture tests for depth-weighted horizon aggregation (clip math,
partial overlap, components with no horizons, weight renormalization)."""

from __future__ import annotations

import pytest
from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.operators import (
    RatingSpec,
    agg_hz_dcp_wta,
    agg_hz_maxmin_then,
    agg_hz_wta_sum,
    agg_hz_wta_wta,
)

ROWS = [
    # mukey, cokey, comppct, hzdept, hzdepb, awc
    ("mu1", "c1", 60, 0, 10, 0.10),
    ("mu1", "c1", 60, 10, 50, 0.20),
    ("mu1", "c2", 40, 0, 200, 0.30),
    # mu2: one component has NO horizons in range -> renormalize weights
    ("mu2", "c3", 60, 0, 30, 0.10),
    ("mu2", "c4", 40, 150, 200, 0.50),  # entirely below [5,25)
    # mu3: null awc horizons only
    ("mu3", "c5", 100, 0, 30, None),
]


def hz(spark):
    return spark.createDataFrame(
        ROWS,
        "mukey string, cokey string, comppct_r int, "
        "hzdept_r int, hzdepb_r int, awc double",
    )


SPEC = RatingSpec(rating_col="awc", out_col="rating")


def test_hz_wta_wta_partial_overlap(spark):
    out = rows_to_dict(
        agg_hz_wta_wta(hz(spark), SPEC, top=5, bot=25), "mukey", "rating"
    )
    # c1: clip 5 of [0,10) + 15 of [10,50) -> (5*.1+15*.2)/20 = 0.175
    # c2: 20 of [0,200) -> 0.3 ; mu1 = (60*.175 + 40*.3)/100 = 0.225
    assert out["mu1"] == pytest.approx(0.225)
    # mu2: only c3 contributes -> its own value, weights renormalized
    assert out["mu2"] == pytest.approx(0.10)
    assert "mu3" not in out  # all-null ratings drop out


def test_hz_wta_sum(spark):
    out = agg_hz_wta_sum(hz(spark), SPEC, top=5, bot=25)
    r = {x["mukey"]: x for x in out.collect()}
    # c1 sum = 3.5, c2 sum = 6.0 -> (60*3.5 + 40*6)/100 = 4.5
    assert r["mu1"]["rating"] == pytest.approx(4.5)
    # mu2: only c3 (sum = 20*.1 = 2.0), denominator renormalized to 60
    assert r["mu2"]["rating"] == pytest.approx(2.0)
    assert r["mu2"]["comppct_r"] == 60


def test_hz_dcp_wta(spark):
    out = rows_to_dict(
        agg_hz_dcp_wta(hz(spark), SPEC, top=5, bot=25), "mukey", "rating"
    )
    assert out["mu1"] == pytest.approx(0.175)  # dominant c1 only


def test_hz_maxmin_then_wta(spark):
    out = rows_to_dict(
        agg_hz_maxmin_then(hz(spark), SPEC, then="wta", maximum=True,
                           top=5, bot=25),
        "mukey",
        "rating",
    )
    # c1 max awc in range = .2, c2 = .3 -> (60*.2+40*.3)/100 = .24
    assert out["mu1"] == pytest.approx(0.24)


def test_zero_thickness_clip(spark):
    # horizon exactly at the range boundary contributes zero
    df = spark.createDataFrame(
        [("m", "c", 100, 25, 40, 0.9), ("m", "c", 100, 5, 25, 0.1)],
        "mukey string, cokey string, comppct_r int, "
        "hzdept_r int, hzdepb_r int, awc double",
    )
    out = rows_to_dict(
        agg_hz_wta_wta(df, SPEC, top=5, bot=25), "mukey", "rating"
    )
    assert out["m"] == pytest.approx(0.1)
