"""Month-collapse stage tests: the 12x-replication trap, month windows
(incl. wrap-around), DTWT null->201 replacement."""

from __future__ import annotations

from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.operators import (
    RatingSpec,
    agg_dcp,
    agg_wta,
    month_collapse,
)


def mo(spark):
    rows = []
    # c1: annual rating 'Frequent' replicated over all 12 months (trap)
    for m in range(1, 13):
        rows.append(("mu1", "c1", 60, m, 10.0))
    # c2: varies by month
    for m, v in [(1, 5.0), (2, 7.0), (6, 1.0), (12, 9.0)]:
        rows.append(("mu1", "c2", 40, m, v))
    # c3: null values in some months
    rows += [("mu2", "c3", 100, 1, None), ("mu2", "c3", 100, 2, 3.0)]
    return spark.createDataFrame(
        rows, "mukey string, cokey string, comppct_r int, monthseq int, val double"
    )


SPEC = RatingSpec(rating_col="val", out_col="rating")


def test_replication_trap_distinct(spark):
    collapsed = month_collapse(mo(spark), SPEC, how="distinct")
    counts = collapsed.groupBy("cokey").count()
    c = rows_to_dict(counts, "cokey", "count")
    assert c["c1"] == 1  # 12 replicated rows -> 1
    assert c["c2"] == 4  # genuinely distinct monthly values survive


def test_month_window_and_min(spark):
    collapsed = month_collapse(mo(spark), SPEC, how="min", beg_month=1, end_month=3)
    v = rows_to_dict(collapsed, "cokey", "val")
    assert v["c2"] == 5.0  # months 1,2 in window; min(5,7)
    out = rows_to_dict(agg_wta(collapsed, SPEC), "mukey", "rating")
    assert abs(out["mu1"] - (60 * 10 + 40 * 5) / 100.0) < 1e-9


def test_wraparound_window(spark):
    collapsed = month_collapse(
        mo(spark), SPEC, how="max", beg_month=11, end_month=2
    )
    v = rows_to_dict(collapsed, "cokey", "val")
    assert v["c2"] == 9.0  # months 1,2,12 in window; max


def test_dtwt_null_replacement(spark):
    spec = RatingSpec(rating_col="val", out_col="rating", null_replacement=201.0)
    collapsed = month_collapse(mo(spark), spec, how="max")
    out = rows_to_dict(agg_dcp(collapsed, spec), "mukey", "rating")
    assert out["mu2"] == 201.0  # null month -> sentinel, max picks it
