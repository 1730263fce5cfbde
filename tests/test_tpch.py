"""TPC-H completion batch: semantic spot checks + plan-shape
assertions for the partsupp-adapted anchors (q2/q8/q9/q11/q16/q19/
q20). Value correctness is the oracle gate's job; these tests pin the
physical-plan properties the 100 TB design depends on (pushdown,
broadcast dims, no vacuous predicates)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q8_plan_broadcasts_all_dims(spark):
    from soil_data_development_tools___arcmap_spark.queries import q8_market_share

    df = q8_market_share(spark, SF)
    plan = _plan(df)
    # dims reach the scan as pushed filters, not post-scan Filters
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "EqualTo(r_name,AMERICA)" in plan
    # at this SF every join should be broadcast — no sort-merge
    assert "SortMergeJoin" not in plan
    rows = {r["o_year"]: r for r in df.collect()}
    assert set(rows) == {1995, 1996}
    for r in rows.values():
        # at sf0.001 a single nation can have zero AMERICA sales in a
        # year; the denominator must still be real
        assert 0 <= r["nation_vol_c2"] < r["total_vol_c2"]
        assert 0 <= r["mkt_share_e4"] <= 10000


def test_q2_min_is_tight_and_ordered(spark):
    from soil_data_development_tools___arcmap_spark.queries import (
        q2_min_cost_supplier,
    )

    rows = q2_min_cost_supplier(spark, SF).collect()
    assert rows
    # descending acctbal with the documented tiebreak chain
    keys = [
        (-r["s_acctbal_c"], r["n_name"], r["s_name"], r["p_partkey"])
        for r in rows
    ]
    assert keys == sorted(keys)
    assert all(r["min_cost_c"] > 0 for r in rows)


def test_q11_threshold_discriminates(spark):
    from soil_data_development_tools___arcmap_spark.queries import (
        q11_important_stock,
    )

    kept = q11_important_stock(spark, SF)
    n_kept = kept.count()
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    # the 0.1% cut must drop some parts and keep some
    assert 0 < n_kept < n_parts


def test_q19_branches_nonvacuous(spark):
    from soil_data_development_tools___arcmap_spark.queries import (
        q19_discounted_revenue,
    )

    row = q19_discounted_revenue(spark, SF).collect()[0]
    li_total = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert 0 < row["n_lines"] < li_total
    assert row["revenue_c2"] > 0


def test_q16_excludes_complaint_suppliers(spark):
    from pyspark.sql import functions as F

    from soil_data_development_tools___arcmap_spark.queries import (
        q16_supplier_cnt,
    )

    df = q16_supplier_cnt(spark, SF)
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    mx = df.agg(F.max("supplier_cnt")).collect()[0][0]
    assert mx is not None and mx <= n_supp
