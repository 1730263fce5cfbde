"""Round-5 operators: by-tile partition planning and the
metadata-catalog gate queries' planning properties."""

from __future__ import annotations

from conftest import SF_SMOKE

from soil_data_development_tools___arcmap_spark import queries as Q


def test_tile_partition_anchors_each_survey_once(spark):
    """Every survey footprint intersects ≥1 tile; the probe-point
    anchor assigns each survey to EXACTLY one owning tile (the rule
    that keeps per-tile builds from double-ingesting a survey), and
    the anchored total equals the survey count."""
    rows = Q.tile_survey_partition(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert sum(r["n_anchored"] for r in rows) == 150  # sf0.001 customers
    for r in rows:
        assert r["n_intersect"] >= r["n_anchored"]
        if r["n_anchored"] > 0:
            assert r["first_areasymbol"] <= r["last_areasymbol"]


def test_tile_partition_broadcasts_tiles(spark):
    """The tile dimension must broadcast: the fact side streams
    map-only through a BroadcastNestedLoopJoin on the range predicate
    — no shuffle of the survey table at any SF."""
    plan = (
        Q.tile_survey_partition(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_planner_extended_matches_manual_relations(spark):
    """The catalog-derived relation walk must plan the same rating as
    hand-passed relations (the fixture-proven path)."""
    from pyspark.sql import functions as F

    from soil_data_development_tools___arcmap_spark.catalog import embedded_catalog
    from soil_data_development_tools___arcmap_spark.plans.relwalk import join_path

    relations = [
        {
            "ltabphyname": l,
            "rtabphyname": r,
            "ltabcolphyname": lc,
            "rtabcolphyname": rc,
        }
        for (l, r, lc, rc) in embedded_catalog().edges
    ]
    path = join_path(relations, "cotaxmoistcl")
    assert path == [
        ("mapunit", "component", "mukey", "mukey"),
        ("component", "cotaxmoistcl", "cokey", "cokey"),
    ]
    out = Q.planner_sdv_extended(spark, SF_SMOKE)
    assert out.where(F.col("rating").isNotNull()).count() > 0
    assert out.count() == 150
