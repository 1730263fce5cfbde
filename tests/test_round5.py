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


def test_albers_projection_properties(spark):
    """Closed-form invariants of the Albers pair: the projection
    origin maps to (0, 0); scale along a standard parallel is true
    (arc length preserved to <1e-6 relative); the inverse recovers
    the forward exactly at double precision."""
    import math

    from pyspark.sql import functions as F

    from soil_data_development_tools___arcmap_spark.functions.projection import (
        CONUS,
        albers_forward,
        albers_inverse,
    )

    x, y = albers_forward(F.lit(CONUS.lon0), F.lit(CONUS.lat0))
    r = spark.range(1).select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(r["x"]) < 1e-6 and abs(r["y"]) < 1e-6

    # true scale along standard parallel 1: project two points 0.1°
    # apart on lat1; planar distance == R·cos(lat1)·Δλ
    x1, y1 = albers_forward(F.lit(-96.0), F.lit(CONUS.lat1))
    x2, y2 = albers_forward(F.lit(-95.9), F.lit(CONUS.lat1))
    row = spark.range(1).select(
        x1.alias("x1"), y1.alias("y1"), x2.alias("x2"), y2.alias("y2")
    ).collect()[0]
    chord = math.hypot(row["x2"] - row["x1"], row["y2"] - row["y1"])
    arc = CONUS.radius * math.cos(math.radians(CONUS.lat1)) * math.radians(0.1)
    assert abs(chord - arc) / arc < 1e-6

    lon, lat = albers_inverse(*albers_forward(F.lit(-104.3), F.lit(37.7)))
    rr = spark.range(1).select(lon.alias("lon"), lat.alias("lat")).collect()[0]
    assert abs(rr["lon"] - (-104.3)) < 1e-9 and abs(rr["lat"] - 37.7) < 1e-9


def test_project_coordinates_roundtrip_all_ok(spark):
    from pyspark.sql import functions as F

    df = Q.project_coordinates(spark, SF_SMOKE)
    assert df.where(F.col("roundtrip_ok") == 0).count() == 0
    assert df.count() == 150


def test_pq_trained_mode_runs_and_differs(spark):
    """train=True swaps in per-subspace Lloyd's codebooks; the search
    path is shared, output schema identical, and the trained encoding
    actually changes the reconstruction-based ranking for at least one
    query (same-ranking would mean the trained codebook was ignored)."""
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    standin = {(r.qid, r.rn): r.cid for r in pq_topk(emb).collect()}
    trained = {
        (r.qid, r.rn): r.cid for r in pq_topk(emb, train=True, train_iters=2).collect()
    }
    assert set(standin) == set(trained)  # same (qid, rank) grid
    assert standin != trained
