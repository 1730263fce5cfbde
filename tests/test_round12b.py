"""Round-12b: PBSM grid-bucketed spatial joins (functions/spatial.py).

Strategy mirrors the clip-family tests: every distributed result is
checked against an independent pure-Python brute force over seeded
random layers, and the plan invariants (keyed join only, no
CartesianProduct, no distinct-dedup) are pinned directly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from soil_data_development_tools___arcmap_spark import queries as Q
from soil_data_development_tools___arcmap_spark.functions.spatial import (
    bbox_cells,
    cell_index,
    neighborhood_cells,
    point_cell,
    report_cell_filter,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_cell_index_floor_semantics(spark):
    """Negative coordinates must floor (cell -1), not truncate to 0."""
    df = spark.createDataFrame(
        [(-17,), (-16,), (-1,), (0,), (15,), (16,)], "v long"
    )
    got = [
        r["c"] for r in
        df.select(cell_index(F.col("v"), 16).alias("c"))
        .orderBy("v").collect()
    ]
    assert got == [-2, -1, -1, 0, 0, 1]


def test_bbox_cells_degenerate_is_empty(spark):
    """x1 < x0 yields an EMPTY replication set by construction, never a
    descending sequence (the round-11 raster.py advice, applied here
    from day one)."""
    df = spark.createDataFrame([(10, 10, 5, 20)], "x0 long, y0 long, x1 long, y1 long")
    got = df.select(
        F.size(
            bbox_cells(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), 8)
        ).alias("n")
    ).collect()[0]["n"]
    assert got == 0


def test_bbox_cells_matches_python_enumeration(spark):
    rng = random.Random(12012)
    rows = []
    for i in range(200):
        x0, y0 = rng.randrange(-40, 40), rng.randrange(-40, 40)
        rows.append((i, x0, y0, x0 + rng.randrange(0, 30), y0 + rng.randrange(0, 30)))
    df = spark.createDataFrame(rows, "i int, x0 long, y0 long, x1 long, y1 long")
    got = {
        r["i"]: sorted((c["cx"], c["cy"]) for c in r["cells"])
        for r in df.select(
            "i",
            bbox_cells(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), 8)
            .alias("cells"),
        ).collect()
    }
    for i, x0, y0, x1, y1 in rows:
        want = sorted(
            (cx, cy)
            for cx in range(x0 // 8, x1 // 8 + 1)
            for cy in range(y0 // 8, y1 // 8 + 1)
        )
        assert got[i] == want, (i, got[i], want)


def _rand_rects(rng, n, span=120, wmax=25):
    out = []
    for i in range(n):
        x0, y0 = rng.randrange(0, span), rng.randrange(0, span)
        out.append(
            (i, x0, y0, x0 + rng.randrange(1, wmax), y0 + rng.randrange(1, wmax))
        )
    return out


def test_grid_containment_join_vs_bruteforce(spark):
    """Random rect layer x random point layer: the PBSM plan (bbox
    replication + single point cell + equi-join) returns EXACTLY the
    brute-force pair set — incl. the no-dedup-needed claim (each pair
    meets once because a point has one cell)."""
    rng = random.Random(4242)
    rects = _rand_rects(rng, 150)
    pts = [
        (j, rng.randrange(-5, 130), rng.randrange(-5, 130)) for j in range(400)
    ]
    cs = 16
    rdf = spark.createDataFrame(rects, "rk int, x0 long, y0 long, x1 long, y1 long")
    pdf = spark.createDataFrame(pts, "pk int, px long, py long")
    joined = (
        rdf.select(
            "*",
            F.explode(
                bbox_cells(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), cs)
            ).alias("cell"),
        )
        .join(pdf.withColumn("cell", point_cell(F.col("px"), F.col("py"), cs)), "cell")
        .where(
            (F.col("px") > F.col("x0")) & (F.col("px") < F.col("x1"))
            & (F.col("py") > F.col("y0")) & (F.col("py") < F.col("y1"))
        )
        .select("rk", "pk")
        .collect()
    )
    got = sorted((r["rk"], r["pk"]) for r in joined)
    assert len(got) == len(set(got)), "pair emitted in more than one cell"
    want = sorted(
        (i, j)
        for i, x0, y0, x1, y1 in rects
        for j, px, py in pts
        if x0 < px < x1 and y0 < py < y1
    )
    assert got == want


def test_grid_overlap_join_report_cell_dedup(spark):
    """Random rect x rect overlay: the reporting-cell rule keeps each
    overlapping pair exactly once (pairs spanning up to 4 shared
    cells), and the pair set + closed-form overlap areas match the
    brute force."""
    rng = random.Random(777)
    a = _rand_rects(rng, 120, span=100, wmax=40)  # wide rects: multi-cell
    b = _rand_rects(rng, 120, span=100, wmax=40)
    cs = 32
    adf = spark.createDataFrame(a, "ak int, ax0 long, ay0 long, ax1 long, ay1 long")
    bdf = spark.createDataFrame(b, "bk int, bx0 long, by0 long, bx1 long, by1 long")
    ae = adf.select(
        "*",
        F.explode(
            bbox_cells(F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"), cs)
        ).alias("cell"),
    )
    be = bdf.select(
        "*",
        F.explode(
            bbox_cells(F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"), cs)
        ).alias("cell"),
    )
    ov_x = F.least(F.col("ax1"), F.col("bx1")) - F.greatest(F.col("ax0"), F.col("bx0"))
    ov_y = F.least(F.col("ay1"), F.col("by1")) - F.greatest(F.col("ay0"), F.col("by0"))
    joined = (
        ae.join(be, "cell")
        .where(
            report_cell_filter(
                F.col("cell"), F.col("ax0"), F.col("ay0"),
                F.col("bx0"), F.col("by0"), cs,
            )
        )
        .where((ov_x > 0) & (ov_y > 0))
        .select("ak", "bk", (ov_x * ov_y).alias("ov"))
        .collect()
    )
    got = sorted((r["ak"], r["bk"], r["ov"]) for r in joined)
    assert len(got) == len({(x, y) for x, y, _ in got}), "duplicate pair"
    want = sorted(
        (i, j, (min(x1, u1) - max(x0, u0)) * (min(y1, v1) - max(y0, v0)))
        for i, x0, y0, x1, y1 in a
        for j, u0, v0, u1, v1 in b
        if min(x1, u1) > max(x0, u0) and min(y1, v1) > max(y0, v0)
    )
    assert got == want


def test_grid_distance_join_vs_bruteforce(spark):
    """Random point x point within-distance join, incl. pairs exactly
    AT the radius (dist2 == R^2, integer-exact) and negative
    coordinates straddling cell 0."""
    rng = random.Random(99)
    s = [(i, rng.randrange(-20, 90), rng.randrange(-20, 90)) for i in range(200)]
    p = [(j, rng.randrange(-20, 90), rng.randrange(-20, 90)) for j in range(300)]
    cs, r2 = 8, 25
    sdf = spark.createDataFrame(s, "sk int, sx long, sy long").select(
        "*", F.explode(neighborhood_cells(F.col("sx"), F.col("sy"), cs)).alias("cell")
    )
    pdf = spark.createDataFrame(p, "pk int, px long, py long").withColumn(
        "cell", point_cell(F.col("px"), F.col("py"), cs)
    )
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    got = sorted(
        (r["sk"], r["pk"], r["d2"])
        for r in sdf.join(pdf, "cell").where(d2 <= r2)
        .select("sk", "pk", d2.alias("d2")).collect()
    )
    assert len(got) == len({(x, y) for x, y, _ in got})
    want = sorted(
        (i, j, (sx - px) ** 2 + (sy - py) ** 2)
        for i, sx, sy in s
        for j, px, py in p
        if (sx - px) ** 2 + (sy - py) ** 2 <= r2
    )
    assert got == want
    assert any(d == r2 for _, _, d in want), "seed must exercise the boundary"


@pytest.mark.parametrize(
    "qname",
    [
        "spatial_join_points",
        "spatial_join_overlap",
        "spatial_join_within_distance",
        "spatial_join_nearest",
    ],
)
def test_spatial_join_plan_invariants(spark, qname):
    """The registry queries must stay keyed joins: no CartesianProduct,
    no BroadcastNestedLoopJoin, and no dedup aggregate (the PBSM
    reporting rule / unique point cell makes distinct unnecessary)."""
    df = getattr(Q, qname)(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan and "HashAggregate" not in plan


def test_geofence_stream_equals_batch(spark):
    """The stateless stream-static spatial join must equal its batch
    twin exactly (same oracle certifies both in the registry)."""
    batch = sorted(
        (r["event_id"], r["okey"])
        for r in Q.events_geofence(spark, SF_SMOKE).collect()
    )
    stream = sorted(
        (r["event_id"], r["okey"])
        for r in Q.events_stream_geofence(spark, SF_SMOKE).collect()
    )
    assert batch == stream and len(batch) > 0


def test_geofence_stream_multibatch(spark, tmp_path):
    """Split the events into per-day files, one file per trigger: the
    broadcast fence layer must re-apply in EVERY micro-batch and the
    appended union must equal the batch twin."""
    import os

    from soil_data_development_tools___arcmap_spark.queries import read_events
    from soil_data_development_tools___arcmap_spark.streaming.events import (
        EVENTS_SCHEMA,
        _ts_ns,
        run_geofence_stream,
    )

    ev = read_events(spark, SF_SMOKE).withColumn(
        "day_num", F.expr("(ts div 1000) div 86400000000")
    )
    days = sorted(r[0] for r in ev.select("day_num").distinct().collect())
    src = str(tmp_path / "geo_stream")
    os.makedirs(src, exist_ok=True)
    for d in days:
        ev.where(F.col("day_num") == d).drop("day_num").withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        ).coalesce(1).write.mode("append").parquet(src)
    source = _ts_ns(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = sorted(
        (r["event_id"], r["okey"])
        for r in run_geofence_stream(spark, SF_SMOKE, source=source).collect()
    )
    want = sorted(
        (r["event_id"], r["okey"])
        for r in Q.events_geofence(spark, SF_SMOKE).collect()
    )
    assert got == want and len(days) > 1


def test_grid_nearest_join_vs_bruteforce(spark):
    """Nearest-within-radius: per-point argmin over the candidate join,
    ties broken by the smaller site key (Near's lowest-OID rule) —
    checked against a pure-Python scan that applies the same rule."""
    from pyspark.sql import Window

    rng = random.Random(2026)
    s = [(i, rng.randrange(0, 60), rng.randrange(0, 60)) for i in range(120)]
    p = [(j, rng.randrange(0, 60), rng.randrange(0, 60)) for j in range(200)]
    cs, r2 = 8, 25
    sdf = spark.createDataFrame(s, "sk int, sx long, sy long").select(
        "*", F.explode(neighborhood_cells(F.col("sx"), F.col("sy"), cs)).alias("cell")
    )
    pdf = spark.createDataFrame(p, "pk int, px long, py long").withColumn(
        "cell", point_cell(F.col("px"), F.col("py"), cs)
    )
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    w = Window.partitionBy("pk").orderBy("d2", "sk")
    got = {
        r["pk"]: (r["sk"], r["d2"])
        for r in sdf.join(pdf, "cell").where(d2 <= r2)
        .select("pk", "sk", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        .collect()
    }
    want = {}
    for j, px, py in p:
        best = None
        for i, sx, sy in s:
            dd = (sx - px) ** 2 + (sy - py) ** 2
            if dd <= r2 and (best is None or (dd, i) < best):
                best = (dd, i)
        if best is not None:
            want[j] = (best[1], best[0])
    assert got == want and len(want) > 0
    # the dense seed must exercise a tie (two sites at equal distance)
    ties = 0
    for j, px, py in p:
        ds = sorted((sx - px) ** 2 + (sy - py) ** 2 for _, sx, sy in s)
        if len(ds) > 1 and ds[0] == ds[1] and ds[0] <= r2:
            ties += 1
    assert ties > 0


def test_salted_grid_join_equals_unsalted(spark):
    """Hot-cell salting must be result-invariant: the salted
    containment join (probe carries one salt, replication side
    enumerates all) returns exactly the unsalted pair set, still with
    no duplicate pairs — even when every point piles into ONE cell
    (the skew case the salt exists for)."""
    from soil_data_development_tools___arcmap_spark.functions.spatial import (
        salted_bbox_cells,
        salted_point_cell,
    )

    rng = random.Random(31337)
    rects = _rand_rects(rng, 80, span=24, wmax=20)   # all within 2 cells
    pts = [(j, rng.randrange(0, 14), rng.randrange(0, 14)) for j in range(300)]
    cs, ns = 16, 4  # cell (0,0) holds nearly every point: max skew
    rdf = spark.createDataFrame(rects, "rk int, x0 long, y0 long, x1 long, y1 long")
    pdf = spark.createDataFrame(pts, "pk int, px long, py long")
    inside = (
        (F.col("px") > F.col("x0")) & (F.col("px") < F.col("x1"))
        & (F.col("py") > F.col("y0")) & (F.col("py") < F.col("y1"))
    )
    salted = (
        rdf.select(
            "*",
            F.explode(
                salted_bbox_cells(
                    F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), cs, ns
                )
            ).alias("cell"),
        )
        .join(
            pdf.withColumn(
                "cell", salted_point_cell(F.col("px"), F.col("py"), F.col("pk"), cs, ns)
            ),
            "cell",
        )
        .where(inside)
        .select("rk", "pk")
        .collect()
    )
    got = sorted((r["rk"], r["pk"]) for r in salted)
    assert len(got) == len(set(got)), "salting duplicated a pair"
    want = sorted(
        (i, j)
        for i, x0, y0, x1, y1 in rects
        for j, px, py in pts
        if x0 < px < x1 and y0 < py < y1
    )
    assert got == want and len(want) > 0
    # the probe side must actually spread across several salt keys
    n_salts = (
        pdf.withColumn(
            "cell", salted_point_cell(F.col("px"), F.col("py"), F.col("pk"), cs, ns)
        )
        .select("cell.s").distinct().count()
    )
    assert n_salts == ns


def test_spatial_lake_prune_partition_filters_and_lossless(spark):
    """The AOI read must prune at the FILE LISTING (PartitionFilters on
    pcx/pcy in the scan), and the padded min-corner pruning must be
    lossless: the result equals the unpruned closed-form intersect over
    the whole layer."""
    df = Q.spatial_lake_prune(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "pcx" in pf and "pcy" in pf
    got = {r["okey"]: r["ov_a2x"] for r in df.collect()}
    ax0, ay0, ax1, ay1 = 60, 30, 140, 90
    from soil_data_development_tools___arcmap_spark._qcore import (
        _even_grid_rects,
        _t,
    )
    want = {}
    for r in _even_grid_rects(
        _t(spark, SF_SMOKE, "customer"), "c_custkey"
    ).collect():
        if r["x0"] < ax1 and r["x1"] > ax0 and r["y0"] < ay1 and r["y1"] > ay0:
            want[r["okey"]] = 2 * (
                min(r["x1"], ax1) - max(r["x0"], ax0)
            ) * (min(r["y1"], ay1) - max(r["y0"], ay0))
    assert got == want and len(want) > 0
