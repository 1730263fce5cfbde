"""Round-12b additions: overlay geometry output, MAJORITY block
resample, NEAREST pyramid levels, zonal statistics."""

from __future__ import annotations

import pyspark.sql.functions as F

from soil_data_development_tools___arcmap_spark import queries as Q
from soil_data_development_tools___arcmap_spark.functions.raster import (
    block_majority,
)

from conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# block_majority mechanism (constructed fixtures — tie semantics)
# ---------------------------------------------------------------------------


def _cells(spark, rows):
    return spark.createDataFrame(rows, "col long, row long, cellvalue long")


def test_block_majority_no_tie(spark):
    # block (0,0) at factor 2: value 7 twice, value 9 once
    out = block_majority(
        _cells(spark, [(0, 0, 7), (1, 0, 7), (0, 1, 9)]), factor=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.bcol, r.brow, r.n_data) == (0, 0, 3)
    assert r.agg_majority == 7
    assert r.blockstat_majority == 7


def test_block_majority_tie_semantics(spark):
    # 2-2 tie between values 5 and 9: Aggregate takes the LOWEST (5),
    # BlockStatistics goes to nodata (0) — the reference's own comment
    # at gSSURGO_ExportRasters.py:1192-1193
    out = block_majority(
        _cells(spark, [(0, 0, 9), (1, 0, 9), (0, 1, 5), (1, 1, 5)]),
        factor=2,
    ).collect()
    r = out[0]
    assert r.n_data == 4
    assert r.agg_majority == 5
    assert r.blockstat_majority == 0


def test_block_majority_blocks_partition_independently(spark):
    # two blocks at factor 2; empty blocks emit nothing ("DATA")
    out = {
        (r.bcol, r.brow): r
        for r in block_majority(
            _cells(spark, [(0, 0, 3), (4, 4, 8), (5, 5, 8), (4, 5, 2)]),
            factor=2,
        ).collect()
    }
    assert set(out) == {(0, 0), (2, 2)}
    assert out[(0, 0)].agg_majority == 3
    assert out[(2, 2)].agg_majority == 8
    assert out[(2, 2)].blockstat_majority == 8


def test_block_majority_singleton_counts_tie_on_values(spark):
    # every value appears once: top count 1 is shared by 3 values —
    # Aggregate takes the lowest (2), BlockStatistics nodata
    out = block_majority(
        _cells(spark, [(0, 0, 4), (1, 0, 2), (0, 1, 6)]), factor=2
    ).collect()[0]
    assert out.agg_majority == 2
    assert out.blockstat_majority == 0


# ---------------------------------------------------------------------------
# registry-query invariants at sf0.001 (oracle hash-match is the
# primary gate; these pin CROSS-query consistency the oracle can't see)
# ---------------------------------------------------------------------------


def test_overlap_wkt_pairs_match_area_twin(spark):
    """The WKT variant must produce exactly the area twin's pair set
    with identical areas — same join, same dedup rule, refine widened
    to geometry output."""
    area = Q.spatial_join_overlap(spark, SF_SMOKE).select(
        "akey", "bkey", "ov_a2x"
    )
    wkt = Q.spatial_join_overlap_wkt(spark, SF_SMOKE).select(
        "akey", "bkey", F.col("ov_a2x").alias("w_a2x"), "clip_wkt"
    )
    joined = area.join(wkt, ["akey", "bkey"], "full_outer").collect()
    assert len(joined) == area.count() == wkt.count()
    for r in joined:
        assert r.ov_a2x is not None and r.w_a2x is not None
        assert r.ov_a2x == r.w_a2x, (r.akey, r.bkey)


def test_overlap_wkt_geometry_closes_the_loop(spark):
    """Self-consistency through an independent code path: parse each
    emitted WKT back and shoelace it — must reproduce ov_a2x. Runs the
    parser/area machinery, not the SH clip that produced the text."""
    from soil_data_development_tools___arcmap_spark.functions.geometry import (
        parse_geom_rings,
        shoelace_area2x,
    )

    out = Q.spatial_join_overlap_wkt(spark, SF_SMOKE)
    bad = (
        out.withColumn("rings", parse_geom_rings("clip_wkt"))
        .withColumn("re_a2x", shoelace_area2x("clip_wkt"))
        .where(F.col("re_a2x") != F.col("ov_a2x"))
        .count()
    )
    assert bad == 0


def test_pyramid_levels_nest(spark):
    """Level-L cells are a subset of level-(L-1) cells, so the total
    count per level must be non-increasing, and level 0 must equal the
    deduplicated raster's size."""
    from soil_data_development_tools___arcmap_spark.q_tools import (
        _mu_raster_dedup_cells,
    )

    out = Q.raster_pyramid_levels(spark, SF_SMOKE)
    per_level = {
        r.level: r.n
        for r in out.groupBy("level")
        .agg(F.sum("n_cells").alias("n"))
        .collect()
    }
    assert set(per_level) == {0, 1, 2, 3}
    assert per_level[0] >= per_level[1] >= per_level[2] >= per_level[3]
    assert per_level[3] >= 1
    assert per_level[0] == _mu_raster_dedup_cells(spark, SF_SMOKE).count()


def test_zonal_stats_invariants(spark):
    rows = Q.raster_zonal_stats(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.variety <= r.n_cells
        assert r.min_mukey <= r.majority_mukey <= r.max_mukey


def test_block_aggregate_conserves_cells(spark):
    """Σ n_data over blocks == deduplicated cell count (every data
    cell lands in exactly one block)."""
    from soil_data_development_tools___arcmap_spark.q_tools import (
        _mu_raster_dedup_cells,
    )

    total = (
        Q.raster_block_aggregate(spark, SF_SMOKE)
        .agg(F.sum("n_data"))
        .collect()[0][0]
    )
    assert total == _mu_raster_dedup_cells(spark, SF_SMOKE).count()


def test_block_mean_invariants(spark):
    """MEAN branch: mean_e4 sits inside the comppct value range
    (3..99 scaled), sum/count reconcile, and the block set is a subset
    of the MAJORITY query's blocks (rated-join can only drop cells)."""
    mean = Q.raster_block_mean(spark, SF_SMOKE)
    rows = mean.collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_data
        assert 3 * 10000 <= r.mean_e4 <= 99 * 10000 + 9999
        lo = r.sum_val * 10000 // r.n_data
        assert abs(r.mean_e4 - lo) <= 1  # float-floor vs int-floor ulp
    blocks_mean = {(r.bcol, r.brow) for r in rows}
    blocks_all = {
        (r.bcol, r.brow)
        for r in Q.raster_block_aggregate(spark, SF_SMOKE).collect()
    }
    assert blocks_mean <= blocks_all


def test_mosaic_max_equals_single_raster(spark):
    """MAXIMUM mosaic of per-tile max-resolved rasters must equal the
    single-raster global max-resolve — max is associative, so tiling
    cannot change the mosaic (the invariant the reference's tiled and
    untiled paths rely on to be interchangeable)."""
    from soil_data_development_tools___arcmap_spark.q_tools import (
        _mu_raster_dedup_cells,
    )

    mosaic = {
        r.cellvalue: r.n_cells
        for r in Q.raster_mosaic_max(spark, SF_SMOKE).collect()
    }
    single = {
        r.cellvalue: r.n
        for r in _mu_raster_dedup_cells(spark, SF_SMOKE)
        .groupBy("cellvalue")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert mosaic == single


def test_raster_statistics_sample_consistency(spark):
    """The sampled pass is a sublattice of the full pass: bounds nest,
    counts shrink by ~the skip product, and the full-scan moments
    reconcile against the exact variance identity."""
    rows = {
        (r.x_skip, r.y_skip): r
        for r in Q.raster_statistics(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {(1, 1), (4, 2)}
    full, samp = rows[(1, 1)], rows[(4, 2)]
    assert samp.n_cells < full.n_cells
    assert full.min_val <= samp.min_val <= samp.max_val <= full.max_val
    assert full.var_e4 >= 0 and samp.var_e4 >= 0
    # var identity on exact integers: n*sumsq - sum^2 >= 0 always
    assert full.n_cells * full.sumsq_val - full.sum_val**2 >= 0


def test_legend_json_is_valid_and_reference_shaped(spark):
    """The emitted esriJSON parses, and its structure matches the
    reference's ClassBreaksJSON contract: 5 classes, standard color
    order, first label '<= x', later labels '> a and <= b', outline
    both at the item level and inside the symbol."""
    import json as _json

    row = Q.legend_class_breaks_json(spark, SF_SMOKE).collect()[0]
    d = _json.loads(row.legend_json)
    r = d["drawingInfo"]["renderer"]
    assert r["type"] == "classBreaks"
    assert r["classificationMethod"] == "esriClassifyManual"
    assert r["field"] == "SDV_pricing.rating_c"
    infos = r["classBreakInfos"]
    assert len(infos) == 5
    assert infos[0]["label"].startswith("<= ")
    for it in infos[1:]:
        assert it["label"].startswith("> ") and " and <= " in it["label"]
    assert [it["symbol"]["color"] for it in infos] == [
        [255, 0, 0, 255], [255, 255, 0, 255], [0, 255, 0, 255],
        [0, 255, 255, 255], [0, 0, 255, 255],
    ]
    for it in infos:
        assert it["outline"] == it["symbol"]["outline"]
        assert it["outline"]["color"] == [0, 0, 0, 0]
        assert it["outline"]["width"] == 0.4
    # class intervals tile [min, min + 5*step] contiguously
    assert float(infos[0]["classMinValue"]) == row.min_e2 / 100
    for a, b in zip(infos, infos[1:]):
        assert a["classMaxValue"] == b["classMinValue"]


def test_legend_json_constant_rating_single_class(spark):
    """min == max → classNum = 1 (gSSURGO_CreateSoilMap.py:2219-2223):
    one class, step 0, label '<= value'."""
    import json as _json

    from soil_data_development_tools___arcmap_spark.functions.legend import (
        class_breaks_layer_json,
    )

    df = spark.createDataFrame([(700, 700)], "mn long, mx long")
    s = df.select(
        class_breaks_layer_json(F.lit("t.f"), F.col("mn"), F.col("mx"))
        .alias("j")
    ).collect()[0].j
    d = _json.loads(s)
    infos = d["drawingInfo"]["renderer"]["classBreakInfos"]
    assert len(infos) == 1
    assert infos[0]["label"] == "<= 7.00"
    assert infos[0]["classMinValue"] == 7.0
    assert infos[0]["classMaxValue"] == 7.0


def test_unique_values_json_is_valid_and_reference_shaped(spark):
    """The unique-values esriJSON parses, carries every domain value
    in sorted order plus the reference's 'Not rated' and '<Null>'
    gray items, and uses the envelope fields UniqueValuesJSON sets
    (gSSURGO_CreateSoilMap.py:2431-2438)."""
    import json as _json

    row = Q.legend_unique_values_json(spark, SF_SMOKE).collect()[0]
    d = _json.loads(row.legend_json)
    r = d["drawingInfo"]["renderer"]
    assert r["type"] == "uniqueValue"
    assert r["field1"] == "SDV_drainage.rating"
    assert r["field2"] == "" and r["field3"] == ""
    assert r["fielddelimiter"] == ";"
    infos = r["uniqueValueInfos"]
    assert len(infos) == row.n_values + 2
    domain = [it["value"] for it in infos[: row.n_values]]
    assert domain == sorted(domain)
    tail = infos[-2:]
    assert tail[0]["value"] == "Not rated"
    assert tail[0]["symbol"]["color"] == [110, 110, 110, 255]
    assert tail[0]["symbol"]["outline"]["width"] == 0.0
    assert tail[1]["value"] == "<Null>" and tail[1]["label"] == "Null"
    assert tail[1]["symbol"]["color"] == [175, 175, 175, 255]
    for it in infos[: row.n_values]:
        assert it["symbol"]["outline"]["width"] == 0.4


def test_defined_breaks_json_is_valid(spark):
    """Hydric defined-breaks legend: metadata bounds 0..100 step 20,
    data-derived minValue, item-level outline duplicate present
    (gSSURGO_CreateSoilMap.py:2646)."""
    import json as _json

    row = Q.legend_defined_breaks_json(spark, SF_SMOKE).collect()[0]
    d = _json.loads(row.legend_json)
    r = d["drawingInfo"]["renderer"]
    assert r["type"] == "classBreaks"
    assert r["minValue"] == row.min_value
    infos = r["classBreakInfos"]
    assert [(it["classMinValue"], it["classMaxValue"]) for it in infos] == [
        (0, 20), (20, 40), (40, 60), (60, 80), (80, 100)
    ]
    for it in infos:
        assert it["outline"] == it["symbol"]["outline"]
        assert it["label"] == f'{it["classMinValue"]} - {it["classMaxValue"]}'


def test_soil_map_manifest_composes_subsystems(spark):
    """The manifest's figures must reconcile against the subsystems it
    composes: mapunit counts against the planner table, the legend
    domain against the rating's distinct values."""
    import json as _json

    from soil_data_development_tools___arcmap_spark.q_sdv import (
        planner_sdv_rating,
    )

    row = Q.soil_map_layer_manifest(spark, SF_SMOKE).collect()[0]
    rat = planner_sdv_rating(spark, SF_SMOKE).collect()
    assert row.n_mapunits == len(rat)
    assert row.n_rated == sum(1 for r in rat if r.rating is not None)
    d = _json.loads(row.legend_json)
    vals = [
        it["value"]
        for it in d["drawingInfo"]["renderer"]["uniqueValueInfos"][:-2]
    ]
    assert vals == sorted({r.rating for r in rat if r.rating is not None})
    assert row.n_cells > 0 and row.acres_e4 > 0


def test_nb_gate_stream_matches_batch_and_replays(spark, tmp_path):
    """The streaming NB gate equals its batch LEFT-join twin, and a
    multi-file replay (one file per trigger) appends to the identical
    result — the broadcast model map re-applies per micro-batch with
    zero state."""
    import os

    from soil_data_development_tools___arcmap_spark.streaming.docs import (
        DOCS_SCHEMA,
        run_nb_gate_stream,
    )

    got = {
        r.doc_id: (r.score_e6, r.keep)
        for r in Q.docs_stream_nb_gate(spark, SF_SMOKE).collect()
    }
    classify = {
        r.doc_id: (r.score_e6, r.keep)
        for r in Q.docs_nb_classify(spark, SF_SMOKE).collect()
    }
    # classify inner-joins (docs with no model token absent); the gate
    # scores every doc — on the shared docs the figures must agree
    for did, (s, k) in classify.items():
        assert got[did] == (s, k)
    assert len(got) >= len(classify)
    # multi-file replay
    docs = spark.read.schema(DOCS_SCHEMA).parquet(
        f"{SF_SMOKE}/documents.parquet"
    )
    src = str(tmp_path / "nb_stream")
    os.makedirs(src, exist_ok=True)
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    source = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    replay = {
        r.doc_id: (r.score_e6, r.keep)
        for r in run_nb_gate_stream(spark, SF_SMOKE, source=source).collect()
    }
    assert replay == got
