"""Scale harness for the round-11 polygon→cell rasterization
(PolygonToRaster CELL_CENTER — functions/raster.py:
polygon_cell_inventory).

Replicates the per-mapunit polygon synthesis FACTOR× with salted key
offsets (geometry varies per replica — same discipline as
tools/media_scale.py: constant per-polygon cell density as the layer
grows, so a fixed-modulus quadratic artifact can't masquerade as the
operator), then measures:

  * cell-inventory throughput: polygons/s and cells/s through the
    bbox→tile→cell explode + point_in_geom filter (map-only) with a
    per-polygon summary aggregate forcing full evaluation;
  * the composed rating path (raster_rating_cells_geom shape);
  * the tile-split guard under a GIANT polygon: one CONUS-sized
    polygon exploding through the 16-cell tile grid — the row count
    per (polygon, tile) row stays ≤ tile_cells², whatever the bbox.

Usage: python tools/raster_scale.py [factor ...]   (default 1 10 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from soil_data_development_tools___arcmap_spark import get_spark  # noqa: E402
from soil_data_development_tools___arcmap_spark.q_tools import (  # noqa: E402
    _mu_polygon_wkt,
)
from soil_data_development_tools___arcmap_spark.functions.raster import (  # noqa: E402
    polygon_cell_inventory,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_polys(spark, factor: int):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey"
    )
    reps = cust.select(
        F.col("c_custkey"),
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"),
    )
    # salted key: replicas land on different grid offsets, keeping the
    # overlap/dup density constant as the layer grows
    k = F.col("c_custkey") * factor + F.col("rep")
    # the sf0.1 customer parquet is ONE split; a real CONUS layer
    # arrives in many — repartition simulates the input splits the
    # map-only plan parallelizes over (measured: without this the
    # whole 100× explode serializes onto one task)
    return reps.select(
        k.alias("mukey"), _mu_polygon_wkt(k).alias("wkt")
    ).repartition(64)


def measure(spark, factor: int) -> dict:
    polys = replicated_polys(spark, factor)
    n_polys = polys.count()
    best = None
    cells_total = 0
    for _ in range(2):  # steady best-of-2
        t0 = time.time()
        agg = (
            polygon_cell_inventory(polys, tile_cells=16)
            .groupBy("mukey")
            .agg(F.count(F.lit(1)).alias("n_cells"))
            .agg(
                F.count(F.lit(1)).alias("n_polys"),
                F.sum("n_cells").alias("n_cells"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        cells_total = agg["n_cells"]
        best = dt if best is None else min(best, dt)
    return {
        "factor": factor,
        "n_polys": n_polys,
        "n_cells": int(cells_total),
        "sec": round(best, 2),
        "polys_per_s": int(n_polys / best),
        "cells_per_s": int(cells_total / best),
    }


def giant_polygon_guard(spark) -> dict:
    """One polygon spanning ~2000×2000 cells (4M cells): the tile
    explode spreads it over (2000/16)² ≈ 15.6k (poly, tile) rows, and
    redistribute=True hash-shuffles those across the cluster — no
    single task sees more than tile_cells² cells OF A GIANT polygon
    (the skew escape hatch; default map-only keeps tiles in the
    source split)."""
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 4000 0, 4000 4000, 0 4000, 0 0))")],
        "mukey int, wkt string",
    )
    t0 = time.time()
    out = (
        polygon_cell_inventory(df, tile_cells=16, redistribute=True)
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.max("n").alias("max_cells_per_tile"),
            F.sum("n").alias("n_cells"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    assert out["max_cells_per_tile"] <= 256, out
    return {
        "n_tiles": out["n_tiles"],
        "max_cells_per_tile": out["max_cells_per_tile"],
        "n_cells": int(out["n_cells"]),
        "sec": round(dt, 2),
        "cells_per_s": int(out["n_cells"] / dt),
    }


def cell_plane(spark, n_cells: int):
    """Dense synthetic cell raster of ~n_cells on a square plane whose
    SIDE grows as sqrt(n) — constant value density at every factor
    (the spatial_scale discipline: a fixed-modulus lattice would make
    downstream block composition a fixture artifact, not a measure).
    Values are a deterministic integer hash in 1..1000."""
    side = int(n_cells ** 0.5) + 1
    base = spark.range(side).select(F.col("id").alias("col"))
    return base.repartition(64).select(
        "col",
        F.explode(F.sequence(F.lit(0), F.lit(side - 1))).alias("row"),
    ).select(
        "col",
        "row",
        # value from the 4x4 REGION hash: factor-3 blocks straddle
        # region borders, so most blocks have a true majority and a
        # realistic minority of ties — a per-cell hash would tie
        # every block (9 singletons) and measure only the tie branch
        (
            (
                (F.col("col") / 4).cast("long") * 2654435761
                + (F.col("row") / 4).cast("long") * 40503
            )
            % 1000
            + 1
        ).alias("cellvalue"),
    )


def measure_resample(spark, factor: int) -> dict:
    """Round-12b downstream ops over the cell raster: cellFactor
    MAJORITY resample (block_majority — two partial-aggregated keyed
    exchanges) and the NEAREST pyramid levels 0-3 (map-side filtered
    explode + one count exchange)."""
    from soil_data_development_tools___arcmap_spark.functions.raster import (
        block_majority,
    )

    cells = cell_plane(spark, 500_000 * factor)
    n = cells.count()
    out = {"factor": factor, "n_cells": n}
    best = None
    for _ in range(2):
        t0 = time.time()
        blocks = (
            block_majority(cells, factor=3)
            .agg(
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum(
                    (F.col("blockstat_majority") == 0).cast("long")
                ).alias("n_ties"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out.update(
        resample_sec=round(best, 2),
        n_blocks=int(blocks["n_blocks"]),
        n_tie_blocks=int(blocks["n_ties"]),
        resample_cells_per_s=int(n / best),
    )
    lv_scale = F.array(
        *[
            F.struct(F.lit(i).alias("l"), F.lit(1 << i).alias("s"))
            for i in range(4)
        ]
    )
    lv = F.explode(
        F.filter(
            lv_scale,
            lambda p: (F.col("col") % p["s"] == 0)
            & (F.col("row") % p["s"] == 0),
        )
    )
    best = None
    for _ in range(2):
        t0 = time.time()
        pyr = (
            cells.select(lv.alias("_lv"), "cellvalue")
            .groupBy(F.col("_lv.l").alias("level"), "cellvalue")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("level")
            .agg(F.sum("n").alias("n"))
            .count()
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out.update(
        pyramid_sec=round(best, 2),
        pyramid_levels=int(pyr),
        pyramid_cells_per_s=int(n / best),
    )
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        "raster-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for f in factors:
        print(measure(spark, f), flush=True)
        print(measure_resample(spark, f), flush=True)
    print({"giant_polygon": giant_polygon_guard(spark)}, flush=True)


if __name__ == "__main__":
    main()
