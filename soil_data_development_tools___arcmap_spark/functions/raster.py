"""Raster lookup-code assignment — the portable core of the
mapunit-raster export (SSURGO_ExportMuRaster.py:1252-1357).

The reference builds a Lookup table mapping each distinct MUKEY from
the soil-polygon layer to a raster CELLVALUE (sorted-distinct cursor
insert, :1288-1300), then joins it back to assign cell values. The
rasterization itself is GIS-bound (out of scope per SURVEY §2.1);
this code assignment + join IS portable and is what a tabular user
needs to interpret an existing raster.

Scale note: the lookup is one global window over the DISTINCT keys —
a single-task sort by design, safe because the key inventory is tiny
relative to the fact data (CONUS ≈ 300k map units) and it runs AFTER
the distinct's full shuffle reduction. The fact-side join is a
broadcast of that lookup — no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mukey_lookup(df: DataFrame, key: str = "mukey", dense: bool = True) -> DataFrame:
    """(cellvalue, mukey) lookup over the distinct keys of ``df``.

    ``dense=True``: sequential 1-based codes via dense_rank in key
    order — the general form (works for the TEXT mukeys SSURGO
    actually ships, keeps the raster value range minimal).
    ``dense=False``: cellvalue = the numeric key itself, exactly the
    reference's insert loop (:1297-1300)."""
    keys = df.select(key).distinct()
    if not dense:
        return keys.select(
            F.col(key).cast("long").alias("cellvalue"), F.col(key)
        )
    w = Window.orderBy(F.col(key).asc())
    return keys.select(
        F.dense_rank().over(w).cast("long").alias("cellvalue"), F.col(key)
    )


def attach_cellvalues(
    fact: DataFrame, lookup: DataFrame, key: str = "mukey"
) -> DataFrame:
    """Join the lookup onto a fact table (the raster attribute
    assignment). The lookup side is explicitly broadcast — it is the
    distinct-key inventory, always tiny next to the fact side."""
    return fact.join(F.broadcast(lookup), key)


def rating_raster_cells(
    rated_mukeys: DataFrame,
    rating_col: str = "rating",
    cellsize_m: float = 30.0,
) -> DataFrame:
    """Rating-raster core (gSSURGO_ExportRasters.py:720-1746
    CreateRasterLayers): the reference Lookup()s each rating onto the
    mapunit raster and the raster's acreage = cell count × cellsize²
    (SURVEY §2.8). Writing the TIFF stays GIS-bound; the computation a
    rating raster carries — per-rating cell counts and acreage from a
    synthetic cell inventory (mukey % 7 + 1 cells per mapunit) — is
    re-expressed here. Input: one row per mukey with its rating.
    Output: per rating, mapunit count, cell count, acres in exact
    floor(x·10⁴) quantization (count is an exact integer; the one
    float op is the final count × cellsize² × convAcres per group).

    Scale: the explode multiplies only the per-MAPUNIT inventory (CONUS
    ≈ 300k rows), never a fact table, and collapses straight into a
    per-rating partial aggregate — one exchange of a rating-sized
    table."""
    from .geometry import ACRES_PER_SQM

    cells = rated_mukeys.select(
        rating_col,
        "mukey",
        F.explode(
            F.sequence(F.lit(1), (F.col("mukey") % 7 + 1).cast("int"))
        ).alias("cell"),
    )
    return cells.groupBy(rating_col).agg(
        F.countDistinct("mukey").alias("n_mapunits"),
        F.count(F.lit(1)).alias("n_cells"),
        F.floor(
            F.count(F.lit(1))
            * F.lit(cellsize_m * cellsize_m)
            * F.lit(ACRES_PER_SQM)
            * 10000.0
        )
        .cast("long")
        .alias("acres_e4"),
    )
