"""Distributed spatial joins via grid-cell bucketing (PBSM-style).

The reference runs layer x layer spatial predicates through the GIS:
``arcpy.SelectLayerByLocation_management(targetLayer, "INTERSECT",
extentLayer)`` (gSSURGO_Clip.py:144, SSURGO_gSSURGO_byState.py:583,
SSURGO_gSSURGO_byTile.py:267,455) and the overlay join
``arcpy.Intersect_analysis([outputFC, aoiLayer])``
(SSURGO_gSSURGO_byTile.py:296). Those calls join ONE feature class
against ANOTHER — not a constant AOI — so the Spark re-expression must
be a genuine two-sided join, and at 100 TB it must never be a cross
join: the classic answer is Partition Based Spatial Merge join (PBSM,
Patel & DeWitt SIGMOD'96): overlay a uniform grid, replicate each
feature onto every cell its bounding box touches, equi-join on the
cell id, then refine candidates with the exact geometric predicate.

Properties that matter at scale:

- The only shuffle is a keyed equi-join on ``(cx, cy)`` — Catalyst
  plans a plain SortMergeJoin/ShuffledHashJoin, AQE can split skewed
  cells, and there is no ``CartesianProduct`` anywhere in the plan.
- Replication is bounded by ``bbox_span / cell_size`` per axis; the
  cell size is the knob that trades replication against per-cell
  candidate fan-in.
- Duplicate candidate pairs (two features sharing SEVERAL cells) are
  eliminated WITHOUT a distinct-shuffle by the PBSM reporting-cell
  rule: a pair is kept only in the single cell that contains the
  top-left corner of the two bounding boxes' intersection — that cell
  is provably one of the shared cells, so each qualifying pair
  survives exactly once (``report_cell_filter``).
- Point x region joins need no dedup at all: a point lives in exactly
  one cell, so each (region, point) pair meets exactly once.

Everything here is pure Column expressions over integer-grid
coordinates — no UDFs, map-only on both join inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cell_index(v: Column, cell_size: int) -> Column:
    """Grid-cell ordinate: ``floor(v / cell_size)`` as BIGINT.

    Uses float division + floor (not integer ``div``) so NEGATIVE
    coordinates land in the correct cell — SQL integer division
    truncates toward zero, which would merge cells -1 and 0. Exact for
    |v| < 2^52 / cell_size, far beyond any planar coordinate."""
    return F.floor(v.cast("double") / F.lit(float(cell_size))).cast("long")


def bbox_cells(
    x0: Column, y0: Column, x1: Column, y1: Column, cell_size: int
) -> Column:
    """All grid cells intersecting the CLOSED bbox [x0,x1] x [y0,y1] as
    ``array<struct<cx:bigint, cy:bigint>>`` — the replication set a
    feature is exploded onto before the cell equi-join. A degenerate
    bbox (x1 < x0 or y1 < y0) yields an EMPTY array by construction
    rather than a descending ``sequence()`` (the raster.py lesson from
    round 11's advice: never rely on a downstream filter to mop up
    rows a malformed range should not have emitted)."""
    cx0, cx1 = cell_index(x0, cell_size), cell_index(x1, cell_size)
    cy0, cy1 = cell_index(y0, cell_size), cell_index(y1, cell_size)
    xs = F.when(
        (x1 >= x0) & (y1 >= y0), F.sequence(cx0, cx1)
    ).otherwise(F.array().cast("array<bigint>"))
    return F.flatten(
        F.transform(
            xs,
            lambda cx: F.transform(
                F.sequence(cy0, cy1),
                lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
            ),
        )
    )


def point_cell(px: Column, py: Column, cell_size: int) -> Column:
    """The single cell containing a point, same struct shape as the
    ``bbox_cells`` elements so both sides join on one key column."""
    return F.struct(
        cell_index(px, cell_size).alias("cx"),
        cell_index(py, cell_size).alias("cy"),
    )


def neighborhood_cells(px: Column, py: Column, cell_size: int) -> Column:
    """The 3x3 block of cells centred on a point's cell, as
    ``array<struct<cx,cy>>`` — the replication set for a
    within-distance join with radius <= cell_size: any partner point
    within that radius is at most one cell away on each axis, so
    joining the replicated side against the partner's single cell
    covers every qualifying pair exactly once (the partner's cell is
    unique, so no dedup is needed)."""
    cx, cy = cell_index(px, cell_size), cell_index(py, cell_size)
    return F.flatten(
        F.transform(
            F.sequence(cx - 1, cx + 1),
            lambda icx: F.transform(
                F.sequence(cy - 1, cy + 1),
                lambda icy: F.struct(icx.alias("cx"), icy.alias("cy")),
            ),
        )
    )


def report_cell_filter(
    cell: Column,
    ax0: Column,
    ay0: Column,
    bx0: Column,
    by0: Column,
    cell_size: int,
) -> Column:
    """PBSM duplicate-elimination predicate for bbox x bbox joins: keep
    the candidate pair only in the cell containing the top-left corner
    ``(max(ax0,bx0), max(ay0,by0))`` of the bbox intersection. When the
    bboxes overlap, that corner lies inside BOTH bboxes, so its cell is
    one of the cells both sides were replicated onto — each pair
    survives in exactly one cell, and the distinct-shuffle a naive
    dedup would pay never happens. (When the bboxes do NOT overlap the
    corner may fall outside a shared cell and the pair may be dropped
    here rather than by the refine step — equally correct, one filter
    earlier.)"""
    return (
        cell["cx"] == cell_index(F.greatest(ax0, bx0), cell_size)
    ) & (cell["cy"] == cell_index(F.greatest(ay0, by0), cell_size))


def salted_point_cell(
    px: Column, py: Column, key: Column, cell_size: int, n_salt: int
) -> Column:
    """Hot-cell skew guard for the probe side of a grid join: the
    point's cell extended with ``salt = pmod(hash(key), n_salt)`` so a
    pathological cell (every point of a city block in one cell) splits
    into ``n_salt`` shuffle keys. Pair coverage is preserved because
    the replicated side enumerates every salt (``salted_bbox_cells``);
    each (region, point) pair still meets exactly once — the point
    carries ONE salt and the region carries all of them. Prefer AQE's
    skew-join split when it applies (sort-merge joins); this is the
    deterministic fallback for broadcast/hash plans and for stable
    pre-partitioned layouts, same trade as the LSH bucket salt-split
    in functions/dedup.py."""
    return F.struct(
        cell_index(px, cell_size).alias("cx"),
        cell_index(py, cell_size).alias("cy"),
        F.pmod(F.hash(key), F.lit(n_salt)).alias("s"),
    )


def salted_bbox_cells(
    x0: Column,
    y0: Column,
    x1: Column,
    y1: Column,
    cell_size: int,
    n_salt: int,
) -> Column:
    """Replication side of the skew-guarded grid join: every covering
    cell x every salt value — replication grows n_salt-fold, which is
    the explicit price of splitting a hot cell; keep n_salt small
    (4-8) and apply only when a cell histogram says so."""
    return F.flatten(
        F.transform(
            bbox_cells(x0, y0, x1, y1, cell_size),
            lambda c: F.transform(
                F.sequence(F.lit(0), F.lit(n_salt - 1)),
                lambda s: F.struct(
                    c["cx"].alias("cx"),
                    c["cy"].alias("cy"),
                    s.cast("int").alias("s"),
                ),
            ),
        )
    )
