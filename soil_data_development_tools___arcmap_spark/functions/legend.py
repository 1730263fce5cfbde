"""Legend/class-break computation (SURVEY §2.7).

The reference computes equal-interval class breaks over a rating's
min/max for map legends (GetNumericLegend, gSSURGO_CreateSoilMap.py
:1234-1493; ClassBreaksJSON :2088-2340). The rendering (JSON/color
ramps) is presentation and out of scope; the break computation is the
portable core: a 2-row aggregate plus a generated class index — no
data-sized work beyond the min/max scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equal_interval_breaks(df: DataFrame, col: str, n_classes: int = 5) -> DataFrame:
    """(class_idx, brk) — n_classes+1 equal-interval break points over
    [min, max] of ``col``. Integer inputs stay in exact integer
    arithmetic (min + ((max-min)·i) div n), engine-reproducible."""
    s = df.agg(F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx"))
    return (
        s.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_classes))).alias("class_idx"),
            "mn",
            "mx",
        )
        .select(
            "class_idx",
            F.expr(f"mn + ((mx - mn) * class_idx) div {n_classes}").alias("brk"),
        )
    )


def unique_values(df: DataFrame, col: str) -> DataFrame:
    """(value, n) per distinct rating — the computation core of the
    reference's unique-values legend (UniqueValuesJSON,
    gSSURGO_CreateSoilMap.py:2341-2518) and of the outputValues list
    every Aggregate* function returns for legend building."""
    return df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
