"""Legend color-ramp core (SURVEY §2.7 presentation gap, closed).

The reference builds progressive map-legend color ramps by Bezier
interpolation between named control colors (BezierColorRamp.py:180-282
``Process``/``bezier_gradient``; invoked from ColorRamp,
gSSURGO_CreateSoilMap.py:512-591). Rendering the .lyr symbology is
ArcGIS-side and stays out of scope; the COLOR COMPUTATION — the part a
legend consumer actually needs — is pure integer/float arithmetic and
is re-expressed here as Column expressions:

- for each adjacent control-color pair, a 2-control-point Bezier
  (which reduces to linear interpolation with the reference's
  per-summand ``int()`` truncation: floor((1−t)·s) + floor(t·f) per
  channel, t = j/(n−1));
- consecutive-duplicate removal over the concatenated gradient
  (the reference's ``lastRGB`` walk);
- skip-sampling down to the legend size
  (skipNum = round((len(master)−n)/(n−1)), keep every skipNum+1-th).

Everything is derived from a single scalar (the legend class count),
so the whole plan is O(classes) rows — the windows below run on a few
dozen rows regardless of data scale; no partitioning concerns apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the reference's named ramp colors in slope-ramp order
#: (BezierColorRamp.py:220-226 dRGB, minus magenta per the ColorRamp
#: comment "not being used in slope color ramp")
RAMP_CONTROLS: list[tuple[int, int, int]] = [
    (255, 0, 0),  # Red
    (255, 255, 0),  # Yellow
    (0, 255, 0),  # Green
    (0, 255, 255),  # Cyan
    (0, 0, 255),  # Blue
]


def _chan(t: Column, s: Column, f: Column) -> Column:
    """One channel of the 2-point Bezier with the reference's
    per-summand int() truncation (values are ≥0, so int == floor)."""
    return (F.floor((F.lit(1.0) - t) * s) + F.floor(t * f)).cast("long")


def bezier_legend_ramp(n_df: DataFrame, n_col: str = "n") -> DataFrame:
    """(class_idx, r, g, b, hex) legend colors for a ramp of ``n``
    classes, ``n`` supplied as the single row of ``n_df`` (the legend
    class count is data-derived — e.g. COUNT(DISTINCT rating)).
    Requires n ≥ 2 (the reference divides by n−1)."""
    controls = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), F.lit(g).alias("g"), F.lit(b).alias("b")
            )
            for (r, g, b) in RAMP_CONTROLS
        ]
    )
    n = F.col(n_col).cast("long")
    pairs = n_df.select(
        n.alias("n"), F.posexplode(F.slice(controls, 1, len(RAMP_CONTROLS) - 1))
    ).select(
        "n",
        F.col("pos").alias("p"),
        F.col("col").alias("s"),
        F.element_at(controls, F.col("pos") + 2).alias("f"),
    )
    pts = pairs.select(
        "n",
        "p",
        "s",
        "f",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("j"),
    ).withColumn("t", F.col("j").cast("double") / (F.col("n") - 1))
    colors = pts.select(
        "n",
        (F.col("p") * F.col("n") + F.col("j")).alias("pos"),
        _chan(F.col("t"), F.col("s.r"), F.col("f.r")).alias("r"),
        _chan(F.col("t"), F.col("s.g"), F.col("f.g")).alias("g"),
        _chan(F.col("t"), F.col("s.b"), F.col("f.b")).alias("b"),
    )
    # lastRGB walk: drop rows equal to the immediately preceding color
    w = Window.orderBy("pos")
    master = (
        colors.withColumn("pr", F.lag("r").over(w))
        .withColumn("pg", F.lag("g").over(w))
        .withColumn("pb", F.lag("b").over(w))
        .where(
            F.col("pr").isNull()
            | (F.col("r") != F.col("pr"))
            | (F.col("g") != F.col("pg"))
            | (F.col("b") != F.col("pb"))
        )
        .withColumn("i", F.row_number().over(w) - 1)
        .select("n", "i", "r", "g", "b")
    )
    sized = master.withColumn(
        "m", F.max(F.col("i")).over(Window.partitionBy(F.lit(0))) + 1
    )
    # skipNum = int(round((len(master) - n) / float(n - 1)))
    skip = F.round(
        (F.col("m") - F.col("n")) / (F.col("n") - 1).cast("double")
    ).cast("long")
    kept = sized.withColumn("skip", skip).where(
        F.col("i") % (F.col("skip") + 1) == 0
    )
    return kept.select(
        F.row_number().over(Window.orderBy("i")).alias("class_idx"),
        "r",
        "g",
        "b",
        F.concat(
            F.lit("#"), F.format_string("%02x%02x%02x", "r", "g", "b")
        ).alias("hex"),
    )
