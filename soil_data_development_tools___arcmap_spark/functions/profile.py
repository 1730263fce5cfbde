"""Exact data profiling via count histograms (SURVEY §2.11 adjacent —
the plausibility-report family generalized into a reusable operator).

``exact_order_stats`` computes engine-exact order statistics (doubled
median — integral for either parity — and the discrete p95 at integer
rank (19·(n−1)) div 20 + 1) WITHOUT sorting raw rows: the input
collapses to a (group, value) count histogram first (combine-friendly
groupBy), then ranks are read off cumulative counts — a distinct value
with count c owns the rank interval [cum−c+1, cum], and each target
rank lands in exactly one interval. The only window runs over the
histogram, bounded by the number of DISTINCT values per group,
independent of row count — the shape that survived the round-4/5
hot-partition review (SCALING.md: 2.35 s at 500k rows, 1.8k histogram
rows).

``table_profile`` applies it per numeric column (DESCRIBE/SUMMARY with
exact medians instead of approx sketches — percentile_approx's GK
sketch is not reproducible across engines or even runs).

Scale bound: the single-task surface is the HISTOGRAM of one group
(distinct values of one column), not its rows — measured flat 1×→10×
(3.3 s at both 6M and 60M lineitem rows; the price histogram plateaus
at 583k distinct cents, SCALING.md). For genuinely continuous
columns whose distinct count tracks the row count, set
``quant_scale`` coarser — the knob trades median resolution for a
bounded histogram, explicitly, instead of an approx sketch trading it
silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_order_stats(
    df: DataFrame,
    group_cols: list[str],
    value: Column | str,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Per group: n (non-null count), med2 (2×median), p95 — exact,
    from a count histogram. NULL values are excluded from the order
    statistics (SQL semantics) but counted in n_null."""
    value = F.col(value) if isinstance(value, str) else value
    base = df.select(*group_cols, value.alias("__v"))
    hist = (
        base.where(F.col("__v").isNotNull())
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    ws = Window.partitionBy(*group_cols)
    wcum = ws.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = (
        hist.withColumn("__hi", F.sum("__c").over(wcum))
        .withColumn("__n", F.sum("__c").over(ws))
        .withColumn("__lo", F.col("__hi") - F.col("__c") + 1)
    )

    def hits(rank: Column) -> Column:
        return (rank >= F.col("__lo")) & (rank <= F.col("__hi"))

    odd = F.col("__n") % 2 == 1
    med_w = F.when(odd, F.when(hits(F.expr("(__n + 1) div 2")), 2).otherwise(0)).otherwise(
        F.when(hits(F.expr("__n div 2")), 1).otherwise(0)
        + F.when(hits(F.expr("__n div 2 + 1")), 1).otherwise(0)
    )
    p95_idx = F.expr("(19 * (__n - 1)) div 20 + 1")
    aggs = [
        F.max("__n").alias("n"),
        F.min("__v").alias("vmin"),
        F.max("__v").alias("vmax"),
        F.sum(med_w * F.col("__v")).alias("med2"),
        F.max(F.when(hits(p95_idx), F.col("__v"))).alias("p95"),
    ] + (extra_aggs or [])
    return h.groupBy(*group_cols).agg(*aggs)


def table_profile(
    df: DataFrame, columns: list[str], quant_scale: int | None = None
) -> DataFrame:
    """One profile row per column: non-null count, null count, min,
    max, exact doubled median, discrete p95. ``quant_scale`` floors
    float columns to integer units first (profiles must hash
    identically across engines; raw doubles as GROUP KEYS would not).
    The columns unpivot into a (col_name, value) long table, so the
    whole profile is ONE histogram pass regardless of column count."""
    stack = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("col_name"),
                (
                    F.floor(F.col(c).cast("double") * quant_scale).cast("long")
                    if quant_scale
                    else F.col(c).cast("long")
                ).alias("v"),
            )
            for c in columns
        ])
    ).alias("s")
    long = df.select(stack).select("s.col_name", "s.v")
    n_rows = df.count()
    prof = exact_order_stats(long, ["col_name"], "v")
    return prof.select(
        "col_name",
        "n",
        (F.lit(n_rows) - F.col("n")).alias("n_null"),
        "vmin",
        "vmax",
        "med2",
        "p95",
    )
