"""Horizon-level (depth-weighted) SDV aggregation operators.

A "horizon" row carries an interval [top_col, bot_col); aggregation over
a requested depth range [top, bot) weights each horizon by its clipped
thickness ``min(bot_col, bot) - max(top_col, top)`` (the reference's
clip expression, gSSURGO_CreateSoilMap.py:8375 / gSSURGO_ValuTable.py:1556).

Every operator is a two-level groupBy: member level (cokey analog —
collapse horizons) then group level (mukey analog — collapse members,
weight-normalized). Both are single-shuffle hash aggregations; the
member-level output is tiny relative to the horizon table, so the
second shuffle is cheap. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .tiebreak import RatingSpec, member_order, rating_order_expr


def clipped_thickness(
    top_col: str, bot_col: str, top: float, bot: float
) -> Column:
    """Thickness of the horizon ∩ [top, bot); 0 when disjoint."""
    t = F.least(F.col(bot_col), F.lit(bot)) - F.greatest(F.col(top_col), F.lit(top))
    return F.greatest(t, F.lit(0))


def _member_sums(
    df: DataFrame,
    spec: RatingSpec,
    top_col: str,
    bot_col: str,
    top: float,
    bot: float,
) -> DataFrame:
    """Per-member Σ(thickness·rating) and Σ(thickness) over in-range,
    non-null-rating horizons."""
    hz_t = clipped_thickness(top_col, bot_col, top, bot)
    rating = spec.rating()
    if spec.zero_nulls:
        rating = F.coalesce(rating, F.lit(0))
    valid = rating.isNotNull() & (hz_t > 0)
    return df.groupBy(*spec.group_cols, spec.member_col, spec.weight_col).agg(
        F.sum(F.when(valid, hz_t * rating)).alias("__txv"),
        F.sum(F.when(valid, hz_t)).alias("__t"),
    )


def agg_hz_wta_sum(
    df: DataFrame,
    spec: RatingSpec,
    top_col: str = "hzdept_r",
    bot_col: str = "hzdepb_r",
    top: float = 0,
    bot: float = 999,
    precision: int | None = None,
) -> DataFrame:
    """AggregateHz_WTA_SUM (AWS-style, gSSURGO_CreateSoilMap.py:8308-8481).

    Component value = Σ(hzT·rating); group value = Σ over contributing
    members of value·weight/Σweight — the weight renormalization over
    CONTRIBUTING members only (adjCompPct, :8430-8438).
    """
    comp = _member_sums(df, spec, top_col, bot_col, top, bot).where(
        F.col("__txv").isNotNull()
    )
    out = F.sum(F.col(spec.weight_col) * F.col("__txv")) / F.sum(F.col(spec.weight_col))
    if precision is not None:
        out = F.round(out, precision)
    return comp.groupBy(*spec.group_cols).agg(
        F.sum(spec.weight_col).alias(spec.weight_col),
        out.alias(spec.out_col),
    )


def agg_hz_wta_wta(
    df: DataFrame,
    spec: RatingSpec,
    top_col: str = "hzdept_r",
    bot_col: str = "hzdepb_r",
    top: float = 0,
    bot: float = 999,
    precision: int | None = None,
) -> DataFrame:
    """AggregateHz_WTA_WTA (AWC-style depth-weighted average,
    gSSURGO_CreateSoilMap.py:8484-8636): component value =
    Σ(hzT·rating)/Σ(hzT), then weight-averaged across members
    (:8590-8598)."""
    comp = _member_sums(df, spec, top_col, bot_col, top, bot).where(
        F.col("__t") > 0
    )
    comp_val = (F.col("__txv") / F.col("__t")).alias("__cv")
    comp = comp.select(*spec.group_cols, spec.weight_col, comp_val)
    out = F.sum(F.col(spec.weight_col) * F.col("__cv")) / F.sum(F.col(spec.weight_col))
    if precision is not None:
        out = F.round(out, precision)
    return comp.groupBy(*spec.group_cols).agg(
        F.sum(spec.weight_col).alias(spec.weight_col),
        out.alias(spec.out_col),
    )


def agg_hz_dcp_wta(
    df: DataFrame,
    spec: RatingSpec,
    top_col: str = "hzdept_r",
    bot_col: str = "hzdepb_r",
    top: float = 0,
    bot: float = 999,
    precision: int | None = None,
) -> DataFrame:
    """AggregateHz_DCP_WTA (gSSURGO_CreateSoilMap.py:8639-8892):
    pick the dominant member per group (max weight, member-key
    tiebreak), then depth-weight its horizons.

    The dominant member is selected on the member-level aggregate, not
    by joining a distinct-member table back to the raw horizons — every
    member survives _member_sums (null sums when no in-range horizon),
    so the pick is identical with one scan and no join."""
    w = Window.partitionBy(*spec.group_cols).orderBy(
        F.col(spec.weight_col).desc_nulls_last(), *member_order(spec)
    )
    comp = (
        _member_sums(df, spec, top_col, bot_col, top, bot)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__t") > 0))
    )
    out = F.col("__txv") / F.col("__t")
    if precision is not None:
        out = F.round(out, precision)
    return comp.select(
        *spec.group_cols, F.col(spec.weight_col), out.alias(spec.out_col)
    )


def agg_hz_maxmin_then(
    df: DataFrame,
    spec: RatingSpec,
    then: str,
    maximum: bool = True,
    top_col: str = "hzdept_r",
    bot_col: str = "hzdepb_r",
    top: float = 0,
    bot: float = 999,
    precision: int | None = None,
) -> DataFrame:
    """AggregateHz_MaxMin_{WTA,DCP,DCD} (gSSURGO_CreateSoilMap.py:8895-9345):
    per-member min/max of the rating over in-range horizons, then a
    component-level aggregation (``then`` in {"wta", "dcp", "dcd"})."""
    from . import component_agg

    hz_t = clipped_thickness(top_col, bot_col, top, bot)
    rating = spec.rating()
    agg_fn = F.max if maximum else F.min
    comp = df.groupBy(*spec.group_cols, spec.member_col, spec.weight_col).agg(
        agg_fn(F.when(hz_t > 0, rating)).alias("__hzv")
    ).where(F.col("__hzv").isNotNull())
    comp_spec = RatingSpec(
        rating_col="__hzv",
        group_cols=spec.group_cols,
        member_col=spec.member_col,
        weight_col=spec.weight_col,
        tiebreak_higher=spec.tiebreak_higher,
        domain=spec.domain,
        domain_reversed=spec.domain_reversed,
        not_rated=spec.not_rated,
        out_col=spec.out_col,
    )
    if then == "wta":
        return component_agg.agg_wta(comp, comp_spec, precision=precision)
    if then == "dcp":
        return component_agg.agg_dcp(comp, comp_spec)
    if then == "dcd":
        return component_agg.agg_dcd(comp, comp_spec)
    raise ValueError(f"unknown second stage: {then}")
