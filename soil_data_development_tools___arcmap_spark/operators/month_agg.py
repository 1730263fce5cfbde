"""Month-level SDV aggregation: the month-collapse stage.

Monthly data (comonth/cosoilmoist) replicates the component weight 12×;
the reference warns this is a trap (gSSURGO_CreateSoilMap.py:10710-10716)
and every Mo_*/DTWT operator first collapses months per member before
the component-level aggregation. ``month_collapse`` is that stage; the
result feeds the operators in ``component_agg`` unchanged:

- AggregateCo_Mo_WTA (:7057-7206)   = month_collapse(min|max) → agg_wta
- AggregateCo_Mo_MaxMin (:6109-6286)= month_collapse → agg_maxmin
- AggregateCo_Mo_DCD (:6289-6410)   = month_collapse → agg_dcd
- AggregateCo_DCP_DTWT (:5894-5980) = month_collapse(min|max) → agg_dcp
- AggregateCo_WTA_DTWT (:7209-7336) = month_collapse + null→201 → agg_wta
- AggregateCo_Mo_DCP_Domain (:6413) = month dedupe → agg_dcp (domain)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tiebreak import RatingSpec


def month_collapse(
    df: DataFrame,
    spec: RatingSpec,
    how: str = "min",
    month_col: str = "monthseq",
    beg_month: int | None = None,
    end_month: int | None = None,
) -> DataFrame:
    """Collapse the month dimension to one value per group-member.

    ``how``: "min" | "max" (WSS picks lowest/highest monthly value per
    component, :7057-7063) | "distinct" (dedupe the 12×-replicated
    annual rating — AggregateCo_*_Domain's dropDuplicates, :10710-10712).
    Month-window filter ``MONTHSEQ IN (begMo..endMo)`` per :10207-10222.
    """
    if beg_month is not None and end_month is not None:
        if beg_month <= end_month:
            df = df.where(F.col(month_col).between(beg_month, end_month))
        else:  # wrap-around window (e.g. Nov..Mar)
            df = df.where(
                (F.col(month_col) >= beg_month) | (F.col(month_col) <= end_month)
            )
    keys = [*spec.group_cols, spec.member_col, spec.weight_col]
    rating = spec.rating()
    if how == "distinct":
        return df.select(*keys, rating.alias(spec.rating_col)).distinct()
    agg = F.min(rating) if how == "min" else F.max(rating)
    return df.groupBy(*keys).agg(agg.alias(spec.rating_col))
