"""Small scalar utilities from SURVEY §2.8 / §2.11.

Everything here is either a lookup map or a one-expression helper; the
heavier scalar logic (depth clip, rounding, domain case-matching) lives
inside the operators as Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: month name <-> monthseq (ListMonths, gSSURGO_CreateSoilMap.py:3613-3621)
MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTH_TO_SEQ = {m: i + 1 for i, m in enumerate(MONTHS)}
SEQ_TO_MONTH = {i + 1: m for i, m in enumerate(MONTHS)}


def month_seq_expr(name_col: str) -> Column:
    """Month name column → monthseq (1-12) as a when-chain (no UDF)."""
    expr = F.lit(None).cast("int")
    for m, s in MONTH_TO_SEQ.items():
        expr = F.when(F.col(name_col) == m, F.lit(s)).otherwise(expr)
    return expr


#: square meters -> acres (gSSURGO_AcreageReport.py:186-244)
SQM_PER_ACRE = 4046.8564224


def acres_expr(area_sqm_col: str) -> Column:
    return F.col(area_sqm_col) / F.lit(SQM_PER_ACRE)


def assert_nonempty(df: DataFrame, name: str) -> DataFrame:
    """Empty-result guard (BadTable, gSSURGO_CreateSoilMap.py:433-453):
    raise instead of silently producing an empty rating table. Costs
    one cheap action (LIMIT 1 scan) — call at materialization points,
    not per-transformation."""
    if df.limit(1).count() == 0:
        raise ValueError(f"{name}: produced no rows")
    return df
