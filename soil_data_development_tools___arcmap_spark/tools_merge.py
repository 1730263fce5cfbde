"""Rating-table merge tool (SURVEY §2.6;
/root/reference/gSSURGO_MergeRatingTables.py — join many SDV_* rating
tables to one wide table keyed by mukey).

Each per-attribute rating table is tiny relative to the fact tables
(one row per map unit), so the chain of left joins broadcasts; column
names are prefixed per attribute exactly like the reference's
SDV_<attribute> field naming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_rating_tables(
    base: DataFrame, ratings: dict[str, DataFrame], key: str = "mukey"
) -> DataFrame:
    """base ⟕ rating1 ⟕ rating2 … on ``key``, non-key columns prefixed
    with the rating name."""
    out = base
    for name, df in ratings.items():
        for c in df.columns:
            if c != key:
                df = df.withColumnRenamed(c, f"{name}_{c}")
        out = out.join(df, key, "left")
    return out
