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


def merge_by_map(
    map_polys: DataFrame,
    source: DataFrame,
    existing: DataFrame | None = None,
    areasym_col: str = "areasymbol",
) -> DataFrame:
    """SSURGO_MergeDatabasesByMap variant (:297-343, :812-886): the
    survey list comes from the SELECTED polygons of a map layer, not a
    user-typed list — distinct areasymbols of ``map_polys`` — and
    surveys already present in the target database (``existing``) are
    skipped, exactly like the reference's already-exists check
    (:828-863). The survey list and existing list are broadcast-sized
    dims (a few thousand areasymbols at CONUS scale), so both filters
    are broadcast semi/anti joins against the fact-sized ``source`` —
    no shuffle of the merged rows; the PK dedup afterwards (see
    ``merge_surveys``) is the only exchange."""
    from pyspark.sql import functions as F

    wanted = map_polys.select(areasym_col).distinct()
    if existing is not None:
        wanted = wanted.join(
            existing.select(areasym_col).distinct(), areasym_col, "left_anti"
        )
    return source.join(F.broadcast(wanted), areasym_col, "left_semi")
