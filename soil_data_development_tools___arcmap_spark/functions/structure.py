"""Structural validation of a gSSURGO-style catalog — the portable
core of CheckgSSURGO (SSURGO_CheckgSSURGO.py:99-355).

The reference walks the file geodatabase checking (a) required tables /
feature classes exist, (b) each has exactly the expected ordered field
list, (c) SACATALOG holds at least one survey, and (d) the raster's
unique-mapunit count matches the tabular side (MapunitCount,
:262-310). Here (a)+(b) are driver-side schema introspection over a
{name: DataFrame} catalog — pure metadata, no job runs — and (c)+(d)
are one-row count aggregates. The GIS-specific pieces (spatial
reference, raster statistics) are out of scope per SURVEY §2.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: required metadata/SDV tables (CheckTables, SSURGO_CheckgSSURGO.py:150-162)
REQUIRED_TABLES = [
    "mdstatdomdet", "mdstatdommas", "mdstatidxdet", "mdstatidxmas",
    "mdstatrshipdet", "mdstatrshipmas", "mdstattabcols", "mdstattabs",
    "sdvalgorithm", "sdvattribute", "sdvfolder", "sdvfolderattribute",
]


def check_structure(
    catalog: dict[str, DataFrame | None],
    expected: dict[str, list[str]],
) -> list[dict]:
    """Table-existence + ordered-field check (CheckFeatureClasses /
    CheckTables shape). Returns one report row per expected table:
    status 'missing' | 'bad_schema' | 'ok', with the actual column
    list in ``detail`` when the schema is wrong (the reference prints
    exactly this, :131-135). Pure driver-side — touching .columns
    never triggers a job."""
    rows = []
    for name, cols in expected.items():
        df = catalog.get(name)
        if df is None:
            rows.append({"table_name": name, "status": "missing",
                         "detail": None})
        elif [c.upper() for c in df.columns] != [c.upper() for c in cols]:
            rows.append({"table_name": name, "status": "bad_schema",
                         "detail": ",".join(df.columns)})
        else:
            rows.append({"table_name": name, "status": "ok", "detail": None})
    return rows


def catalog_survey_count(sacatalog: DataFrame) -> DataFrame:
    """CheckCatalog (:180-198): at least one survey must be present."""
    return sacatalog.agg(
        F.count(F.lit(1)).alias("n"),
        F.when(F.count(F.lit(1)) > 0, "ok").otherwise("empty").alias("status"),
    )


def count_cross_check(
    left: DataFrame, right: DataFrame, key: str = "mukey"
) -> DataFrame:
    """MapunitCount cross-check (:262-310): distinct-key count on both
    sides plus a match flag — the raster-vs-tabular reconciliation
    with the raster side generalized to any DataFrame. One aggregate
    per side (map-side partial, no join)."""
    ln = left.select(key).distinct().count()
    rn = right.select(key).distinct().count()
    spark = left.sparkSession
    return spark.createDataFrame(
        [(ln, rn, "match" if ln == rn else "mismatch", abs(ln - rn))],
        "n_left bigint, n_right bigint, status string, diff bigint",
    )
