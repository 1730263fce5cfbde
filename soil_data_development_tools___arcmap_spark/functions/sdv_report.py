"""SDV attribute-report outline (SDV_AttributeReport.py:1-251).

The reference walks sdvfolder (ORDER BY foldersequence, first name
wins) → sdvfolderattribute (folderkey → attributekey) → sdvattribute,
dedupes attribute names per folder, sorts them, and optionally drops
state-specific interps — names ending in a ``(ST)`` suffix whose ST
appears among the first-two-letter prefixes of legend.areasymbol
(bNational, :123-131, :180-189). Here the whole outline is one
declarative plan: the catalog tables are broadcast-sized dims, the
state list is a broadcast anti-join, and the per-folder ordering is a
window — no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_report(
    sdvfolder: DataFrame,
    sdvfolderattribute: DataFrame,
    sdvattribute: DataFrame,
    legend: DataFrame | None = None,
    national: bool = False,
) -> DataFrame:
    """One outline row per (folder, attribute): folder sequence + name,
    the attribute's 1-based alphabetical position within the folder
    (the reference's alphaList letter index, :195-197), name, logical
    datatype and aggregation algorithm.

    ``national=True`` drops state-specific attributes — a trailing
    ``(XX)`` whose XX is a legend-derived state prefix — exactly like
    the reference's att[-4:] test (:183-189)."""
    # first folder row wins per name, in foldersequence order (:136-142)
    wf = Window.partitionBy("foldername").orderBy(
        F.col("foldersequence").asc(), F.col("folderkey").asc()
    )
    folders = (
        sdvfolder.withColumn("__rn", F.row_number().over(wf))
        .where(F.col("__rn") == 1)
        .select("foldername", "folderkey", "foldersequence")
    )
    atts = sdvattribute.select(
        "attributekey",
        "attributename",
        "attributelogicaldatatype",
        "algorithmname",
    )
    out = (
        folders.join(sdvfolderattribute, "folderkey")
        .join(atts, "attributekey")
    )
    if national:
        if legend is None:
            raise ValueError("national=True requires the legend table")
        states = legend.select(
            F.substring(F.col("areasymbol"), 1, 2).alias("__st")
        ).distinct()
        tail = F.substring(F.col("attributename"), -4, 4)
        out = out.join(
            F.broadcast(states),
            (tail.startswith("(") & tail.endswith(")"))
            & (F.substring(tail, 2, 2) == F.col("__st")),
            "left_anti",
        )
    # dedupe attribute names per folder (first by datatype/algorithm
    # for a deterministic representative; the reference keeps the
    # cursor's first row, :176-178)
    wd = Window.partitionBy("foldername", "attributename").orderBy(
        F.col("attributelogicaldatatype").asc_nulls_last(),
        F.col("algorithmname").asc_nulls_last(),
        F.col("attributekey").asc(),
    )
    out = (
        out.withColumn("__rd", F.row_number().over(wd))
        .where(F.col("__rd") == 1)
    )
    # alphabetical position within the folder (attList.sort(), :194)
    wc = Window.partitionBy("foldername").orderBy(F.col("attributename").asc())
    return out.select(
        F.col("foldersequence").alias("folder_seq"),
        "foldername",
        F.row_number().over(wc).alias("choice"),
        "attributename",
        "attributelogicaldatatype",
        "algorithmname",
    )
