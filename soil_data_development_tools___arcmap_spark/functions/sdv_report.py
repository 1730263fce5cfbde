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


def report_template(df: DataFrame, rating_col: str | None = None) -> dict:
    """Tabular-report template dispatch (gSSURGO_TabularReport.py:
    120-197): the reference inspects the SDV_Data rating table's shape
    — horizon level if HZDEPT_R present, component level if COMPNAME,
    else map unit level — and the rating column's datatype to pick the
    .rlf report template, page layout, and field map. The PDF/rlf
    rendering is GIS-bound (out of scope); the dispatch is the
    portable core a report runner needs. ``rating_col`` defaults to
    the LAST column, like the reference's fields[-1] assumption."""
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    cols = [c.upper() for c in df.columns]
    rating = (rating_col or df.columns[-1]).upper()
    dt = df.schema[df.columns[cols.index(rating)]].dataType
    if isinstance(dt, StringType):
        kind = "string"
    elif isinstance(dt, (DoubleType, FloatType)):
        kind = "float"
    elif isinstance(dt, ShortType):
        kind = "smallinteger"
    elif isinstance(dt, (IntegerType, LongType)):
        kind = "integer"
    else:
        raise ValueError(f"Invalid data type for report: {dt.simpleString()}")

    base_fm = {"AREASYMBOL", "MUKEY", "MUSYM", "MUNAME"}
    if "HZDEPT_R" in cols:  # horizon level — always landscape (:143)
        tmpl = {
            "string": "SDV_Report_Hz_String.rlf",
            "float": "SDV_Report_Hz_Float.rlf",
            "smallinteger": "SDV_Report_Hz_Integer.rlf",
            "integer": "SDV_Report_Hz_Integer.rlf",
        }[kind]
        fm = sorted(base_fm | {"COMPNAME", "COMPPCT_R", "HZDEPT_R",
                               "HZDEPB_R"}) + [rating]
        layout = "SDV_MapDescription_Landscape.mxd"
    elif "COMPNAME" in cols:  # component level (:160-175)
        tmpl = {
            "string": "SDV_Report_Co_String.rlf",
            "float": "SDV_Report_Co_Float.rlf",
            "smallinteger": "SDV_Report_Co_Integer.rlf",
            "integer": "SDV_Report_Co_Integer.rlf",
        }[kind]
        fm = sorted(base_fm | {"COMPNAME", "COMPPCT_R"}) + [rating]
        layout = (
            "SDV_MapDescription_Landscape.mxd"
            if kind == "string"
            else "SDV_MapDescription_Portrait.mxd"
        )
    else:  # map unit level (:177-197)
        if rating == "MUNAME":
            tmpl, fm = "SDV_Report_MuName.rlf", None
        else:
            tmpl = {
                "string": "SDV_Report_Mu_String.rlf",
                "float": "SDV_Report_Mu_Float.rlf",
                "smallinteger": "SDV_Report_Mu_Float.rlf",
                "integer": "SDV_Report_Mu_Integer.rlf",
            }[kind]
            fm = sorted(base_fm) + [rating]
        layout = "SDV_MapDescription_Portrait.mxd"
    return {"template": tmpl, "layout": layout, "field_map": fm,
            "rating_col": rating, "rating_type": kind}


# --------------------------------------------------------------------
# PDF byte renderer (round 5): the reference exports its report via
# ArcMap's PDF engine (SDV_AttributeReport.py:214-231
# ExportReport/PDFDocumentCreate); the portable half that was missing
# is the FILE — a deterministic, dependency-free PDF 1.4 writer good
# for tabular report pages (Helvetica, one text block per page).


def encode_pdf_report(
    title: str,
    pages: list[list[str]],
    page_w: int = 612,
    page_h: int = 792,
    font_size: int = 10,
) -> bytes:
    """Minimal valid PDF 1.4: catalog → pages → N page objects, one
    content stream per page drawing the title + each line with Tj.
    Deterministic bytes (no timestamps, no ids) so the output can be
    content-addressed in a manifest like the raster tiles.

    ``pages``: the paginated line lists the report pagination operator
    already produces (attribute_report) — this is the sink for them.
    """

    def esc(s: str) -> str:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )

    objs: list[bytes] = []  # 1-indexed

    n_pages = max(len(pages), 1)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_obj_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i in range(n_pages):
        lines = pages[i] if pages else [""]
        y = page_h - 54
        parts = [
            f"BT /F1 {font_size + 2} Tf 54 {y} Td ({esc(title)}) Tj ET"
        ]
        y -= 2 * font_size
        for ln in lines:
            y -= int(font_size * 1.4)
            parts.append(
                f"BT /F1 {font_size} Tf 54 {y} Td ({esc(ln)}) Tj ET"
            )
        stream = "\n".join(parts).encode("latin-1", "replace")
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w} "
                f"{page_h}] /Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_obj_ids[i] + 1} 0 R >>"
            ).encode()
        )
        objs.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
