"""Metadata-generated catalog: schema generation, FK load order and the
export bootstrap path (SSURGO_Convert_to_Geodatabase.py:656-708 table
mapping, :1227-1234 FK-ordered import list)."""

from __future__ import annotations

import os

import pytest

from soil_data_development_tools___arcmap_spark import ssurgo_metadata as M
from soil_data_development_tools___arcmap_spark.catalog import (
    catalog_from_export,
    embedded_catalog,
    fk_load_order,
    load_full_export,
)

# The reference's published 59-file import order
# (SSURGO_Convert_to_Geodatabase.py:1227-1234; featdesc + the 8 mdstat
# metadata files are imported separately).
REFERENCE_TXT_ORDER = [
    "distmd", "legend", "distimd", "distlmd", "lareao", "ltext", "mapunit",
    "comp", "muaggatt", "muareao", "mucrpyd", "mutext", "chorizon", "ccancov",
    "ccrpyd", "cdfeat", "cecoclas", "ceplants", "cerosnac", "cfprod",
    "cgeomord", "chydcrit", "cinterp", "cmonth", "cpmatgrp", "cpwndbrk",
    "crstrcts", "csfrags", "ctxfmmin", "ctxmoicl", "ctext", "ctreestm",
    "ctxfmoth", "chaashto", "chconsis", "chdsuffx", "chfrags", "chpores",
    "chstrgrp", "chtext", "chtexgrp", "chunifie", "cfprodo", "cpmat",
    "csmoist", "cstemp", "csmorgc", "csmorhpp", "csmormr", "csmorss",
    "chstr", "chtextur", "chtexmod", "sacatlog", "sainterp", "sdvalgorithm",
    "sdvattribute", "sdvfolder", "sdvfolderattribute",
]


def test_embedded_catalog_is_the_full_inventory():
    cat = embedded_catalog()
    assert len(cat.schemas) == 69
    # full layouts, not the pruned projections
    assert len(cat.schemas["chorizon"].fields) == 171
    assert len(cat.schemas["component"].fields) == 109
    # tables the hand-written schema set never declared
    for t in ("cotaxmoistcl", "chstructgrp", "legendtext", "cosoiltemp",
              "chpores", "mucropyld"):
        assert t in cat.schemas, t
    # type mapping spot checks
    ch = {f.name: f.dataType.typeName() for f in cat.schemas["chorizon"].fields}
    assert ch["hzdept_r"] == "short"  # SmallInteger
    assert ch["awc_r"] == "float"  # Single
    assert ch["chkey"] == "string"
    sa = {f.name: f.dataType.typeName() for f in cat.schemas["sainterp"].fields}
    assert sa["interpgendate"] == "timestamp"
    assert sa["interpmaxreasons"] == "short"
    fd = {f.name: f.dataType.typeName() for f in cat.schemas["featdesc"].fields}
    assert fd["spatialversion"] == "integer"
    assert fd["featdesc"] == "string"  # Narrative Text memo


def test_fk_load_order_satisfies_every_edge_and_is_deterministic():
    cat = embedded_catalog()
    order = cat.load_order()
    assert sorted(order) == sorted(cat.schemas)
    pos = {t: i for i, t in enumerate(order)}
    for left, right, _lc, _rc in cat.edges:
        assert pos[left] < pos[right], (left, right)
    assert order == cat.load_order()


def test_reference_import_order_is_a_witness_of_our_edges():
    """Every file in the reference's hardcoded order maps to a catalog
    table, and that published order itself satisfies our derived FK
    edge set — the two orders certify each other."""
    cat = embedded_catalog()
    by_file = {v: k for k, v in cat.iefile.items() if v}
    tables = [by_file[f] for f in REFERENCE_TXT_ORDER]  # KeyError = unmapped
    pos = {t: i for i, t in enumerate(tables)}
    for left, right, _lc, _rc in cat.edges:
        if left in pos and right in pos:
            assert pos[left] < pos[right], (left, right)


def test_fk_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        fk_load_order(["a", "b"], [("a", "b", "k", "k"), ("b", "a", "k", "k")])


def test_metadata_is_self_hosting():
    """mdstattabcols describes itself and the other bootstrap tables —
    a real export's catalog can always be built from its own files."""
    tabs = {t for (t, *_rest) in M.MDSTATTABCOLS}
    for t in ("mdstattabs", "mdstattabcols", "mdstatrshipdet"):
        assert t in tabs
    cols = [c for (t, _s, c, *_r) in M.MDSTATTABCOLS if t == "mdstattabcols"]
    assert cols[:3] == ["tabphyname", "colsequence", "colphyname"]


def _write_txt(path: str, rows: list[list], encoding="cp1252") -> None:
    import csv

    with open(path, "w", encoding=encoding, newline="") as fh:
        w = csv.writer(fh, delimiter="|", quotechar='"', doublequote=True,
                       quoting=csv.QUOTE_MINIMAL)
        w.writerows(rows)


def _full_width(table: str, named_rows: list[dict]) -> list[list]:
    """Pad dict rows out to the table's full positional text layout
    (real export lines carry EVERY column, blanks for NULL)."""
    cols = [f.name for f in embedded_catalog().schemas[table].fields]
    return [
        ["" if r.get(c) is None else str(r[c]) for c in cols]
        for r in named_rows
    ]


def test_export_bootstrap_roundtrip(spark, tmp_path):
    """An export carrying its own ms*.txt metadata: catalog_from_export
    must rebuild the same schemas and load a table the pruned schema
    set never declared, with blank→NULL, cp1252 recode, short/float
    types and timestamp parsing all through the generated StructType."""
    d = str(tmp_path)
    emb = embedded_catalog()
    _write_txt(
        os.path.join(d, "mstab.txt"),
        _full_width(
            "mdstattabs",
            [{"tabphyname": t, "iefilename": f}
             for t, f in sorted(emb.iefile.items())],
        ),
    )
    _write_txt(
        os.path.join(d, "mstabcol.txt"),
        _full_width(
            "mdstattabcols",
            [{"tabphyname": t, "colsequence": s, "colphyname": c,
              "logicaldatatype": lt, "fieldsize": sz}
             for (t, s, c, lt, sz) in M.MDSTATTABCOLS],
        ),
    )
    _write_txt(
        os.path.join(d, "msrsdet.txt"),
        _full_width(
            "mdstatrshipdet",
            [{"ltabphyname": l, "rtabphyname": r, "relationshipname": n,
              "ltabcolphyname": lc, "rtabcolphyname": rc}
             for (l, r, n, lc, rc) in M.MDSTATRSHIPDET],
        ),
    )
    # chstructgrp: (structgrpname, rvindicator, chkey, chstructgrpkey)
    _write_txt(
        os.path.join(d, "chstrgrp.txt"),
        [["granular’s", "Yes", "11", "1"],
         ["", "No", "12", "2"]],
    )
    # sainterp has Date/Time + SmallInteger columns
    _write_txt(
        os.path.join(d, "sainterp.txt"),
        [["AL001", "NCCPI", "interp", "", "2023-09-13 15:30:01", "", "7",
          "90", "901"]],
    )
    cat = catalog_from_export(spark, d)
    assert cat.schemas["chorizon"] == emb.schemas["chorizon"]
    assert cat.schemas["chstructgrp"] == emb.schemas["chstructgrp"]
    dfs = load_full_export(spark, d, catalog=cat,
                           tables=["chstructgrp", "sainterp"])
    assert list(dfs) == ["chstructgrp", "sainterp"]  # FK order preserved
    rows = {r["chstructgrpkey"]: r for r in dfs["chstructgrp"].collect()}
    assert rows["1"]["structgrpname"] == "granular’s"  # cp1252 0x92
    assert rows["2"]["structgrpname"] is None  # blank→NULL
    sa = dfs["sainterp"].collect()[0]
    assert sa["interpmaxreasons"] == 7
    assert sa["interpdesigndate"].year == 2023
    assert sa["interpgendate"] is None
    assert sa["sainterpkey"] == "901"


def test_pipe_text_export_roundtrip_adversarial(spark, tmp_path):
    """The executor-side pipe-text exporter (_pipe_text_export) must
    round-trip adversarial narrative values byte-faithfully through
    the multiLine catalog scan: embedded newlines (LF and CRLF), the
    pipe delimiter, doubled quotes, the cp1252 right-quote, and NULLs
    in unspecified catalog columns."""
    from pyspark.sql import functions as F

    from soil_data_development_tools___arcmap_spark.catalog import (
        embedded_catalog,
        load_full_export,
    )
    from soil_data_development_tools___arcmap_spark.queries import (
        _pipe_text_export,
    )

    vals = {
        1: "plain",
        2: "line one\nline two",
        3: "crlf one\r\ncrlf two",
        4: 'has "quotes" and | a pipe',
        5: "right’quote",  # cp1252 0x92
    }
    emb = embedded_catalog()
    df = spark.createDataFrame(
        [(k, v) for k, v in vals.items()], "legtextkey long, text string"
    ).withColumn("lkey", F.col("legtextkey"))
    out = str(tmp_path / "export")
    import os as _os

    _os.makedirs(out, exist_ok=True)
    _pipe_text_export(df, "legendtext", emb, out)
    rt = load_full_export(spark, out, catalog=emb, tables=["legendtext"])[
        "legendtext"
    ]
    rows = {int(r["legtextkey"]): r for r in rt.collect()}
    assert {k: r["text"] for k, r in rows.items()} == vals
    # unspecified catalog columns land as NULL
    assert all(r["textcat"] is None for r in rows.values())
    assert len(rows) == 5
