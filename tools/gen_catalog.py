"""Generate the embedded SSURGO data-model metadata module.

Derives ``soil_data_development_tools___arcmap_spark/ssurgo_metadata.py``
from an ESRI workspace-document XML that carries the full SSURGO table
inventory (the reference ships several; the canonical one is
``gSSURGO_CONUS_5070.xml`` — 69 tabular datasets with every column's
name/type/size). The emitted module holds the PUBLIC USDA SSURGO data
model as mdstat*-shaped ROWS — the same shape a real WSS export's
``mstab.txt`` / ``mstabcol.txt`` / ``msrsdet.txt`` files carry — so the
runtime catalog builder (``catalog.py``) consumes embedded and
export-shipped metadata through one code path.

What is derived vs declared here:

- column inventory (name, order, esri type, length): parsed from the XML
  field definitions verbatim (OBJECTID bookkeeping fields dropped);
- logicaldatatype/fieldsize: esri physical type mapped onto the
  mdstattabcols vocabulary (String n; Integer 2/4; Float 4/8;
  Date/Time; Narrative Text for 2GB memos);
- iefilename (text-file base name per table): the SSURGO export naming,
  i.e. the reference's FK-ordered import list
  (SSURGO_Convert_to_Geodatabase.py:1227-1234) joined to its table
  names (GetTableInfo reads the same mapping from mdstattabs:656-708);
- primary keys: SSURGO convention — the table's trailing ``...key``
  column — with declared overrides for the sdv*/mdstat*/month tables
  whose keys are not last-positioned;
- FK edges (mdstatrshipdet-shaped): a column carrying another table's
  single-column primary-key NAME references that table (ownership
  collisions like muaggatt.mukey resolved to the canonical hierarchy
  parent).

Usage: python tools/gen_catalog.py [workspace.xml] [out.py]
"""

from __future__ import annotations

import sys
import xml.etree.ElementTree as ET

DEFAULT_XML = "/root/reference/gSSURGO_CONUS_5070.xml"
DEFAULT_OUT = (
    "soil_data_development_tools___arcmap_spark/ssurgo_metadata.py"
)

# SSURGO export text-file base name per table: the reference's ordered
# import list (SSURGO_Convert_to_Geodatabase.py:1227-1234) states the
# file names; mdstattabs.iefilename pairs them with physical table
# names (same pairing is in the WSS export's own mstab.txt).
IEFILENAME = {
    "distmd": "distmd",
    "legend": "legend",
    "distinterpmd": "distimd",
    "distlegendmd": "distlmd",
    "laoverlap": "lareao",
    "legendtext": "ltext",
    "mapunit": "mapunit",
    "component": "comp",
    "muaggatt": "muaggatt",
    "muaoverlap": "muareao",
    "mucropyld": "mucrpyd",
    "mutext": "mutext",
    "chorizon": "chorizon",
    "cocanopycover": "ccancov",
    "cocropyld": "ccrpyd",
    "codiagfeatures": "cdfeat",
    "coecoclass": "cecoclas",
    "coeplants": "ceplants",
    "coerosionacc": "cerosnac",
    "coforprod": "cfprod",
    "cogeomordesc": "cgeomord",
    "cohydriccriteria": "chydcrit",
    "cointerp": "cinterp",
    "comonth": "cmonth",
    "copmgrp": "cpmatgrp",
    "copwindbreak": "cpwndbrk",
    "corestrictions": "crstrcts",
    "cosurffrags": "csfrags",
    "cotaxfmmin": "ctxfmmin",
    "cotaxmoistcl": "ctxmoicl",
    "cotext": "ctext",
    "cotreestomng": "ctreestm",
    "cotxfmother": "ctxfmoth",
    "chaashto": "chaashto",
    "chconsistence": "chconsis",
    "chdesgnsuffix": "chdsuffx",
    "chfrags": "chfrags",
    "chpores": "chpores",
    "chstructgrp": "chstrgrp",
    "chtext": "chtext",
    "chtexturegrp": "chtexgrp",
    "chunified": "chunifie",
    "coforprodo": "cfprodo",
    "copm": "cpmat",
    "cosoilmoist": "csmoist",
    "cosoiltemp": "cstemp",
    "cosurfmorphgc": "csmorgc",
    "cosurfmorphhpp": "csmorhpp",
    "cosurfmorphmr": "csmormr",
    "cosurfmorphss": "csmorss",
    "chstruct": "chstr",
    "chtexture": "chtextur",
    "chtexturemod": "chtexmod",
    "sacatalog": "sacatlog",
    "sainterp": "sainterp",
    "sdvalgorithm": "sdvalgorithm",
    "sdvattribute": "sdvattribute",
    "sdvfolder": "sdvfolder",
    "sdvfolderattribute": "sdvfolderattribute",
    "featdesc": "featdesc",
    "mdstattabcols": "mstabcol",
    "mdstatrshipdet": "msrsdet",
    "mdstattabs": "mstab",
    "mdstatrshipmas": "msrsmas",
    "mdstatdommas": "msdommas",
    "mdstatidxmas": "msidxmas",
    "mdstatidxdet": "msidxdet",
    "mdstatdomdet": "msdomdet",
    "month": None,  # static lookup, not shipped in exports
}

# Primary keys that are NOT the table's trailing "...key" column.
PK_OVERRIDES = {
    "month": ["monthseq"],
    "muaggatt": ["mukey"],
    "sdvattribute": ["attributekey"],
    "sdvfolder": ["folderkey"],
    "sdvfolderattribute": ["folderkey", "attributekey"],
    "sdvalgorithm": ["algorithmsequence"],
    "mdstattabs": ["tabphyname"],
    "mdstattabcols": ["tabphyname", "colphyname"],
    "mdstatrshipmas": ["ltabphyname", "rtabphyname", "relationshipname"],
    "mdstatrshipdet": ["ltabphyname", "rtabphyname", "relationshipname"],
    "mdstatdommas": ["domainname"],
    "mdstatdomdet": ["domainname", "choicesequence"],
    "mdstatidxmas": ["tabphyname", "idxphyname"],
    "mdstatidxdet": ["tabphyname", "idxphyname", "idxcolsequence"],
}

# When one key NAME is the single-column PK of several tables
# (muaggatt is 1:1 with mapunit on mukey), the FK target is the
# canonical hierarchy parent.
PK_OWNER_PREFERENCE = {
    "mukey": "mapunit",
    "lkey": "legend",
    "cokey": "component",
    "chkey": "chorizon",
    "attributekey": "sdvattribute",
    "folderkey": "sdvfolder",
}

ESRI_TO_LOGICAL = {
    "esriFieldTypeString": "String",
    "esriFieldTypeSmallInteger": ("Integer", 2),
    "esriFieldTypeInteger": ("Integer", 4),
    "esriFieldTypeSingle": ("Float", 4),
    "esriFieldTypeDouble": ("Float", 8),
    "esriFieldTypeDate": ("Date/Time", None),
}

MEMO_LEN = 2147483647


def strip(tag: str) -> str:
    return tag.split("}")[-1]


def parse_tables(xml_path: str) -> dict[str, list[tuple]]:
    """{table: [(colphyname, logicaldatatype, fieldsize), ...]} in
    declared column order, esri bookkeeping fields dropped."""
    root = ET.parse(xml_path).getroot()
    tables: dict[str, list[tuple]] = {}
    for de in root.iter():
        if strip(de.tag) != "DataElement":
            continue
        name = dstype = None
        for ch in de:
            tag = strip(ch.tag)
            if tag == "Name":
                name = ch.text
            elif tag == "DatasetType":
                dstype = ch.text
        if dstype != "esriDTTable" or name is None:
            continue
        cols = []
        for fa in de.iter():
            if strip(fa.tag) != "FieldArray":
                continue
            for f in fa:
                d = {strip(p.tag): p.text for p in f}
                if d.get("Type") == "esriFieldTypeOID":
                    continue
                if (d.get("Name") or "").upper() in ("OBJECTID", "FDO_OBJECTID"):
                    continue
                et = d.get("Type")
                if et == "esriFieldTypeString":
                    n = int(d.get("Length") or 0)
                    if n >= MEMO_LEN:
                        cols.append((d["Name"], "Narrative Text", None))
                    else:
                        cols.append((d["Name"], "String", n))
                else:
                    lt, size = ESRI_TO_LOGICAL[et]
                    cols.append((d["Name"], lt, size))
            break
        tables[name] = cols
    return tables


def derive_pks(tables: dict[str, list[tuple]]) -> dict[str, list[str]]:
    pks = {}
    for t, cols in tables.items():
        if t in PK_OVERRIDES:
            pks[t] = PK_OVERRIDES[t]
        elif cols and cols[-1][0].endswith("key"):
            pks[t] = [cols[-1][0]]
        else:
            raise SystemExit(f"no PK rule for table {t}: {cols[-1]}")
    return pks


def derive_fk_edges(
    tables: dict[str, list[tuple]], pks: dict[str, list[str]]
) -> list[tuple]:
    """mdstatrshipdet-shaped rows (ltab, rtab, relname, lcol, rcol)."""
    owner: dict[str, str] = {}
    for t, pk in pks.items():
        if len(pk) != 1:
            continue
        k = pk[0]
        if k in PK_OWNER_PREFERENCE:
            owner[k] = PK_OWNER_PREFERENCE[k]
        elif k in owner:
            raise SystemExit(f"ambiguous PK name {k}: {owner[k]} vs {t}")
        else:
            owner[k] = t
    edges = []
    for t, cols in tables.items():
        for c, _lt, _sz in cols:
            parent = owner.get(c)
            if parent and parent != t:
                edges.append((parent, t, f"x{parent}_{t}", c, c))
    return sorted(edges)


def emit(tables, pks, edges, out_path: str) -> None:
    lines = [
        '"""GENERATED by tools/gen_catalog.py — do not hand-edit.',
        "",
        "Embedded SSURGO data model (public USDA soil-survey schema) as",
        "mdstat*-shaped rows; see the generator docstring for the",
        "derivation rules and the reference citations. Regenerate with:",
        "    python tools/gen_catalog.py <workspace.xml>",
        '"""',
        "",
        "# (tabphyname, colsequence, colphyname, logicaldatatype, fieldsize)",
        "MDSTATTABCOLS = [",
    ]
    for t in sorted(tables):
        for i, (c, lt, sz) in enumerate(tables[t], start=1):
            lines.append(f"    ({t!r}, {i}, {c!r}, {lt!r}, {sz!r}),")
    lines.append("]")
    lines.append("")
    lines.append("# (tabphyname, iefilename) — None: not shipped in exports")
    lines.append("MDSTATTABS = [")
    for t in sorted(tables):
        if t not in IEFILENAME:
            raise SystemExit(f"no iefilename mapping for {t}")
        lines.append(f"    ({t!r}, {IEFILENAME[t]!r}),")
    lines.append("]")
    lines.append("")
    lines.append("PRIMARY_KEYS = {")
    for t in sorted(pks):
        lines.append(f"    {t!r}: {pks[t]!r},")
    lines.append("}")
    lines.append("")
    lines.append(
        "# (ltabphyname, rtabphyname, relationshipname, ltabcolphyname,"
        " rtabcolphyname)"
    )
    lines.append("MDSTATRSHIPDET = [")
    for e in edges:
        lines.append(f"    {e!r},")
    lines.append("]")
    lines.append("")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
    print(
        f"wrote {out_path}: {len(tables)} tables, "
        f"{sum(len(c) for c in tables.values())} columns, {len(edges)} FK edges"
    )


def main() -> None:
    xml_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_XML
    out_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    tables = parse_tables(xml_path)
    pks = derive_pks(tables)
    emit(tables, pks, derive_fk_edges(tables, pks), out_path)


if __name__ == "__main__":
    main()
