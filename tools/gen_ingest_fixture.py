"""Generate the committed real-layout SSURGO tabular-export fixture
(tests/fixtures/ssurgo_export/tabular/).

The r6 ``ingest_full_catalog`` round-trip synthesizes its export from
the engine's own (pruned) layouts, so it can never catch raw-format
quirks; this fixture pins them the way a genuine WSS download does —
built strictly from the PUBLIC format facts the reference encodes
(SSURGO_Convert_to_Geodatabase.py): pipe-delimited, QUOTE_MINIMAL with
doubled quotes, cp1252 bytes (0x92 curly apostrophe, 0xB0 degree),
CRLF record terminators, quoted MULTILINE narrative fields with
embedded CRLFs, blank -> NULL, per-table iefile names (comp.txt,
cinterp.txt, ...), and — the one that found a real bug — the RAW
19-column cinterp.txt layout of which the importer keeps positions
[0:7]+[11:13]+[15:19] (:1334-1348) plus the ruledepth==0 / NCCPI
54955 row filter.

Values are public-style SSURGO content (a Nebraska-style survey area,
Moody/Nora/Crofton series names) with deterministic keys; column
layouts come from the embedded metadata catalog so the fixture always
matches the data model. Regenerate with:

    python tools/gen_ingest_fixture.py
"""

from __future__ import annotations

import csv
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ssurgo_export", "tabular",
)

#: raw cinterp.txt column order (19 fields; the engine keeps 13)
COINTERP_RAW = [
    "cokey", "mrulekey", "mrulename", "seqnum", "rulekey", "rulename",
    "ruledepth", "interpll", "interpllc", "interplr", "interplrc",
    "interphr", "interphrc", "interphh", "interphhc",
    "nullpropdatabool", "defpropdatabool", "incpropdatabool",
    "cointerpkey",
]


def _rows_by_name(cols: list[str], dicts: list[dict]) -> list[list]:
    out = []
    for d in dicts:
        unknown = set(d) - set(cols)
        if unknown:
            raise KeyError(f"not in layout: {sorted(unknown)}")
        out.append([d.get(c, "") for c in cols])
    return out


def _write(name: str, rows: list[list]) -> None:
    buf = io.StringIO()
    w = csv.writer(
        buf, delimiter="|", quotechar='"', doublequote=True,
        quoting=csv.QUOTE_MINIMAL, lineterminator="\r\n",
    )
    w.writerows(rows)
    with open(os.path.join(OUT, f"{name}.txt"), "wb") as fh:
        fh.write(buf.getvalue().encode("cp1252"))


def main() -> None:
    from soil_data_development_tools___arcmap_spark.catalog import (
        embedded_catalog,
    )

    os.makedirs(OUT, exist_ok=True)
    cat = embedded_catalog()

    def cols(t):
        return [f.name for f in cat.schemas[t].fields]

    _write(cat.iefile["sacatalog"], _rows_by_name(cols("sacatalog"), [
        {"areasymbol": "NE109", "areaname": "Madison County, Nebraska",
         "saversion": "22", "tabularversion": "5",
         "sacatalogkey": "10109"},
    ]))

    _write(cat.iefile["legend"], _rows_by_name(cols("legend"), [
        {"areasymbol": "NE109", "areaname": "Madison County, Nebraska",
         "areatypename": "Non-MLRA Soil Survey Area",
         "legenddesc": "Detailed soil map legend",
         "ssastatus": "Published", "lkey": "16000"},
    ]))

    _write(cat.iefile["mapunit"], _rows_by_name(cols("mapunit"), [
        {"musym": "8107", "muname":
            "Moody silty clay loam, 2 to 6 percent slopes",
         "mukind": "Consociation", "mustatus": "Correlated",
         "muacres": "12450", "lkey": "16000", "mukey": "2500001"},
        {"musym": "8220", "muname":
            "Nora-Crofton complex, 6 to 11 percent slopes",
         "mukind": "Complex", "muacres": "8320",
         "lkey": "16000", "mukey": "2500002"},
        # quoted field: embedded pipe AND doubled quotes
        {"musym": "W", "muname": 'Water, "open" | intermittent',
         "mukind": "Miscellaneous area", "muacres": "310",
         "lkey": "16000", "mukey": "2500003"},
        # mustatus blank -> NULL on load
        {"musym": "8999", "muname": "Pits, quarry", "mukind":
            "Miscellaneous area", "muacres": "45", "lkey": "16000",
         "mukey": "2500004"},
    ]))

    comp = []
    series = [
        ("Moody", "85", "2500001", "35000001", "Yes", "Well drained"),
        ("Trent", "10", "2500001", "35000002", "No", "Moderately well drained"),
        ("Nora", "55", "2500002", "35000003", "Yes", "Well drained"),
        ("Crofton", "35", "2500002", "35000004", "Yes", "Well drained"),
        ("Alcester", "5", "2500002", "35000005", "No", ""),
        ("Water", "100", "2500003", "35000006", "Yes", ""),
        ("Pits", "", "2500004", "35000007", "Yes", ""),  # blank comppct
    ]
    for name, pct, mukey, cokey, maj, drain in series:
        comp.append({
            "compname": name, "comppct_r": pct, "majcompflag": maj,
            "compkind": ("Series" if name not in ("Water", "Pits")
                         else "Miscellaneous area"),
            "drainagecl": drain, "taxorder":
                "Mollisols" if name in ("Moody", "Trent", "Nora") else "",
            "mukey": mukey, "cokey": cokey,
        })
    _write(cat.iefile["component"], _rows_by_name(cols("component"), comp))

    hz = []
    for i, (cokey, layers) in enumerate([
        ("35000001", [("Ap", 0, 23, "30"), ("Bw", 23, 79, "28"),
                      ("C", 79, 200, "")]),
        ("35000003", [("Ap", 0, 18, "26"), ("Bw", 18, 64, "24")]),
        ("35000004", [("Ap", 0, 15, "22"), ("C", 15, 200, "18")]),
    ]):
        for j, (desgn, top, bot, clay) in enumerate(layers):
            hz.append({
                "hzname": desgn, "desgnmaster": desgn[0],
                "hzdept_r": str(top), "hzdepb_r": str(bot),
                "claytotal_r": clay,
                "cokey": cokey, "chkey": f"450000{i}{j}",
            })
    _write(cat.iefile["chorizon"], _rows_by_name(cols("chorizon"), hz))

    # RAW 19-column cinterp.txt: ruledepth>0 sub-rules must be pruned
    # (except the NCCPI 54955 submodel), and interphr/interphrc sit at
    # positions 11-12 with interpll..interplrc (7-10) in between — a
    # 13-column read would mis-seat them.
    ci = []
    def ci_row(cokey, mrulekey, mrulename, seq, rulekey, rulename, depth,
               hr, hrc, key):
        return {
            "cokey": cokey, "mrulekey": mrulekey, "mrulename": mrulename,
            "seqnum": seq, "rulekey": rulekey, "rulename": rulename,
            "ruledepth": str(depth),
            "interpll": "0.2" if depth else "0.1",
            "interpllc": "Not limited",
            "interplr": "0.5" if depth else "0.4",
            "interplrc": "Somewhat limited",
            "interphr": hr, "interphrc": hrc,
            "interphh": "1.0", "interphhc": "Very limited",
            "cointerpkey": key,
        }
    for cokey in ("35000001", "35000003"):
        k = cokey[-1]
        ci.append(ci_row(cokey, "54967", "ENG - Dwellings With Basements",
                         "", "54967", "ENG - Dwellings With Basements", 0,
                         "0.85", "Somewhat limited", f"9{k}001"))
        ci.append(ci_row(cokey, "54967", "ENG - Dwellings With Basements",
                         "0", "38674", "Shrink-swell", 1,
                         "0.85", "Somewhat limited", f"9{k}002"))
        ci.append(ci_row(cokey, "54967", "ENG - Dwellings With Basements",
                         "1", "38675", "Depth to saturated zone", 2,
                         "0.30", "Not limited", f"9{k}003"))
        ci.append(ci_row(cokey, "54955",
                         "NCCPI - National Commodity Crop Productivity Index (Ver 3.0)",
                         "0", "54996", "NCCPI - NCCPI Corn and Soybeans Submodel (II)",
                         1, "0.72", "Moderately high", f"9{k}004"))
    _write(cat.iefile["cointerp"], _rows_by_name(COINTERP_RAW, ci))

    _write(cat.iefile["mutext"], _rows_by_name(cols("mutext"), [
        {"recdate": "", "mapunittextkind": "Miscellaneous notes",
         "textcat": "AGRON", "text":
            "The Moody series formed in loess on uplands.\r\n"
            "Slopes are 2 to 6 percent; mean annual temperature is "
            "about 10°C.\r\nIt’s suited to corn and soybeans.",
         "mukey": "2500001", "mutextkey": "77001"},
        {"textcat": "ENG", "text": "Seasonal high water table.",
         "mukey": "2500002", "mutextkey": "77002"},
        {"textcat": "GEN", "text": "",  # blank narrative -> NULL
         "mukey": "2500003", "mutextkey": "77003"},
    ]))
    print(f"fixture written to {OUT}")


if __name__ == "__main__":
    main()
