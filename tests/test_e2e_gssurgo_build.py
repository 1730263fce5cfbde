"""End-to-end gSSURGO-build lifecycle (SURVEY §3.3): per-survey
shapefiles + a full-catalog tabular export → metadata-generated ingest
→ spatial⨝mapunit attribute join → hive-partitioned parquet, read back
with partition pruning — the ETL entry point composed from the real
pieces instead of tested in isolation."""

from __future__ import annotations

import csv
import os

from soil_data_development_tools___arcmap_spark.catalog import (
    embedded_catalog,
    load_full_export,
)
from soil_data_development_tools___arcmap_spark.sources.shapefile import (
    read_shapefiles,
    write_shapefile,
)
from soil_data_development_tools___arcmap_spark.sources.sinks import (
    write_partitioned,
)

SURVEYS = {
    "IA001": [("100", "M1"), ("101", "M2")],
    "NE137": [("200", "N1")],
}


def _write_txt(path, table, named_rows):
    cols = [f.name for f in embedded_catalog().schemas[table].fields]
    with open(path, "w", encoding="cp1252", newline="") as fh:
        w = csv.writer(fh, delimiter="|", quotechar='"', doublequote=True,
                       quoting=csv.QUOTE_MINIMAL)
        for r in named_rows:
            w.writerow(["" if r.get(c) is None else str(r[c]) for c in cols])


def test_gssurgo_build_compose(spark, tmp_path):
    from pyspark.sql import functions as F

    d = str(tmp_path)
    # tabular half: legend + mapunit through the metadata-generated
    # full catalog (24-column mapunit layout, not the pruned one)
    _write_txt(
        os.path.join(d, "legend.txt"), "legend",
        [{"lkey": str(i), "areasymbol": sym}
         for i, sym in enumerate(SURVEYS)],
    )
    _write_txt(
        os.path.join(d, "mapunit.txt"), "mapunit",
        [{"mukey": mk, "musym": ms, "muname": f"Unit {ms}", "lkey": str(i)}
         for i, (sym, mus) in enumerate(SURVEYS.items())
         for mk, ms in mus],
    )
    tables = load_full_export(spark, d, tables=["legend", "mapunit"])
    assert list(tables) == ["legend", "mapunit"]  # FK order

    # spatial half: one shapefile per survey, polygons keyed by mukey
    paths = []
    fields = [("AREASYMBOL", 20), ("MUSYM", 6), ("MUKEY", 30)]
    for j, (sym, mus) in enumerate(SURVEYS.items()):
        stem = os.path.join(d, f"soilmu_a_{sym.lower()}")
        write_shapefile(
            stem, fields,
            [[sym, ms, mk] for mk, ms in mus],
            [[(j * 50.0 + i, 0.0), (j * 50.0 + i + 4, 0.0),
              (j * 50.0 + i + 4, 3.0), (j * 50.0 + i, 3.0)]
             for i, _ in enumerate(mus)],
        )
        paths.append(stem + ".shp")
    spatial = read_shapefiles(spark, paths)

    # attribute join (the reference's featureclass carries muname via
    # the mapunit relationship class) + partitioned landing
    joined = spatial.join(
        tables["mapunit"].select("mukey", "muname"), "mukey"
    )
    out_dir = os.path.join(d, "landed")
    write_partitioned(joined, out_dir, ["areasymbol"], sort_by=["mukey"])

    # partition-pruned read-back: one survey's directory only
    back = spark.read.parquet(out_dir).where(F.col("areasymbol") == "IA001")
    rows = back.collect()
    assert {r["mukey"] for r in rows} == {"100", "101"}
    assert all(r["muname"].startswith("Unit ") for r in rows)
    assert all(r["wkt"].startswith("POLYGON") for r in rows)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(areasymbol" in plan
    # the pruned scan reads ONE of the two survey partitions
    assert os.path.isdir(os.path.join(out_dir, "areasymbol=IA001"))
    assert os.path.isdir(os.path.join(out_dir, "areasymbol=NE137"))
