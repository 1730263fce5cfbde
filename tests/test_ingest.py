"""Pipe-delimited SSURGO text ingest tests: blank→NULL, quoting,
cointerp prune, sdv dedup, multi-survey merge."""

from __future__ import annotations

import os

from soil_data_development_tools___arcmap_spark.sources.ssurgo_text import (
    merge_surveys,
    read_ssurgo_table,
)


def write(tmp_path, name, lines):
    p = os.path.join(tmp_path, name)
    with open(p, "w", encoding="cp1252") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_blank_to_null_and_quotes(spark, tmp_path):
    p = write(
        str(tmp_path),
        "mapunit.txt",
        [
            'mu1|Aa|"Alpha loam, 0 to 2% slopes"|l1|Prime',
            "mu2|Bb||l1|",  # blank muname + farmlndcl -> NULL
        ],
    )
    df = read_ssurgo_table(spark, p, "mapunit")
    rows = {r["mukey"]: r for r in df.collect()}
    assert rows["mu1"]["muname"] == "Alpha loam, 0 to 2% slopes"
    assert rows["mu2"]["muname"] is None
    assert rows["mu2"]["farmlndcl"] is None


def test_cointerp_prune(spark, tmp_path):
    p = write(
        str(tmp_path),
        "cinterp.txt",
        [
            "i1|c1|r1|Rule One|r1|Rule One|0|0.5|Well suited",
            "i2|c1|r1|Rule One|r11|Sub Rule|1|0.4|Limited",  # pruned
            "i3|c1|54955|NCCPI|n1|NCCPI Corn|1|0.8|High",  # kept (NCCPI)
        ],
    )
    df = read_ssurgo_table(spark, p, "cointerp")
    keys = {r["cointerpkey"] for r in df.collect()}
    assert keys == {"i1", "i3"}


def test_sdv_dedup_and_merge(spark, tmp_path):
    row = (
        "1|Attr|component|col_r|float|float|2|Property|Weighted Average|"
        "|1|0|1|0|0||-1|Lower|Higher|Not rated||0||attr|"
    )
    p1 = write(str(tmp_path), "s1.txt", [row])
    p2 = write(str(tmp_path), "s2.txt", [row])
    d1 = read_ssurgo_table(spark, p1, "sdvattribute")
    d2 = read_ssurgo_table(spark, p2, "sdvattribute")
    merged = merge_surveys([d1, d2], pk=["attributekey"])
    assert merged.count() == 1  # identical catalog row per survey dedupes
