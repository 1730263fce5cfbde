"""SDA tabular REST as a Spark Python DataSource — offline tests over
captured-response fixtures (the network seam; SURVEY §2.1)."""

from __future__ import annotations

import json
import os

import pytest

from soil_data_development_tools___arcmap_spark.sources.sda_datasource import (
    SDACountReader,
    register,
)


def _fixtures(tmp_path, docs):
    for i, doc in enumerate(docs):
        with open(os.path.join(str(tmp_path), f"batch-{i}.json"), "w") as fh:
            json.dump(doc, fh)
    return str(tmp_path)


def _read(spark, d, syms, **opts):
    register(spark)
    r = (
        spark.read.format("sda")
        .option("areasymbols", syms)
        .option("fixture_dir", d)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_one_partition_per_batch(spark, tmp_path):
    d = _fixtures(
        tmp_path,
        [
            {"Table": [["areasymbol", "n"], ["A1", "5"], ["A2", "6"]]},
            {"Table": [["areasymbol", "n"], ["B1", "7"]]},
        ],
    )
    df = _read(spark, d, "A1,A2,A3,A4,B1")
    assert df.rdd.getNumPartitions() == 2
    assert sorted((r.areasymbol, r.n) for r in df.collect()) == [
        ("A1", "5"),
        ("A2", "6"),
        ("B1", "7"),
    ]


def test_empty_response_and_null_coercion(spark, tmp_path):
    d = _fixtures(
        tmp_path,
        [
            {"Table": []},  # zero-row batch is not an error
            {"Table": [["areasymbol", "n"], ["C1", ""]]},  # '' -> NULL
        ],
    )
    df = _read(spark, d, "A1,A2,A3,A4,C1")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].areasymbol == "C1" and rows[0].n is None


def test_custom_batch_size(spark, tmp_path):
    d = _fixtures(
        tmp_path,
        [{"Table": [["areasymbol", "n"], [s, "1"]]} for s in ("A", "B", "C")],
    )
    df = _read(spark, d, "A,B,C", batch_size="1")
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3


def test_missing_areasymbols_rejected():
    with pytest.raises(ValueError):
        SDACountReader({"table": "mapunit"})


def test_reader_batching_matches_reference_rule():
    r = SDACountReader({"areasymbols": ",".join(f"S{i}" for i in range(9))})
    assert [len(p.areasymbols) for p in r.partitions()] == [4, 4, 1]
