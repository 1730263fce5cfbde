"""WSS acquisition as a Spark DataSource — offline fixture-transport
tests (the download fleet; SSURGO_BatchDownload ProcessSurvey)."""

from __future__ import annotations

import io
import os
import zipfile

import pytest

from soil_data_development_tools___arcmap_spark.sources.wss import wss_zip_name
from soil_data_development_tools___arcmap_spark.sources.wss_datasource import (
    WSSReader,
    register,
)


def _zip_fixture(d, sym, date, rec='"S"|"n"|"2"|"03/15/2021 08:00:00"\n'):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(f"{sym}/tabular/sacatlog.txt", rec)
    with open(os.path.join(str(d), wss_zip_name(sym, date)), "wb") as fh:
        fh.write(buf.getvalue())


def test_parallel_acquire_and_version_parse(spark, tmp_path):
    fx = tmp_path / "fx"
    out = tmp_path / "out"
    fx.mkdir()
    _zip_fixture(fx, "NE109", 20210401)
    _zip_fixture(fx, "IA021", 20210402)
    register(spark)
    df = (
        spark.read.format("wss")
        .option("areasymbols", "NE109,IA021")
        .option("surveydates", "20210401,20210402")
        .option("output_dir", str(out))
        .option("fixture_dir", str(fx))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r.areasymbol: r for r in df.collect()}
    assert rows["NE109"].status == "ok"
    assert rows["NE109"].tabular_date == 20210315
    assert rows["NE109"].n_files == 1
    # the survey folders were actually extracted
    assert (out / "NE109" / "tabular" / "sacatlog.txt").exists()
    assert (out / "IA021" / "tabular" / "sacatlog.txt").exists()


def test_missing_zip_reports_not_fails(spark, tmp_path):
    fx = tmp_path / "fx"
    out = tmp_path / "out"
    fx.mkdir()
    register(spark)
    df = (
        spark.read.format("wss")
        .option("areasymbols", "XX000")
        .option("surveydates", "20210401")
        .option("output_dir", str(out))
        .option("fixture_dir", str(fx))
        .load()
    )
    r = df.collect()[0]
    assert (r.status, r.tabular_date, r.n_files) == ("missing", 0, 0)


def test_misaligned_options_rejected():
    with pytest.raises(ValueError):
        WSSReader(
            {
                "areasymbols": "A,B",
                "surveydates": "20210101",
                "output_dir": "/tmp/x",
            }
        )
    with pytest.raises(ValueError):
        WSSReader({"areasymbols": "A", "surveydates": "20210101"})
