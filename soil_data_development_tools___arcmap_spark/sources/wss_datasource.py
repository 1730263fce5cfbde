"""WSS survey acquisition as a Spark data source (Python DataSource
API): ``spark.read.format("wss")`` with ONE input partition per survey
area — the reference's serial per-areasymbol download loop
(SSURGO_BatchDownload.py:694-792 ProcessSurvey) becomes an
executor-parallel fetch fleet, with Spark task retry replacing the
hand-rolled driver retry.

Each partition (1) resolves the public-cache zip name from the
areasymbol + catalog survey date (``wss.wss_zip_name``), (2) acquires
the zip — via HTTP in production, or by copying from the ``fixture_dir``
staging directory in this network-less container (the transport is the
ONLY seam that differs), (3) extracts it with the naming-convention
handling of ``wss.unzip_download``, and (4) emits one audit row:
(areasymbol, surveydate, status, tabular_date, n_files). ``output_dir``
must be a shared filesystem in production (each task extracts its own
survey folder; no two partitions touch the same folder).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .wss import tabular_date, unzip_download, wss_zip_name, wss_zip_url


class WSSPartition(InputPartition):
    def __init__(self, areasym: str, surveydate: int):
        self.areasym = areasym
        self.surveydate = surveydate


class WSSReader(DataSourceReader):
    def __init__(self, options: dict):
        syms = [
            s.strip()
            for s in options.get("areasymbols", "").split(",")
            if s.strip()
        ]
        dates = [
            int(d)
            for d in options.get("surveydates", "").split(",")
            if d.strip()
        ]
        if not syms or len(syms) != len(dates):
            raise ValueError(
                "wss source requires aligned 'areasymbols' and 'surveydates'"
            )
        self.pairs = list(zip(syms, dates))
        self.output_dir = options.get("output_dir")
        if not self.output_dir:
            raise ValueError("wss source requires option 'output_dir'")
        self.fixture_dir = options.get("fixture_dir")

    def partitions(self) -> list[WSSPartition]:
        return [WSSPartition(s, d) for s, d in self.pairs]

    def read(self, partition: WSSPartition) -> Iterator[tuple]:
        sym, date = partition.areasym, partition.surveydate
        name = wss_zip_name(sym, date)
        zip_path = os.path.join(self.output_dir, name)
        os.makedirs(self.output_dir, exist_ok=True)
        if self.fixture_dir:
            src = os.path.join(self.fixture_dir, name)
            if not os.path.isfile(src):
                yield (sym, date, "missing", 0, 0)
                return
            shutil.copyfile(src, zip_path)
        else:  # pragma: no cover - needs network
            import urllib.request

            with urllib.request.urlopen(
                wss_zip_url(sym, date), timeout=300
            ) as r, open(zip_path, "wb") as fh:
                shutil.copyfileobj(r, fh)
        folder = os.path.join(self.output_dir, sym.upper())
        ok = unzip_download(zip_path, self.output_dir, sym, folder)
        if not ok:
            yield (sym, date, "badzip", 0, 0)
            return
        n_files = sum(len(fs) for _, _, fs in os.walk(folder))
        yield (sym, date, "ok", tabular_date(folder), n_files)


class WSSDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wss"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("areasymbol", StringType()),
                StructField("surveydate", LongType()),
                StructField("status", StringType()),
                StructField("tabular_date", LongType()),
                StructField("n_files", IntegerType()),
            ]
        )

    def reader(self, schema: StructType) -> WSSReader:
        return WSSReader(self.options)


def register(spark) -> None:
    """Idempotently register: ``spark.read.format("wss")`` afterwards."""
    spark.dataSource.register(WSSDataSource)
