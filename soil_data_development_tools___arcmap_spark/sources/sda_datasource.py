"""SDA tabular REST as a first-class Spark data source (Python
DataSource API, Spark 4): ``spark.read.format("sda")`` with one input
partition per 4-areasymbol batch — the reference's batching rule
(SSURGO_CheckgSSURGO.py:466-484) becomes the source's parallelism
unit, so a 3000-survey CONUS reconciliation fans out as ~750
independent partition reads instead of a driver-side loop.

The wire protocol (POST ``{"format","query"}`` → ``{"Table": ...}``)
and the count-reconciliation query shape live in ``sources.sda``; this
module only adds the DataSource plumbing. Because the container has no
network, the transport is pluggable via the ``fixture_dir`` option:
each partition then reads ``batch-<i>.json`` (a captured SDA response)
instead of POSTing — the partitioning, parsing, and row emission are
identical, which is exactly the seam the offline tests pin. Production
use omits ``fixture_dir`` and the partitions call ``sda.fetch`` from
the EXECUTORS (each batch an independent HTTP POST, retried by Spark's
task retry machinery rather than hand-rolled driver loops).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from .sda import batch_areasymbols, count_query, parse_sda_table


class SDABatchPartition(InputPartition):
    def __init__(self, index: int, areasymbols: list[str]):
        self.index = index
        self.areasymbols = areasymbols


class SDACountReader(DataSourceReader):
    """One count-reconciliation table read: emits (areasymbol, n)
    string rows (SDA's wire format is untyped text; cast downstream
    against the mdstat catalogs, like every other SDA consumer here).
    """

    def __init__(self, options: dict):
        self.table = options.get("table", "mapunit")
        syms = [
            s.strip()
            for s in options.get("areasymbols", "").split(",")
            if s.strip()
        ]
        if not syms:
            raise ValueError("sda source requires option 'areasymbols'")
        self.batches = batch_areasymbols(
            syms, int(options.get("batch_size", "4"))
        )
        self.fixture_dir = options.get("fixture_dir")

    def partitions(self) -> list[SDABatchPartition]:
        return [SDABatchPartition(i, b) for i, b in enumerate(self.batches)]

    def read(self, partition: SDABatchPartition) -> Iterator[tuple]:
        if self.fixture_dir:
            path = os.path.join(
                self.fixture_dir, f"batch-{partition.index}.json"
            )
            with open(path) as fh:
                doc = json.load(fh)
        else:  # pragma: no cover - needs network
            from .sda import fetch

            doc = fetch(count_query(self.table, partition.areasymbols))
        cols, rows = parse_sda_table(doc)
        for r in rows:
            yield tuple(None if v == "" else str(v) for v in r)


class SDADataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sda"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("areasymbol", StringType()),
                StructField("n", StringType()),
            ]
        )

    def reader(self, schema: StructType) -> SDACountReader:
        return SDACountReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session:
    ``spark.read.format("sda")`` afterwards."""
    spark.dataSource.register(SDADataSource)
