"""Skew-mitigation utilities for hot-key aggregations.

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one mukey holding 1% of a 100 TB fact
table) still funnels one partition. ``salted_agg`` is the standard
two-stage rewrite: shuffle once on (key, salt) — spreading the hot key
over ``salt`` partitions — then once more on the key over the tiny
partial aggregates. Only algebraic aggregates (sum/count/min/max)
decompose this way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: {out_col: (fn, in_col)} with fn in sum/count/min/max.
    count re-aggregates as sum of partial counts.
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def col1(fn: str, c: str) -> Column:
        return _partial[fn](F.col(c))

    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[col1(fn, c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[_merge[fn](F.col(out)).alias(out) for out, (fn, _) in aggs.items()]
    )
