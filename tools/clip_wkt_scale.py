"""Scale harness for the round-12 clipped-geometry WKT queries
(clip_concave_diagonal_aoi_wkt — convex-band dissolve;
clip_concave_subject_wkt — bridge-split MULTIPOLYGON output).

Same replicated-customer discipline as tools/raster_scale.py: the
sf0.1 customer keys replicate FACTOR× with salted offsets (subject
geometry and window vary per replica — the per-key case-mix of the
closed-form oracle stays constant as the layer grows), written to a
temp parquet dir so the REAL registry query functions run unmodified
against it. Measures steady best-of-2 rows/s through the full parse →
SH clip → dissolve/split → normalize → serialize pipeline, forced by
the noop sink. Expectation from the plan class (zero-exchange
map-only, PLANS_AUDIT.md): the same 60k–140k rows/s band as the
certified round-10/11 WKT clip family.

Usage: python tools/clip_wkt_scale.py [factor ...]   (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from soil_data_development_tools___arcmap_spark import get_spark  # noqa: E402
from soil_data_development_tools___arcmap_spark import queries as Q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "clip_concave_diagonal_aoi_wkt",
    "clip_concave_subject_wkt",
    "clip_concave_multipart_wkt",
]


def replicated_dir(spark, factor: int) -> str:
    """customer.parquet replicated factor× with salted keys, in a temp
    dir the query functions can treat as an sf_dir. Repartitioned so
    the map-only plans parallelize (the sf0.1 parquet is one split)."""
    out = tempfile.mkdtemp(prefix=f"sddt_clipwkt_{factor}x_")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey"
    )
    reps = cust.select(
        "c_custkey",
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"),
    )
    (
        reps.select(
            (F.col("c_custkey") * factor + F.col("rep")).alias("c_custkey")
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("clip-wkt-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    for factor in factors:
        d = replicated_dir(spark, factor)
        n = base * factor
        row = {"factor": factor, "rows": n}
        for name in QUERIES:
            fn = getattr(Q, name)
            fn(spark, d).write.mode("overwrite").format("noop").save()
            best = None
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.time()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[name] = {
                "sec": round(best, 3),
                "rows_per_sec": int(n / best),
            }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
