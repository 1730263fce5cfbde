"""PySpark-native analytics engine with the query/data-processing
capabilities of USDA-NRCS/Soil-Data-Development-Tools---ArcMap.

The reference is an ArcPy ETL + metadata-driven aggregation toolbox over
SSURGO (see /root/reference, SURVEY.md). This package re-expresses its
semantics Spark-first:

- ``sources``   : ingest (pipe-delimited SSURGO text, parquet test tables)
- ``operators`` : the SDV aggregation engine (DCP/DCD/WTA/... as
                  window/groupBy pipelines), generic over any
                  parent->child->grandchild hierarchy
- ``plans``     : the rating planner (relationship walk, where-clause
                  mini-parser, tiebreak/domain resolution)
- ``valu1``     : the Valu1 derived-table pipeline (AWS/SOC/NCCPI/PWSL)
- ``functions`` : scalar helpers + LLM-data-pipeline operators
                  (dedup, similarity search, text analysis)
- ``streaming`` : Structured Streaming ingestion of the events table
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
