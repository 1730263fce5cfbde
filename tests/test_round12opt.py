"""Round-12 optimization: pinned equivalences for operator internals
that were restructured for performance (results must be bit-identical).

- the pipe-text export writer moved from a per-row csv.writerow loop
  over all 109 columns to a JVM-rendered concat_ws line (QUOTE_MINIMAL
  replicated as a Column) with only the final join + cp1252 encode in
  Python (guide §4.1) — byte-exactness pinned here;
- minhash signatures aggregate in the long domain (HashAggregate) and
  reconstruct the hex output — hex equivalence pinned against the
  independent row-wise formulation (array_min over hex strings).
"""

from __future__ import annotations

import csv
import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 (spark fixture)


NASTY_ROWS = [
    ["plain", "with|pipe", 'with"quote', "with\nnewline", "with\r\ncrlf", "", None],
    [None, "trailing ", " leading", "cp1252: é±", "semi;colon", "tab\there", "end"],
    ["nan", "NaN", "None", "null", '"', "|", 'a|b"c\nd'],
    ["", None, "0", "00042", "-1", "1.5", "ümlaut"],
]


def test_pipe_text_export_bytes_match_csv_writer(spark, tmp_path):
    """_pipe_text_export's JVM-rendered quoting (field quoted iff it
    contains | \" CR or LF, inner quotes doubled, CRLF line ends,
    blank for NULL, absent catalog columns blank) must emit
    byte-identical cp1252 output to the csv.writer formulation it
    replaced — on fields with embedded pipes, quotes, newlines, CRLFs
    and cp1252 non-ASCII."""
    from soil_data_development_tools___arcmap_spark.q_tools import (
        _pipe_text_export,
    )

    from pyspark.sql.types import StringType, StructField, StructType

    class _Cat:
        schemas = {
            "nasty": StructType(
                [StructField(f"c{i}", StringType()) for i in range(7)]
                # one column absent from the df -> constant blank field
                + [StructField("absent", StringType())]
            )
        }
        iefile = {"nasty": "nasty"}

    df = spark.createDataFrame(
        [tuple(r) for r in NASTY_ROWS],
        "c0 string, c1 string, c2 string, c3 string, c4 string, "
        "c5 string, c6 string",
    ).coalesce(1)
    _pipe_text_export(df, "nasty", _Cat, str(tmp_path))
    parts = sorted((tmp_path / "nasty.txt").glob("part-*.txt"))
    got = b"".join(p.read_bytes() for p in parts)

    buf = io.StringIO()
    w = csv.writer(
        buf, delimiter="|", quotechar='"', doublequote=True,
        quoting=csv.QUOTE_MINIMAL,
    )
    # collect back in the exporter's partition order (single partition,
    # original row order)
    for r in NASTY_ROWS:
        w.writerow(["" if v is None else v for v in r] + [""])
    want = buf.getvalue().encode("cp1252")
    assert got == want


def test_minhash_long_domain_matches_hex(spark):
    """minhash_signatures' long-domain aggregation (min over the hex
    substring parsed base-16, re-hexed as lower(lpad(hex(v), 8, '0')))
    must reproduce the historical hex-string mins exactly. The
    reference here is the independent row-wise formulation
    (rowwise_minhash: array_min over the hex substrings), which was
    NOT restructured."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        minhash_signatures,
        rowwise_minhash,
        rowwise_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c x y z w q"),
            (3, "lorem ipsum dolor sit amet lorem ipsum"),
            (4, "one two"),          # < k tokens: no shingles, no row
            (5, "t t t t t t t t"),  # degenerate repeats
        ],
        "doc_id long, text string",
    )
    got = minhash_signatures(docs, num_hashes=16).orderBy("did").collect()
    ref = (
        docs.select(
            F.col("doc_id").alias("did"),
            rowwise_shingles("text").alias("ss"),
        )
        .withColumns(
            {f"mh{i}": m for i, m in enumerate(rowwise_minhash(F.col("ss")))}
        )
        .where(F.col("mh0").isNotNull())
        .drop("ss")
        .orderBy("did")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
    # all hex, fixed width 8, lowercase
    for r in got:
        for i in range(16):
            v = r[f"mh{i}"]
            assert len(v) == 8 and v == v.lower()
            int(v, 16)


def test_minhash_as_long_roundtrip(spark):
    """as_long=True is the exact numeric preimage of the hex output."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c x y z w q")],
        "doc_id long, text string",
    )
    longs = minhash_signatures(docs, num_hashes=4, as_long=True)
    hexed = longs.select(
        "did",
        *[
            F.lower(F.lpad(F.hex(F.col(f"mh{i}")), 8, "0")).alias(f"mh{i}")
            for i in range(4)
        ],
    ).orderBy("did").collect()
    direct = minhash_signatures(docs, num_hashes=4).orderBy("did").collect()
    assert [tuple(r) for r in hexed] == [tuple(r) for r in direct]
