"""Deduplication operators: exact (hash-groupBy), n-gram Jaccard,
MinHash+LSH (shingle → minhash → band → bucket-join), SimHash.

Scale design (the point of these at 100 TB):

- exact dedup is one shuffle on the content hash;
- n-gram Jaccard NEVER compares all pairs — candidate generation is an
  equi-join on a blocking key (shared shingle, or an LSH band bucket),
  so cost follows the true near-dup density, not n²;
- frequency capping drops ultra-common shingles before the self-join
  (a stop-shingle appearing in k docs would alone create k² candidate
  rows — classic skew);
- the MinHash family here uses md5-derived hash functions so the
  DuckDB oracle can reproduce signatures bit-for-bit (xxhash64 would
  be faster; the hash function is pluggable at the `_mh_col` seam).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Exact duplicate groups: (content md5, representative id, count).
    One hash-shuffle; the representative is min(id) for determinism."""
    return (
        df.select(F.md5(F.col(col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n"))
    )


def shingles(col: str = "text", k: int = 3) -> Column:
    """Distinct k-token shingles of a space-separated text column.
    Documents shorter than k tokens yield an empty set (guarded:
    Spark's sequence() would run backwards on a negative stop)."""
    t = F.split(F.col(col), " ")
    idx = F.sequence(F.lit(0), F.size(t) - k)
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j + 1) for j in range(k)]
    )
    return F.when(F.size(t) >= k, F.array_distinct(F.transform(idx, parts))).otherwise(
        F.array().cast("array<string>")
    )


def _exploded_shingles(
    df: DataFrame, id_col: str, col: str, k: int, max_freq: int | None
) -> DataFrame:
    ex = df.select(F.col(id_col).alias("did"), F.explode(shingles(col, k)).alias("s"))
    if max_freq is not None:
        # stop-shingle cap: a shingle in >max_freq docs is blocked from
        # candidate generation (skew guard; pure semantics preserved
        # because verification uses full shingle sets).
        freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
        ex = ex.join(freq.where(F.col("f") <= max_freq), "s")
    return ex.select("did", "s")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 3,
    threshold_e4: int = 3000,
    max_freq: int | None = 100,
) -> DataFrame:
    """Near-duplicate pairs by exact k-gram Jaccard ≥ threshold.

    Blocked self-join on shared shingles (never n²); Jaccard emitted
    floor-scaled: jac_e4 = floor(10000·|∩| / (|A|+|B|−|∩|))."""
    ex = _exploded_shingles(df, id_col, col, k, max_freq)
    sizes = df.select(
        F.col(id_col).alias("did"), F.size(shingles(col, k)).alias("nsh")
    )
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("i"), F.col("b.did").alias("j"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    si = sizes.select(F.col("did").alias("i"), F.col("nsh").alias("ni"))
    sj = sizes.select(F.col("did").alias("j"), F.col("nsh").alias("nj"))
    jac = F.floor(
        (F.col("inter") / (F.col("ni") + F.col("nj") - F.col("inter"))) * 10000
    ).cast("long")
    return (
        inter.join(si, "i")
        .join(sj, "j")
        .select("i", "j", jac.alias("jac_e4"))
        .where(F.col("jac_e4") >= threshold_e4)
    )


def _mh_col(seed: int) -> Column:
    """One md5-derived minhash function: min over shingles of the first
    15 hex chars of md5(seed || '#' || shingle). Lexicographic order on
    the fixed-width hex = numeric order — reproducible in any engine."""
    return F.min(F.md5(F.concat(F.lit(f"{seed}#"), F.col("s"))).substr(1, 15))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: num_hashes md5-derived minima
    computed in ONE pass over the exploded shingles (single shuffle)."""
    ex = df.select(F.col(id_col).alias("did"), F.explode(shingles(col, k)).alias("s"))
    aggs = [_mh_col(i).alias(f"mh{i}") for i in range(num_hashes)]
    return ex.groupBy("did").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold_e4: int = 3000,
    max_freq: int | None = 100,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures into ``bands``
    buckets, candidate pairs share ≥1 band bucket (equi-join, no n²),
    then VERIFY candidates with exact shingle Jaccard ≥ threshold.

    Output matches ngram_jaccard_pairs on (i, j, jac_e4) for pairs the
    LSH recalls — the scale path for the same semantics."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, col, k, num_hashes)
    band_cols = [
        F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("did", *band_cols)
    stacked = banded.select(
        "did",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("did", F.col("bk.band_id"), F.col("bk.key"))
    a, b_ = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("i"), F.col("b.did").alias("j"))
        .distinct()
    )
    # verification: exact Jaccard on candidates only
    ex = _exploded_shingles(df, id_col, col, k, max_freq)
    sizes = df.select(
        F.col(id_col).alias("did"), F.size(shingles(col, k)).alias("nsh")
    )
    ai = ex.select(F.col("did").alias("i"), F.col("s").alias("si"))
    bj = ex.select(F.col("did").alias("jd"), F.col("s").alias("sj"))
    inter = (
        cand.join(ai, "i")
        .join(bj, (F.col("j") == F.col("jd")) & (F.col("si") == F.col("sj")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    si = sizes.select(F.col("did").alias("i"), F.col("nsh").alias("ni"))
    sj = sizes.select(F.col("did").alias("j"), F.col("nsh").alias("nj"))
    jac = F.floor(
        (F.col("inter") / (F.col("ni") + F.col("nj") - F.col("inter"))) * 10000
    ).cast("long")
    return (
        inter.join(si, "i")
        .join(sj, "j")
        .select("i", "j", jac.alias("jac_e4"))
        .where(F.col("jac_e4") >= threshold_e4)
    )


_HI_NIBBLES = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash16(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct tokens: bit i set iff the sum over
    tokens of ±1 (sign = high bit of md5 nibble i) is positive.
    md5-nibble signs keep the signature engine-reproducible."""
    ex = df.select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(F.split(F.col(col), " "))).alias("w"),
    ).withColumn("h", F.md5(F.col("w")))
    bit_sums = [
        F.sum(
            F.when(F.substring(F.col("h"), i + 1, 1).isin(*_HI_NIBBLES), 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(16)
    ]
    agg = ex.groupBy("did").agg(*bit_sums)
    sig = None
    for i in range(16):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("did", sig.cast("long").alias("simhash"))
