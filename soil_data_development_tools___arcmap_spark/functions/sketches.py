"""Mergeable cardinality / sampling sketches with ENGINE-EXACT math.

The 100-TB operators a training-data pipeline runs constantly —
"how big is the vocabulary", "how much do two sources overlap",
"draw a weighted sample of documents" — must not require a global
distinct or a global sort.  This module implements the three
standard sketches for those questions, each built from pure integer
arithmetic on an md5-derived hash so the DuckDB oracle reproduces
the sketch BIT-FOR-BIT (the repo's determinism contract: the hash
check certifies the sketch itself, not a tolerance band around an
estimate):

* **KMV / bottom-k distinct sketch** (`kmv_sketch`): the k smallest
  distinct hash values per group.  Order-independent and mergeable
  (union of sketches, re-truncate to k) — the partial aggregate IS
  the sketch merge, exactly what 1000 executors would ship to a
  final reducer.  Estimate = (k-1)*M // h_(k) by integer floor.
* **Theta-style set operations** (`kmv_setops` at the query layer):
  union sketch = k smallest of the merged member sets; intersection
  via the inclusion fraction of the union sketch (the standard KMV
  Jaccard estimator) — floor-scaled to permille so both engines
  agree exactly.
* **Priority sampling** (Duffield–Lund–Thorup) for weighted
  sampling without replacement: priority p_i = w_i / u_i with
  u_i uniform from the seeded hash; keep the n largest priorities.
  Implemented as the n SMALLEST integer keys u_i*S // w_i (floor) —
  a pure top-k by an integer column, no global sort, and the
  Horvitz–Thompson total estimate Σ max(w_i, τ) falls out of the
  (n+1)-th key.

Reference provenance: the reference has no sketch layer (ArcGIS
tools materialize full tables); these are the scale analogs of its
exhaustive counting loops (e.g. SSURGO_Checks.py record-count
reconciliation) for corpus-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash space modulus — 10^12 keeps (k-1)*M and u*S inside BIGINT
#: with huge headroom (max intermediate ~2^50) in BOTH engines.
M = 1_000_000_000_000


def seeded_hash(col: Column, seed: str) -> Column:
    """Uniform integer in [0, M) from md5(seed || value) — identical in
    Spark and DuckDB (15 hex digits < 2^60 fits BIGINT; mod 10^12).
    The DuckDB twin parses the same 15-hex-digit prefix with
    ``CAST(('0x' || substring(md5(seed||v), 1, 15)) AS BIGINT)`` —
    see the ``docs_kmv_*`` entries in oracles.py.
    """
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 15), 16, 10)
        .cast("long")
        % M
    )


def kmv_sketch(
    df: DataFrame,
    value: Column,
    group_cols: list[str],
    k: int,
    seed: str,
) -> DataFrame:
    """Per-group bottom-k distinct-hash sketch.

    Returns one row per (group, rank) with the rank-th smallest
    distinct hash ``h`` (rank 1..k; fewer rows when the group has
    fewer distinct values).  The distinct is over (group, h) — i.e.
    vocabulary-bounded, never corpus-row-bounded — and the window
    ranks that already-distinct set, so the sort key space per group
    is the group's distinct-value count, not its row count.  At
    100 TB the map side hashes and locally dedups; only distinct
    (group, h) pairs shuffle.
    """
    hashed = df.select(*group_cols, seeded_hash(value, seed).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*group_cols, "rank", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-cardinality estimate from a bottom-k sketch.

    If the group's sketch is saturated (has all k rows) the estimate
    is ``(k-1) * M // h_(k)`` (integer floor — engine-exact); an
    unsaturated sketch IS the exact distinct set, so the estimate is
    its row count.  Output: group cols, n_sketch, est_distinct.
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("h_k"),
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(
            F.col("n_sketch") < k, F.col("n_sketch")
        )
        .otherwise(F.expr(f"({k} - 1) * {M}L div h_k"))
        .cast("long")
        .alias("est_distinct"),
    )


def priority_sample(
    df: DataFrame,
    weight: Column,
    n: int,
    seed: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Priority sampling: a weighted sample of n rows without
    replacement, deterministic, order-independent, single top-k.

    Key: ``key_i = (u_i * 1_000_000) div w_i`` with u_i =
    seeded_hash(id) in [0, M) — the n smallest keys are the n largest
    priorities w_i/u_i.  Ties broken by id.  Also returns ``tau_key``
    (the (n+1)-th smallest key, NULL when the input has ≤ n rows) on
    every row: the Horvitz–Thompson estimate of the population total
    is Σ max(w_i, 1_000_000 * M div tau_key) over the sample — all
    integer floor ops, engine-exact.

    Scale: the keying is map-only; the top-(n+1) is a single
    ``row_number`` over an ordered window — at 100 TB you'd replace
    the global window with a per-partition LIMIT n+1 then a final
    n+1-of-(parts*(n+1)) reduce, which Spark's TakeOrderedAndProject
    already does for ``orderBy().limit()``; n is user-sized (50),
    so either physical form is driver-safe.
    """
    u = seeded_hash(F.col(id_col).cast("string"), seed)
    keyed = df.withColumn("u", u).withColumn(
        "w_", F.greatest(weight.cast("long"), F.lit(1).cast("long"))
    )
    keyed = keyed.withColumn("skey", F.expr("u * 1000000 div w_"))
    # top-(n+1) via orderBy().limit() — Spark plans this as
    # TakeOrderedAndProject (per-partition heap of n+1 rows + driver
    # merge), NOT a single-partition global sort; the ranking window
    # below then runs over only the surviving n+1 rows.
    # settle the n+1 survivors once (localCheckpoint) — three
    # consumers derive from them (sample rows, τ threshold, HT sum);
    # without it each consumer re-runs the corpus top-k scan.
    top = keyed.orderBy("skey", id_col).limit(n + 1).localCheckpoint()
    w_rank = Window.orderBy("skey", id_col)
    ranked = top.withColumn("prank", F.row_number().over(w_rank))
    # one-row threshold side (NULL tau when the input has <= n rows) —
    # agg over the filtered set always yields exactly one row, so the
    # broadcast cross join is safe on empty/small inputs.
    tau = ranked.agg(
        F.min(F.when(F.col("prank") == n + 1, F.col("skey"))).alias("tau_key")
    )
    return ranked.where(F.col("prank") <= n).crossJoin(F.broadcast(tau))


def cms_sketch(
    df: DataFrame,
    value: Column,
    depth: int,
    width: int,
    seed: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch: a depth×width counter grid over a value
    stream (one increment per input row), optionally per group.

    Each row lands in ``depth`` cells ``(r, seeded_hash(v, seed+r+':')
    % width)``; the grid is the groupBy SUM of those increments.  The
    shuffle key space is depth×width (+ group) — CONSTANT in corpus
    size — and Spark's partial aggregation means every map task emits
    at most depth×width cells no matter how many rows it scanned:
    this is the canonical mergeable frequency sketch (Cormode &
    Muthukrishnan 2005).  Point estimates (``cms_lookup``) are upper
    bounds: min over rows of the probed cells never undercounts.
    Output: [group_cols,] r, c, cnt.
    """
    gc = list(group_cols or [])
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (seeded_hash(value, f"{seed}{r}:") % width).alias("c"),
            )
            for r in range(depth)
        ]
    )
    cells = df.select(*gc, F.explode(pairs).alias("rc"))
    return cells.groupBy(*gc, "rc.r", "rc.c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    cand: DataFrame,
    value: Column,
    key_cols: list[str],
    depth: int,
    width: int,
    seed: str,
) -> DataFrame:
    """Point-estimate ``cand`` rows against a count-min ``sketch``:
    probe the depth cells the value hashes to, take the min.

    ``sketch`` must be a single UNGROUPED grid with columns
    (r, c, cnt) — to probe one group of a grouped ``cms_sketch``
    result, filter and project it first (see ``docs_cms_drift``).
    The sketch side is depth×width rows — broadcast, so the lookup
    is a map-side join however large the candidate set.  A missing
    cell coalesces to 0 (nothing ever hashed there).  Output:
    key_cols + cms_est (BIGINT, ≥ the true count always).
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (seeded_hash(value, f"{seed}{r}:") % width).alias("c"),
            )
            for r in range(depth)
        ]
    )
    probes = cand.select(*key_cols, F.explode(pairs).alias("rc")).select(
        *key_cols, "rc.r", "rc.c"
    )
    joined = probes.join(F.broadcast(sketch), ["r", "c"], "left")
    return joined.groupBy(*key_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est")
    )


def logbucket_sql(col: str) -> str:
    """SQL fragment: log-scale bucket id of a non-negative BIGINT.

    Base-2 octaves with 8 linear sub-buckets each (a DDSketch-style
    fixed-resolution histogram in pure integer ops):
    ``b = (bitlen-1)*8 + ((v >> max(bitlen-4, 0)) & 7)`` with bitlen
    = length(bin(v)).  Values 0..7 map to singleton buckets (exact);
    larger values to buckets of relative width 2^-3.  Monotone in v,
    mergeable (bucket counts just add), and the whole int64 range
    needs ≤ 64*8 = 512 buckets — the bounded-state quantile summary.
    bin()/>>/&/greatest are bit-identical in Spark and DuckDB.

    PRECONDITION: v ≥ 0.  bin() of a negative long is its 64-bit
    two's-complement string, which would land every negative value in
    the TOP octave and break monotonicity — clamp (the registry
    queries use greatest(v, 0)) or offset signed data first.
    """
    return (
        f"(length(bin({col})) - 1) * 8"
        f" + (({col} >> greatest(length(bin({col})) - 4, 0)) & 7)"
    )


def logbucket_rep_sql(col: str) -> str:
    """SQL fragment: midpoint representative value of a log bucket id.

    Inverse of ``logbucket_sql``: buckets below 24 (values 0..7) are
    exact; otherwise lo = (8 + b%8) << (b div 8 - 3) and the
    representative is lo + half the bucket width (floor).  Max
    relative error vs any member of the bucket: 1/16 (62.5 permille).
    """
    # the half-width literal MUST be BIGINT: Spark's << on an INT base
    # wraps the shift count mod 32 (Java semantics), silently turning
    # 1 << 36 into 16.  8 + b % 8 is already BIGINT via b.
    return (
        f"CASE WHEN {col} < 24 THEN {col} % 8"
        f" ELSE ((8 + {col} % 8) << ({col} div 8 - 3))"
        f"      + (CASE WHEN {col} div 8 > 3"
        f"              THEN CAST(1 AS BIGINT) << ({col} div 8 - 4)"
        f"              ELSE 0 END)"
        f" END"
    )
