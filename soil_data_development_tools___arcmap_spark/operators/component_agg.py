"""Component-level SDV aggregation operators.

Each operator collapses a denormalized rating table (one row per
group-member, e.g. mapunit-component) to one rating per group. The
reference implements these as sort-order-dependent cursor loops
(gSSURGO_CreateSoilMap.py:4810-8305); here each is a window/groupBy
pipeline — partial (map-side) aggregation, no global sort, no Python
UDFs, deterministic tiebreaks.

Scale notes: every groupBy/window below shuffles once on the group key.
The group key (mukey analog) is high-cardinality and roughly uniform in
SSURGO, so no salting is needed; AQE skew-join/partition-coalescing is
enabled by the session factory for when it isn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .tiebreak import RatingSpec, domain_rank_expr, member_order, rating_order_expr


def _weight(spec: RatingSpec) -> Column:
    return F.col(spec.weight_col)


def agg_mapunit_passthrough(
    df: DataFrame, spec: RatingSpec, precision: int | None = None
) -> DataFrame:
    """Aggregate1 — map-unit-level attribute passthrough with rounding
    to ``attributeprecision`` (gSSURGO_CreateSoilMap.py:4720-4807)."""
    rating = spec.rating()
    if precision is not None:
        rating = F.round(rating, precision)
    return df.select(*spec.group_cols, rating.alias(spec.out_col))


def _argbest(
    spec: RatingSpec, weight: Column, member: Column, payload: list[Column]
):
    """'First row per group under (weight DESC NULLS LAST, rating
    tiebreak, member ASC)' as ONE min()/max() aggregate over an
    encoded comparison struct — no per-group sort, and the aggregate
    partially combines map-side, so the shuffle carries one candidate
    per (group, input partition) instead of every member row (the
    shape that matters at fact-table scale; a row_number window must
    materialize and SORT each whole group after the exchange).

    Key encoding (struct comparison is lexicographic, short-circuits
    on the first unequal field, so later-field nulls are never
    compared across null/non-null):
    - k1: ±weight with null→−inf, so null weights lose in both
      directions;
    - k2a: rating NULL marker — 0/1 places nulls FIRST under min
      (Spark asc = nulls first) and LAST under max (desc = nulls
      last), matching the window's ordering exactly;
    - k2b: domain rank (totalized, never null) or the raw rating;
    - k3: member ASC — natural under min; NEGATED under max, which
      requires a numeric member key (callers fall back to the window
      form for a non-numeric member under tiebreak_higher — see
      ``_numeric_member``; long negation is exact, no double cast).
    """
    if spec.domain is not None:
        k2a = F.lit(1)
        k2b = domain_rank_expr(spec)
    else:
        r = spec.rating()
        k2a = F.when(r.isNull(), F.lit(0)).otherwise(F.lit(1))
        k2b = r
    neg_inf = F.lit(float("-inf"))
    if spec.tiebreak_higher:
        k1 = F.coalesce(weight.cast("double"), neg_inf)
        k3 = -member
        agg_fn = F.max
    else:
        k1 = -F.coalesce(weight.cast("double"), neg_inf)
        k3 = member
        agg_fn = F.min
    return agg_fn(
        F.struct(
            k1.alias("__k1"),
            k2a.alias("__k2a"),
            k2b.alias("__k2b"),
            k3.alias("__k3"),
            *payload,
        )
    )


def _numeric_member(df: DataFrame, member_col: str) -> bool:
    from pyspark.sql.types import NumericType

    return isinstance(df.schema[member_col].dataType, NumericType)


def agg_dcp(df: DataFrame, spec: RatingSpec, keep_weight: bool = True) -> DataFrame:
    """AggregateCo_DCP — dominant component (gSSURGO_CreateSoilMap.py:4810-4984).

    First row per group under ORDER BY weight DESC, rating tiebreak,
    member key — as a single argbest aggregate (see ``_argbest``):
    one exchange, partial map-side combine, no per-group sort. A
    non-numeric member key under tiebreak_higher cannot be negated
    into the max-struct, so that corner keeps the row_number window."""
    if spec.tiebreak_higher and not _numeric_member(df, spec.member_col):
        w = Window.partitionBy(*spec.group_cols).orderBy(
            _weight(spec).desc_nulls_last(),
            rating_order_expr(spec),
            *member_order(spec),
        )
        out = [*spec.group_cols] + ([spec.weight_col] if keep_weight else [])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*out, spec.rating().alias(spec.out_col))
        )
    best = _argbest(
        spec,
        _weight(spec),
        F.col(spec.member_col),
        [_weight(spec).alias("pw"), spec.rating().alias("pr")],
    ).alias("__b")
    res = df.groupBy(*spec.group_cols).agg(best)
    cols = [*spec.group_cols]
    if keep_weight:
        cols.append(F.col("__b.pw").alias(spec.weight_col))
    cols.append(F.col("__b.pr").alias(spec.out_col))
    return res.select(*cols)


def agg_dcd(
    df: DataFrame,
    spec: RatingSpec,
    dcp_override: bool = True,
    normalize_pct: bool = True,
) -> DataFrame:
    """AggregateCo_DCD — dominant condition (gSSURGO_CreateSoilMap.py:5564-5891).

    Sum weight per rating value within the group; the rating with the
    largest summed weight wins (tiebreak by rating order). Two extras
    from the reference:

    - DCP-override: if the single dominant component holds >= 50 weight,
      its rating wins outright (:5764-5781).
    - Output weight normalized to 100 * pct / totalPct (:5786-5805).
    """
    rating = spec.rating().alias("__rating")
    by_rating = df.groupBy(*spec.group_cols, rating).agg(
        F.sum(_weight(spec)).alias("__sum_w"),
        # deterministic member representative for total ordering
        F.min(F.col(spec.member_col)).alias("__member"),
        # per-rating DCP candidate: the heaviest single member. The
        # member-level tiebreak chain (weight DESC, rating order,
        # member ASC) reduces to (max-weight DESC, rating order) on
        # these candidates because rows tied on (weight, rating) are
        # output-identical — so ONE shuffle serves both the condition
        # winner and the DCP-override winner (the reference computes
        # them in two passes, :5764-5781).
        F.max(_weight(spec)).alias("__mw"),
        # member tiebreak for the DCP override, conditioned on the
        # max-weight rows of this rating (min-of-struct: negate the
        # weight so min picks max weight first, then min member; null
        # weight maps to +inf so it loses, matching desc_nulls_last)
        F.min(
            F.struct(
                (-F.coalesce(_weight(spec).cast("double"), F.lit(float("-inf"))))
                .alias("nw"),
                F.col(spec.member_col).alias("m"),
            )
        )["m"].alias("__member_dcp"),
    )
    order_spec = RatingSpec(
        rating_col="__rating",
        group_cols=spec.group_cols,
        member_col="__member",
        weight_col="__sum_w",
        tiebreak_higher=spec.tiebreak_higher,
        domain=spec.domain,
        domain_reversed=spec.domain_reversed,
        not_rated=spec.not_rated,
    )
    if spec.tiebreak_higher and not _numeric_member(df, spec.member_col):
        # non-numeric member under 'Higher': the max-struct cannot
        # negate the member tiebreak — window fallback (see _argbest)
        w = Window.partitionBy(*spec.group_cols).orderBy(
            F.col("__sum_w").desc_nulls_last(),
            rating_order_expr(order_spec),
            F.col("__member").asc(),
        )
        w_dcp = Window.partitionBy(*spec.group_cols).orderBy(
            F.col("__mw").desc_nulls_last(),
            rating_order_expr(order_spec),
            F.col("__member_dcp").asc(),
        )
        total_w = Window.partitionBy(*spec.group_cols)
        both = (
            by_rating.withColumn("__total", F.sum("__sum_w").over(total_w))
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__rn_dcp", F.row_number().over(w_dcp))
        )
        picked = both.groupBy(*spec.group_cols).agg(
            F.max("__total").alias("__total"),
            F.max(
                F.when(
                    F.col("__rn") == 1,
                    F.struct(
                        F.col("__sum_w").alias("pw"),
                        F.col("__rating").alias("pr"),
                    ),
                )
            ).alias("__d"),
            F.max(
                F.when(
                    F.col("__rn_dcp") == 1,
                    F.struct(
                        F.col("__mw").alias("pw"),
                        F.col("__rating").alias("pr"),
                    ),
                )
            ).alias("__p"),
        )
        return _dcd_output(picked, spec, dcp_override, normalize_pct)
    # condition winner AND dcp-override winner as argbest aggregates in
    # ONE groupBy (the total rides along) — the previous form ran two
    # row_number windows + a partition-total window over by_rating,
    # i.e. a second exchange plus per-group sorts; this is a single
    # sort-free exchange on the group key.
    picked = by_rating.groupBy(*spec.group_cols).agg(
        F.sum("__sum_w").alias("__total"),
        _argbest(
            order_spec,
            F.col("__sum_w"),
            F.col("__member"),
            [F.col("__sum_w").alias("pw"), F.col("__rating").alias("pr")],
        ).alias("__d"),
        _argbest(
            order_spec,
            F.col("__mw"),
            F.col("__member_dcp"),
            [F.col("__mw").alias("pw"), F.col("__rating").alias("pr")],
        ).alias("__p"),
    )
    return _dcd_output(picked, spec, dcp_override, normalize_pct)


def _dcd_output(
    picked: DataFrame,
    spec: RatingSpec,
    dcp_override: bool,
    normalize_pct: bool,
) -> DataFrame:
    """Final DCD projection from the per-group winner structs
    (__d/__p with fields pw/pr, plus __total). 100*pct/total rounded
    half-up in pure integer arithmetic ((200p + t) div 2t) — exact,
    engine-independent."""
    pct = (
        F.expr("(200 * __d.pw + __total) div (2 * __total)")
        if normalize_pct
        else F.col("__d.pw")
    )
    if not dcp_override:
        return picked.select(
            *spec.group_cols,
            pct.cast("int").alias(spec.weight_col),
            F.col("__d.pr").alias(spec.out_col),
        )
    return picked.select(
        *spec.group_cols,
        pct.cast("int").alias(spec.weight_col),
        F.when(F.col("__p.pw") >= 50, F.col("__p.pr"))
        .otherwise(F.col("__d.pr"))
        .alias(spec.out_col),
    )


def agg_wta(
    df: DataFrame,
    spec: RatingSpec,
    exclude_values: list | None = None,
    precision: int | None = None,
    clamp: tuple[float, float] | None = None,
) -> DataFrame:
    """AggregateCo_WTA — weighted average (gSSURGO_CreateSoilMap.py:7981-8202).

    sum(weight*rating)/sum(weight) per group. Null policy: ``zero_nulls``
    (bZero) coalesces null ratings to 0; otherwise null-rating rows are
    excluded from BOTH sums (:8034-8094). ``exclude_values`` drops
    sentinel ratings (e.g. the 201 null-replacement) from the weighted
    average. ``clamp`` reproduces the NCCPI forced [0,1] range
    (:8177-8179).
    """
    rating = spec.rating()
    if spec.zero_nulls:
        rating = F.coalesce(rating, F.lit(0))
    cond = rating.isNotNull()
    if exclude_values:
        cond = cond & ~rating.isin(exclude_values)
    num = F.sum(F.when(cond, _weight(spec) * rating)).alias("__num")
    den = F.sum(F.when(cond, _weight(spec))).alias("__den")
    out = F.col("__num") / F.col("__den")
    if clamp is not None:
        lo, hi = clamp
        out = F.least(F.greatest(out, F.lit(lo)), F.lit(hi))
    if precision is not None:
        out = F.round(out, precision)
    return (
        df.groupBy(*spec.group_cols)
        .agg(num, den)
        .select(
            *spec.group_cols,
            F.col("__den").alias(spec.weight_col),
            out.alias(spec.out_col),
        )
    )


def agg_maxmin(df: DataFrame, spec: RatingSpec, maximum: bool = True) -> DataFrame:
    """AggregateCo_MaxMin — per-group min or max rating
    (gSSURGO_CreateSoilMap.py:5230-5561). Ordinal ratings compare by
    domain index; the reported weight is that of the extreme row
    (ties: heaviest, then member key)."""
    key = domain_rank_expr(spec) if spec.domain is not None else spec.rating()
    order = key.desc_nulls_last() if maximum else key.asc_nulls_last()
    w = Window.partitionBy(*spec.group_cols).orderBy(
        order, _weight(spec).desc_nulls_last(), *member_order(spec)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*spec.group_cols, spec.weight_col, spec.rating().alias(spec.out_col))
    )


def agg_limiting(df: DataFrame, spec: RatingSpec, most: bool = True) -> DataFrame:
    """AggregateCo_Limiting — Most/Least Limiting
    (gSSURGO_CreateSoilMap.py:4988-5227).

    Min (most limiting) or max (least) DOMAIN INDEX across the group's
    members, skipping 'Not rated' rows unless they are all the group
    has (:5115-5121, :5166-5171); reports the weight of the limiting
    class (summed over members sharing it).
    """
    assert spec.domain is not None, "Limiting requires an ordinal domain"
    # plain ranks: Limiting manages 'Not rated'/null placement itself
    # (skip unless it is all the group has, :5115-5121) — the domain
    # insertions of :9913-9967 must not apply here
    rank = domain_rank_expr(spec, plain=True)
    nr_rank = len(spec.domain) + 1
    df2 = df.withColumn("__rank", rank)
    # 'Not rated' sorts last for MOST limiting and for LEAST limiting
    # alike — a real class always beats it; __is_nr breaks that tie.
    is_nr = (F.col("__rank") >= nr_rank).cast("int")
    order = F.col("__rank").asc() if most else F.col("__rank").desc()
    # weight of the limiting class (Σ over members at the winning rank)
    # as a window sum, so the winner row carries it — one scan, no
    # aggregate-and-join-back second pass over the raw table.
    cw = Window.partitionBy(*spec.group_cols, "__rank")
    w = Window.partitionBy(*spec.group_cols).orderBy(
        is_nr.asc(), order, _weight(spec).desc_nulls_last(), *member_order(spec)
    )
    # window order matters for the plan: the row_number window
    # (partitioned by the group alone) runs FIRST, so the class-weight
    # window — clustered by (group, rank), which HashPartitioning(group)
    # already satisfies — reuses that exchange instead of forcing its
    # own. 2 exchanges -> 1 (one shuffle of the fact rows instead of
    # two; 1.32 s -> 0.81 s at sf0.1, rows identical — optimization
    # r12, guide §2.4 "window functions partitioned by the same key").
    return (
        df2.withColumn("__rn", F.row_number().over(w))
        .withColumn("__class_w", F.sum(_weight(spec)).over(cw))
        .filter(F.col("__rn") == 1)
        .select(
            *spec.group_cols,
            F.col("__class_w").alias(spec.weight_col),
            spec.rating().alias(spec.out_col),
        )
    )


def agg_pp_sum(
    df: DataFrame,
    spec: RatingSpec,
    target_values: list,
    parent: DataFrame | None = None,
) -> DataFrame:
    """AggregateCo_PP_SUM — percent present
    (gSSURGO_CreateSoilMap.py:8205-8305): sum weight over rows whose
    rating is in ``target_values``; groups with no match get 0, not
    null (:8234-8291) — hence the left join from ``parent`` (the
    mapunit table) when provided."""
    hit = F.when(spec.rating().isin(target_values), _weight(spec)).otherwise(F.lit(0))
    agg = df.groupBy(*spec.group_cols).agg(F.sum(hit).alias(spec.out_col))
    if parent is None:
        return agg
    base = parent.select(*spec.group_cols).distinct()
    return base.join(agg, on=spec.group_cols, how="left").select(
        *spec.group_cols,
        F.coalesce(F.col(spec.out_col), F.lit(0)).alias(spec.out_col),
    )
