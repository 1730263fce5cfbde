"""The Valu1 derived-table pipeline (gSSURGO_ValuTable.py, SURVEY §2.5).

The reference materializes a mu×co×hz query table then runs 11
sequential per-depth-range passes plus RZ/NCCPI/PWSL passes over
cursors. Here: ONE cached joined DataFrame; the depth-range list is an
exploded dimension so all ranges aggregate in a single pass; every
rule is a native Column expression.

Scale notes: the mu-co-hz join is a single shuffle on cokey (mukey
keys ride along); `build_query_table(...).cache()` is the analog of
the reference's scratch QueryTable_HZ (:341-352) because 5+ metric
branches consume it. The final assembly is a chain of mukey equi-joins
between per-metric aggregates — each tiny relative to the horizon
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# gSSURGO_ValuTable.py:3092
DEPTH_RANGES = [
    (0, 5), (5, 20), (20, 50), (50, 100), (100, 150), (150, 999),
    (0, 20), (0, 30), (0, 100), (0, 150), (0, 999),
]

# restriction kinds that stop the root zone (resList :3101)
RZ_RESKINDS = [
    "Lithic bedrock", "Paralithic bedrock", "Densic bedrock",
    "Fragipan", "Duripan", "Sulfuric",
]

# organic texture lists (gSSURGO_ValuTable.py:767-770)
OM_TEXTURES = ["MUCK", "MPT", "PEAT", "SPM", "UDOM", "PDOM", "HPM", "MPM"]
OM_LIEUTEX = ["Muck", "Mucky peat", "Peat", "Coprogenous earth"]


def major_earthy(component: DataFrame) -> Column:
    """Major-earthy component filter (gSSURGO_ValuTable.py:960): a
    major component whose compkind is present and not 'Miscellaneous
    area' (the reference's NULL-tolerant earthy test collapses to this
    once conjoined with its NOT-NULL requirement)."""
    return (
        F.col("compkind").isNotNull()
        & (F.col("compkind") != "Miscellaneous area")
        & (F.col("majcompflag") == "Yes")
    )


def get_sum_pct(component: DataFrame) -> DataFrame:
    """Per-mukey Σcomppct for the four component classes
    (GetSumPct, gSSURGO_ValuTable.py:1953-2013)."""
    is_earthy = F.col("compkind").isNull() | (
        F.col("compkind") != "Miscellaneous area"
    )
    is_major = F.col("majcompflag") == "Yes"
    pct = F.col("comppct_r")
    return component.groupBy("mukey").agg(
        F.sum(pct).alias("musumcpct"),
        F.sum(F.when(is_major & is_earthy & F.col("compkind").isNotNull(), pct))
        .alias("musumcpcta"),
        F.sum(F.when(is_major, pct)).alias("musumcpcts"),
    )


def check_texture_organic() -> Column:
    """Organic-horizon classifier (CheckTexture,
    gSSURGO_ValuTable.py:741-817): histosols/histic taxa are treated as
    mineral (their O horizons are the norm); otherwise desgnmaster O/L
    or an organic texture/lieutex marks the horizon organic."""
    histic = (F.col("taxorder") == "Histosols") | F.lower(
        F.coalesce(F.col("taxsubgrp"), F.lit(""))
    ).contains("histic")
    organic_marks = (
        F.upper(F.coalesce(F.col("desgnmaster"), F.lit(""))).isin("O", "L")
        | F.upper(F.coalesce(F.col("texture"), F.lit(""))).isin(OM_TEXTURES)
        | F.coalesce(F.col("lieutex"), F.lit("")).isin(OM_LIEUTEX)
    )
    return F.when(histic, F.lit(False)).otherwise(organic_marks)


def check_bulk_density() -> Column:
    """Dense-layer test (CheckBulkDensity, gSSURGO_ValuTable.py:820-892):
    fill ONE missing sand/silt/clay as 100−others, then
    dense ⇔ bd − (1.65·sand + 1.30·silt + 1.25·clay)/100
            > 0.002081·sand + 0.003912·silt + 0.0024351·clay."""
    sand0, silt0, clay0 = F.col("sandtotal_r"), F.col("silttotal_r"), F.col("claytotal_r")
    sand = F.coalesce(sand0, F.lit(100.0) - silt0 - clay0)
    silt = F.coalesce(silt0, F.lit(100.0) - sand0 - clay0)
    clay = F.coalesce(clay0, F.lit(100.0) - sand0 - silt0)
    bd = F.col("dbthirdbar_r")
    lhs = bd - (sand * 1.65 + silt * 1.30 + clay * 1.25) / 100.0
    rhs = sand * 0.002081 + silt * 0.003912 + clay * 0.0024351
    return F.when(
        bd.isNotNull() & sand.isNotNull() & silt.isNotNull() & clay.isNotNull(),
        lhs > rhs,
    ).otherwise(F.lit(False))


def get_frag_vol(chfrags: DataFrame) -> DataFrame:
    """Per-chkey Σ fragment volume (GetFragVol, :1910-1951)."""
    return chfrags.groupBy("chkey").agg(F.sum("fragvol_r").alias("fragvol"))


def get_co_restrictions(corestrictions: DataFrame, max_depth: int = 150) -> DataFrame:
    """Shallowest qualifying restriction per cokey
    (GetCoRestrictions, :1106-1146)."""
    w = Window.partitionBy("cokey").orderBy(
        F.col("resdept_r").asc_nulls_last(), F.col("corestrictkey")
    )
    return (
        corestrictions.where(
            F.col("reskind").isin(RZ_RESKINDS) & (F.col("resdept_r") < max_depth)
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("cokey", F.col("resdept_r").alias("resdept"))
    )


def build_query_table(
    component: DataFrame,
    chorizon: DataFrame,
    chtexturegrp: DataFrame | None = None,
    chtexture: DataFrame | None = None,
    chfrags: DataFrame | None = None,
) -> DataFrame:
    """The materialized mu×co×hz query table (CreateQueryTables,
    gSSURGO_ValuTable.py:110-498): components joined to horizons, the
    RV texture (rvindicator='Yes', :223-225) and fragment volume."""
    df = component.join(chorizon, "cokey", "left")
    if chtexturegrp is not None:
        tex = chtexturegrp.where(F.col("rvindicator") == "Yes").select(
            "chkey", "chtgkey", "texture"
        )
        if chtexture is not None:
            tex = tex.join(
                chtexture.select("chtgkey", "lieutex"), "chtgkey", "left"
            )
        df = df.join(tex.drop("chtgkey"), "chkey", "left")
    else:
        df = df.withColumn("texture", F.lit(None).cast("string")).withColumn(
            "lieutex", F.lit(None).cast("string")
        )
    if chfrags is not None:
        df = df.join(get_frag_vol(chfrags), "chkey", "left")
    else:
        df = df.withColumn("fragvol", F.lit(None).cast("double"))
    return df


def calc_rz_depth(qt: DataFrame, restrictions: DataFrame) -> DataFrame:
    """Root-zone depth per major-earthy component (CalcRZDepth,
    gSSURGO_ValuTable.py:895-1102): the shallowest of — a dense layer,
    pH ≤ 3.5 on a non-organic horizon (:1023-1029), EC ≥ 16 (:1031-1037),
    a qualifying corestriction (:1051-1066) — else 150."""
    hz = qt.where(major_earthy(qt) & F.col("hzdept_r").isNotNull())
    organic = check_texture_organic()
    dense = check_bulk_density()
    limiting = (
        dense
        | (
            (F.col("ph1to1h2o_r") <= 3.5)
            & F.col("ph1to1h2o_r").isNotNull()
            & ~organic
        )
        | (F.col("ec_r") >= 16)
    )
    hz_limit = hz.groupBy("mukey", "cokey", "comppct_r").agg(
        F.min(F.when(limiting, F.col("hzdept_r"))).alias("hz_restrict")
    )
    out = hz_limit.join(restrictions, "cokey", "left")
    rz = F.least(
        F.coalesce(F.col("hz_restrict"), F.lit(150)),
        F.coalesce(F.col("resdept"), F.lit(150)),
        F.lit(150),
    )
    return out.select(
        "mukey", "cokey", "comppct_r", rz.cast("int").alias("rzdepth")
    )


def calc_rz_aws(qt: DataFrame, rzdepth: DataFrame) -> DataFrame:
    """Root-zone AWS 0-150 cm (CalcRZAWS, :1150-1478): Σ awc·clipped
    thickness up to the restriction depth, comppct-weighted over
    major-earthy components; rootznemc capped at 150 (:1428-1432);
    droughty = rootznaws ≤ 152 (:1436-1440)."""
    hz = qt.where(major_earthy(qt)).join(rzdepth.select("cokey", "rzdepth"), "cokey")
    hz_t = F.greatest(
        F.least(F.col("hzdepb_r").cast("int"), F.col("rzdepth"))
        - F.greatest(F.col("hzdept_r").cast("int"), F.lit(0)),
        F.lit(0),
    )
    comp = hz.groupBy("mukey", "cokey", "comppct_r", "rzdepth").agg(
        F.sum(F.when(F.col("awc_r").isNotNull(), hz_t * F.col("awc_r") * 10.0))
        .alias("caws")
    )
    return comp.groupBy("mukey").agg(
        F.round(
            F.sum(F.col("comppct_r") * F.col("caws"))
            / F.sum(F.when(F.col("caws").isNotNull(), F.col("comppct_r"))),
            0,
        ).alias("rootznaws"),
        F.least(
            F.round(
                F.sum(F.col("comppct_r") * F.col("rzdepth"))
                / F.sum(F.col("comppct_r")),
                0,
            ),
            F.lit(150.0),
        ).alias("rootznemc"),
    ).withColumn(
        "droughty", (F.col("rootznaws") <= 152).cast("int")
    )


def calc_aws(
    qt: DataFrame,
    ranges: list[tuple[int, int]] | None = None,
    exact_scale: int | None = None,
) -> DataFrame:
    """AWS per depth range (CalcAWS, :1481-1674): aws = hzT·awc·10 mm
    (:1556) — ALL ranges in one pass via an exploded range dimension
    instead of the reference's 11 sequential table passes.

    ``exact_scale``: emit floor(value·scale) as BIGINT instead of
    round(value, 2). Decimal rounding of doubles is not reproducible
    across engines (shortest-repr ties); floor of a deterministic IEEE
    quotient is — the oracle-comparable output mode.

    Scale shape: the ranges are CONDITIONAL AGGREGATE COLUMNS over the
    horizon rows, not an exploded row dimension — the first (big)
    shuffle carries one row per component with 2R columns instead of
    R× the horizon rows; only the already-aggregated component level
    is unpivoted back to long form."""
    ranges = ranges or DEPTH_RANGES
    aggs = []
    for t, b in ranges:
        hz_t = F.greatest(
            F.least(F.col("hzdepb_r"), F.lit(b))
            - F.greatest(F.col("hzdept_r"), F.lit(t)),
            F.lit(0),
        )
        valid = F.col("awc_r").isNotNull()
        aggs.append(
            F.sum(F.when(valid, hz_t * F.col("awc_r") * 10.0)).alias(
                f"__aws_{t}_{b}"
            )
        )
        aggs.append(F.sum(F.when(valid, hz_t)).alias(f"__tk_{t}_{b}"))
    comp_wide = qt.groupBy("mukey", "cokey", "comppct_r").agg(*aggs)
    comp = comp_wide.select(
        "mukey",
        "comppct_r",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("top"),
                    F.lit(b).alias("bot"),
                    F.col(f"__aws_{t}_{b}").alias("caws"),
                    F.col(f"__tk_{t}_{b}").alias("ctk"),
                )
                for t, b in ranges
            ])
        ).alias("r"),
    ).select("mukey", "comppct_r", "r.top", "r.bot", "r.caws", "r.ctk")
    aws_raw = F.sum(F.col("comppct_r") * F.col("caws")) / F.sum(
        F.when(F.col("caws").isNotNull(), F.col("comppct_r"))
    )
    tk_raw = F.sum(F.col("comppct_r") * F.col("ctk")) / F.sum(
        F.when(F.col("ctk").isNotNull(), F.col("comppct_r"))
    )
    if exact_scale is not None:
        aws_out = F.floor(aws_raw * exact_scale).cast("long")
        tk_out = F.floor(tk_raw * exact_scale).cast("long")
    else:
        aws_out, tk_out = F.round(aws_raw, 2), F.round(tk_raw, 2)
    return comp.groupBy("mukey", "top", "bot").agg(
        aws_out.alias("aws"), tk_out.alias("tk")
    )


def calc_soc(
    qt: DataFrame,
    restrictions: DataFrame | None = None,
    ranges: list[tuple[int, int]] | None = None,
    exact_scale: int | None = None,
) -> DataFrame:
    """SOC per depth range (CalcSOC, :1675-1909): horizon clip further
    capped at the restriction depth (:1770-1780); per-cm carbon =
    (1 − fragvol/100)·10·(om/1.724)·db3 (g C m⁻², :1807).

    ``exact_scale``: quantize each horizon contribution to
    floor(contrib·scale) BEFORE summing, keeping every sum exact
    integer (cross-engine order-independent) — the /1.724 factor makes
    raw contributions non-integer doubles whose float sums would be
    partition-order-dependent. Output is then floor(weighted mean)."""
    ranges = ranges or DEPTH_RANGES
    if restrictions is not None:
        qt = qt.join(restrictions, "cokey", "left")
    else:
        qt = qt.withColumn("resdept", F.lit(None).cast("int"))
    carbon_per_cm = (
        (F.lit(1.0) - F.coalesce(F.col("fragvol"), F.lit(0.0)) / 100.0)
        * 10.0
        * (F.col("om_r") / 1.724)
        * F.col("dbthirdbar_r")
    )
    valid = F.col("om_r").isNotNull() & F.col("dbthirdbar_r").isNotNull()
    # per-range conditional aggregates over the horizon rows (same
    # no-explosion shape as calc_aws — the big shuffle carries one row
    # per component, not R× the horizon rows)
    aggs = []
    for t, b in ranges:
        bot_cap = F.least(
            F.col("hzdepb_r").cast("int"),
            F.lit(b),
            F.coalesce(F.col("resdept"), F.lit(999)),
        )
        hz_t = F.greatest(
            bot_cap - F.greatest(F.col("hzdept_r"), F.lit(t)), F.lit(0)
        )
        contrib = hz_t * carbon_per_cm
        if exact_scale is not None:
            contrib = F.floor(contrib * exact_scale).cast("long")
        aggs.append(F.sum(F.when(valid, contrib)).alias(f"__soc_{t}_{b}"))
    comp_wide = qt.groupBy("mukey", "cokey", "comppct_r").agg(*aggs)
    comp = comp_wide.select(
        "mukey",
        "comppct_r",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("top"),
                    F.lit(b).alias("bot"),
                    F.col(f"__soc_{t}_{b}").alias("csoc"),
                )
                for t, b in ranges
            ])
        ).alias("r"),
    ).select("mukey", "comppct_r", "r.top", "r.bot", "r.csoc")
    mean = F.sum(F.col("comppct_r") * F.col("csoc")) / F.sum(
        F.when(F.col("csoc").isNotNull(), F.col("comppct_r"))
    )
    out = (
        F.floor(mean).cast("long") if exact_scale is not None else F.round(mean, 1)
    )
    return comp.groupBy("mukey", "top", "bot").agg(out.alias("soc"))


def calc_nccpi(
    component: DataFrame, cointerp: DataFrame, exact_scale: int | None = None
) -> DataFrame:
    """NCCPI v3 (CalcNCCPI3, :2276-2478): per-mukey Σ(fuzzy·comppct)
    normalized by major-component pct; submodels (ruledepth 1) pivot on
    rulename, overall = ruledepth 0. ``exact_scale``: floor(score·scale)
    BIGINT instead of round(score, 3) — see calc_aws."""
    co = component.where(F.col("majcompflag") == "Yes").select(
        "mukey", "cokey", "comppct_r"
    )
    ci = cointerp.where(F.col("mrulename").like("NCCPI%"))
    j = co.join(ci, "cokey")

    def _score(cond):
        mean = F.sum(
            F.when(cond, F.col("interphr") * F.col("comppct_r"))
        ) / F.sum(F.when(F.col("ruledepth") == 0, F.col("comppct_r")))
        if exact_scale is not None:
            return F.floor(mean * exact_scale).cast("long")
        return F.round(mean, 3)

    scored = j.groupBy("mukey").agg(
        *[
            _score(cond).alias(alias)
            for alias, cond in [
                ("nccpi3all", F.col("ruledepth") == 0),
                ("nccpi3corn", (F.col("ruledepth") == 1)
                 & F.col("rulename").contains("Corn")),
                ("nccpi3soy", (F.col("ruledepth") == 1)
                 & F.col("rulename").contains("Soybean")),
                ("nccpi3cot", (F.col("ruledepth") == 1)
                 & F.col("rulename").contains("Cotton")),
                ("nccpi3sg", (F.col("ruledepth") == 1)
                 & F.col("rulename").contains("Small Grain")),
            ]
        ]
    )
    return scored


NCCPI_V3_RULE = "NCCPI - National Commodity Crop Productivity Index (Ver 3.0)"
NCCPI_V2_RULE = "NCCPI - National Commodity Crop Productivity Index (Ver 2.0)"


def resolve_nccpi_mainrule(rulenames: list[str]) -> str:
    """NCCPI mainrule v2/v3 resolution (gSSURGO_ValuTable.py:3018-3064):
    the distinct ``sdvattribute.nasisrulename`` values for attributes
    named 'National Commodity Crop Productivity Index%' decide which
    rule generation the database carries — a single name wins outright,
    Ver 3.0 is preferred when both exist, otherwise Ver 2.0."""
    names = list(dict.fromkeys(rulenames))
    if not names:
        raise ValueError("Failed to get NCCPI rulename")
    if len(names) == 1:
        return names[0]
    if NCCPI_V3_RULE in names:
        return NCCPI_V3_RULE
    return NCCPI_V2_RULE


def calc_nccpi2(
    component: DataFrame, cointerp: DataFrame, exact_scale: int | None = None
) -> DataFrame:
    """NCCPI v2 (CalcNCCPI2, gSSURGO_ValuTable.py:2097-2275): the
    pre-FY2018 rule generation — corn and soybeans are ONE combined
    submodel ('Corn and Soybeans (II)') and the output columns are
    nccpi2cs/nccpi2co/nccpi2sg/nccpi2all. Per mukey:
    Σ(fuzzy·comppct) over major components' v2 cointerp rows,
    normalized by the mapunit's total major-component percent
    (dPct[mukey][2], :2434-2452) — faithfully from the component
    table, so a major component with no NCCPI rating still counts in
    the denominator, exactly as the reference's cursor does."""
    co = component.where(F.col("majcompflag") == "Yes").select(
        "mukey", "cokey", "comppct_r"
    )
    den = co.groupBy("mukey").agg(F.sum("comppct_r").alias("__sumpct"))
    ci = cointerp.where(F.col("mrulename") == NCCPI_V2_RULE)
    j = co.join(ci, "cokey")

    def _num(cond):
        return F.sum(F.when(cond, F.col("interphr") * F.col("comppct_r")))

    d1 = F.col("ruledepth") == 1
    nums = j.groupBy("mukey").agg(
        _num(F.col("ruledepth") == 0).alias("__all"),
        _num(
            d1 & (F.col("rulename") == "NCCPI - NCCPI Corn and Soybeans Submodel (II)")
        ).alias("__cs"),
        _num(d1 & (F.col("rulename") == "NCCPI - NCCPI Cotton Submodel (II)")).alias(
            "__co"
        ),
        _num(
            d1 & (F.col("rulename") == "NCCPI - NCCPI Small Grains Submodel (II)")
        ).alias("__sg"),
    )

    def _out(c):
        mean = c / F.col("__sumpct")
        if exact_scale is not None:
            return F.floor(mean * exact_scale).cast("long")
        return F.round(mean, 3)

    return nums.join(den, "mukey").select(
        "mukey",
        _out(F.col("__cs")).alias("nccpi2cs"),
        _out(F.col("__co")).alias("nccpi2co"),
        _out(F.col("__sg")).alias("nccpi2sg"),
        _out(F.col("__all")).alias("nccpi2all"),
    )


def calc_pwsl(component: DataFrame) -> DataFrame:
    """Potential wet soil landscape (CalcPWSL, :2479-2665): Σ comppct
    of components that are Water-named (≥80% total ⇒ sentinel 999,
    :2535-2556), hydric='Yes', or unranked-hydric with poor drainage /
    drained-phase markers."""
    water = F.col("compname").isin("Water", "WATER", "water")
    hydric = F.col("hydricrating") == "Yes"
    unranked_wet = (F.col("hydricrating") == "Unranked") & (
        F.col("drainagecl").isin("Poorly drained", "Very poorly drained")
        | F.lower(F.coalesce(F.col("localphase"), F.lit(""))).contains("drained")
        | F.lower(F.coalesce(F.col("otherph"), F.lit(""))).contains("drained")
    )
    agg = component.groupBy("mukey").agg(
        F.sum(F.when(water | hydric | unranked_wet, F.col("comppct_r")))
        .alias("pwsl_pct"),
        F.sum(F.when(water, F.col("comppct_r"))).alias("water_pct"),
    )
    return agg.select(
        "mukey",
        F.when(F.col("water_pct") >= 80, F.lit(999))
        .otherwise(F.col("pwsl_pct"))
        .cast("int")
        .alias("pwsl1pomu"),
    )


def build_valu1(
    component: DataFrame,
    chorizon: DataFrame,
    corestrictions: DataFrame | None = None,
    cointerp: DataFrame | None = None,
    chtexturegrp: DataFrame | None = None,
    chtexture: DataFrame | None = None,
    chfrags: DataFrame | None = None,
    ranges: list[tuple[int, int]] | None = None,
    exact_scales: tuple[int, int, int] | None = None,
    cache_qt: bool = False,
    nccpi_rulenames: list[str] | None = None,
) -> DataFrame:
    """Assemble the wide Valu1 table (CreateValuTable orchestration,
    gSSURGO_ValuTable.py:2992-3209): independent metric branches over
    one query table, joined on mukey.

    ``cache_qt`` defaults OFF deliberately: although 4+ branches read
    the query table (the reference materializes QueryTable_HZ for the
    same reason, :341-352), caching the WIDE row defeats per-branch
    column pruning — measured 2.6x SLOWER than recomputing the pruned
    subtrees (18-23s vs 7-9s at sf0.1). Turn it on only when the
    upstream join is genuinely expensive relative to its width.

    ``exact_scales`` = (aws_scale, soc_scale, nccpi_scale) switches the
    float metrics to floor-quantized integer output (see calc_aws) for
    cross-engine hashing.

    ``nccpi_rulenames``: the distinct sdvattribute.nasisrulename values
    of the source database; when given, the NCCPI branch dispatches to
    v2 or v3 the way CreateValuTable does (resolve_nccpi_mainrule,
    reference :3018-3064). Default: v3 shape.

    Per-branch query tables (round 3): each metric joins ONLY the
    child tables it reads — CalcRZDepth needs texture/lieutex (the
    organic test), CalcSOC needs fragvol, CalcAWS/CalcRZAWS need just
    the horizon depths+awc. One shared wide qt made every branch pay
    for the texture and fragment joins it never read (and re-JIT the
    wider codegen): pruning them cut the cold rz-aws plan ~3x."""
    aws_s, soc_s, nccpi_s = exact_scales or (None, None, None)
    # rz-depth reads texture/lieutex; aws/rz-aws read depths+awc only;
    # soc reads fragvol+om+db — three pruned qts, no shared wide row
    qt_tex = build_query_table(component, chorizon, chtexturegrp, chtexture)
    qt_hz = build_query_table(component, chorizon)
    qt_soc = build_query_table(component, chorizon, chfrags=chfrags)
    if cache_qt:
        qt_hz = qt_hz.cache()
    restr = (
        get_co_restrictions(corestrictions)
        if corestrictions is not None
        else None
    )
    rz = calc_rz_depth(
        qt_tex,
        restr if restr is not None
        else component.select("cokey").distinct().withColumn(
            "resdept", F.lit(None).cast("int")
        ).select("cokey", "resdept"),
    )
    out = get_sum_pct(component)
    aws_long = calc_aws(qt_hz, ranges, exact_scale=aws_s)
    # wide layout aws<t>_<b> / tk<t>_<b>a via conditional aggregation
    # (pivot() keys on one column; the range is a (top,bot) pair)
    rng = ranges or DEPTH_RANGES
    aws_cols = aws_long.groupBy("mukey").agg(
        *[
            F.max(
                F.when((F.col("top") == t) & (F.col("bot") == b), F.col("aws"))
            ).alias(f"aws{t}_{b}")
            for t, b in rng
        ],
        *[
            F.max(
                F.when((F.col("top") == t) & (F.col("bot") == b), F.col("tk"))
            ).alias(f"tk{t}_{b}a")
            for t, b in rng
        ],
    )
    out = out.join(aws_cols, "mukey", "left")
    soc_long = calc_soc(qt_soc, restr, ranges, exact_scale=soc_s)
    soc_cols = soc_long.groupBy("mukey").agg(
        *[
            F.max(
                F.when((F.col("top") == t) & (F.col("bot") == b), F.col("soc"))
            ).alias(f"soc{t}_{b}")
            for t, b in rng
        ]
    )
    out = out.join(soc_cols, "mukey", "left")
    out = out.join(calc_rz_aws(qt_hz, rz), "mukey", "left")
    if cointerp is not None:
        nccpi_fn = calc_nccpi
        if nccpi_rulenames is not None:
            main = resolve_nccpi_mainrule(nccpi_rulenames)
            nccpi_fn = calc_nccpi2 if main == NCCPI_V2_RULE else calc_nccpi
        out = out.join(
            nccpi_fn(component, cointerp, exact_scale=nccpi_s), "mukey", "left"
        )
    out = out.join(calc_pwsl(component), "mukey", "left")
    return out
