"""The rating planner: sdvattribute row + user params → aggregation
pipeline (replaces the reference's 300-line flag/method dispatch,
gSSURGO_CreateSoilMap.py:10612-10923, and the CreateRatingTableN
chain selection :10469-10519).

Pure driver-side planning over broadcast-sized metadata: hydrate a
RatingRequest, walk the relationship catalog for the join path, build
the predicate set, pick the operator. The result is a lazy DataFrame —
Catalyst owns physical strategy (broadcasts the metadata-driven dims,
pushes every predicate into the parquet scans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import (
    RatingSpec,
    agg_dcd,
    agg_dcp,
    agg_hz_dcp_wta,
    agg_hz_maxmin_then,
    agg_hz_wta_sum,
    agg_hz_wta_wta,
    agg_limiting,
    agg_maxmin,
    agg_pp_sum,
    agg_wta,
    month_collapse,
)
from .relwalk import build_join_chain, join_path
from .whereclause import parse_where

# dAgg method-name map (gSSURGO_CreateSoilMap.py:9656-9663)
METHODS = {
    "Dominant Component": "DCP",
    "Dominant Condition": "DCD",
    "Weighted Average": "WTA",
    "Minimum or Maximum": "MAXMIN",
    "Most Limiting": "LIMITING_MOST",
    "Least Limiting": "LIMITING_LEAST",
    "Percent Present": "PP",
    "No Aggregation Necessary": "NONE",
    "Absence/Presence": "PP",
}


@dataclass
class RatingRequest:
    """One rating query, hydrated from an sdvattribute row
    (GetSDVAtts, gSSURGO_CreateSoilMap.py:3689-3818) + user params."""

    attributename: str
    attributetablename: str
    attributecolumnname: str
    method: str  # resolved aggregation key from METHODS
    resultcolumn: str = "rating"
    # flags
    mapunit_level: bool = False
    comp_level: bool = False
    month_level: bool = False
    horizon_level: bool = False
    # tiebreak / domain
    tiebreak_higher: bool = False
    domain: list[str] | None = None
    domain_reversed: bool = False
    not_rated: str | None = None
    null_replacement: float | str | None = None
    zero_nulls: bool = False
    precision: int | None = None
    sqlwhereclause: str | None = None
    fuzzy: bool = False  # interp fuzzy value (INTERPHR) vs rating class
    # which representative value to rate: None/'Representative' keeps
    # the _r column; 'Low'/'High' swap to the _l/_h sibling
    # (gSSURGO_CreateSoilMap.py:3774-3783)
    rv: str | None = None
    # user params
    cutoff: int = 0  # component percent cutoff
    top: int = 0
    bot: int = 999
    beg_month: int | None = None
    end_month: int | None = None
    pp_targets: list | None = None
    hz_sum: bool = False  # AWS-style depth-weighted SUM vs average
    # CreateRatingTable3S surface path: keep only the FIRST child row
    # per horizon (gSSURGO_CreateSoilMap.py:4510-4514), then aggregate
    # at component level. child_key orders the children.
    first_child_only: bool = False
    child_key: str | None = None


#: broken sqlwhereclause literals shipped in real SSURGO sdvattribute
#: rows, and their repaired forms (floodBandaid,
#: gSSURGO_CreateSoilMap.py:183-201). Our parser handles parens and IN
#: natively, but the repair is applied anyway so a hydrated request
#: matches what the reference would actually have executed.
_SQL_REPAIRS = {
    "(coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or "
    "coecoclass.ecoclasstypename = 'NRCS Forestland Site')":
        "coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or "
        "coecoclass.ecoclasstypename = 'NRCS Forestland Site'",
    "corestrictions.reskind IN ('Densic bedrock', 'Paralithic bedrock', "
    "'Lithic bedrock')":
        "corestrictions.reskind ='Densic bedrock' OR  "
        "corestrictions.reskind ='Paralithic bedrock' OR "
        "corestrictions.reskind ='Lithic bedrock'",
}


def repair_sdvattribute(sdv_row: dict) -> dict:
    """Metadata bandaid for known-broken sdvattribute rows
    (floodBandaid, gSSURGO_CreateSoilMap.py:166-204). Real SSURGO
    databases ship the flooding-frequency attribute (attributekey 12)
    with a NULL tiebreakdomainname — without the repair the ordinal
    domain never hydrates and the rating tiebreak degrades to string
    order — and two attributes with parenthesized/IN sqlwhereclause
    forms the reference's cursor layer cannot execute. Returns a
    repaired copy; the input dict is not mutated."""
    row = dict(sdv_row)
    if row.get("attributekey") == 12 and not row.get("tiebreakdomainname"):
        row["tiebreakdomainname"] = "flooding_frequency_class"
    wc = row.get("sqlwhereclause")
    if wc in _SQL_REPAIRS:
        row["sqlwhereclause"] = _SQL_REPAIRS[wc]
    return row


def hydrate(
    sdv_row: dict,
    mdstatdomdet: list[dict] | None = None,
    aggmethod: str | None = None,
    **params,
) -> RatingRequest:
    """Build a RatingRequest from a collected sdvattribute row.

    Replicates the reference's defaulting: aggmethod falls back to
    ``algorithmname``; tiebreakrule 1 ⇒ 'Higher' wins; the ordinal
    domain comes from mdstatdomdet.choicesequence filtered to the
    attribute's tiebreakdomainname (GetRatingDomain :3865-3896),
    reversed for suitability interps ruledesign=2 (:9942-9944); interp
    attributes rating INTERPHR when fuzzy (:3719-3738). Known-broken
    metadata is repaired first (repair_sdvattribute).

    ``rv='Low'``/``'High'`` rates the low/high representative value by
    swapping the ``_r`` attribute column to its ``_l``/``_h`` sibling
    (:3774-3783 — "not available with SDV or WSS. Does not work with
    interps", so fuzzy requests never swap). Pass ``columns`` (the
    attribute table's column set) to guard the swap: a column without
    an ``_l``/``_h`` sibling in the catalog stays at ``_r``."""
    sdv_row = repair_sdvattribute(sdv_row)
    method_name = aggmethod or sdv_row.get("algorithmname")
    if method_name not in METHODS:
        raise ValueError(f"unknown aggregation method {method_name!r}")
    domain = None
    domname = sdv_row.get("tiebreakdomainname")
    if domname and mdstatdomdet:
        rows = [
            d
            for d in mdstatdomdet
            if d["domainname"] == domname
            and (d.get("choiceobsolete") or "No") != "Yes"
        ]
        rows.sort(key=lambda d: d["choicesequence"])
        domain = [d["choice"] for d in rows] or None
    nullrep = sdv_row.get("nullratingreplacementvalue")
    if nullrep is not None and str(nullrep).strip() != "":
        try:
            nullrep = float(nullrep)
        except ValueError:
            pass
    else:
        nullrep = None
    fuzzy = bool(params.pop("fuzzy", False)) or (
        sdv_row.get("attributetype") == "Interpretation"
        and (sdv_row.get("effectivelogicaldatatype") or "").lower() == "float"
    )
    rv = params.pop("rv", None)
    columns = params.pop("columns", None)
    colname = "interphr" if fuzzy else sdv_row["attributecolumnname"].lower()
    if rv in ("Low", "High") and not fuzzy and colname.endswith("_r"):
        swapped = colname[:-2] + ("_l" if rv == "Low" else "_h")
        if columns is None or swapped in {c.lower() for c in columns}:
            colname = swapped
    req = RatingRequest(
        attributename=sdv_row["attributename"],
        attributetablename=sdv_row["attributetablename"].lower(),
        attributecolumnname=colname,
        rv=rv,
        method=METHODS[method_name],
        resultcolumn=(sdv_row.get("resultcolumnname") or "rating").lower(),
        mapunit_level=bool(sdv_row.get("mapunitlevelattribflag")),
        comp_level=bool(sdv_row.get("complevelattribflag")),
        month_level=bool(sdv_row.get("cmonthlevelattribflag")),
        horizon_level=bool(sdv_row.get("horzlevelattribflag")),
        tiebreak_higher=sdv_row.get("tiebreakrule") == 1,
        domain=domain,
        domain_reversed=sdv_row.get("ruledesign") == 2,
        not_rated=sdv_row.get("notratedphrase"),
        null_replacement=nullrep,
        zero_nulls=bool(sdv_row.get("interpnullsaszeroflag")),
        precision=sdv_row.get("attributeprecision"),
        sqlwhereclause=sdv_row.get("sqlwhereclause") or None,
        fuzzy=fuzzy,
    )
    for k, v in params.items():
        setattr(req, k, v)
    return req


def _component_filter(req: RatingRequest):
    """comppct cutoff + NOTCOM exclusion (:10287-10293)."""
    cond = F.col("comppct_r").isNotNull()
    if req.cutoff:
        cond = cond & (F.col("comppct_r") >= req.cutoff)
    return cond & (
        F.col("compname").isNull() | (F.col("compname") != "NOTCOM")
    )


def _hz_overlap(req: RatingRequest):
    """Interval-overlap form of the reference's IN-list depth predicate
    (built :10013-10022; semantics per SURVEY §2.2)."""
    return (F.col("hzdept_r") < req.bot) & (F.col("hzdepb_r") > req.top)


def create_soil_map(
    tables: dict[str, DataFrame],
    relations: list[dict],
    req: RatingRequest,
) -> DataFrame:
    """Plan + build the rating DataFrame for one attribute.

    ``tables``: {name: DataFrame} incl. mapunit/component/...;
    ``relations``: collected mdstatrshipdet rows. Returns one rating
    row per mukey with the resultcolumn named per the request.
    """
    spec = RatingSpec(
        rating_col=req.attributecolumnname,
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        tiebreak_higher=req.tiebreak_higher,
        domain=req.domain,
        domain_reversed=req.domain_reversed,
        not_rated=req.not_rated,
        zero_nulls=req.zero_nulls,
        null_replacement=req.null_replacement,
        out_col=req.resultcolumn,
    )

    predicates: dict[str, object] = {}
    if req.comp_level or req.horizon_level or req.month_level:
        predicates["component"] = _component_filter(req)
    if req.horizon_level:
        predicates["chorizon"] = _hz_overlap(req)
    if req.sqlwhereclause:
        tbl = req.attributetablename
        prev = predicates.get(tbl)
        w = parse_where(req.sqlwhereclause)
        predicates[tbl] = (prev & w) if prev is not None else w
    if req.attributetablename == "cointerp":
        # rule selection: the reference semi-joins RULEKEY IN (...)
        # as an index workaround (:10157-10188); the semantics are a
        # plain filter on the rule name + top-level rule depth.
        rule = (F.col("mrulename") == req.attributename) & (F.col("ruledepth") == 0)
        prev = predicates.get("cointerp")
        predicates["cointerp"] = (prev & rule) if prev is not None else rule

    if req.mapunit_level:
        path = (
            join_path(relations, req.attributetablename)
            if req.attributetablename != "mapunit"
            else []
        )
        df = (
            build_join_chain(tables, path, predicates)
            if path
            else tables["mapunit"]
        )
        rating = F.col(req.attributecolumnname)
        if req.precision is not None and req.fuzzy:
            rating = F.round(rating, req.precision)
        return df.select("mukey", rating.alias(req.resultcolumn))

    path = join_path(relations, req.attributetablename)
    df = build_join_chain(tables, path, predicates)
    # the join null-pads mapunits whose components were all filtered
    # (NOTCOM/cutoff); the reference's aggregators skip those rows
    # (null comppct_r never enters an Aggregate* pass)
    df = df.where(F.col("cokey").isNotNull())

    if req.month_level:
        if req.beg_month is None:
            collapsed = month_collapse(df, spec, how="distinct")
        else:
            how = "max" if req.tiebreak_higher else "min"
            collapsed = month_collapse(
                df, spec, how=how, beg_month=req.beg_month, end_month=req.end_month
            )
        df = collapsed

    if req.horizon_level and req.first_child_only:
        # CreateRatingTable3S (gSSURGO_CreateSoilMap.py:4471-4530): the
        # rating for each in-window horizon is taken from the FIRST
        # child row only ("save only rating for first horizon",
        # :4510-4514 — the top-of-depth-range rating); the depth window
        # has already restricted chorizon via _hz_overlap. After the
        # collapse each row is component-level, so control falls
        # through to the normal component aggregation below. The
        # window partitions by (cokey, chkey) — one shuffle that AQE
        # coalesces; at scale this is the same single exchange the
        # component aggregation needs anyway.
        # the reference's "first" is its cursor order — nondeterministic
        # beyond the child key; the rating value is appended for a
        # total order so the pick is reproducible across engines.
        key = req.child_key or "chkey"
        w = Window.partitionBy("cokey", "chkey").orderBy(
            F.col(key).asc(),
            F.col(req.attributecolumnname).asc_nulls_first(),
        )
        df = (
            df.withColumn("__rn_fc", F.row_number().over(w))
            .filter(F.col("__rn_fc") == 1)
            .drop("__rn_fc")
        )
    elif req.horizon_level:
        if req.method == "WTA":
            fn = agg_hz_wta_sum if req.hz_sum else agg_hz_wta_wta
            return fn(df, spec, top=req.top, bot=req.bot, precision=req.precision)
        if req.method == "DCP":
            return agg_hz_dcp_wta(
                df, spec, top=req.top, bot=req.bot, precision=req.precision
            )
        if req.method == "MAXMIN":
            return agg_hz_maxmin_then(
                df,
                spec,
                then="dcd" if req.domain else "wta",
                maximum=req.tiebreak_higher,
                top=req.top,
                bot=req.bot,
                precision=req.precision,
            )
        raise ValueError(f"unsupported horizon method {req.method}")

    if req.method == "DCP":
        return agg_dcp(df, spec)
    if req.method == "DCD":
        return agg_dcd(df, spec, dcp_override=True)
    if req.method == "WTA":
        return agg_wta(df, spec, precision=req.precision)
    if req.method == "MAXMIN":
        return agg_maxmin(df, spec, maximum=req.tiebreak_higher)
    if req.method == "LIMITING_MOST":
        return agg_limiting(df, spec, most=True)
    if req.method == "LIMITING_LEAST":
        return agg_limiting(df, spec, most=False)
    if req.method == "PP":
        targets = req.pp_targets or []
        return agg_pp_sum(df, spec, targets, parent=tables["mapunit"])
    if req.method == "NONE":
        return df.select("mukey", "cokey", "comppct_r",
                         F.col(req.attributecolumnname).alias(req.resultcolumn))
    raise ValueError(f"unsupported method {req.method}")
