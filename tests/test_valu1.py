"""Valu1 pipeline tests on SSURGO-shaped fixtures with hand-computed
root-zone / AWS / SOC / PWSL expectations."""

from __future__ import annotations

import pytest
from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.valu1 import (
    build_query_table,
    build_valu1,
    calc_aws,
    calc_pwsl,
    calc_rz_aws,
    calc_rz_depth,
    get_co_restrictions,
    get_sum_pct,
)


def tables(spark):
    component = spark.createDataFrame(
        [
            # mukey, cokey, compname, pct, majcomp, compkind, hydric,
            # drainage, localphase, otherph, taxorder, taxsubgrp
            ("mu1", "c1", "Alpha", 60, "Yes", "Series", "No",
             "Well drained", None, None, "Alfisols", "Typic"),
            ("mu1", "c2", "Beta", 40, "Yes", "Series", "Yes",
             "Poorly drained", None, None, "Alfisols", "Typic"),
            ("mu2", "c3", "Water", 90, "No", "Miscellaneous area", None,
             None, None, None, None, None),
            ("mu2", "c4", "Gamma", 10, "Yes", "Series", "Unranked",
             "Very poorly drained", None, None, "Alfisols", "Typic"),
        ],
        "mukey string, cokey string, compname string, comppct_r int, "
        "majcompflag string, compkind string, hydricrating string, "
        "drainagecl string, localphase string, otherph string, "
        "taxorder string, taxsubgrp string",
    )
    chorizon = spark.createDataFrame(
        [
            # c1: 0-50 good, 50-100 pH 3.0 (root-zone stopper at 50)
            ("h1", "c1", 0, 50, 0.20, 6.5, 1.0, 1.40, 2.0, 40.0, 40.0, 20.0, None),
            ("h2", "c1", 50, 100, 0.10, 3.0, 1.0, 1.40, 1.0, 40.0, 40.0, 20.0, None),
            # c2: 0-150 uniform
            ("h3", "c2", 0, 150, 0.15, 6.0, 1.0, 1.30, 3.0, 30.0, 40.0, 30.0, "O"),
        ],
        "chkey string, cokey string, hzdept_r int, hzdepb_r int, awc_r double, "
        "ph1to1h2o_r double, ec_r double, dbthirdbar_r double, om_r double, "
        "sandtotal_r double, silttotal_r double, claytotal_r double, "
        "desgnmaster string",
    )
    corestrictions = spark.createDataFrame(
        [
            ("r1", "c2", "Lithic bedrock", None, 120),
            ("r2", "c2", "Lithic bedrock", None, 130),  # deeper dup ignored
            ("r3", "c1", "Abrupt textural change", None, 10),  # non-qualifying
        ],
        "corestrictkey string, cokey string, reskind string, reshard string, "
        "resdept_r int",
    )
    return component, chorizon, corestrictions


def test_sum_pct(spark):
    component, _, _ = tables(spark)
    r = {x["mukey"]: x for x in get_sum_pct(component).collect()}
    assert r["mu1"]["musumcpct"] == 100
    assert r["mu2"]["musumcpcta"] == 10  # Water/Misc excluded from major-earthy


def test_first_restriction(spark):
    _, _, corestrictions = tables(spark)
    out = rows_to_dict(get_co_restrictions(corestrictions), "cokey", "resdept")
    assert out == {"c2": 120}  # shallowest qualifying kind only


def test_rz_depth_ph_and_restriction(spark):
    component, chorizon, corestrictions = tables(spark)
    qt = build_query_table(component, chorizon)
    rz = rows_to_dict(
        calc_rz_depth(qt, get_co_restrictions(corestrictions)), "cokey", "rzdepth"
    )
    assert rz["c1"] == 50  # pH 3.0 horizon starts at 50
    assert rz["c2"] == 120  # bedrock at 120 beats the 150 default


def test_rz_aws(spark):
    component, chorizon, corestrictions = tables(spark)
    qt = build_query_table(component, chorizon)
    rz = calc_rz_depth(qt, get_co_restrictions(corestrictions))
    out = {x["mukey"]: x for x in calc_rz_aws(qt, rz).collect()}
    # c1: 50cm*0.2*10 = 100mm ; c2: 120cm*0.15*10 = 180mm
    expect = round((60 * 100 + 40 * 180) / 100)
    assert out["mu1"]["rootznaws"] == expect
    assert out["mu1"]["droughty"] == (1 if expect <= 152 else 0)


def test_aws_ranges_single_pass(spark):
    component, chorizon, _ = tables(spark)
    qt = build_query_table(component, chorizon)
    out = calc_aws(qt, ranges=[(0, 20), (0, 100)])
    r = {(x["mukey"], x["top"], x["bot"]): x["aws"] for x in out.collect()}
    # mu1 (0,20): c1 20*0.2*10=40, c2 20*0.15*10=30 -> .6*40+.4*30=36
    assert r[("mu1", 0, 20)] == pytest.approx(36.0)
    # mu1 (0,100): c1 50*2+50*1=150, c2 100*1.5=150
    assert r[("mu1", 0, 100)] == pytest.approx(150.0)


def test_pwsl(spark):
    component, _, _ = tables(spark)
    out = rows_to_dict(calc_pwsl(component), "mukey", "pwsl1pomu")
    assert out["mu1"] == 40  # hydric c2
    assert out["mu2"] == 999  # Water >= 80% sentinel


def test_build_valu1_wide(spark):
    component, chorizon, corestrictions = tables(spark)
    wide = build_valu1(
        component, chorizon, corestrictions, ranges=[(0, 20), (0, 100)]
    )
    row = {x["mukey"]: x for x in wide.collect()}
    assert row["mu1"]["aws0_20"] == pytest.approx(36.0)
    assert row["mu1"]["pwsl1pomu"] == 40
    assert row["mu1"]["musumcpct"] == 100
    assert "soc0_100" in wide.columns


def test_nccpi_mainrule_resolution():
    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        NCCPI_V2_RULE,
        NCCPI_V3_RULE,
        resolve_nccpi_mainrule,
    )

    # prefer v3 when both generations are present
    assert resolve_nccpi_mainrule([NCCPI_V2_RULE, NCCPI_V3_RULE]) == NCCPI_V3_RULE
    # single name wins outright (even a non-standard one)
    assert resolve_nccpi_mainrule([NCCPI_V2_RULE]) == NCCPI_V2_RULE
    assert resolve_nccpi_mainrule(["custom"]) == "custom"
    # several names, none v3 -> v2
    assert resolve_nccpi_mainrule(["custom", NCCPI_V2_RULE]) == NCCPI_V2_RULE
    with pytest.raises(ValueError):
        resolve_nccpi_mainrule([])


def test_calc_nccpi2_combined_submodel_and_denominator(spark):
    """v2 layout: Corn+Soybeans is ONE submodel; unrated major
    components still count in the major-pct denominator."""
    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        NCCPI_V2_RULE,
        calc_nccpi2,
    )

    component = spark.createDataFrame(
        [
            ("mu1", "c1", 60, "Yes"),
            ("mu1", "c2", 40, "Yes"),  # major but NO cointerp rows
            ("mu1", "c3", 10, "No"),  # non-major: excluded everywhere
        ],
        "mukey string, cokey string, comppct_r int, majcompflag string",
    )
    cointerp = spark.createDataFrame(
        [
            ("c1", 0, "NCCPI - National Commodity Crop Productivity Index (Ver 2.0)",
             NCCPI_V2_RULE, 0.8),
            ("c1", 1, "NCCPI - NCCPI Corn and Soybeans Submodel (II)",
             NCCPI_V2_RULE, 0.5),
            ("c1", 1, "NCCPI - NCCPI Cotton Submodel (II)", NCCPI_V2_RULE, 0.25),
            # v3-generation row must be ignored by the v2 calc
            ("c1", 0, "NCCPI - National Commodity Crop Productivity Index",
             "NCCPI - National Commodity Crop Productivity Index (Ver 3.0)", 0.9),
        ],
        "cokey string, ruledepth int, rulename string, mrulename string,"
        " interphr double",
    )
    row = calc_nccpi2(component, cointerp).collect()[0]
    # denominator = 100 (60 rated + 40 unrated major), not 60
    assert row["nccpi2all"] == pytest.approx(round(0.8 * 60 / 100, 3))
    assert row["nccpi2cs"] == pytest.approx(round(0.5 * 60 / 100, 3))
    assert row["nccpi2co"] == pytest.approx(round(0.25 * 60 / 100, 3))
    assert row["nccpi2sg"] is None


def test_rz_chain_matches_independent_reference(spark):
    """calc_rz_depth -> calc_rz_aws -> droughty vs a direct Python
    loop built from the spec (gSSURGO_ValuTable.py:741-1478 semantics
    as documented on the operators), over seeded random tables that
    hit every rule: dense layers with one backfilled separate, acid
    horizons on organic vs histic vs mineral taxa, qualifying and
    non-qualifying restrictions at the 150 cm boundary, components
    with no horizons, mapunits with no rated members.

    awc values are exact binary fractions so every sum/product is
    exact in double; the single final division + HALF_UP round (via
    shortest-repr Decimal, Java's BigDecimal.valueOf contract) is the
    only inexact step on either engine."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        OM_LIEUTEX,
        OM_TEXTURES,
        RZ_RESKINDS,
    )

    def round_half_up(x):
        return float(
            Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    def ref(comps, hzs, rests):
        # shallowest qualifying restriction per cokey
        resd = {}
        for key, ck, kind, dep in rests:
            if kind in RZ_RESKINDS and dep is not None and dep < 150:
                cur = resd.get(ck)
                if cur is None or (dep, key) < cur:
                    resd[ck] = (dep, key)

        def organic(h, co):
            if co["taxorder"] == "Histosols" or "histic" in (
                co["taxsubgrp"] or ""
            ).lower():
                return False
            return (
                (h["desgn"] or "").upper() in ("O", "L")
                or (h["texture"] or "").upper() in OM_TEXTURES
                or (h["lieutex"] or "") in OM_LIEUTEX
            )

        def dense(h):
            s0, si0, c0 = h["sand"], h["silt"], h["clay"]
            s = s0 if s0 is not None else (
                100.0 - si0 - c0 if si0 is not None and c0 is not None else None
            )
            si = si0 if si0 is not None else (
                100.0 - s0 - c0 if s0 is not None and c0 is not None else None
            )
            c = c0 if c0 is not None else (
                100.0 - s0 - si0 if s0 is not None and si0 is not None else None
            )
            bd = h["bd"]
            if bd is None or s is None or si is None or c is None:
                return False
            return (bd - (s * 1.65 + si * 1.30 + c * 1.25) / 100.0) > (
                s * 0.002081 + si * 0.003912 + c * 0.0024351
            )

        rz = {}  # ck -> rzdepth
        for co in comps:
            if not (
                co["compkind"] is not None
                and co["compkind"] != "Miscellaneous area"
                and co["majcomp"] == "Yes"
            ):
                continue
            mine = [h for h in hzs if h["ck"] == co["ck"]]
            if not mine:
                continue
            lim = [
                h["t"]
                for h in mine
                if dense(h)
                or (
                    h["ph"] is not None
                    and h["ph"] <= 3.5
                    and not organic(h, co)
                )
                or (h["ec"] is not None and h["ec"] >= 16)
            ]
            hz_restrict = min(lim) if lim else 150
            res = resd.get(co["ck"], (150, None))[0]
            rz[co["ck"]] = min(hz_restrict, res, 150)

        out = {}
        by_mu = {}
        for co in comps:
            if co["ck"] in rz:
                by_mu.setdefault(co["mu"], []).append(co)
        for mu, members in by_mu.items():
            num_aws = den_aws = 0.0
            num_emc = den_emc = 0.0
            any_caws = False
            for co in members:
                depth = rz[co["ck"]]
                caws = None
                for h in hzs:
                    if h["ck"] == co["ck"] and h["awc"] is not None:
                        th = max(min(h["b"], depth) - max(h["t"], 0), 0)
                        caws = (caws or 0.0) + th * h["awc"] * 10.0
                if caws is not None:
                    num_aws += co["pct"] * caws
                    den_aws += co["pct"]
                    any_caws = True
                num_emc += co["pct"] * depth
                den_emc += co["pct"]
            rootznaws = (
                round_half_up(num_aws / den_aws) if any_caws else None
            )
            rootznemc = min(round_half_up(num_emc / den_emc), 150.0)
            out[mu] = (
                rootznaws,
                rootznemc,
                None if rootznaws is None else int(rootznaws <= 152),
            )
        return out

    rng = random.Random(20260814)
    for case in range(4):
        comps, hzs, rests = [], [], []
        ck_n = rk_n = 0
        for mu in range(3):
            for _ in range(rng.randint(1, 3)):
                ck_n += 1
                ck = f"c{ck_n}"
                comps.append({
                    "mu": f"mu{mu}", "ck": ck,
                    "pct": rng.randint(1, 100),
                    "majcomp": rng.choice(["Yes", "Yes", "No"]),
                    "compkind": rng.choice(
                        ["Series", "Series", "Miscellaneous area", None]
                    ),
                    "taxorder": rng.choice(["Alfisols", "Histosols"]),
                    "taxsubgrp": rng.choice([None, "Typic", "Histic foo"]),
                })
                t = 0
                for _h in range(rng.randint(0, 3)):
                    b = t + rng.randint(10, 60)
                    hzs.append({
                        "ck": ck, "t": t, "b": b,
                        "awc": rng.choice([None, 0.0, 0.25, 0.5]),
                        "ph": rng.choice([None, 3.0, 3.5, 5.0]),
                        "ec": rng.choice([None, 10.0, 16.0, 20.0]),
                        "bd": rng.choice([None, 1.2, 1.8]),
                        "sand": rng.choice([None, 20.0, 40.0]),
                        "silt": rng.choice([None, 20.0, 40.0]),
                        "clay": rng.choice([None, 20.0, 40.0]),
                        "desgn": rng.choice([None, "O", "A"]),
                        "texture": rng.choice([None, "PEAT", "SIL"]),
                        "lieutex": rng.choice([None, "Muck"]),
                    })
                    t = b
                for _r in range(rng.randint(0, 2)):
                    rk_n += 1
                    rests.append((
                        f"r{rk_n}", ck,
                        rng.choice(RZ_RESKINDS[:2] + ["Abrupt textural change"]),
                        rng.choice([10, 50, 120, 149, 150, 160, None]),
                    ))

        component = spark.createDataFrame(
            [
                (c["mu"], c["ck"], c["pct"], c["majcomp"], c["compkind"],
                 c["taxorder"], c["taxsubgrp"])
                for c in comps
            ],
            "mukey string, cokey string, comppct_r int, majcompflag string,"
            " compkind string, taxorder string, taxsubgrp string",
        )
        chorizon = spark.createDataFrame(
            [
                (h["ck"], h["t"], h["b"], h["awc"], h["ph"], h["ec"],
                 h["bd"], h["sand"], h["silt"], h["clay"], h["desgn"],
                 h["texture"], h["lieutex"])
                for h in hzs
            ],
            "cokey string, hzdept_r int, hzdepb_r int, awc_r double,"
            " ph1to1h2o_r double, ec_r double, dbthirdbar_r double,"
            " sandtotal_r double, silttotal_r double, claytotal_r double,"
            " desgnmaster string, texture string, lieutex string",
        )
        corestrictions = spark.createDataFrame(
            [(k, ck, kind, dep) for k, ck, kind, dep in rests],
            "corestrictkey string, cokey string, reskind string,"
            " resdept_r int",
        )
        qt = component.join(chorizon, "cokey", "left")
        rzdepth = calc_rz_depth(qt, get_co_restrictions(corestrictions))
        got = {
            r["mukey"]: (r["rootznaws"], r["rootznemc"], r["droughty"])
            for r in calc_rz_aws(qt, rzdepth).collect()
        }
        assert got == ref(comps, hzs, rests), f"case {case}"


def test_calc_aws_matches_independent_reference(spark):
    """calc_aws (all 11 depth ranges in one pass, exact_scale output)
    vs a direct per-range loop: clipped thickness per horizon, null-awc
    horizons excluded from BOTH sums, contributing-member weight
    renormalization per range, components with no horizons emitting
    null range rows. exact binary awc fractions keep both engines'
    arithmetic exact up to the single division (then *scale + floor,
    identical IEEE ops)."""
    import math
    import random

    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        DEPTH_RANGES,
    )

    def ref(comps, hzs, scale):
        out = {}
        for mu in {c["mu"] for c in comps}:
            members = [c for c in comps if c["mu"] == mu]
            for t, b in DEPTH_RANGES:
                num_a = den_a = num_t = den_t = 0.0
                any_a = any_t = False
                for co in members:
                    caws = ctk = None
                    for h in hzs:
                        if h["ck"] == co["ck"] and h["awc"] is not None:
                            th = max(min(h["b"], b) - max(h["t"], t), 0)
                            caws = (caws or 0.0) + th * h["awc"] * 10.0
                            ctk = (ctk or 0.0) + th
                    if caws is not None:
                        num_a += co["pct"] * caws
                        den_a += co["pct"]
                        any_a = True
                    if ctk is not None:
                        num_t += co["pct"] * ctk
                        den_t += co["pct"]
                        any_t = True
                out[(mu, t, b)] = (
                    math.floor(num_a / den_a * scale) if any_a else None,
                    math.floor(num_t / den_t * scale) if any_t else None,
                )
        return out

    rng = random.Random(20260814)
    for case in range(3):
        comps, hzs = [], []
        ck_n = 0
        for mu in range(3):
            for _ in range(rng.randint(1, 3)):
                ck_n += 1
                ck = f"c{ck_n}"
                comps.append(
                    {"mu": f"mu{mu}", "ck": ck, "pct": rng.randint(1, 100)}
                )
                t = 0
                for _h in range(rng.randint(0, 4)):
                    b = t + rng.randint(3, 80)
                    hzs.append({
                        "ck": ck, "t": t, "b": b,
                        "awc": rng.choice([None, 0.0, 0.25, 0.5, 0.125]),
                    })
                    t = b

        component = spark.createDataFrame(
            [(c["mu"], c["ck"], c["pct"]) for c in comps],
            "mukey string, cokey string, comppct_r int",
        )
        chorizon = spark.createDataFrame(
            [(h["ck"], h["t"], h["b"], h["awc"]) for h in hzs],
            "cokey string, hzdept_r int, hzdepb_r int, awc_r double",
        )
        qt = component.join(chorizon, "cokey", "left")
        got = {
            (r["mukey"], r["top"], r["bot"]): (r["aws"], r["tk"])
            for r in calc_aws(qt, exact_scale=100).collect()
        }
        assert got == ref(comps, hzs, 100), f"case {case}"


def test_calc_soc_matches_independent_reference(spark):
    """calc_soc (exact_scale mode) vs a direct loop: per-horizon clip
    additionally capped at the restriction depth, carbon factor
    (1 - fragvol/100)*10*(om/1.724)*db3 with null fragvol as 0,
    null om/db3 horizons excluded, per-horizon floor-quantization
    BEFORE summing (the order-independence contract), then the
    weighted mean floored. The reference replicates the exact IEEE
    expression grouping, so values match bit-for-bit."""
    import math
    import random

    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        DEPTH_RANGES,
        RZ_RESKINDS,
        calc_soc,
    )

    SCALE = 1000

    def ref(comps, hzs, rests):
        resd = {}
        for key, ck, kind, dep in rests:
            if kind in RZ_RESKINDS and dep is not None and dep < 150:
                cur = resd.get(ck)
                if cur is None or (dep, key) < cur:
                    resd[ck] = (dep, key)
        out = {}
        for mu in {c["mu"] for c in comps}:
            members = [c for c in comps if c["mu"] == mu]
            for t, b in DEPTH_RANGES:
                num = den = 0
                rated = False
                for co in members:
                    csoc = None
                    cap = resd.get(co["ck"], (999, None))[0]
                    for h in hzs:
                        if h["ck"] != co["ck"]:
                            continue
                        if h["om"] is None or h["db3"] is None:
                            continue
                        th = max(
                            min(h["b"], b, cap) - max(h["t"], t), 0
                        )
                        frag = h["frag"] if h["frag"] is not None else 0.0
                        carbon = (
                            (1.0 - frag / 100.0)
                            * 10.0
                            * (h["om"] / 1.724)
                            * h["db3"]
                        )
                        csoc = (csoc or 0) + math.floor(th * carbon * SCALE)
                    if csoc is not None:
                        num += co["pct"] * csoc
                        den += co["pct"]
                        rated = True
                out[(mu, t, b)] = (
                    math.floor(num / den) if rated else None
                )
        return out

    rng = random.Random(20260814)
    for case in range(3):
        comps, hzs, rests = [], [], []
        ck_n = rk_n = 0
        for mu in range(3):
            for _ in range(rng.randint(1, 3)):
                ck_n += 1
                ck = f"c{ck_n}"
                comps.append(
                    {"mu": f"mu{mu}", "ck": ck, "pct": rng.randint(1, 100)}
                )
                t = 0
                for _h in range(rng.randint(0, 4)):
                    b = t + rng.randint(3, 80)
                    hzs.append({
                        "ck": ck, "t": t, "b": b,
                        "om": rng.choice([None, 1.0, 2.5, 3.449]),
                        "db3": rng.choice([None, 1.2, 1.5]),
                        "frag": rng.choice([None, 0.0, 10.0, 25.0]),
                    })
                    t = b
                for _r in range(rng.randint(0, 2)):
                    rk_n += 1
                    rests.append((
                        f"r{rk_n}", ck,
                        rng.choice(RZ_RESKINDS[:2] + ["Abrupt textural change"]),
                        rng.choice([10, 50, 120, 149, 150, None]),
                    ))

        component = spark.createDataFrame(
            [(c["mu"], c["ck"], c["pct"]) for c in comps],
            "mukey string, cokey string, comppct_r int",
        )
        chorizon = spark.createDataFrame(
            [
                (h["ck"], h["t"], h["b"], h["om"], h["db3"], h["frag"])
                for h in hzs
            ],
            "cokey string, hzdept_r int, hzdepb_r int, om_r double,"
            " dbthirdbar_r double, fragvol double",
        )
        corestrictions = spark.createDataFrame(
            [(k, ck, kind, dep) for k, ck, kind, dep in rests],
            "corestrictkey string, cokey string, reskind string,"
            " resdept_r int",
        )
        qt = component.join(chorizon, "cokey", "left")
        got = {
            (r["mukey"], r["top"], r["bot"]): r["soc"]
            for r in calc_soc(
                qt,
                restrictions=get_co_restrictions(corestrictions),
                exact_scale=SCALE,
            ).collect()
        }
        assert got == ref(comps, hzs, rests), f"case {case}"


def test_calc_pwsl_matches_independent_reference(spark):
    """calc_pwsl vs a direct loop over random component tables: the
    Water-name set, hydric Yes, unranked-hydric with poor drainage or
    'drained' phase markers (case-insensitive substring), the >=80%
    water sentinel 999, and the all-dry null group."""
    import random

    def ref(comps):
        out = {}
        for mu in {c["mu"] for c in comps}:
            wet = water = None
            for c in comps:
                if c["mu"] != mu:
                    continue
                is_water = c["name"] in ("Water", "WATER", "water")
                is_hydric = c["hyd"] == "Yes"
                unranked_wet = c["hyd"] == "Unranked" and (
                    c["drain"] in ("Poorly drained", "Very poorly drained")
                    or "drained" in (c["lph"] or "").lower()
                    or "drained" in (c["oph"] or "").lower()
                )
                if is_water or is_hydric or unranked_wet:
                    wet = (wet or 0) + c["pct"]
                if is_water:
                    water = (water or 0) + c["pct"]
            out[mu] = 999 if (water or 0) >= 80 and water is not None else wet
        return out

    rng = random.Random(20260814)
    for case in range(3):
        comps = []
        for mu in range(4):
            for _ in range(rng.randint(1, 4)):
                comps.append({
                    "mu": f"mu{mu}",
                    "name": rng.choice(
                        ["Alpha", "Water", "WATER", "water", "Beta"]
                    ),
                    "pct": rng.randint(1, 90),
                    "hyd": rng.choice(["Yes", "No", "Unranked", None]),
                    "drain": rng.choice(
                        ["Well drained", "Poorly drained",
                         "Very poorly drained", None]
                    ),
                    "lph": rng.choice([None, "Drained", "gravelly"]),
                    "oph": rng.choice([None, "undrained", "stony"]),
                })
        df = spark.createDataFrame(
            [
                (c["mu"], c["name"], c["pct"], c["hyd"], c["drain"],
                 c["lph"], c["oph"])
                for c in comps
            ],
            "mukey string, compname string, comppct_r int,"
            " hydricrating string, drainagecl string, localphase string,"
            " otherph string",
        )
        got = {
            r["mukey"]: r["pwsl1pomu"] for r in calc_pwsl(df).collect()
        }
        assert got == ref(comps), f"case {case}"


def test_calc_nccpi_matches_independent_reference(spark):
    """calc_nccpi (v3, exact_scale) vs a direct loop: major components
    only, NCCPI% mrulename filter, the ruledepth-0 denominator over
    JOINED rows (a duplicated overall row doubles the weight, a
    component with no rows contributes nothing — the reference
    cursor's exact behavior), submodel dispatch by rulename substring,
    null interphr rows skipped. Exact-fraction fuzzy values keep both
    engines exact up to the final division/floor."""
    import math
    import random

    from soil_data_development_tools___arcmap_spark.valu1.pipeline import (
        calc_nccpi,
    )

    SCALE = 1000
    SUBS = [
        "NCCPI - NCCPI Corn Submodel (I)",
        "NCCPI - NCCPI Soybeans Submodel (I)",
        "NCCPI - NCCPI Cotton Submodel (II)",
        "NCCPI - NCCPI Small Grains Submodel (II)",
        "Overall",
    ]

    def ref(comps, ints):
        rows = []
        for c in comps:
            if c["maj"] != "Yes":
                continue
            for i in ints:
                if i["ck"] == c["ck"] and i["mrule"].startswith("NCCPI"):
                    rows.append((c["mu"], c["pct"], i))
        out = {}
        for mu in {mu for mu, _p, _i in rows}:
            mine = [(p, i) for m, p, i in rows if m == mu]
            den = sum(p for p, i in mine if i["rd"] == 0) or None

            def score(cond):
                num = None
                for p, i in mine:
                    if cond(i) and i["hr"] is not None:
                        num = (num or 0.0) + i["hr"] * p
                if num is None or den is None:
                    return None
                return math.floor(num / den * SCALE)

            out[mu] = (
                score(lambda i: i["rd"] == 0),
                score(lambda i: i["rd"] == 1 and "Corn" in i["rule"]),
                score(lambda i: i["rd"] == 1 and "Soybean" in i["rule"]),
                score(lambda i: i["rd"] == 1 and "Cotton" in i["rule"]),
                score(lambda i: i["rd"] == 1 and "Small Grain" in i["rule"]),
            )
        return out

    rng = random.Random(20260814)
    for case in range(3):
        comps, ints = [], []
        ck_n = 0
        for mu in range(3):
            for _ in range(rng.randint(1, 3)):
                ck_n += 1
                ck = f"c{ck_n}"
                comps.append({
                    "mu": f"mu{mu}", "ck": ck,
                    "pct": rng.randint(1, 100),
                    "maj": rng.choice(["Yes", "Yes", "No"]),
                })
                for _i in range(rng.randint(0, 5)):
                    rule = rng.choice(SUBS)
                    ints.append({
                        "ck": ck,
                        "mrule": rng.choice(
                            ["NCCPI - National Commodity Crop Productivity"
                             " Index (Ver 3.0)", "Ensayo Index"]
                        ),
                        "rd": 0 if rule == "Overall" else 1,
                        "rule": rule,
                        "hr": rng.choice([None, 0.25, 0.5, 0.75, 1.0]),
                    })

        component = spark.createDataFrame(
            [(c["mu"], c["ck"], c["pct"], c["maj"]) for c in comps],
            "mukey string, cokey string, comppct_r int, majcompflag string",
        )
        cointerp = spark.createDataFrame(
            [
                (i["ck"], i["mrule"], i["rd"], i["rule"], i["hr"])
                for i in ints
            ],
            "cokey string, mrulename string, ruledepth int,"
            " rulename string, interphr double",
        )
        got = {
            r["mukey"]: (r["nccpi3all"], r["nccpi3corn"], r["nccpi3soy"],
                         r["nccpi3cot"], r["nccpi3sg"])
            for r in calc_nccpi(component, cointerp, exact_scale=SCALE)
            .collect()
        }
        assert got == ref(comps, ints), f"case {case}"
