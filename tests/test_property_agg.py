"""Property-based tests: the window/groupBy operators must agree with
a direct sort-based reference implementation (the semantics the ArcPy
original computes with cursors) on randomly generated component tables
— ties, missing ratings, out-of-domain values, single-member groups.
"""

from __future__ import annotations

import os

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from soil_data_development_tools___arcmap_spark.operators import (
    RatingSpec,
    agg_dcd,
    agg_dcp,
    agg_limiting,
    agg_wta,
)

DOMAIN = ["R", "A", "N"]

row = st.tuples(
    st.integers(0, 3),                       # mukey
    st.integers(1, 100),                     # comppct_r
    st.sampled_from(["R", "A", "N", "X", None]),  # rating
)
tables = st.lists(row, min_size=1, max_size=14)


def rank(r, domain, higher=False, not_rated=None):
    """Reference-faithful rank (gSSURGO_CreateSoilMap.py:9913-9967):
    not_rated inserted at the start; nulls rank 0 under 'Higher'
    (losing DESC ties) and len+1 otherwise; unknown values last."""
    dom = list(domain)
    if not_rated and not_rated.upper() not in {v.upper() for v in dom}:
        dom.insert(0, not_rated)
    if r is None:
        return 0 if higher else len(dom) + 1
    try:
        return [v.upper() for v in dom].index(r.upper()) + 1
    except ValueError:
        return len(dom) + 1


def ref_dcp(rows, domain, higher=False):
    out = {}
    for mu, pct, r, member in rows:
        rk = rank(r, domain, higher=higher)
        key = (-pct, -rk if higher else rk, member)
        if mu not in out or key < out[mu][0]:
            out[mu] = (key, pct, r)
    return {mu: (pct, r) for mu, (_, pct, r) in out.items()}


def ref_dcd(rows, domain):
    from collections import defaultdict

    by_rating = defaultdict(lambda: [0, None])
    totals = defaultdict(int)
    for mu, pct, r, member in rows:
        g = by_rating[(mu, r)]
        g[0] += pct
        g[1] = member if g[1] is None else min(g[1], member)
        totals[mu] += pct
    winners = {}
    for (mu, r), (sw, mm) in by_rating.items():
        key = (-sw, rank(r, domain), mm)
        if mu not in winners or key < winners[mu][0]:
            winners[mu] = (key, sw, r)
    dcp = ref_dcp(rows, domain)
    out = {}
    for mu, (_, sw, r) in winners.items():
        t = totals[mu]
        pct = (200 * sw + t) // (2 * t)
        dcp_w, dcp_r = dcp[mu]
        out[mu] = (pct, dcp_r if dcp_w >= 50 else r)
    return out


def ref_limiting(rows, domain, most=True):
    from collections import defaultdict

    class_w = defaultdict(int)
    for mu, pct, r, member in rows:
        class_w[(mu, rank(r, domain))] += pct
    nr = len(domain) + 1
    out = {}
    for mu, pct, r, member in rows:
        rk = rank(r, domain)
        key = (rk >= nr, rk if most else -rk, -pct, member)
        if mu not in out or key < out[mu][0]:
            out[mu] = (key, rk, r)
    return {
        mu: (class_w[(mu, rk)], r) for mu, (_, rk, r) in out.items()
    }


def with_members(data):
    return [(mu, pct, r, i) for i, (mu, pct, r) in enumerate(data)]


def build_df(spark, rows):
    return spark.createDataFrame(
        [(mu, m, pct, r) for mu, pct, r, m in rows],
        "mukey int, cokey int, comppct_r int, rating_in string",
    )


SETTINGS = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(data=tables)
@SETTINGS
def test_dcp_dcd_match_reference(spark, data):
    rows = with_members(data)
    df = build_df(spark, rows)
    spec = RatingSpec(
        rating_col="rating_in",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        domain=DOMAIN,
        out_col="rating",
    )
    got_dcp = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_dcp(df, spec).collect()
    }
    assert got_dcp == ref_dcp(rows, DOMAIN)

    spec_hi = RatingSpec(
        rating_col="rating_in",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        domain=DOMAIN,
        tiebreak_higher=True,
        out_col="rating",
    )
    got_hi = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_dcp(df, spec_hi).collect()
    }
    assert got_hi == ref_dcp(rows, DOMAIN, higher=True)

    got_dcd = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_dcd(df, spec, dcp_override=True).collect()
    }
    assert got_dcd == ref_dcd(rows, DOMAIN)


@given(data=tables)
@SETTINGS
def test_limiting_matches_reference(spark, data):
    rows = with_members(data)
    df = build_df(spark, rows)
    for most in (True, False):
        spec = RatingSpec(
            rating_col="rating_in",
            group_cols=["mukey"],
            member_col="cokey",
            weight_col="comppct_r",
            domain=["R", "A"],
            out_col="rating",
        )
        got = {
            r["mukey"]: (r["comppct_r"], r["rating"])
            for r in agg_limiting(df, spec, most=most).collect()
        }
        assert got == ref_limiting(rows, ["R", "A"], most=most)


num_row = st.tuples(
    st.integers(0, 3),
    st.integers(1, 100),
    st.one_of(st.none(), st.integers(0, 50)),
)


@given(data=st.lists(num_row, min_size=1, max_size=14))
@SETTINGS
def test_wta_matches_reference(spark, data):
    rows = [(mu, pct, v, i) for i, (mu, pct, v) in enumerate(data)]
    df = spark.createDataFrame(
        [(mu, m, pct, v) for mu, pct, v, m in rows],
        "mukey int, cokey int, comppct_r int, val int",
    )
    spec = RatingSpec(
        rating_col="val",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        out_col="rating",
    )
    got = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_wta(df, spec).collect()
    }
    from collections import defaultdict

    num, den = defaultdict(int), defaultdict(int)
    mus = set()
    for mu, pct, v, _ in rows:
        mus.add(mu)
        if v is not None:
            num[mu] += pct * v
            den[mu] += pct
    for mu in mus:
        w, r = got[mu]
        if den[mu] == 0:
            assert w is None and r is None
        else:
            assert w == den[mu] and r == num[mu] / den[mu]


@given(data=tables)
@SETTINGS
def test_maxmin_matches_reference(spark, data):
    from soil_data_development_tools___arcmap_spark.operators import agg_maxmin

    rows = with_members(data)
    df = build_df(spark, rows)
    for maximum in (True, False):
        spec = RatingSpec(
            rating_col="rating_in",
            group_cols=["mukey"],
            member_col="cokey",
            weight_col="comppct_r",
            domain=DOMAIN,
            out_col="rating",
        )
        got = {
            r["mukey"]: (r["comppct_r"], r["rating"])
            for r in agg_maxmin(df, spec, maximum=maximum).collect()
        }
        ref = {}
        for mu, pct, r, member in rows:
            rk = rank(r, DOMAIN)
            key = (-rk if maximum else rk, -pct, member)
            if mu not in ref or key < ref[mu][0]:
                ref[mu] = (key, pct, r)
        assert got == {mu: (p, r) for mu, (_, p, r) in ref.items()}


edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0,
    max_size=16,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    """The min-label propagation fixpoint must equal a direct
    union-find on arbitrary random graphs (cycles, self-merges,
    disconnected nodes)."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        connected_components,
    )

    n = 12
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for x in range(n):
        r = find(x)
        expected[x] = min(y for y in range(n) if find(y) == r)

    nodes = spark.createDataFrame([(i,) for i in range(n)], "did long")
    pairs = (
        spark.createDataFrame([(i, j) for i, j in edges], "i long, j long")
        if edges
        else spark.createDataFrame([], "i long, j long")
    )
    got = {
        r["did"]: r["group_rep"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == expected


# --- horizon (depth-weighted) aggregation vs a direct reference ------------
#
# The subtlest §2.4 semantics: clip each horizon to the requested depth
# range, drop null-rating / zero-thickness horizons, renormalize weights
# over CONTRIBUTING members only (WTA_SUM), depth-average per member
# (WTA_WTA), or pick the dominant member first (DCP_WTA — dominance
# judged over ALL members with horizons, so a dominant member whose
# horizons all miss the range yields NO group row).

hz_row = st.tuples(
    st.integers(0, 40),                       # hzdept
    st.integers(0, 30),                       # thickness (hzdepb = t + th)
    st.one_of(st.none(), st.integers(0, 50)),  # rating
)
hz_member = st.tuples(
    st.integers(0, 2),                         # mukey
    st.integers(1, 100),                       # comppct_r
    st.lists(hz_row, max_size=4),              # horizons
)
hz_tables = st.lists(hz_member, min_size=1, max_size=8)

HZ_TOP, HZ_BOT = 5, 30


def _hz_member_sums(members):
    """(mu, ck) -> (pct, sum(th*r), sum(th), saw_valid) over horizons
    clipped to [HZ_TOP, HZ_BOT); members with no horizon rows at all
    never reach the aggregate (no input rows)."""
    out = {}
    for ck, (mu, pct, hzs) in enumerate(members):
        if not hzs:
            continue
        txv = t = 0.0
        valid = False
        for ht, th, r in hzs:
            clipped = max(min(ht + th, HZ_BOT) - max(ht, HZ_TOP), 0)
            if r is not None and clipped > 0:
                txv += clipped * r
                t += clipped
                valid = True
        out[(mu, ck)] = (pct, txv, t, valid)
    return out


def _hz_df(spark, members):
    rows = [
        (mu, ck, pct, ht, ht + th, float(r) if r is not None else None)
        for ck, (mu, pct, hzs) in enumerate(members)
        for ht, th, r in hzs
    ]
    return spark.createDataFrame(
        rows,
        "mukey int, cokey int, comppct_r int,"
        " hzdept_r int, hzdepb_r int, hz_rating double",
    )


HZ_SPEC = dict(
    rating_col="hz_rating",
    group_cols=["mukey"],
    member_col="cokey",
    weight_col="comppct_r",
    out_col="rating",
)


@SETTINGS
@given(members=hz_tables)
def test_hz_wta_sum_matches_reference(spark, members):
    from collections import defaultdict

    from soil_data_development_tools___arcmap_spark.operators import (
        agg_hz_wta_sum,
    )

    groups = defaultdict(list)
    for (mu, _ck), (pct, txv, _t, valid) in _hz_member_sums(members).items():
        if valid:  # __txv IS NULL when no in-range rated horizon
            groups[mu].append((pct, txv))
    expected = {
        mu: (
            sum(p for p, _ in lst),
            sum(p * v for p, v in lst) / sum(p for p, _ in lst),
        )
        for mu, lst in groups.items()
    }
    got = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_hz_wta_sum(
            _hz_df(spark, members), RatingSpec(**HZ_SPEC),
            top=HZ_TOP, bot=HZ_BOT,
        ).collect()
    }
    assert got.keys() == expected.keys()
    for mu, (sw, val) in expected.items():
        assert got[mu][0] == sw
        assert got[mu][1] == pytest.approx(val, rel=1e-9)


@SETTINGS
@given(members=hz_tables)
def test_hz_wta_wta_matches_reference(spark, members):
    from collections import defaultdict

    from soil_data_development_tools___arcmap_spark.operators import (
        agg_hz_wta_wta,
    )

    groups = defaultdict(list)
    for (mu, _ck), (pct, txv, t, _v) in _hz_member_sums(members).items():
        if t > 0:
            groups[mu].append((pct, txv / t))
    expected = {
        mu: (
            sum(p for p, _ in lst),
            sum(p * cv for p, cv in lst) / sum(p for p, _ in lst),
        )
        for mu, lst in groups.items()
    }
    got = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_hz_wta_wta(
            _hz_df(spark, members), RatingSpec(**HZ_SPEC),
            top=HZ_TOP, bot=HZ_BOT,
        ).collect()
    }
    assert got.keys() == expected.keys()
    for mu, (sw, val) in expected.items():
        assert got[mu][0] == sw
        assert got[mu][1] == pytest.approx(val, rel=1e-9)


@SETTINGS
@given(members=hz_tables)
def test_hz_dcp_wta_matches_reference(spark, members):
    from collections import defaultdict

    from soil_data_development_tools___arcmap_spark.operators import (
        agg_hz_dcp_wta,
    )

    by_mu = defaultdict(list)
    for (mu, ck), (pct, txv, t, _v) in _hz_member_sums(members).items():
        by_mu[mu].append((-pct, ck, txv, t))
    expected = {}
    for mu, lst in by_mu.items():
        neg_pct, _ck, txv, t = min(lst)  # max pct, then cokey ASC
        if t > 0:  # dominant member may have NO in-range horizon
            expected[mu] = (-neg_pct, txv / t)
    got = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_hz_dcp_wta(
            _hz_df(spark, members), RatingSpec(**HZ_SPEC),
            top=HZ_TOP, bot=HZ_BOT,
        ).collect()
    }
    assert got.keys() == expected.keys()
    for mu, (pct, val) in expected.items():
        assert got[mu][0] == pct
        assert got[mu][1] == pytest.approx(val, rel=1e-9)


# --- month collapse → WTA composition (the DTWT pipeline) -------------------
#
# Monthly rows replicate the member weight 12x (the reference's trap,
# gSSURGO_CreateSoilMap.py:10710-10716); the operator collapses months
# per member FIRST (min, inside a possibly wrap-around month window,
# nulls replaced by the 201 sentinel) and only then weight-averages
# with the sentinel excluded. The reference below is the direct loop.

mo_row = st.tuples(
    st.integers(1, 12),                        # monthseq
    st.one_of(st.none(), st.integers(0, 250)),  # dtwt (may exceed 201)
)
mo_member = st.tuples(
    st.integers(0, 2),                         # mukey
    st.integers(1, 100),                       # comppct_r
    st.lists(mo_row, min_size=1, max_size=12),
)
mo_tables = st.lists(mo_member, min_size=1, max_size=6)
mo_windows = st.sampled_from([(1, 12), (4, 10), (11, 3)])  # incl. wrap


@SETTINGS
@given(members=mo_tables, window=mo_windows)
def test_mo_wta_dtwt_matches_reference(spark, members, window):
    from collections import defaultdict

    from soil_data_development_tools___arcmap_spark.operators import (
        agg_wta,
        month_collapse,
    )

    beg, end = window

    def in_window(m):
        return beg <= m <= end if beg <= end else (m >= beg or m <= end)

    collapsed = {}  # (mu, ck) -> (pct, min month value, nulls -> 201)
    for ck, (mu, pct, months) in enumerate(members):
        vals = [201 if v is None else v for m, v in months if in_window(m)]
        if vals:
            collapsed[(mu, ck)] = (pct, min(vals))
    num = defaultdict(float)
    den = defaultdict(float)
    mus = set()
    for (mu, _ck), (pct, v) in collapsed.items():
        mus.add(mu)  # every collapsed group emits a row, rated or not
        if v != 201:  # sentinel excluded from BOTH sums
            num[mu] += pct * v
            den[mu] += pct
    expected = {
        mu: (den[mu], num[mu] / den[mu]) if mu in den else (None, None)
        for mu in mus
    }

    df = spark.createDataFrame(
        [
            (mu, ck, pct, m, float(v) if v is not None else None)
            for ck, (mu, pct, months) in enumerate(members)
            for m, v in months
        ],
        "mukey int, cokey int, comppct_r int, monthseq int, dtwt double",
    )
    spec = RatingSpec(
        rating_col="dtwt",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        null_replacement=201,
        out_col="rating",
    )
    got = {
        r["mukey"]: (r["comppct_r"], r["rating"])
        for r in agg_wta(
            month_collapse(df, spec, how="min", beg_month=beg, end_month=end),
            spec,
            exclude_values=[201],
        ).collect()
    }
    assert got.keys() == expected.keys()
    for mu, (sw, val) in expected.items():
        if sw is None:
            assert got[mu] == (None, None)
        else:
            assert got[mu][0] == sw
            assert got[mu][1] == pytest.approx(val, rel=1e-9)


@SETTINGS
@given(data=tables, extra_parents=st.lists(st.integers(0, 5), max_size=3))
def test_pp_sum_matches_reference(spark, data, extra_parents):
    """Percent-present: weight summed over target-rated rows; groups
    with rows but no hits report 0; parent-driven output backfills
    mapunits with NO component rows at all as 0 (not absent)."""
    from soil_data_development_tools___arcmap_spark.operators import (
        agg_pp_sum,
    )

    targets = ["R", "X"]
    rows = with_members(data)
    parents = sorted({mu for mu, _p, _r, _m in rows} | set(extra_parents))
    expected = {
        mu: sum(p for m, p, r, _ in rows if m == mu and r in targets)
        for mu in parents
    }
    parent = spark.createDataFrame([(mu,) for mu in parents], "mukey int")
    spec = RatingSpec(
        rating_col="rating_in",
        group_cols=["mukey"],
        member_col="cokey",
        weight_col="comppct_r",
        out_col="rating",
    )
    got = {
        r["mukey"]: r["rating"]
        for r in agg_pp_sum(
            build_df(spark, rows), spec, targets, parent=parent
        ).collect()
    }
    assert got == expected
