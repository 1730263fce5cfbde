"""Tiebreak + ordinal-domain machinery for the SDV aggregation engine.

The reference resolves every categorical/ordinal aggregation tie with a
2-level sort — primary ``comppct_r DESC``, secondary rating value ASC
("Lower" wins) or DESC ("Higher" wins) per ``sdvattribute.tiebreakrule``
(SortData, gSSURGO_CreateSoilMap.py:456-509; defaulting :9710-9721).
Ordinal ratings are ranked by domain position from
``mdstatdomdet.choicesequence`` (GetRatingDomain :3865-3896), with
'Not rated' and nulls inserted at the low or high end depending on the
rule (:9913-9967); suitability interps (ruledesign=2) reverse the domain
(:9942-9944).

The reference's first-row-wins over equal sort keys is nondeterministic
in Spark without a total order, so every window here ends with the
member key ASC (exactly like GetDominantComponent.py:89's ``COKEY`` sort).

Everything is a native Column expression — no Python UDFs — so the whole
pipeline stays inside WholeStageCodegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class RatingSpec:
    """Parameters of one rating request, hydrated from ``sdvattribute``.

    Generic over the hierarchy: ``group_cols`` plays mapunit,
    ``member_col`` plays cokey, ``weight_col`` plays comppct_r and
    ``rating_col`` the attribute column. The same spec drives the
    TPC-H-shaped correctness queries and the SSURGO fixtures.
    """

    rating_col: str
    group_cols: list[str] = field(default_factory=lambda: ["mukey"])
    member_col: str = "cokey"
    weight_col: str = "comppct_r"
    # tiebreakrule: False => "Lower" label wins ties (ASC), True => "Higher".
    tiebreak_higher: bool = False
    # Ordinal domain in choicesequence order (None => numeric/plain rating).
    domain: list[str] | None = None
    # Reverse domain for suitability interps (ruledesign=2).
    domain_reversed: bool = False
    # notratedphrase — ranked past the real domain, used by Limiting.
    not_rated: str | None = None
    # bZero / interpnullsaszeroflag: nulls treated as 0 instead of dropped.
    zero_nulls: bool = False
    # nullratingreplacementvalue (e.g. 201 cm depth-to-water-table).
    null_replacement: float | str | None = None
    # Output column name for the aggregated rating.
    out_col: str = "rating"

    def rating(self) -> Column:
        c = F.col(self.rating_col)
        if self.null_replacement is not None:
            c = F.coalesce(c, F.lit(self.null_replacement))
        return c


def domain_rank_expr(spec: RatingSpec, plain: bool = False) -> Column:
    """1-based position of the rating inside its ordered domain,
    mirroring the reference's domain assembly
    (gSSURGO_CreateSoilMap.py:9913-9967):

    - ``notratedphrase`` (when set and absent) is inserted at the START
      of the domain BEFORE the suitability reversal (:9938-9940).
    - NULL ratings rank BEFORE every class when the tiebreaker is
      'Higher' (so they lose DESC ties, :9951-9957) and AFTER every
      class otherwise (:9959-9962).
    - Values absent from the domain rank last (no dValues entry).

    Case-insensitive match (the reference upper-cases domain dict keys,
    :4906-4916). ``plain=True`` skips the not-rated/null insertion —
    the Limiting operators manage those classes themselves
    (:5115-5121).
    """
    assert spec.domain is not None
    dom = list(spec.domain)
    if not plain and spec.not_rated:
        if spec.not_rated.upper() not in {v.upper() for v in dom}:
            dom.insert(0, spec.not_rated)
    if spec.domain_reversed:
        dom = list(reversed(dom))
    arr = F.array(*[F.lit(v.upper()) for v in dom])
    pos = F.array_position(arr, F.upper(F.trim(spec.rating())))
    null_rank = 0 if (not plain and spec.tiebreak_higher) else len(dom) + 1
    return (
        F.when(pos > 0, pos)
        .when(spec.rating().isNull(), F.lit(null_rank))
        .otherwise(F.lit(len(dom) + 1))
    )


def rating_order_expr(spec: RatingSpec) -> Column:
    """Secondary sort key for tie resolution (rating value or domain rank)."""
    key = domain_rank_expr(spec) if spec.domain is not None else spec.rating()
    return key.desc() if spec.tiebreak_higher else key.asc()


def member_order(spec: RatingSpec) -> list[Column]:
    """Deterministic total-order suffix (the GetDominantComponent cokey sort)."""
    return [F.col(spec.member_col).asc()]
