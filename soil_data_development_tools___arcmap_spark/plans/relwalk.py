"""Join-path planning from the self-describing metadata catalog.

The reference derives the join chain at runtime by walking
``mdstatrshipdet`` (LTABPHYNAME→RTABPHYNAME with the FK column pair)
from the attribute table up to MAPUNIT, max depth 6
(gSSURGO_CreateSoilMap.py:9994-10107, :10401), then emits one of the
hand-written CreateRatingTableN cursor loops (§2.3). Here the walk is
the same driver-side metadata lookup, but the chain is ONE generic
fold of left-outer DataFrame joins — Catalyst broadcasts/reorders as
it sees fit; missing children null-pad exactly like the reference's
dMissing rows (:9763-9770).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_DEPTH = 6  # gSSURGO_CreateSoilMap.py:10401


def join_path(
    relations: list[dict],
    from_table: str,
    to_table: str = "mapunit",
) -> list[tuple[str, str, str, str]]:
    """Walk child→parent relationships from ``from_table`` up to
    ``to_table``.

    ``relations``: collected mdstatrshipdet rows (ltabphyname = parent,
    rtabphyname = child, l/rtabcolphyname = join columns). Returns the
    chain TOP-DOWN: [(parent, child, parent_col, child_col), ...].
    """
    by_child: dict[str, tuple[str, str, str]] = {}
    for r in relations:
        child = r["rtabphyname"].lower()
        # first relationship wins, matching the reference's first-match
        # cursor walk
        by_child.setdefault(
            child,
            (
                r["ltabphyname"].lower(),
                r["ltabcolphyname"].lower(),
                r["rtabcolphyname"].lower(),
            ),
        )
    chain: list[tuple[str, str, str, str]] = []
    cur = from_table.lower()
    for _ in range(MAX_DEPTH):
        if cur == to_table.lower():
            return list(reversed(chain))
        if cur not in by_child:
            break
        parent, pcol, ccol = by_child[cur]
        chain.append((parent, cur, pcol, ccol))
        cur = parent
    raise ValueError(
        f"no relationship path {from_table} -> {to_table} within depth {MAX_DEPTH}"
    )


def build_join_chain(
    tables: dict[str, DataFrame],
    path: list[tuple[str, str, str, str]],
    predicates: dict[str, object] | None = None,
) -> DataFrame:
    """Fold the top-down path into mapunit ⟕ child ⟕ grandchild …

    ``predicates``: optional {table: Column} filters applied to each
    child BEFORE its join (the reference pushes where_clauses into each
    ReadTable cursor — Catalyst pushes these into the parquet scan)."""
    predicates = predicates or {}
    top = path[0][0]
    out = tables[top]
    if top in predicates:
        out = out.where(predicates[top])
    for parent, child, pcol, ccol in path:
        c = tables[child]
        if child in predicates:
            c = c.where(predicates[child])
        if pcol == ccol:
            out = out.join(c, on=pcol, how="left")
        else:
            out = out.join(c, on=out[pcol] == c[ccol], how="left")
    return out
