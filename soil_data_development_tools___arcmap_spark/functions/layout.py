"""Data-layout clustering math: Morton (Z-order) interleave.

Z-ordering is THE data-layout lever for multi-dimensional skipping at
100 TB: write the table range-partitioned by the interleaved key and
every file's min/max footer stats become tight in *both* dimensions at
once, so a 2-D box predicate prunes files instead of scanning them.
(The reference's analog is its spatial-index/tile organisation of the
SSURGO rasters; here it is re-expressed as pure column math usable in
``repartitionByRange`` + parquet footers.)

The expression builder emits the SAME arithmetic text for Spark SQL
and DuckDB — only the integer-division token differs (`div` vs `//`)
— using nothing but ``* / % +`` on BIGINT literals, so the value is
engine-exact by construction (no reliance on `<<`/`>>` operator
parity). Deliberately dependency-free: imported by both ``queries``
(Spark side) and ``oracles`` (DuckDB side).
"""

from __future__ import annotations


def morton_sql(a: str, b: str, bits: int, idiv: str = " div ") -> str:
    """SQL text interleaving the low ``bits`` bits of integer
    expressions ``a`` (even positions) and ``b`` (odd positions) into
    a Z-value in ``[0, 4**bits)``.

    ``idiv`` is the engine's integer-division operator: ``" div "``
    for Spark SQL, ``" // "`` for DuckDB. Bit i is extracted as
    ``(x {idiv} 2**i) % 2`` and placed with a multiply — portable
    integer arithmetic only.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(({a}){idiv}{1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"(({b}){idiv}{1 << i}) % 2 * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
