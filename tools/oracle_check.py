"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count + column names + an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/oracle_check.py [--json PATH] [sf_dir] [query ...]

``--json PATH`` additionally writes driver-format entries
({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) so a round's new queries can ship committed
cross-engine evidence (CORRECTNESS_SELF_r*.json) even when the
driver's fixed sample misses them.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df) -> tuple[int, list[str], str]:
    """(row_count, sorted_columns, value_hash) for a pandas DataFrame."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 2**53:
                return str(int(v))
            return repr(v)
        return str(v)

    rows = sorted(
        "|".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if args and args[0] == "--json":
        json_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as E
    from soil_data_development_tools___arcmap_spark import get_spark
    from soil_data_development_tools___arcmap_spark.sources.testdata import TABLES

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-like session: NO repo factory confs — proves every
        # query pins the semantics it needs (timezone etc.) itself
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "12g")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark error: {exc}"[:500],
            }
            continue
        if name not in os_:
            print(f"okay {name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"duckdb error: {exc}"[:500],
            }
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "PASS" if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        results[name] = {
            "rows_match": sn == on, "schema_match": sc == oc,
            "hash_match": sh == oh, "spark_rows": sn,
            "oracle_rows": on, "err": None,
        }
        dt = time.time() - t0
        print(f"{status} {name}: rows {sn}/{on} cols {sc == oc} hash "
              f"{sh}/{oh} ({dt:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if sc != oc:
                print(f"   spark cols: {sc}\n   duck  cols: {oc}")
            elif sn == on:
                import pandas as pd

                s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns))
                o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns))
                s, o = s.reset_index(drop=True), o.reset_index(drop=True)
                neq = (s.astype(str) != o.astype(str)).any(axis=1)
                print("   first diffs (spark vs duck):")
                print(pd.concat([s[neq].head(3), o[neq].head(3)], axis=1))
    print(f"\n{checked - len(failures)}/{checked} pass"
          + ("" if checked == len(qs) else f" ({len(qs) - checked} skipped)"))
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
