"""Capture .explain("formatted") output for named queries into
plans/<round>/<query>_<tag>.txt (optimization-round evidence).

Usage: python tools/capture_plans.py <tag> [query ...]
With no query list, captures the bench HEADLINE set. The round
directory defaults to r13 and can be overridden with
``SPARK_GRAFT_PLANS_ROUND``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    tag = sys.argv[1]
    import __spark_entry__ as E
    from bench import HEADLINE
    from soil_data_development_tools___arcmap_spark import get_spark

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
