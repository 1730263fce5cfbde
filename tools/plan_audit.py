"""Physical-plan audit over the whole query registry.

For every registered BATCH query, builds the executed plan at the
given sf_dir (default sf0.001 — plan SHAPE, not timing) and reports:
exchanges, file scans, top-k (TakeOrderedAndProject), CartesianProduct
(always a bug — pinned to zero by tests), broadcast nested-loop joins,
and Python-eval surfaces (Arrow-batched escape hatches). Streaming
run-to-completion entries are skipped — building them executes the
stream; their plans are covered by their own tests.

Two caveats on "shape, not timing":

- BUILDING some queries executes real Spark jobs as a side effect:
  the eager ``localCheckpoint()`` stages (events_pagerank,
  docs_collocations, docs_containment, docs_simhash_pairs,
  docs_dup_triangles, docs_cms_drift, docs_priority_sample, the LSH
  shingle reuse) run their upstream pipeline; fixture-writing
  queries (partitioned_sink_prune, ingest_full_catalog,
  nightly_gssurgo, raster/report sinks) write files; and the
  driver-loop trainers (docs_bpe_train/apply, trained IVF/PQ paths)
  run their full training rounds. At sf0.001 this is seconds per
  query, but the audit is NOT free of execution.
- ``executedPlan()`` is read BEFORE any action runs, so exchange
  counts are the PRE-AQE plan; AQE may coalesce or re-plan exchanges
  at runtime, making real exchange counts ≤ (occasionally ≠) the
  numbers reported here. Treat the counts as an upper-bound shape
  signature, stable for diffing round-over-round.

Usage: python tools/plan_audit.py [sf_dir] [--markdown]

The --markdown form regenerates PLANS_AUDIT.md (committed per round so
plan-shape drift shows up in the diff like bench numbers do).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = (
    "events_stream_",
    "docs_stream_",
    "emb_stream_",
    "events_sessionize_stateful",
)
PY_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "BatchEvalPython",
    "PythonUDTF",
    "MapInArrow",
)


def count_global_windows(df) -> int:
    """Number of executed Window nodes with an EMPTY partition spec —
    a single-task sort of the whole input unless the input is provably
    bounded. Every non-zero count must be on the explicit allowlist
    (GLOBAL_WINDOW_ALLOWED); tests/test_round4.py::test_no_cartesian_product_in_any_plan
    rejects any other query, so a future edit cannot put a global window on data-sized
    input and pass review."""

    def walk(node, out):
        nm = node.getClass().getSimpleName()
        if "Window" in nm:
            try:
                out.append(bool(node.partitionSpec().isEmpty()))
            except Exception:  # noqa: BLE001  (node without a spec)
                pass
        for meth in ("executedPlan", "finalPhysicalPlan", "plan"):
            try:
                child = getattr(node, meth)()
                walk(child, out)
                return out
            except Exception:  # noqa: BLE001
                pass
        try:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i), out)
        except Exception:  # noqa: BLE001
            pass
        return out

    return sum(walk(df._jdf.queryExecution().executedPlan(), []))


#: queries whose global windows run over PROVABLY BOUNDED inputs —
#: each entry names the bound; anything else with a global window
#: fails tests/test_round4.py::test_no_cartesian_product_in_any_plan
#: (the full-registry plan sweep), so a future edit cannot put a
#: global window on data-sized input and pass review
GLOBAL_WINDOW_ALLOWED = {
    # rank over the top-(n+1) priority rows (functions/sketches.py)
    "docs_priority_sample",
    # priority_sample inside the DSIR selection — same top-(n+1) bound
    "docs_dsir_sample",
    # rank over the 20 rows a TakeOrderedAndProject already reduced to
    "docs_top_ngrams",
    # cumulative histogram over DISTINCT token counts (length domain)
    "docs_length_deciles",
    # drift_rank over the 64 embedding dimensions
    "emb_drift",
    "emb_stream_drift",
    # prefix max over per-1M-id chunk maxima (one row per chunk)
    "events_late_data_audit",
    # dense_rank over distinct rating values (domain-sized lookup)
    "raster_lookup_codes",
    # Bezier ramp interpolation over class-count ramp rows
    "legend_color_ramp",
    # page numbering over already-aggregated report rows
    "report_pagination",
    # lead over the 6-row equal-interval break table (class count + 1)
    "raster_reclassify_cells",
}


def audit_plan(plan: str) -> dict:
    return {
        "exchanges": len(
            re.findall(
                r"Exchange (?:hash|range)partitioning|Exchange SinglePartition",
                plan,
            )
        ),
        "scans": plan.count("FileScan"),
        "topk": "TakeOrderedAndProject" in plan,
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoop" in plan,
        "python": sorted({n for n in PY_NODES if n in plan}),
    }


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    markdown = False
    for a in sys.argv[1:]:
        if a == "--markdown":
            markdown = True
        else:
            sf_dir = a

    import __spark_entry__ as E
    from soil_data_development_tools___arcmap_spark import get_spark

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in E.queries().items():
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            rows.append({"query": name, "error": str(exc)[:120]})
            continue
        rows.append({
            "query": name,
            **audit_plan(plan),
            "global_window": count_global_windows(df),
        })

    if markdown:
        out = [
            "# Plan audit (generated by tools/plan_audit.py)",
            "",
            f"{len(rows)} batch queries at {sf_dir}. `python` lists the",
            "Arrow-batched escape-hatch nodes in the plan (empty = pure",
            "JVM). CartesianProduct is pinned to zero and `gwin`",
            "(global windows — empty partition spec) to the bounded-input",
            "allowlist in tools/plan_audit.py, both by",
            "tests/test_round4.py.",
            "",
            "| query | exchanges | scans | topk | cartesian | gwin | python |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in sorted(rows, key=lambda r: r["query"]):
            if "error" in r:
                out.append(f"| {r['query']} | ERROR: {r['error']} | | | | | |")
                continue
            out.append(
                "| {query} | {exchanges} | {scans} | {topk} | {cartesian} "
                "| {global_window} "
                "| {py} |".format(py=",".join(r["python"]) or "-", **r)
            )
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLANS_AUDIT.md",
        )
        with open(path, "w") as fh:
            fh.write("\n".join(out) + "\n")
        print(f"wrote {path} ({len(rows)} queries)")
    else:
        for r in rows:
            print(json.dumps(r))
    bad = [r for r in rows if r.get("cartesian")]
    bad += [
        r for r in rows
        if r.get("global_window")
        and r["query"] not in GLOBAL_WINDOW_ALLOWED
    ]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
