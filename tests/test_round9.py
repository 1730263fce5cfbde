"""Round 9: areasymbol-partitioned gSSURGO lake (pruned single-survey
reads) + incremental nightly refresh (changed partitions only,
output == full recompute)."""

from __future__ import annotations

import os
import re

from conftest import SF_SMOKE
from pyspark.sql import functions as F

import soil_data_development_tools___arcmap_spark.queries as Q


def _scan_partition_counts(df):
    """numPartitions metric of every executed FileSourceScan — the
    engine's own count of partition DIRECTORIES read (inputFiles()
    reports the unpruned relation, so it cannot certify pruning)."""

    def walk(node, out):
        if "FileSourceScan" in node.getClass().getSimpleName():
            out.append(node)
        for meth in ("executedPlan", "finalPhysicalPlan", "plan"):
            try:
                child = getattr(node, meth)()
                walk(child, out)
                return out
            except Exception:
                pass
        try:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i), out)
        except Exception:
            pass
        return out

    counts = []
    for sc in walk(df._jdf.queryExecution().executedPlan(), []):
        mm = sc.metrics()
        it = mm.keys().iterator()
        vals = {}
        while it.hasNext():
            k = it.next()
            vals[k] = mm.apply(k).value()
        if "numPartitions" in vals:
            counts.append(int(vals["numPartitions"]))
    return counts


def test_lake_prune_scans_one_partition(spark):
    """The single-survey rating's component scan must resolve the
    areasymbol filter against the file LISTING: PartitionFilters in
    the plan, and the engine's own numPartitions metric says exactly
    ONE survey directory was read (PartitionCount=1)."""
    df = Q.gssurgo_lake_prune(spark, SF_SMOKE)
    assert len(df.collect()) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "areasymbol" in pf and "AS7" in pf
    counts = _scan_partition_counts(df)
    assert counts and all(c == 1 for c in counts), counts


def test_lake_holds_all_surveys_and_tables(spark):
    """The lake is written ONCE with every synth table partitioned by
    areasymbol — 20 survey directories per table."""
    lake = Q.gssurgo_lake(spark, SF_SMOKE)
    for name in ("component", "chorizon", "chtexturegrp", "chtexture",
                 "chfrags", "corestrictions", "cointerp"):
        parts = sorted(
            d for d in os.listdir(os.path.join(lake, name))
            if d.startswith("areasymbol=")
        )
        assert len(parts) == 20, (name, parts)
    # lake content round-trips the synth values (spot: component)
    lc = spark.read.parquet(os.path.join(lake, "component"))
    t = Q.ssurgo_synth(spark, SF_SMOKE)
    assert lc.count() == t["component"].count()
    got = {
        (r["cokey"], r["comppct_r"], r["areasymbol"])
        for r in lc.select("cokey", "comppct_r", "areasymbol").collect()
    }
    want = {
        (r["cokey"], r["comppct_r"], f"AS{r['mukey'] % 20}")
        for r in t["component"].select(
            "cokey", "comppct_r", "mukey"
        ).collect()
    }
    assert got == want


def test_incremental_equals_full_recompute(spark):
    """The refreshed lake must be row-identical to the full nightly
    recompute, and the stale pre-refresh rows for the changed surveys
    must actually DIFFER (the refresh had something to fix)."""
    inc = {
        tuple(r[c] for c in sorted(r.asDict()))
        for r in Q.nightly_gssurgo_incremental(spark, SF_SMOKE).collect()
    }
    full = {
        tuple(r[c] for c in sorted(r.asDict()))
        for r in Q.nightly_gssurgo(spark, SF_SMOKE)
        .withColumn("areasymbol", F.concat(
            F.lit("AS"), (F.col("mukey") % 20).cast("string")))
        .collect()
    }
    assert inc == full and len(inc) > 0
    # the perturbation is material: stale != full on changed surveys
    t = Q.ssurgo_synth(spark, SF_SMOKE)
    asym = F.concat(F.lit("AS"), (F.col("mukey") % 20).cast("string"))
    stale_comp = t["component"].withColumn(
        "comppct_r",
        F.when(asym.isin("AS3", "AS11"), F.col("cokey") % 89 + 3)
        .otherwise(F.col("comppct_r")),
    )
    stale = {
        tuple(r[c] for c in sorted(r.asDict()))
        for r in Q._nightly_rate_and_widen(stale_comp, t)
        .withColumn("areasymbol", asym)
        .where(F.col("areasymbol").isin("AS3", "AS11"))
        .collect()
    }
    full_changed = {r for r in full if r[0] in ("AS3", "AS11")}
    assert stale != full_changed and len(stale) == len(full_changed)


def test_incremental_reads_only_changed_partitions(spark):
    """The refresh's lake reads must prune to the two changed survey
    directories for every table (numPartitions metric == 2)."""
    lake = Q.gssurgo_lake(spark, SF_SMOKE)
    for name in ("component", "chorizon", "corestrictions"):
        df = spark.read.parquet(os.path.join(lake, name)).where(
            F.col("areasymbol").isin("AS3", "AS11")
        )
        df.collect()
        counts = _scan_partition_counts(df)
        assert counts and all(c == 2 for c in counts), (name, counts)
