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


def test_ivf_recall_monotone_in_nprobe(spark):
    """Probed lists are nested in nprobe, so per-query hits must be
    non-decreasing and scanned strictly pays for recall."""
    by_n = {}
    for n in (1, 2, 4):
        by_n[n] = {
            r["qid"]: (r["hits"], r["scanned"])
            for r in Q._emb_ivf_recall_nprobe(spark, SF_SMOKE, n).collect()
        }
    assert set(by_n[1]) == set(by_n[2]) == set(by_n[4])
    for qid in by_n[1]:
        h1, s1 = by_n[1][qid]
        h2, s2 = by_n[2][qid]
        h4, s4 = by_n[4][qid]
        assert h1 <= h2 <= h4, (qid, h1, h2, h4)
        assert s1 <= s2 <= s4, (qid, s1, s2, s4)


def test_ivf_nprobe_planted_cluster_recall_increases(spark):
    """Planted two-cluster fixture: the query's exact top-5 is
    {30, 31, 8, 40, 42} — three in list A (members 30, 31 and the
    centroid-candidate 8 itself) and two in list B (40, 42, whose
    y > x files them under centroid B) — so nprobe=1 structurally
    caps hits at 3 and nprobe=2 reaches 5/5."""
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        knn_recall,
    )

    def vec(x, y, tail=0.0):
        return [float(x), float(y)] + [tail] * 2

    rows = []
    # query 0: between the two clusters, slightly A-ward
    rows.append((0, vec(1.0, 0.52)))
    # ids 8..23 are the stand-in centroids (first 16 candidates by id):
    # give A (id 8) and B (id 9) axis directions; park the other 14
    # centroids far away on the tail axes so nothing else attracts
    rows.append((8, vec(1.0, 0.0)))       # centroid A
    rows.append((9, vec(0.0, 1.0)))       # centroid B
    for i in range(10, 24):
        rows.append((i, [0.0, 0.0, 1.0, float(i)]))
    # cluster A members: near-perfect matches for the query
    rows.append((30, vec(1.0, 0.5)))
    rows.append((31, vec(1.0, 0.45)))
    # cluster B members: still in the query's exact top-5 (the only
    # other non-orthogonal candidates) but y > x, so the assignment
    # step files them under centroid B — invisible at nprobe=1
    rows.append((40, vec(0.55, 0.9)))
    rows.append((41, vec(0.5, 0.88)))
    rows.append((42, vec(0.52, 0.86)))
    emb = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    exact = brute_force_topk(emb)

    def hits(nprobe):
        return {
            r["qid"]: r["hits"]
            for r in knn_recall(
                exact, ivf_topk(emb, nprobe=nprobe)
            ).collect()
        }

    h1, h2 = hits(1), hits(2)
    # exact top-5 = {30, 31, 8, 40, 42}; list A holds {8, 30, 31}
    assert h1[0] == 3 and h2[0] == 5, (h1, h2)
    probed1 = {r["cid"] for r in ivf_topk(emb, nprobe=1).collect()}
    assert not {40, 41, 42} & probed1
