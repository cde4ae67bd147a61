#!/usr/bin/env python
"""Forced-distributed graph parity proofs on the sf1 corpus (the r8
verdict's items 1-2): give the iterative operators' DISTRIBUTED paths
a recorded real-data execution, with parity against the local paths
on the SAME data.

What runs (sf1 = scaledata/sf1, from scripts/make_scaledata.py):

1. edge betweenness, tau=5 graph (1010 vertices with the planted
   chain-of-cliques block — ABOVE the 500-vertex local cap, so the
   registered query's default path IS the batched mapInPandas
   Brandes). This script runs both paths explicitly:
     distributed (local_cap=0)  vs  local (local_cap high)
   and records: identical top-20 edge list (4-dp), max abs/rel
   credit diff over the full edge set.
2. girvan_newman, tau=5 graph: local_cap=0 (every removal round's
   betweenness is the distributed sweep) vs the default local loop —
   identical best modularity and community-size multiset.
3. connected_components + label_propagation, tau=3 graph (306,968
   symmetric edges > the 200k local cap -> the distributed
   pointer-jumping / LPA loops run by construction): walls + shape.

Writes scale_artifacts/graph_proof.json (consumed by SCALE.md).

Usage: SPARK_GRAFT_SF_DIR=$PWD/scaledata/sf1 python scripts/scale_graph_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_mining_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf1"),
    )
    out: dict = {"sf_dir": sf}
    spark = get_spark(app_name="scale-graph-proof")

    from data_mining_map_reduce_spark.operators.graph import (
        connected_components,
        edge_betweenness,
        girvan_newman,
        label_propagation,
        symmetric_edges,
    )
    from data_mining_map_reduce_spark.queries import _cooccurrence_edges

    # ---- tau=5 graph: betweenness parity (distributed vs local) ----
    t0 = time.perf_counter()
    edges5 = _cooccurrence_edges(spark, sf, tau=5).localCheckpoint(eager=True)
    n5 = edges5.count()
    n5_vert = (
        edges5.select(F.col("src").alias("v"))
        .unionByName(edges5.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    out["tau5_build_sec"] = round(time.perf_counter() - t0, 1)
    out["tau5_edges"] = n5
    out["tau5_vertices"] = n5_vert
    out["betweenness_local_cap"] = 500
    out["tau5_above_betweenness_cap"] = n5_vert > 500
    print(f"tau=5: {n5} canonical edges, {n5_vert} vertices "
          f"[{out['tau5_build_sec']}s]", flush=True)

    t0 = time.perf_counter()
    dist = edge_betweenness(edges5, local_cap=0).collect()
    out["betweenness_distributed_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    local = edge_betweenness(edges5, local_cap=10_000_000).collect()
    out["betweenness_local_sec"] = round(time.perf_counter() - t0, 1)

    dmap = {(r.src, r.dst): r.betweenness for r in dist}
    lmap = {(r.src, r.dst): r.betweenness for r in local}
    out["betweenness_edge_sets_equal"] = set(dmap) == set(lmap)
    diffs = [
        (abs(dmap[k] - lmap[k]), abs(dmap[k] - lmap[k]) / max(lmap[k], 1e-12))
        for k in lmap
    ]
    out["betweenness_max_abs_diff"] = round(max(d for d, _ in diffs), 9)
    out["betweenness_max_rel_diff"] = round(max(r for _, r in diffs), 9)

    def top20(m):
        return sorted(
            ((round(b, 4), k) for k, b in m.items()),
            key=lambda t: (-t[0], t[1]),
        )[:20]

    out["betweenness_top20_equal"] = top20(dmap) == top20(lmap)
    print(
        f"betweenness: dist {out['betweenness_distributed_sec']}s vs local "
        f"{out['betweenness_local_sec']}s, top20_equal="
        f"{out['betweenness_top20_equal']}, max_rel_diff="
        f"{out['betweenness_max_rel_diff']}", flush=True,
    )

    # ---- tau=5 graph: Girvan-Newman parity (forced distributed) ----
    t0 = time.perf_counter()
    a_dist, q_dist = girvan_newman(edges5, max_removals=3, local_cap=0)
    sizes_dist = sorted(
        r.n for r in a_dist.groupBy("community").agg(F.count("*").alias("n")).collect()
    )
    out["gn_distributed_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    a_loc, q_loc = girvan_newman(edges5, max_removals=3)
    sizes_loc = sorted(
        r.n for r in a_loc.groupBy("community").agg(F.count("*").alias("n")).collect()
    )
    out["gn_local_sec"] = round(time.perf_counter() - t0, 1)
    out["gn_q_distributed"] = round(q_dist, 9)
    out["gn_q_local"] = round(q_loc, 9)
    out["gn_q_abs_diff"] = round(abs(q_dist - q_loc), 12)
    out["gn_community_sizes_equal"] = sizes_dist == sizes_loc
    out["gn_n_communities"] = len(sizes_dist)
    print(
        f"girvan_newman: dist {out['gn_distributed_sec']}s vs local "
        f"{out['gn_local_sec']}s, sizes_equal="
        f"{out['gn_community_sizes_equal']}, q_diff={out['gn_q_abs_diff']}",
        flush=True,
    )

    # ---- tau=3 graph: CC + LPA take the distributed loops ----
    t0 = time.perf_counter()
    edges3 = _cooccurrence_edges(spark, sf, tau=3).localCheckpoint(eager=True)
    out["tau3_build_sec"] = round(time.perf_counter() - t0, 1)
    out["tau3_sym_edges"] = symmetric_edges(edges3).count()
    out["cc_lpa_local_cap"] = 200_000
    out["tau3_above_cc_cap"] = out["tau3_sym_edges"] > 200_000
    print(f"tau=3: {out['tau3_sym_edges']} sym edges "
          f"[{out['tau3_build_sec']}s]", flush=True)

    t0 = time.perf_counter()
    cc = connected_components(edges3).localCheckpoint(eager=True)
    out["cc_distributed_sec"] = round(time.perf_counter() - t0, 1)
    out["cc_vertices"] = cc.count()
    out["cc_components"] = cc.select("component").distinct().count()
    print(
        f"connected_components (distributed): {out['cc_vertices']} vertices, "
        f"{out['cc_components']} components [{out['cc_distributed_sec']}s]",
        flush=True,
    )

    t0 = time.perf_counter()
    lpa = label_propagation(edges3, max_iter=5).localCheckpoint(eager=True)
    out["lpa_distributed_sec"] = round(time.perf_counter() - t0, 1)
    out["lpa_vertices"] = lpa.count()
    out["lpa_communities"] = lpa.select("label").distinct().count()
    print(
        f"label_propagation (distributed): {out['lpa_vertices']} vertices, "
        f"{out['lpa_communities']} communities [{out['lpa_distributed_sec']}s]",
        flush=True,
    )

    art_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_artifacts",
    )
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, "graph_proof.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    ok = (
        out["betweenness_top20_equal"]
        and out["betweenness_edge_sets_equal"]
        and out["gn_community_sizes_equal"]
        and out["tau5_above_betweenness_cap"]
        and out["tau3_above_cc_cap"]
    )
    print("GRAPH PROOF:", "OK" if ok else "PARITY FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
