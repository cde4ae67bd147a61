#!/usr/bin/env python
"""Graph family ON the LSH-pre-cut edge build at sf10 (the r13
verdict's optional task 7 closing the loop on task 1): the r13
decomposition proved the EXACT Σdᵢ² edge build owns 502-685 s of the
graph family's sf10 wall while the algorithms themselves are cheap.
This probe runs connected components and LPA over the PRE-CUT edges
(co_occurrence_pairs_lsh, tau=3 — the same twin the registered
cooccurrence_pairs_lsh query grades) at sf10 and records walls + the
component/community shape, next to the r13 exact-build walls
(graph_components 685 s, graph_lpa_community_sizes 521 s).

Writes scale_artifacts/precut_graph.json (consumed by SCALE.md).

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g \
    SPARK_GRAFT_SF_DIR=$PWD/scaledata/sf10 python scripts/probe_r14_precut_cc.py
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
        os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf10"),
    )
    out: dict = {"sf_dir": sf}
    spark = get_spark(app_name="precut-graph-probe")

    from data_mining_map_reduce_spark.operators.graph import (
        connected_components,
        label_propagation,
    )
    from data_mining_map_reduce_spark.operators.relational import (
        co_occurrence_pairs_lsh,
    )
    from data_mining_map_reduce_spark.queries import _customer_part_pairs

    pairs = _customer_part_pairs(spark, sf)
    edges = co_occurrence_pairs_lsh(
        pairs, "k", "i", min_shared=3, left_alias="src", right_alias="dst"
    ).select("src", "dst")

    # Edge build alone (the term the pre-cut attacks).
    t0 = time.perf_counter()
    out["precut_edges"] = edges.count()
    out["precut_edge_build_sec"] = round(time.perf_counter() - t0, 1)

    # CC over the pre-cut edges (recomputes the build inside its own
    # lineage — the registered queries' execution shape).
    t0 = time.perf_counter()
    comp = connected_components(edges)
    sizes = (
        comp.groupBy("component").count().groupBy().agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("count").alias("largest"),
        )
    ).collect()[0]
    out["cc_sec"] = round(time.perf_counter() - t0, 1)
    out["cc_components"] = sizes["n_components"]
    out["cc_largest"] = sizes["largest"]

    t0 = time.perf_counter()
    lpa = label_propagation(edges)
    lrow = (
        lpa.groupBy("label").count().groupBy().agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.max("count").alias("largest"),
        )
    ).collect()[0]
    out["lpa_sec"] = round(time.perf_counter() - t0, 1)
    out["lpa_communities"] = lrow["n_communities"]
    out["lpa_largest"] = lrow["largest"]

    path = os.path.join(
        os.path.dirname(__file__), "..", "scale_artifacts", "precut_graph.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
