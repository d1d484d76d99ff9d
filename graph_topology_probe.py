#!/usr/bin/env python3
"""Pathological-topology probe for the CC kernels (round-7 verdict task
#7): the registry's near-dup pair graphs are dense 2-3-diameter
clusters, and the replica-based x10/x100 probes only grow MORE disjoint
copies of that easy shape -- so the round bounds the kernels are chosen
for (star contraction: O(log n) regardless of diameter; min-label:
diameter rounds) were never exercised at scale.  This probe builds the
adversarial shapes directly and records rounds-to-converge + wall:

* ``long_chain``      -- a V-vertex path, diameter V-1: the shape that
                         kills label propagation and is exactly why
                         star contraction is the deployed kernel;
* ``long_chain_perm`` -- the same path under a hash-permuted vertex id
                         space (monotone ids are the friendly case for
                         min-attachment kernels);
* ``star_of_stars``   -- one root hub, M sub-hubs, K leaves each
                         (diameter 4, max degree M*?): the skew shape
                         where one vertex's neighborhood dominates a
                         partition;
* ``disjoint_chains`` -- C disjoint chains (component-count check: the
                         fixpoint must keep components separate).

min-label runs only on the bounded-diameter shapes (its documented
contract); the chain is listed for it as "excluded by design".

Run manually (not part of the driver contract):

    python graph_topology_probe.py            # writes one JSON line

Scale knobs (round-9 verdict task 6 -- confirm the ~1-round-per-
diameter-doubling budget and the MAX_STAR_ROUNDS=30 headroom at
x100-equivalent vertex counts):

    SPARK_GRAFT_GRAPH_V=1000000 SPARK_GRAFT_GRAPH_M=1000 \\
    SPARK_GRAFT_GRAPH_K=1000 python graph_topology_probe.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from wsu_cpts_415_spark.queries.graph_ops import min_label_components
from wsu_cpts_415_spark.queries.graph_ops3 import (
    star_contraction_components,
)
from wsu_cpts_415_spark.session import get_spark

# path vertices (diameter V-1)
CHAIN_V = int(os.environ.get("SPARK_GRAFT_GRAPH_V", "100000"))
# sub-hubs / leaves per sub-hub (default ~90k vertices, diameter 4)
STARS_M = int(os.environ.get("SPARK_GRAFT_GRAPH_M", "300"))
STARS_K = int(os.environ.get("SPARK_GRAFT_GRAPH_K", "300"))
N_CHAINS = 50  # disjoint chains of CHAIN_V / N_CHAINS vertices each


def _chain(spark, n: int, permute: bool) -> DataFrame:
    ids = spark.range(n)
    pid = (
        (F.xxhash64("id") % F.lit(10**12)).alias("pid")
        if permute
        else F.col("id").alias("pid")
    )
    ids = ids.select("id", pid)
    nxt = ids.select(
        (F.col("id") + 1).alias("id"), F.col("pid").alias("qid")
    )
    return ids.join(nxt, "id").select(
        F.col("pid").alias("doc_a"), F.col("qid").alias("doc_b")
    )


def _star_of_stars(spark, m: int, k: int) -> DataFrame:
    """Root 0; sub-hubs 1..m; sub-hub i's leaves are m + (i-1)k + 1 ...;
    ids hash-permuted so the root is not the numeric minimum."""
    hubs = spark.range(1, m + 1).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    leaves = spark.range(m * k).select(
        (F.col("id") % m + 1).alias("a"),
        (F.col("id") + m + 1).alias("b"),
    )
    perm = lambda c: F.pmod(F.xxhash64(c), F.lit(10**12))  # noqa: E731
    return hubs.unionByName(leaves).select(
        perm(F.col("a")).alias("doc_a"), perm(F.col("b")).alias("doc_b")
    )


def _disjoint_chains(spark, total_v: int, n_chains: int) -> DataFrame:
    per = total_v // n_chains
    ids = spark.range(total_v).select(
        "id", (F.col("id") % per != per - 1).alias("has_next")
    )
    return (
        ids.filter("has_next")
        .select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
    )


def _run(kernel, pairs: DataFrame, expect_components: int) -> dict:
    stats: dict = {}
    t0 = time.perf_counter()
    labels = kernel(pairs, stats=stats)
    ncomp = labels.select("label").distinct().count()
    wall = round(time.perf_counter() - t0, 3)
    return {
        "rounds": stats.get("rounds"),
        "wall_sec": wall,
        "n_components": ncomp,
        "components_correct": ncomp == expect_components,
    }


def main() -> None:
    spark = get_spark(app_name="graph-topology-probe")
    out = {
        "metric": "graph_topology_probe",
        "chain_v": CHAIN_V,
        "stars_m": STARS_M,
        "stars_k": STARS_K,
        "topologies": {},
    }
    cases = [
        ("long_chain", _chain(spark, CHAIN_V, False), 1),
        ("long_chain_perm", _chain(spark, CHAIN_V, True), 1),
        ("star_of_stars", _star_of_stars(spark, STARS_M, STARS_K), 1),
        ("disjoint_chains", _disjoint_chains(spark, CHAIN_V, N_CHAINS), N_CHAINS),
    ]
    for name, pairs, expect in cases:
        pairs = pairs.localCheckpoint(eager=True)  # exclude build cost
        entry = {
            "star_contraction": _run(
                star_contraction_components, pairs, expect
            )
        }
        if name == "star_of_stars":
            # bounded diameter (4): min-label's contract; the chains are
            # excluded by design (diameter rounds would exceed the bound,
            # which is exactly why star contraction is the deployed kernel)
            entry["min_label"] = _run(min_label_components, pairs, expect)
        out["topologies"][name] = entry
    print(json.dumps(out))


if __name__ == "__main__":
    main()
