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


def _iterative_ab(spark, pairs: DataFrame, iters: int = 5) -> dict:
    """Round-11 stage-fusion A/B: time the FUSED PageRank / LPA rounds
    (one shuffle per round -- union-base aggregate, repartition-shared
    two-level argmax) against the pre-fusion agg->join formulation on
    the same graph, and record that outputs stay byte-identical at the
    queries' own rounding.  Quantifies lesson #11 for the two kernels
    the round-10 verdict named (per-round FIXED cost, not bytes)."""
    from pyspark.sql import Window

    from wsu_cpts_415_spark.queries.graph_ops import lpa_round

    bidir = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    verts = (
        bidir.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    edges_deg = bidir.select(
        "src", "dst", F.count("*").over(Window.partitionBy("src")).alias("deg")
    ).localCheckpoint(eager=True)
    damping = 0.85

    def pr_fused():
        ranks = verts.select(F.col("node").alias("id"), F.lit(1.0 / n).alias("pr"))
        base = verts.select(F.col("node").alias("id"), F.lit(0.0).alias("c"))
        for _ in range(iters):
            contribs = edges_deg.join(
                F.broadcast(ranks), edges_deg["src"] == ranks["id"]
            ).select(
                F.col("dst").alias("id"), (F.col("pr") / F.col("deg")).alias("c")
            )
            ranks = (
                base.unionByName(contribs)
                .groupBy("id")
                .agg(F.sum("c").alias("m"))
                .select(
                    "id",
                    (F.lit((1 - damping) / n) + damping * F.col("m")).alias("pr"),
                )
                .localCheckpoint(eager=False)
            )
        return ranks.select("id", F.round("pr", 9).alias("pr"))

    def pr_unfused():
        ranks = verts.select(F.col("node").alias("id"), F.lit(1.0 / n).alias("pr"))
        for _ in range(iters):
            contribs = (
                edges_deg.join(
                    F.broadcast(ranks), edges_deg["src"] == ranks["id"]
                )
                .select(
                    F.col("dst").alias("id"),
                    (F.col("pr") / F.col("deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("m"))
            )
            ranks = (
                verts.select(F.col("node").alias("id"))
                .join(F.broadcast(contribs), "id", "left")
                .select(
                    "id",
                    (
                        F.lit((1 - damping) / n)
                        + damping * F.coalesce(F.col("m"), F.lit(0.0))
                    ).alias("pr"),
                )
                .localCheckpoint(eager=False)
            )
        return ranks.select("id", F.round("pr", 9).alias("pr"))

    def lpa_unfused_round(verts_, bidir_, labels_, hint):
        cnt = (
            bidir_.alias("e")
            .join(hint(labels_.alias("l")), F.col("e.dst") == F.col("l.node"))
            .select(F.col("e.src").alias("nbr"), F.col("l.label").alias("label"))
            .groupBy("nbr", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            cnt.groupBy("nbr")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("negc"), F.col("label").alias("lab")
                    )
                ).alias("b")
            )
            .select(F.col("nbr").alias("node"), F.col("b.lab").alias("new_label"))
        )
        return verts_.join(hint(best), "node", "left").select(
            "node", F.coalesce("new_label", F.col("node")).alias("label")
        )

    def lpa_run(round_fn):
        labels = verts.select("node", F.col("node").alias("label"))
        for _ in range(iters):
            labels = round_fn(verts, bidir, labels, F.broadcast).localCheckpoint(
                eager=False
            )
        return labels

    def timed(build):
        # warm once (JIT/codegen/broadcast-path warmup), time the second
        # run -- the A/B compares plan shapes, not cold-start costs
        build().collect()
        t0 = time.perf_counter()
        df = build()
        rows = sorted(map(tuple, df.collect()))
        return round(time.perf_counter() - t0, 3), rows

    pr_f_wall, pr_f_rows = timed(pr_fused)
    pr_u_wall, pr_u_rows = timed(pr_unfused)
    lpa_f_wall, lpa_f_rows = timed(lambda: lpa_run(lpa_round))
    lpa_u_wall, lpa_u_rows = timed(lambda: lpa_run(lpa_unfused_round))
    return {
        "iters": iters,
        "n_vertices": n,
        "pagerank": {
            "fused_wall_sec": pr_f_wall,
            "unfused_wall_sec": pr_u_wall,
            "identical": pr_f_rows == pr_u_rows,
        },
        "label_propagation": {
            "fused_wall_sec": lpa_f_wall,
            "unfused_wall_sec": lpa_u_wall,
            "identical": lpa_f_rows == lpa_u_rows,
        },
    }


def _bfs_ab(spark, pairs: DataFrame, max_hops: int = 6) -> dict:
    """Round-12 A/B for the BFS frontier kernel: the engine's
    gated-broadcast formulation (queries/graph_ops.py bfs_hops --
    frontier semi join and visited anti join broadcast under the
    driver-tracked row gate, one exchange per hop) against the
    un-hinted variant whose semi/anti joins both SHUFFLE the edge
    table every hop.  Same graph, outputs compared for identity --
    extends the pagerank/LPA A/B to the third fused kernel the
    round-11 verdict named."""
    from wsu_cpts_415_spark.queries.graph_ops import bfs_hops
    from wsu_cpts_415_spark.queries.ssjoin import DOC_SIDE_BCAST_ROWS

    bidir = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    root_id = bidir.agg(F.min("src")).first()[0]
    root = spark.createDataFrame([(root_id,)], "id long")

    def gated():
        return bfs_hops(bidir, root, max_hops)

    def unhinted():
        # bfs_hops with the broadcast gate removed: both per-hop joins
        # fall back to shuffle joins over the full edge table
        dist = root.select("id", F.lit(0).alias("hops")).localCheckpoint(
            eager=True
        )
        frontier = dist
        for h in range(1, max_hops + 1):
            reached = (
                bidir.join(
                    frontier.select(F.col("id").alias("src")),
                    "src",
                    "leftsemi",
                )
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            new = (
                reached.join(dist.select("id"), "id", "leftanti")
                .select("id", F.lit(h).alias("hops"))
                .coalesce(4)
                .localCheckpoint(eager=True)
            )
            if new.count() == 0:
                break
            dist = dist.unionByName(new)
            frontier = new
        return dist

    def timed(build):
        build().collect()  # warm: JIT/codegen/broadcast warmup
        t0 = time.perf_counter()
        rows = sorted(map(tuple, build().collect()))
        return round(time.perf_counter() - t0, 3), rows

    g_wall, g_rows = timed(gated)
    u_wall, u_rows = timed(unhinted)
    return {
        "max_hops": max_hops,
        "n_reached": len(g_rows),
        "bcast_gate_rows": DOC_SIDE_BCAST_ROWS,
        "gated_wall_sec": g_wall,
        "unhinted_wall_sec": u_wall,
        "identical": g_rows == u_rows,
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
    # lesson-#11 A/B on the skew shape (hub fan-out, diameter 4) -- the
    # realistic profile for the videos graph the fused kernels serve
    star_pairs = _star_of_stars(spark, STARS_M, STARS_K).localCheckpoint(
        eager=True
    )
    out["iterative_ab"] = _iterative_ab(spark, star_pairs)
    out["bfs_ab"] = _bfs_ab(spark, star_pairs)
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
