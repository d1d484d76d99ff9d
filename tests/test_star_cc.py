"""Property tests for the star-contraction CC kernel
(queries/graph_ops3.py): cross-checked against a Python union-find
oracle AND the min-label kernel on adversarial graph shapes -- in
particular the long-path case that motivates star contraction (diameter
>> log n, where min-label needs diameter rounds)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.graph_ops import min_label_components
from wsu_cpts_415_spark.queries.graph_ops3 import (
    star_contraction_components,
)


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to component minimum
    labels: dict[int, int] = {}
    for x in list(parent):
        root = find(x)
        labels[x] = root
    # path compression above makes find(x) the min because unions always
    # parent the larger root under the smaller one
    return labels


def _spark_labels(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = star_contraction_components(df).collect()
    return {r.doc_id: r.label for r in out}


GRAPHS = {
    "long_path": [(i, i + 1) for i in range(200)],
    "two_cliques_bridge": [
        (a, b) for a in range(6) for b in range(a + 1, 6)
    ]
    + [(a, b) for a in range(100, 106) for b in range(a + 1, 106)]
    + [(5, 100)],
    "star": [(0, i) for i in range(1, 50)],
    "reverse_path": [(i + 1, i) for i in range(100)],
    "self_ish": [(7, 7), (1, 2)],  # self-loop must be ignored
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_cc_matches_union_find(spark, name):
    pairs = GRAPHS[name]
    expected = _union_find([p for p in pairs if p[0] != p[1]])
    got = _spark_labels(spark, pairs)
    assert got == expected


def test_star_cc_random_graphs_match_min_label(spark):
    rng = random.Random(415)
    for _ in range(3):
        n = 120
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        star = {
            r.doc_id: r.label
            for r in star_contraction_components(df).collect()
        }
        minlab = {
            r.doc_id: r.label for r in min_label_components(df).collect()
        }
        assert star == minlab
        assert star == _union_find(pairs)


def test_star_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert star_contraction_components(df).count() == 0


def test_long_chain_beyond_min_label_round_bound(spark, monkeypatch):
    """The motivating case: on a path graph whose diameter exceeds the
    min-label kernel's round bound, min_label_components fails loudly
    (its documented contract) while star contraction converges in
    O(log n) rounds -- the reason web-scale CC uses star contraction."""
    import wsu_cpts_415_spark.queries.graph_ops as go

    pairs = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    # tighten the min-label bound so the demonstration stays fast: a
    # 300-hop path needs ~300 rounds either way, far beyond 12
    monkeypatch.setattr(go, "MAX_CC_ROUNDS", 12)
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        go.min_label_components(df).collect()

    labels = {
        r.doc_id: r.label
        for r in star_contraction_components(df).collect()
    }
    assert labels == {i: 0 for i in range(301)}


# ---------------------------------------------------------------------------
# Round-11 stage-fusion pins: the fused LPA / PageRank rounds (one shuffle
# exchange per round instead of agg -> join chains) must be byte-identical
# to the straightforward unfused formulation.


def _unfused_lpa_round(verts, bidir, labels, hint):
    """The pre-round-11 LPA round shape: count per (vertex, label),
    argmax per vertex, then a vertex left join for isolated vertices."""
    cnt = (
        bidir.alias("e")
        .join(hint(labels.alias("l")), F.col("e.dst") == F.col("l.node"))
        .select(F.col("e.src").alias("nbr"), F.col("l.label").alias("label"))
        .groupBy("nbr", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    best = (
        cnt.groupBy("nbr")
        .agg(
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("label").alias("lab"))
            ).alias("b")
        )
        .select(F.col("nbr").alias("node"), F.col("b.lab").alias("new_label"))
    )
    return verts.join(hint(best), "node", "left").select(
        "node", F.coalesce("new_label", F.col("node")).alias("label")
    )


def test_fused_lpa_round_matches_unfused(spark):
    from wsu_cpts_415_spark.queries.graph_ops import lpa_round

    rng = random.Random(411)
    und = {(a, b) for a, b in
           ((rng.randrange(60), rng.randrange(60)) for _ in range(150))
           if a < b}
    pairs = list(und) or [(0, 1)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    ).localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .union(spark.createDataFrame([(999,)], "node long"))  # isolated
        .localCheckpoint(eager=True)
    )
    labels = verts.select("node", F.col("node").alias("label"))
    for _ in range(3):  # iterate so divergence would compound
        fused = lpa_round(verts, edges, labels, F.broadcast)
        unfused = _unfused_lpa_round(verts, edges, labels, F.broadcast)
        got = sorted((r.node, r.label) for r in fused.collect())
        want = sorted((r.node, r.label) for r in unfused.collect())
        assert got == want
        labels = fused.localCheckpoint(eager=True)
    assert (999, 999) in got  # isolated vertex kept its own label


def test_fused_lpa_round_is_single_shuffle(spark):
    """The fusion's whole point: one shuffle exchange per round (plus the
    label broadcast), not agg -> agg -> join."""
    import re

    from wsu_cpts_415_spark.queries.graph_ops import lpa_round

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    ).localCheckpoint(eager=True)
    verts = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    labels = verts.select("node", F.col("node").alias("label"))
    plan = (
        lpa_round(verts, edges, labels, F.broadcast)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles == 1, f"fused LPA round has {shuffles} shuffles:\n{plan}"


def test_fused_pagerank_matches_unfused(spark):
    """The union-base PageRank round == the contribution-agg + vertex
    left-join round, after the query's own 1e-9 rounding (adding a 0.0
    base term to each vertex's positive contribution sum is an IEEE
    no-op; only summation order may move, ~1e-16 relative, far below
    the grain)."""
    damping, iters = 0.85, 4
    rng = random.Random(412)
    edges_l = list(
        {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
    )
    edges = spark.createDataFrame(edges_l, "src long, dst long")
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    from pyspark.sql import Window

    edges_deg = edges.select(
        "src", "dst", F.count("*").over(Window.partitionBy("src")).alias("deg")
    ).localCheckpoint(eager=True)

    def fused():
        ranks = verts.select("id", F.lit(1.0 / n).alias("pr"))
        base = verts.select("id", F.lit(0.0).alias("c"))
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
        return ranks

    def unfused():
        ranks = verts.select("id", F.lit(1.0 / n).alias("pr"))
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
                verts.join(F.broadcast(contribs), "id", "left")
                .select(
                    "id",
                    (
                        F.lit((1 - damping) / n)
                        + damping * F.coalesce(F.col("m"), F.lit(0.0))
                    ).alias("pr"),
                )
                .localCheckpoint(eager=False)
            )
        return ranks

    got = {
        r.id: r.pr for r in fused().select("id", F.round("pr", 9).alias("pr")).collect()
    }
    want = {
        r.id: r.pr
        for r in unfused().select("id", F.round("pr", 9).alias("pr")).collect()
    }
    assert got == want
