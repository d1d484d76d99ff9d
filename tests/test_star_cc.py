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
