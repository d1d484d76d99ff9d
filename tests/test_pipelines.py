"""Reference-parity pipeline tests beyond the registry oracles:
the native SCC implementation is checked against a Python Tarjan oracle on
arbitrary graphs (registry oracle only covers the derived block-ring graph),
and trending math is spot-checked on handcrafted rows."""

from __future__ import annotations

import math

from pyspark.sql import Row

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.pipelines.scc import (
    scc_components,
    strongly_connected_components,
    video_edges,
)
from wsu_cpts_415_spark.pipelines.trending import trending_scores
from wsu_cpts_415_spark.pipelines.videos import videos_nested


def tarjan_scc(vertices: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    """Iterative Tarjan; returns vertex -> min-id-in-SCC labeling."""
    adj: dict[str, list[str]] = {v: [] for v in vertices}
    for s, d in edges:
        if s in adj and d in adj:
            adj[s].append(d)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    label: dict[str, str] = {}
    counter = [0]

    for root in vertices:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recursed = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return label


def _run_scc(spark, vertices, edges):
    vdf = spark.createDataFrame([Row(id=v) for v in vertices])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {
        r["id"]: r["component"]
        for r in strongly_connected_components(vdf, edf).collect()
    }
    assert got == tarjan_scc(vertices, edges)


def test_scc_arbitrary_graph(spark):
    # two cycles bridged one-way, a chain, a self-loop, an isolate, and a
    # dangling edge to a non-vertex
    vertices = list("abcdefghij")
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # SCC {a,b,c}
        ("c", "d"), ("d", "e"), ("e", "d"),          # bridge -> SCC {d,e}
        ("f", "g"), ("g", "h"),                      # chain: singletons
        ("i", "i"),                                  # self-loop singleton
        ("e", "zz"),                                 # dangling, ignored
    ]
    _run_scc(spark, vertices, edges)


def test_scc_nested_peeling(spark):
    # chain of cycles forces multiple peel rounds: 1->2->3 block chain
    vertices = [f"n{i}" for i in range(9)]
    edges = (
        [("n0", "n1"), ("n1", "n2"), ("n2", "n0")]
        + [("n3", "n4"), ("n4", "n5"), ("n5", "n3")]
        + [("n6", "n7"), ("n7", "n8"), ("n8", "n6")]
        + [("n2", "n3"), ("n5", "n6")]  # one-way bridges
    )
    _run_scc(spark, vertices, edges)


def test_scc_videos_graph_matches_tarjan(spark):
    videos = videos_nested(spark, SF_SMOKE)
    vertices = [r["id"] for r in videos.select("id").collect()]
    edges = [(r["src"], r["dst"]) for r in video_edges(videos).collect()]
    got = {r["id"]: r["component"] for r in scc_components(videos).collect()}
    assert got == tarjan_scc(vertices, edges)


def test_trending_score_math(spark):
    videos = videos_nested(spark, SF_SMOKE)
    rows = {r["id"]: r for r in trending_scores(videos).collect()}
    raw = {r["id"]: r for r in videos.collect()}
    assert rows, "no scored rows"
    # independently recompute one row end-to-end in plain python
    some_id = sorted(rows)[7]
    v = raw[some_id]
    age = v["video_desc"]["age_days"]
    views = v["video_engagement"]["views"]
    nr = v["video_engagement"]["num_ratings"]
    nc = v["video_engagement"]["num_comments"]
    rating = v["video_attri"]["rating"]
    length = v["video_attri"]["length"]
    log_views = math.log1p(views)
    recency = age / 100.0
    velocity = log_views * age / 1000.0
    density = ((nr + nc) / (log_views + 1)) / 1000.0
    quality = rating * (math.log1p(nr) / 10)
    bonus = 2 if (age > 710 and density > 0.01) else 1.0
    if 120 <= length <= 900:
        lscore = 1.0
    elif length < 30:
        lscore = 0.3
    elif length > 3600:
        lscore = 0.4
    else:
        lscore = 0.7
    base = recency * 20 + velocity * 15 + density * 3 + quality * 25 + lscore * 1
    got = rows[some_id]
    assert abs(got["trending_score"] - base * bonus) < 1e-9
    # quality filter removed the injected >5-rating violators
    violators = [i for i, v in raw.items() if v["video_attri"]["rating"] > 5]
    assert violators and all(i not in rows for i in violators)


def test_trending_report_sink(spark, tmp_path):
    from wsu_cpts_415_spark.pipelines.report import trending_report
    from wsu_cpts_415_spark.pipelines.trending import trending_rankings

    ranked = trending_rankings(videos_nested(spark, SF_SMOKE))
    out = tmp_path / "trend_output.txt"
    text = trending_report(ranked, path=str(out))
    assert out.read_text() == text
    assert "STATS FOR TOP VIDEOS" in text
    assert "=== TOP 20 TRENDING VIDEOS ===" in text
    # 20 breakdown entries (#1:..#20:) and 20 table rows
    assert all(f"#{i}:" in text for i in range(1, 21))
    top_id = (
        ranked.orderBy("trending_score", ascending=False).limit(1).collect()[0]["id"]
    )
    assert top_id in text


def test_trending_scalable_percentile_matches_parity_window(spark):
    """Forcing the range-partitioned W2 path (scalable_rows=0) must give
    bit-identical global percentiles to the reference's single-partition
    window -- the bound only switches plans, never values."""
    from wsu_cpts_415_spark.pipelines.trending import trending_rankings

    videos = videos_nested(spark, SF_SMOKE)
    parity = {
        r["id"]: r
        for r in trending_rankings(videos, scalable_rows=1 << 60).collect()
    }
    scalable = {
        r["id"]: r for r in trending_rankings(videos, scalable_rows=0).collect()
    }
    assert parity.keys() == scalable.keys()
    for vid, p in parity.items():
        s = scalable[vid]
        assert p["category_rank"] == s["category_rank"]
        assert p["global_percentile"] == s["global_percentile"], (
            vid,
            p["global_percentile"],
            s["global_percentile"],
        )


def test_min_label_components_matches_union_find(spark):
    """min-label propagation == union-find on assorted pair graphs:
    chains (worst-case diameter), stars, cliques, disjoint singleton
    pairs, and a pseudo-random mix."""
    from wsu_cpts_415_spark.queries.graph_ops import min_label_components

    cases = [
        [(i, i + 1) for i in range(0, 12)],                      # one chain
        [(0, i) for i in range(1, 8)],                           # star
        [(a, b) for a in range(5) for b in range(a + 1, 5)],     # clique
        [(10, 11), (20, 21), (30, 31)],                          # pairs
        [((i * 7) % 23, (i * 11) % 23) for i in range(1, 15) if (i * 7) % 23 != (i * 11) % 23],
    ]
    for pairs in cases:
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
        expected = {v: find(v) for v in parent}

        df = spark.createDataFrame(
            [Row(doc_a=a, doc_b=b) for a, b in pairs]
        )
        got = {
            r["doc_id"]: r["label"]
            for r in min_label_components(df).collect()
        }
        assert got == expected, f"pairs={pairs}"
