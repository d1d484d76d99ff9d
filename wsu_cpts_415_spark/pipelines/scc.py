"""Native strongly-connected components on DataFrames (reference
big_data/scripts/analysis/graph_filter.py:120-159).

The reference calls ``graphframes.GraphFrame.stronglyConnectedComponents
(maxIter=10)`` (graph_filter.py:129); graphframes has no PySpark 4.x build
here (SURVEY.md §7.3), so the engine implements SCC natively as iterative
DataFrame algebra -- which is also what GraphFrames does under the hood
(Pregel-style joins), minus the JVM package dependency.

Algorithm: trimming + min-label forward/backward peeling.

  1. **Trim**: a vertex with no in-edges or no out-edges (in the remaining
     graph) cannot lie on a cycle -> it is its own singleton SCC.  Repeat
     (removing a sink exposes new sinks) a bounded number of rounds.
  2. **Peel round**: compute f(v) = min id forward-reachable from v
     (including v) and b(v) = min id backward-reachable, each by iterative
     min-label propagation over the edge table.  Where ``f(v) == b(v) == m``,
     m is both a descendant and an ancestor of v, so v is in SCC(m); all of
     SCC(m) shares (f, b), so the whole component is labeled at once.  The
     SCC containing the globally minimal remaining id is always labeled,
     guaranteeing progress; assigned vertices are removed and the next
     round peels the rest.
  3. Vertices still unlabeled when the round budget runs out keep their own
     id as component -- the same bounded-iteration semantics as the
     reference's maxIter=10.

Scale notes: each propagation step is one (edges JOIN labels) shuffle plus
a min-aggregate -- the canonical Pregel superstep as relational algebra.
``localCheckpoint`` after every step truncates the iterative lineage
(without it, plan depth grows linearly and planning cost quadratically).
Early exit is detected with a cheap changed-count action per step; at
cluster scale you would run fixed-step batches instead.  Vertex ids stay
strings here (test graphs are small); a production run would
dictionary-encode ids to longs first so shuffle keys are 8 bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_reach_labels(
    vertices: DataFrame, edges: DataFrame, max_iter: int, check_every: int = 3
) -> DataFrame:
    """(id, f, b): minimum vertex id reachable forward (along src->dst)
    and backward from ``id``, within ``max_iter`` hops.

    Both fixpoints run FUSED in one label table: each superstep is a
    single union + min-aggregate job (min ignores the null half of each
    message), halving the job count vs separate passes.  Convergence is
    checked every ``check_every`` steps -- the check is a join+count
    action over two checkpointed tables, cheap but not free."""
    lab = vertices.select(
        "id", F.col("id").alias("f"), F.col("id").alias("b")
    ).localCheckpoint(eager=True)
    steps_since_check = 0
    for it in range(max_iter):
        msgs_f = edges.join(lab, F.col("dst") == F.col("id")).select(
            F.col("src").alias("id"), "f", F.lit(None).cast("string").alias("b")
        )
        msgs_b = edges.join(lab, F.col("src") == F.col("id")).select(
            F.col("dst").alias("id"), F.lit(None).cast("string").alias("f"), "b"
        )
        new_lab = (
            lab.unionByName(msgs_f)
            .unionByName(msgs_b)
            .groupBy("id")
            .agg(F.min("f").alias("f"), F.min("b").alias("b"))
            # lazy: lineage still truncates at the next materialization,
            # but supersteps between convergence checks run as ONE job
            # instead of one eager checkpoint job each (measured ~15%
            # off the whole SCC query at sf0.1)
            .localCheckpoint(eager=False)
        )
        steps_since_check += 1
        if steps_since_check >= check_every or it == max_iter - 1:
            steps_since_check = 0
            changed = (
                new_lab.alias("n")
                .join(lab.alias("o"), "id")
                .filter(
                    (F.col("n.f") != F.col("o.f")) | (F.col("n.b") != F.col("o.b"))
                )
                .limit(1)
                .count()
            )
            if changed == 0:
                return new_lab
        lab = new_lab
    return lab


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 15,
    max_rounds: int = 10,
    trim_rounds: int = 5,
) -> DataFrame:
    """(id, component) with component = min vertex id in the SCC.

    ``vertices``: DataFrame with column ``id``; ``edges``: (src, dst).
    Edges with endpoints outside ``vertices`` are ignored (the reference's
    inner-join semantics drop dangling related-ids the same way)."""
    remaining = vertices.select("id").distinct().localCheckpoint(eager=True)
    ids_src = remaining.select(F.col("id").alias("src"))
    ids_dst = remaining.select(F.col("id").alias("dst"))
    live_edges = (
        edges.select("src", "dst")
        .distinct()
        .filter(F.col("src") != F.col("dst"))
        .join(ids_src, "src")
        .join(ids_dst, "dst")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    assigned: list[DataFrame] = []

    # -- trim: acyclic fringe vertices are singleton SCCs ------------------
    for _ in range(trim_rounds):
        has_out = live_edges.select(F.col("src").alias("id")).distinct()
        has_in = live_edges.select(F.col("dst").alias("id")).distinct()
        in_cycle_candidates = has_out.join(has_in, "id")
        trimmed = remaining.join(in_cycle_candidates, "id", "left_anti")
        if trimmed.limit(1).count() == 0:
            break
        assigned.append(trimmed.select("id", F.col("id").alias("component")))
        remaining = remaining.join(trimmed, "id", "left_anti").localCheckpoint(
            eager=True
        )
        live_edges = (
            live_edges.join(remaining.select(F.col("id").alias("src")), "src")
            .join(remaining.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    # -- peel: label SCCs where min-forward-reach == min-backward-reach ---
    for _ in range(max_rounds):
        if remaining.limit(1).count() == 0:
            break
        both = _min_reach_labels(remaining, live_edges, max_iter=max_iter)
        found = both.filter(F.col("f") == F.col("b")).select(
            "id", F.col("f").alias("component")
        )
        assigned.append(found.localCheckpoint(eager=True))
        remaining = remaining.join(found, "id", "left_anti").localCheckpoint(
            eager=True
        )
        live_edges = (
            live_edges.join(remaining.select(F.col("id").alias("src")), "src")
            .join(remaining.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    # round budget exhausted: remaining vertices keep their own id
    leftover = remaining.select("id", F.col("id").alias("component"))
    out = leftover
    for part in assigned:
        out = out.unionByName(part)
    return out


def video_edges(videos: DataFrame) -> DataFrame:
    """(src, dst) edge derivation from the videos table
    (graph_filter.py:120-123): one edge per related-id reference."""
    return videos.select(
        F.col("id").alias("src"), F.explode("related_ids").alias("dst")
    )


def scc_components(
    videos: DataFrame, max_iter: int = 15, comps: DataFrame | None = None
) -> DataFrame:
    """Per-video SCC label over the related-ids graph, ordered by id.

    ``comps`` lets a caller supply an already-computed label table (the
    registry stages one per session -- SCC is deterministic, so sharing
    it between the components and rollup queries changes latency, never
    results; the cluster analogue is one labeling job whose output table
    feeds every downstream consumer)."""
    if comps is None:
        vertices = videos.select("id")
        comps = strongly_connected_components(
            vertices, video_edges(videos), max_iter
        )
    return comps.orderBy("id")


def scc_cluster_rollup(
    videos: DataFrame, comps: DataFrame | None = None
) -> DataFrame:
    """Per-component rollup (graph_filter.py:143-156): cluster size,
    distinct uploaders/categories, average views -- biggest cluster first.

    The reference materializes collect_list/collect_set arrays and takes
    their ``size`` (unbounded per-group state for a viral cluster); the
    engine computes the counts directly -- countDistinct is two hash
    aggregates, no arrays ever materialize (SURVEY.md §7.3)."""
    if comps is None:
        comps = strongly_connected_components(
            videos.select("id"), video_edges(videos)
        )
    flat = videos.select(
        "id",
        F.col("video_desc.uploader").alias("uploader"),
        F.col("video_desc.category").alias("category"),
        F.col("video_engagement.views").alias("views"),
    )
    return (
        comps.join(flat, "id")
        .groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.countDistinct("uploader").alias("distinct_uploaders"),
            F.countDistinct("category").alias("distinct_categories"),
            F.round(F.avg("views"), 4).alias("avg_views"),
        )
        # P6: keep real clusters only (the reference filters size > 1 in
        # pandas, graph_filter.py:53-54; here it is a plain agg filter)
        .filter(F.col("cluster_size") > 1)
        .orderBy(F.col("cluster_size").desc(), F.col("component").asc())
    )
