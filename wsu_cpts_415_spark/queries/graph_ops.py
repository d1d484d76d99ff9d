"""Distributed graph operators over corpus and link graphs: near-duplicate
clustering (connected components over LSH-verified pairs) and PageRank over
the videos related-ids graph.

These extend the reference's graph surface (graph_filter.py builds SCCs
over related-ids; see pipelines/scc.py) with the two canonical iterative
graph computations a training-data pipeline needs:

* **near-dup clustering** is the step AFTER pair generation in every
  large-corpus dedup (MinHashLSH -> pairs -> connected components ->
  keep one canonical doc per cluster).  Pairs alone can't be acted on --
  transitively-linked groups must collapse together or the "keep the
  first, drop the rest" policy is order-dependent.
* **PageRank** is the classic link-popularity refinement of the
  reference's times-linked count (analyze_links.py:111-153 counts raw
  in-links; PageRank weights them by the linker's own rank).

Scale design:
  * The CC label loop runs ONLY on vertices incident to a near-dup pair
    (at real corpus scale that is a sliver of the corpus: the pair graph
    for a 100 TB crawl fits in a fraction of one executor's memory even
    when the corpus doesn't).  Min-label propagation converges in
    graph-diameter rounds; near-dup clusters are dense and tiny, so
    2-3 rounds suffice.  For adversarially long chains the same loop
    admits the large-star/small-star optimization (Kiveris et al. 2014)
    without changing the output contract.
  * Each PageRank iteration is one shuffle (contributions grouped by
    dst).  The edge+degree table is staged once (localCheckpoint here;
    a staged parquet table on a cluster) so iterations re-read a
    materialized slim table instead of recomputing the derivation.
  * Iterative lineage is truncated per round (localCheckpoint) exactly
    as in pipelines/scc.py -- unbounded lineage is what kills iterative
    jobs at scale, not the math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.pipelines.videos import VIDEOS_FLAT_DUCK_CTE, videos_flat
from wsu_cpts_415_spark.queries.similarity import (
    LSH_PAIRS_DUCK_CTES,
    lsh_verified_pairs,
)
from wsu_cpts_415_spark.registry import register

# exact-Jaccard cut for "these are the same doc", kept as a RATIONAL so
# every consumer derives from one constant pair: the float threshold
# (LSH-side filters), the PPJoin+ kernel's tau (ssjoin_pairs_above(...,
# NEARDUP_NUM, NEARDUP_DEN)), and the oracle templates' integer
# coefficients (J >= num/den iff (num+den)*n_common >= num*(na+nb)) --
# changing the threshold changes ALL of them together instead of
# silently desynchronizing the ground-truth side from the estimator
NEARDUP_NUM, NEARDUP_DEN = 1, 2
NEARDUP_THRESHOLD = NEARDUP_NUM / NEARDUP_DEN
MAX_CC_ROUNDS = 60  # safety bound ~ max component diameter; checked each round

PR_DAMPING = 0.85
PR_ITERS = 5

_NEARDUP_DUCK_CTES = f"""{LSH_PAIRS_DUCK_CTES},
    nd AS (
        SELECT doc_a, doc_b FROM lsh_pairs WHERE jaccard >= {NEARDUP_THRESHOLD}
    ),
    ud_edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM nd
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM nd
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, reach.r FROM ud_edges e JOIN reach ON reach.node = e.src
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )"""


def min_label_components(
    pairs: DataFrame, stats: dict | None = None
) -> DataFrame:
    """Connected components of an undirected pair graph by min-label
    propagation: (doc_a, doc_b) pairs in, (doc_id, label) out for every
    vertex incident to a pair, label = component-minimum vertex id.
    Converges in graph-diameter rounds with per-round convergence check
    and lineage truncation (generic kernel; property-tested against a
    union-find oracle in tests/test_pipelines.py).  ``stats`` records
    ``rounds`` for the pathological-topology probe."""
    # The pair graph is a sliver of the corpus; keep the iteration loop on
    # a handful of partitions so per-round task overhead tracks GRAPH size
    # (on a cluster this would be `coalesce(edges_bytes / target)`).
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .coalesce(4)
        # lazy init checkpoints (r12): round 1 materializes both inside
        # its convergence-aggregate job instead of two standalone jobs
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .coalesce(4)
        .localCheckpoint(eager=False)
    )
    # Min-label sums are strictly decreasing until the fixpoint, so one
    # scalar aggregate per round doubles as the convergence test (no
    # old-vs-new join needed).
    prev_sum = None
    converged = False
    for _rnd in range(MAX_CC_ROUNDS):
        if stats is not None:
            stats["rounds"] = _rnd + 1
        prop = edges.join(
            labels, edges["src"] == labels["doc_id"], "inner"
        ).select(F.col("dst").alias("doc_id"), "label")
        labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .coalesce(4)
            # lazy: the convergence aggregate right below materializes
            # the checkpoint in the same job (one job per round, not two)
            .localCheckpoint(eager=False)
        )
        label_sum = labels.agg(F.sum("label")).collect()[0][0]
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        # rounds ~ component diameter; a silent partial result would be
        # WRONG clusters (and an oracle mismatch) -- fail loudly so the
        # caller raises the bound instead
        raise RuntimeError(
            f"connected components did not converge in {MAX_CC_ROUNDS} "
            "rounds (component diameter exceeds the bound)"
        )
    return labels


def _neardup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every document: cluster_id is the minimum
    doc_id reachable through the >= {NEARDUP_THRESHOLD} Jaccard pair
    graph; documents in no pair are their own singleton cluster."""
    from wsu_cpts_415_spark.ops.staging import staged

    def build() -> DataFrame:
        pairs = (
            lsh_verified_pairs(spark, sf_dir)
            .filter(F.col("jaccard") >= NEARDUP_THRESHOLD)
            .select("doc_a", "doc_b")
        )
        # label loop over incident vertices only -- the corpus never
        # enters it; the result is session-staged because the clusters
        # query and the dedup summary share it verbatim.
        labels = min_label_components(pairs)
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        return docs.join(labels, "doc_id", "left").select(
            "doc_id",
            F.coalesce("label", "doc_id").cast("bigint").alias("cluster_id"),
        )

    return staged(spark, "neardup_labels", sf_dir, build)


@register(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_DUCK_CTES}
    SELECT doc_id, cluster_id, cluster_id = doc_id AS is_canonical
    FROM clusters
    ORDER BY doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components near-dup clustering: every document labeled
    with the min doc_id of its LSH near-dup component; ``is_canonical``
    marks the single survivor per cluster (deterministic winner policy,
    mirroring the ingest dedup sink's min-wins rule, io/ingest.py).

    The oracle computes the identical clustering via a recursive-CTE
    transitive closure over the same verified pair table -- feasible for
    DuckDB precisely because the pair graph is small, which is the same
    property the distributed loop exploits."""
    labels = _neardup_labels(spark, sf_dir)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_canonical"),
    ).orderBy("doc_id")


@register(
    "neardup_dedup_summary",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_DUCK_CTES}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT) AS n_dropped,
           ROUND((COUNT(*) - COUNT(DISTINCT cluster_id)) * 100.0 / COUNT(*), 6)
               AS dropped_pct
    FROM clusters
    """,
)
def neardup_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup report over the near-dup clustering: corpus size,
    canonical survivors, documents a dedup pass would drop, and the drop
    rate -- the headline number every corpus-curation run reports."""
    labels = _neardup_labels(spark, sf_dir)
    return labels.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_kept"),
        (F.count("*") - F.countDistinct("cluster_id")).alias("n_dropped"),
        F.round(
            (F.count("*") - F.countDistinct("cluster_id"))
            * 100.0
            / F.count("*"),
            6,
        ).alias("dropped_pct"),
    )


def _pagerank_duck_iters() -> str:
    """pr0..pr{PR_ITERS} chained CTEs; textual arithmetic mirrors the
    Spark expressions token-for-token so IEEE evaluation agrees."""
    ctes = ["pr0 AS (SELECT id, 1.0 / nn.n AS pr FROM verts CROSS JOIN nn)"]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
        SELECT v.id,
               (1 - {PR_DAMPING}) / nn.n
                   + {PR_DAMPING} * COALESCE(s.m, 0.0) AS pr
        FROM verts v CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS id, SUM(p.pr / e.deg) AS m
            FROM edges_deg e JOIN pr{i - 1} p ON p.id = e.src
            GROUP BY e.dst
        ) s ON s.id = v.id
    )"""
        )
    return ",\n    ".join(ctes)


@register(
    "pagerank_videos",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    verts AS (SELECT id FROM videos_flat),
    nn AS (SELECT COUNT(*) AS n FROM verts),
    e0 AS (
        SELECT v.id AS src, unnest(v.related_ids) AS dst FROM videos_flat v
    ),
    live AS (
        SELECT e0.src, e0.dst FROM e0 JOIN verts t ON t.id = e0.dst
    ),
    edges_deg AS (
        SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS deg FROM live
    ),
    {_pagerank_duck_iters()}
    SELECT id, ROUND(pr, 9) AS pagerank
    FROM pr{PR_ITERS}
    ORDER BY pagerank DESC, id
    """,
)
def pagerank_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping {PR_DAMPING}, {PR_ITERS} synchronous iterations,
    uniform init) over the videos related-ids graph, dangling references
    dropped by a semi join exactly as the reference's link analysis drops
    them (analyze_links.py:140-141).

    Per iteration: contributions = rank/out-degree flow along edges, one
    hash aggregate by dst, one left join back to the vertex set (nodes
    with no in-links decay to (1-d)/N).  The staged (src, dst, deg)
    table is the only input re-read each round."""
    from pyspark.sql import Window

    from wsu_cpts_415_spark.ops.staging import staged

    # The videos derivation (wide expression tree -> codegen compile per
    # plan) is materialized ONCE as a slim (id, related_ids) projection;
    # vertex set, edge list, degrees, and the vertex count all derive from
    # that staged table instead of re-deriving the view per action.
    flat_slim = staged(
        spark,
        "videos_graph_slim",
        sf_dir,
        lambda: videos_flat(spark, sf_dir).select("id", "related_ids"),
    )
    verts = flat_slim.select("id")
    raw = flat_slim.select(
        F.col("id").alias("src"), F.explode("related_ids").alias("dst")
    )
    live = raw.join(verts.select(F.col("id").alias("dst")), "dst", "leftsemi")

    n = verts.count()  # scalar vertex count: one job, as in MLlib PageRank
    # iteration parallelism sized by the GRAPH, not the session default:
    # ~100k vertices per task keeps a 1000-executor cluster busy at web
    # scale while a fixture graph runs in single-digit tasks
    parts = max(1, min(spark.sparkContext.defaultParallelism, n // 100_000))
    # lazy init checkpoints: both tables first materialize inside the
    # final action's first round instead of as two standalone driver
    # jobs (r12; the data and every later read are identical)
    edges_deg = (
        live.select(
            "src", "dst", F.count("*").over(Window.partitionBy("src")).alias("deg")
        )
        .coalesce(parts)
        .localCheckpoint(eager=False)
    )
    verts_c = verts.coalesce(parts).localCheckpoint(eager=False)
    # Each iteration's rank table is LAZILY checkpointed: without a
    # materialization boundary, iteration i's subtree is re-evaluated by
    # both consumers at level i+1 (the contribution join's broadcast AND
    # the vertex left join), compounding 2^iters; lazy checkpoints cache
    # each level on first evaluation while keeping the whole recurrence
    # inside one action.
    # Rank-table join strategy is size-aware, like GraphX's choice
    # between broadcast and co-partitioned iteration: while the rank
    # table is bounded (the reference caps its graph inputs at 100k
    # vertices, analyze_links.py workload cap), broadcasting it removes
    # BOTH per-iteration edge shuffles -- each superstep is then one
    # partial-agg exchange of |verts| contribution rows.  Past the
    # bound, fall back to hash joins (AQE co-partitions both sides).
    bcast = n <= 5_000_000
    hint = F.broadcast if bcast else (lambda df: df)
    n = max(n, 1)  # empty graph: verts_c has no rows, so 1/n is unused
    ranks = verts_c.select("id", F.lit(1.0 / n).alias("pr"))
    # FUSED round (round 11, lesson #11 applied): the old shape was
    # contribution agg THEN a vertex left join (per round: one exchange
    # plus TWO broadcast builds plus a join stage) -- per-round fixed
    # cost, not bytes, dominated the wall (32 KB of shuffle at sf0.1).
    # Unioning a zero-contribution base row per vertex into the SAME
    # aggregate folds the "vertices with no in-links" left join into
    # the one exchange: per round = one broadcast build (ranks) + one
    # partial-combining exchange.  Adding 0.0 to each vertex's
    # contribution sum is an IEEE no-op (contributions are positive),
    # so results are identical to the join form.
    base = verts_c.select("id", F.lit(0.0).alias("c"))
    for _ in range(PR_ITERS):
        contribs = edges_deg.join(
            hint(ranks), edges_deg["src"] == ranks["id"], "inner"
        ).select(
            F.col("dst").alias("id"), (F.col("pr") / F.col("deg")).alias("c")
        )
        ranks = (
            base.unionByName(contribs)
            .groupBy("id")
            .agg(F.sum("c").alias("m"))
            .select(
                "id",
                (
                    F.lit((1 - PR_DAMPING) / n) + PR_DAMPING * F.col("m")
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", F.round("pr", 9).alias("pagerank")).orderBy(
        F.col("pagerank").desc(), "id"
    )


_UND_EDGES_DUCK = f"""{VIDEOS_FLAT_DUCK_CTE},
    verts AS (SELECT id FROM videos_flat),
    e0 AS (
        SELECT v.id AS src, unnest(v.related_ids) AS dst FROM videos_flat v
    ),
    live AS (
        SELECT e0.src, e0.dst FROM e0 JOIN verts t ON t.id = e0.dst
        WHERE e0.src <> e0.dst
    ),
    und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM live
    )"""


def _und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge list (a < b, deduped, dangling refs and
    self-loops dropped) of the videos related-ids graph -- the Spark twin
    of _UND_EDGES_DUCK."""
    from wsu_cpts_415_spark.ops.staging import staged

    flat_slim = staged(
        spark,
        "videos_graph_slim",
        sf_dir,
        lambda: videos_flat(spark, sf_dir).select("id", "related_ids"),
    )
    verts = flat_slim.select("id")
    raw = flat_slim.select(
        F.col("id").alias("src"), F.explode("related_ids").alias("dst")
    )
    live = raw.join(
        verts.select(F.col("id").alias("dst")), "dst", "leftsemi"
    ).filter(F.col("src") != F.col("dst"))
    return live.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


@register(
    "triangle_counts",
    oracle=f"""
    WITH {_UND_EDGES_DUCK},
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    GROUP BY id
    ORDER BY n_triangles DESC, id
    """,
)
def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation over the undirected videos
    graph -- the clustering-coefficient numerator and the classic
    cohesion signal (which videos sit inside tightly-linked pockets
    rather than chains).

    Algorithm: canonical a<b<c enumeration -- each triangle found
    exactly once by joining wedge (a,b)+(b,c) against closing edge
    (a,c).  Scale: two equi-joins on vertex keys; the wedge join's skew
    is bounded by max degree (production orders vertices by degree
    before directing edges, which caps wedge counts at
    O(edges^1.5) total -- the standard node-iterator++ bound); no
    cross product anywhere (plan-gated)."""
    und = _und_edges(spark, sf_dir)
    # explicit relation aliases: a 3-way self-join without them lets the
    # analyzer deduplicate the shared subplan's attributes, collapsing
    # the closing-edge equi condition into a trivial comparison and
    # falling back to a nested-loop join (correct, but quadratic)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "id")
    )


COMMON_NEIGHBOR_TOP_K = 50


@register(
    "common_neighbor_sim",
    oracle=f"""
    WITH {_UND_EDGES_DUCK},
    adj AS (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL
        SELECT b AS node, a AS nbr FROM und
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY node
    ),
    wedges AS (
        SELECT l.node AS u, r.node AS w,
               CAST(COUNT(*) AS BIGINT) AS common
        FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.node < r.node
        GROUP BY l.node, r.node
    )
    SELECT u, w, common,
           ROUND(CAST(common AS DOUBLE)
                 / (du.deg + dw.deg - common), 6) AS jaccard
    FROM wedges
    JOIN deg du ON du.node = u
    JOIN deg dw ON dw.node = w
    ORDER BY jaccard DESC, u, w
    LIMIT {COMMON_NEIGHBOR_TOP_K}
    """,
)
def common_neighbor_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: for every vertex pair
    sharing at least one neighbor, the Jaccard similarity of their
    neighbor sets (|N(u) ∩ N(w)| / |N(u) ∪ N(w)|), top-{COMMON_NEIGHBOR_TOP_K}.

    Scale: candidate pairs come from the wedge join (only pairs with a
    common neighbor ever exist -- never the all-pairs matrix); the
    shuffle carries (node, nbr) edge rows keyed by neighbor.  Hub
    vertices fan out quadratically exactly as in the LSH hot-bucket
    case; the production knob is the same (cap or salt the hub's
    wedge list).  The degree table is pair-graph-NODE-grain -- a
    corpus-fraction that grows without bound at 100 TB -- so it rides
    through the row+byte-gated ``maybe_broadcast`` (fixed-width rows;
    above the gate the degree joins shuffle on u/w, which the wedge
    aggregate has already clustered)."""
    from wsu_cpts_415_spark.ops.staging import maybe_broadcast
    from wsu_cpts_415_spark.queries.ssjoin import DOC_SIDE_BCAST_ROWS

    und = _und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    left = adj.select(F.col("node").alias("u"), "nbr")
    right = adj.select(F.col("node").alias("w"), F.col("nbr").alias("nbr2"))
    wedges = (
        left.join(right, (F.col("nbr") == F.col("nbr2")) & (F.col("u") < F.col("w")))
        .groupBy("u", "w")
        .agg(F.count("*").alias("common"))
    )
    deg = maybe_broadcast(
        deg,
        DOC_SIDE_BCAST_ROWS,
        persist_input=True,
        stats_key=("cns_deg", sf_dir),
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dw = deg.select(F.col("node").alias("w"), F.col("deg").alias("deg_w"))
    return (
        wedges.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_u") + F.col("deg_w") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "w")
        .limit(COMMON_NEIGHBOR_TOP_K)
    )


LPA_ITERS = 3


def _lpa_duck_iters() -> str:
    """Chained synchronous label-propagation CTEs (lp0..lpN): each round,
    every vertex adopts its neighbors' most frequent label, ties broken
    by smallest label; isolated vertices keep their own id."""
    parts = ["lp0 AS (SELECT id AS node, id AS label FROM verts)"]
    for i in range(1, LPA_ITERS + 1):
        parts.append(
            f"""cnt{i} AS (
        SELECT e.src AS node, l.label, COUNT(*) AS c
        FROM bidir e JOIN lp{i - 1} l ON l.node = e.dst
        GROUP BY e.src, l.label
    ),
    best{i} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM cnt{i}
        ) WHERE rn = 1
    ),
    lp{i} AS (
        SELECT v.id AS node, COALESCE(b.label, v.id) AS label
        FROM verts v LEFT JOIN best{i} b ON b.node = v.id
    )"""
        )
    return ",\n    ".join(parts)


@register(
    "label_propagation",
    oracle=f"""
    WITH {_UND_EDGES_DUCK},
    bidir AS (
        SELECT a AS src, b AS dst FROM und
        UNION ALL
        SELECT b AS src, a AS dst FROM und
    ),
    {_lpa_duck_iters()}
    SELECT node, label AS community FROM lp{LPA_ITERS} ORDER BY node
    """,
)
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected videos graph: every vertex starts as
    its own label and repeatedly adopts the most frequent label among
    its neighbors (ties -> smallest label), {LPA_ITERS} fixed rounds.
    Deterministic by construction -- synchronous updates plus a total
    tie-break order -- so the same SQL-expressible fixpoint prefix is
    checkable in DuckDB via chained CTEs.

    Scale design (the same posture as ``pagerank_videos``): iteration
    parallelism is sized by the graph, not the session default; while
    the label table is bounded it broadcasts into the edge join (no
    per-round edge shuffle at all), falling back to hash joins past the
    bound; the argmax is two hash aggregates -- (node, label) counts,
    then min(struct(-count, label)) per node, the exact (count desc,
    label asc) tie-break with no window sort -- so nothing is ever
    quadratic in vertices, state per round is one label per vertex, and
    lineage is truncated every round.  At 100 TB you'd bucket edges and
    labels on the vertex id so every non-broadcast round co-locates.
    """
    from wsu_cpts_415_spark.ops.staging import staged

    und = _und_edges(spark, sf_dir)
    verts = staged(
        spark,
        "videos_graph_slim",
        sf_dir,
        lambda: videos_flat(spark, sf_dir).select("id", "related_ids"),
    ).select(F.col("id").alias("node"))
    n = verts.count()
    parts = max(1, min(spark.sparkContext.defaultParallelism, n // 100_000))
    # lazy init checkpoints (r12): first round materializes both in the
    # final action instead of two standalone driver jobs
    bidir = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .coalesce(parts)
        .localCheckpoint(eager=False)
    )
    verts_c = verts.coalesce(parts).localCheckpoint(eager=False)
    hint = F.broadcast if n <= 5_000_000 else (lambda df: df)
    labels = verts_c.select("node", F.col("node").alias("label"))
    for _ in range(LPA_ITERS):
        labels = lpa_round(verts_c, bidir, labels, hint).localCheckpoint(
            eager=False
        )
    return labels.select("node", F.col("label").alias("community")).orderBy("node")


def lpa_round(
    verts: DataFrame,
    bidir: DataFrame,
    labels: DataFrame,
    hint=None,
) -> DataFrame:
    """One synchronous LPA round: equi-join edges x labels on the vertex
    id, partial-aggregated (node, label) counts, then a per-node
    min(struct(-count, label)) argmax -- the exact (count desc, label
    asc) tie-break as a hash aggregate instead of a window sort.
    Isolated vertices keep their previous (= initial) label.  Exposed
    separately so the plan gate can assert the round shape that
    ``localCheckpoint`` hides from the registered query's final plan."""
    if hint is None:
        hint = lambda df: df  # noqa: E731
    # FUSED round (round 11, lesson #11 applied).  The old shape was
    # count-per-(vertex,label) -> exchange -> argmax-per-vertex ->
    # exchange -> broadcast -> vertex left join: two exchanges and two
    # broadcast builds per round of per-round FIXED cost on tiny data.
    # Fusion: (a) a zero-weight (node, own-label) base row per vertex
    # rides the same aggregate, so isolated vertices keep their label
    # without the final join (a real neighbor label has c >= 1 and
    # always beats the c = 0 sentinel in the argmax); (b) one explicit
    # hash repartition on the vertex id satisfies BOTH aggregates'
    # clustering (node subset-of (node, label)), so the count and the
    # argmax run back-to-back in ONE post-exchange stage.  Per round:
    # one broadcast build (labels) + one exchange.  Semantics are
    # byte-identical (tests/test_star_cc.py pins fused == unfused).
    #
    # explicit relation aliases: labels may share lineage with bidir (e.g.
    # before the first checkpoint), and without aliases the analyzer
    # deduplicates the shared subplan's attributes, collapsing the equi
    # condition into a trivial one and falling back to a nested loop
    contrib = (
        bidir.alias("e")
        .join(hint(labels.alias("l")), F.col("e.dst") == F.col("l.node"))
        .select(
            F.col("e.src").alias("node"),
            F.col("l.label").alias("label"),
            F.lit(1).cast("long").alias("w"),
        )
    )
    base = verts.select(
        "node",
        F.col("node").alias("label"),
        F.lit(0).cast("long").alias("w"),
    )
    return (
        base.unionByName(contrib)
        .repartition("node")
        .groupBy("node", "label")
        .agg(F.sum("w").alias("c"))
        .groupBy("node")
        .agg(
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("label").alias("lab"))
            ).alias("b")
        )
        .select("node", F.col("b.lab").alias("label"))
    )


@register(
    "community_modularity",
    oracle=f"""
    WITH RECURSIVE {_NEARDUP_DUCK_CTES},
    deg AS (
        SELECT node, CAST(COUNT(*) AS DOUBLE) AS d
        FROM (SELECT doc_a AS node FROM nd
              UNION ALL SELECT doc_b AS node FROM nd)
        GROUP BY node
    ),
    intra AS (
        SELECT la.cluster_id, CAST(COUNT(*) AS DOUBLE) AS e_c
        FROM nd e
        JOIN clusters la ON e.doc_a = la.doc_id
        JOIN clusters lb ON e.doc_b = lb.doc_id
                        AND la.cluster_id = lb.cluster_id
        GROUP BY la.cluster_id
    ),
    dsum AS (
        SELECT l.cluster_id, SUM(deg.d) AS d_c
        FROM deg JOIN clusters l ON deg.node = l.doc_id
        GROUP BY l.cluster_id
    ),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM nd)
    SELECT CAST(m.m AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           ROUND(SUM(COALESCE(intra.e_c, 0) / m.m
                     - POW(dsum.d_c / (2 * m.m), 2)), 6) AS modularity
    FROM dsum LEFT JOIN intra USING (cluster_id) CROSS JOIN m
    GROUP BY m.m
    """,
)
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the near-dup cluster partition over the
    verified pair graph: Q = sum_c [e_c/m - (d_c/2m)^2].  The quality
    score that tells a dedup pipeline whether its clusters are real
    communities or artifacts of the pair threshold; computed generally
    (intra-edges counted via a two-sided label join), so the same
    operator scores ANY partition -- LPA labels, category buckets --
    not just connected components (for which e_c/m trivially sums to 1).

    Scale: runs entirely on the pair-graph sliver (edges + incident
    vertices); two joins against the label table (broadcast -- labels of
    edge-incident vertices only) and one tiny per-cluster aggregate.
    """
    pairs = (
        lsh_verified_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= NEARDUP_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    labels = _neardup_labels(spark, sf_dir).select("doc_id", "cluster_id")
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionByName(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("double").alias("d"))
    )
    # broadcast ONLY edge-incident labels: _neardup_labels is corpus-grain
    # (every doc, singletons included); at scale the full table would blow
    # the broadcast, while the incident sliver is pair-graph-sized.  The
    # sliver itself still grows with the pair graph, so the hint goes
    # through the row+byte-gated maybe_broadcast (shuffle-join fallback
    # above the gate); the hint survives the la/lb projections below
    inc_labels = labels.join(
        deg.select(F.col("node").alias("doc_id")), "doc_id", "left_semi"
    )
    from wsu_cpts_415_spark.ops.staging import maybe_broadcast
    from wsu_cpts_415_spark.queries.ssjoin import DOC_SIDE_BCAST_ROWS

    inc_labels = maybe_broadcast(
        inc_labels,
        DOC_SIDE_BCAST_ROWS,
        persist_input=True,
        stats_key=("modularity_inc_labels", sf_dir),
    )
    la = inc_labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = inc_labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    intra = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("cluster_id"))
        .agg(F.count("*").cast("double").alias("e_c"))
    )
    dsum = (
        deg.join(inc_labels, deg["node"] == inc_labels["doc_id"])
        .groupBy("cluster_id")
        .agg(F.sum("d").alias("d_c"))
    )
    m_edges = pairs.count()
    m = float(m_edges)
    per_cluster = dsum.join(intra, "cluster_id", "left").select(
        (F.coalesce("e_c", F.lit(0.0)) / F.lit(m)
         - F.pow(F.col("d_c") / F.lit(2 * m), 2)).alias("q_c")
    )
    return per_cluster.agg(
        F.lit(m_edges).cast("bigint").alias("n_edges"),
        F.count("*").alias("n_communities"),
        F.round(F.sum("q_c"), 6).alias("modularity"),
    ).filter(F.col("n_edges") > 0)  # empty pair graph: 0 rows, like the oracle


BFS_MAX_HOPS = 4


@register(
    "bfs_hops_videos",
    oracle=f"""
    WITH RECURSIVE {VIDEOS_FLAT_DUCK_CTE.strip().rstrip()},
    verts AS (SELECT id FROM videos_flat),
    edges AS (
        SELECT f.id AS src, u.dst
        FROM videos_flat f, UNNEST(f.related_ids) AS u(dst)
        WHERE u.dst IN (SELECT id FROM verts)
    ),
    root AS (SELECT MIN(id) AS id FROM verts),
    reach(node, h) AS (
        SELECT id, 0 FROM root
        UNION ALL
        SELECT e.dst, reach.h + 1
        FROM edges e JOIN reach ON reach.node = e.src
        WHERE reach.h < {BFS_MAX_HOPS}
    )
    SELECT node AS id, CAST(MIN(h) AS INT) AS hops
    FROM reach
    GROUP BY node
    ORDER BY hops, id
    """,
)
def bfs_hops_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS: shortest hop distance (<= {BFS_MAX_HOPS}) from the
    lexicographically-first video along directed related-links -- the
    "how far does influence travel" primitive under every k-hop
    neighborhood feature.  Completes the iterative-graph family (SCC,
    CC, PageRank, LPA, k-core, triangles) with the one kernel whose
    frontier SHRINKS as it runs.

    Scale: per round, only the FRONTIER (nodes first reached that round)
    joins the edge table -- visited nodes never re-enter, so total work
    is O(edges within the horizon), one shuffle per hop, lineage
    truncated per round like every iterative kernel here.  The oracle's
    recursive CTE enumerates bounded paths and takes MIN(h); BFS's
    first-touch IS that minimum."""
    from wsu_cpts_415_spark.ops.staging import staged

    flat_slim = staged(
        spark,
        "videos_graph_slim",
        sf_dir,
        lambda: videos_flat(spark, sf_dir).select("id", "related_ids"),
    )
    verts = flat_slim.select("id")
    raw = flat_slim.select(
        F.col("id").alias("src"), F.explode("related_ids").alias("dst")
    )
    edges = (
        raw.join(verts.select(F.col("id").alias("dst")), "dst", "leftsemi")
        .coalesce(4)
        # lazy: round 1's frontier count materializes it in-job (r12)
        .localCheckpoint(eager=False)
    )
    root = verts.agg(F.min("id").alias("id"))
    return bfs_hops(edges, root, BFS_MAX_HOPS).orderBy("hops", "id")


def bfs_hops(edges: DataFrame, root: DataFrame, max_hops: int) -> DataFrame:
    """Frontier BFS kernel: (src, dst) directed edges + a root vertex set
    in, (id, hops) out for every vertex within ``max_hops`` of a root.
    Visited vertices never re-enter the frontier join (anti join against
    the accumulated distance table), lineage truncated per round.
    Property-tested against a pure-python BFS in tests/test_properties.py.
    """
    from wsu_cpts_415_spark.queries.ssjoin import DOC_SIDE_BCAST_ROWS

    # lazy: the count below materializes the checkpoint in the same job
    dist = root.select("id", F.lit(0).alias("hops")).localCheckpoint(eager=False)
    frontier = dist
    n_dist = dist.count()
    for h in range(1, max_hops + 1):
        # frontier and visited sets are checkpointed RDDs with unknown
        # stats -- un-hinted, both the semi and the anti join would
        # shuffle.  Broadcast them while the driver-tracked visited
        # count stays under the gate (round 11, lesson #11): the
        # frontier distinct is then the round's only exchange.
        hint = (
            F.broadcast if n_dist <= DOC_SIDE_BCAST_ROWS else (lambda d: d)
        )
        reached = (
            edges.join(
                hint(frontier.select(F.col("id").alias("src"))),
                "src",
                "leftsemi",
            )
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = (
            reached.join(hint(dist.select("id")), "id", "leftanti")
            .select("id", F.lit(h).alias("hops"))
            .coalesce(4)
            # lazy: the frontier count below materializes the checkpoint
            # in the same job (one job per round, not two)
            .localCheckpoint(eager=False)
        )
        n_new = new.count()
        if n_new == 0:
            break
        # dist is a union of <= max_hops checkpointed frontiers: lineage
        # stays shallow without re-checkpointing the accumulated table
        # every round (the old shape re-materialized |visited| rows per
        # hop)
        dist = dist.unionByName(new)
        n_dist += n_new
        frontier = new
    return dist
